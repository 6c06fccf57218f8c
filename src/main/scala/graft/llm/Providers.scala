package graft.llm

/** Multi-provider LLM adapters (U4) — the reference's provider switch
  * (reference: Requirements/ExampleAiCode.md:387-417 selects
  * OpenAI/Azure/Anthropic/Google by config) re-expressed as pure
  * request-shape builders behind [[WeeklySummary.LlmClient]].
  *
  * This environment has no egress, so the TRANSPORT is injected
  * (`RequestSpec => String`); everything testable without a network —
  * endpoint, headers, body shape, response extraction — is built and
  * pinned here. All four request shapes are the providers' public,
  * documented HTTP APIs.
  */
object Providers {

  /** A fully-formed HTTP request: what a transport must send. */
  final case class RequestSpec(url: String, headers: Map[String, String], body: String)

  type Transport = RequestSpec => String

  /** Minimal JSON string escaping for prompt embedding. */
  private[llm] def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 16)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Pull the assistant text out of a provider response with the
    * provider's content-field path. Deliberately tolerant (first match
    * of the field pattern) — the data plane never depends on this.
    */
  private[llm] def extractField(json: String, field: String): String = {
    val m = java.util.regex.Pattern
      .compile("\"" + field + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")
      .matcher(json)
    if (m.find()) unescape(m.group(1)) else json
  }

  /** Single left-to-right unescape pass — sequential `.replace` calls
    * corrupt content where a literal backslash precedes an escape
    * letter (e.g. `C:\\newfile` would gain a newline).
    */
  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          // the remaining legal JSON escapes: serializers commonly
          // escape forward slashes, and \b/\f are valid if rare —
          // leaving them produces stray backslashes in extracted text
          case '/' => sb.append('/'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' if i + 5 < s.length =>
            try { sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6 }
            catch { case _: NumberFormatException => sb.append(s(i)); i += 1 }
          case _ => sb.append(s(i)); i += 1
        }
      } else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }

  final class HttpLlm(
      name: String,
      build: String => RequestSpec,
      extract: String => String,
      transport: Transport) extends WeeklySummary.LlmClient {
    def request(prompt: String): RequestSpec = build(prompt)
    def complete(prompt: String): String = extract(transport(build(prompt)))
    override def toString: String = s"HttpLlm($name)"
  }

  /** OpenAI chat completions: POST /v1/chat/completions with a Bearer
    * key and a messages array.
    */
  def openAi(
      apiKey: String,
      model: String,
      transport: Transport,
      baseUrl: String = "https://api.openai.com/v1"): HttpLlm =
    new HttpLlm(
      "openai",
      prompt => RequestSpec(
        s"$baseUrl/chat/completions",
        Map("Authorization" -> s"Bearer $apiKey", "Content-Type" -> "application/json"),
        s"""{"model":"${jsonEscape(model)}","messages":[{"role":"user","content":"${jsonEscape(prompt)}"}]}"""),
      extractField(_, "content"),
      transport)

  /** Azure OpenAI: deployment-scoped endpoint, `api-key` header, and
    * the api-version query parameter; the body carries no model (the
    * deployment pins it).
    */
  def azureOpenAi(
      endpoint: String,
      deployment: String,
      apiKey: String,
      transport: Transport,
      apiVersion: String = "2024-06-01"): HttpLlm =
    new HttpLlm(
      "azure-openai",
      prompt => RequestSpec(
        s"${endpoint.stripSuffix("/")}/openai/deployments/$deployment/chat/completions?api-version=$apiVersion",
        Map("api-key" -> apiKey, "Content-Type" -> "application/json"),
        s"""{"messages":[{"role":"user","content":"${jsonEscape(prompt)}"}]}"""),
      extractField(_, "content"),
      transport)

  /** Anthropic messages API: x-api-key + anthropic-version headers,
    * max_tokens required.
    */
  def anthropic(
      apiKey: String,
      model: String,
      transport: Transport,
      maxTokens: Int = 1024,
      baseUrl: String = "https://api.anthropic.com"): HttpLlm =
    new HttpLlm(
      "anthropic",
      prompt => RequestSpec(
        s"$baseUrl/v1/messages",
        Map(
          "x-api-key" -> apiKey,
          "anthropic-version" -> "2023-06-01",
          "Content-Type" -> "application/json"),
        s"""{"model":"${jsonEscape(model)}","max_tokens":$maxTokens,"messages":[{"role":"user","content":"${jsonEscape(prompt)}"}]}"""),
      extractField(_, "text"),
      transport)

  /** Google Gemini generateContent: model-scoped path, x-goog-api-key
    * header, contents/parts body.
    */
  def google(
      apiKey: String,
      model: String,
      transport: Transport,
      baseUrl: String = "https://generativelanguage.googleapis.com/v1beta"): HttpLlm =
    new HttpLlm(
      "google",
      prompt => RequestSpec(
        s"$baseUrl/models/$model:generateContent",
        Map("x-goog-api-key" -> apiKey, "Content-Type" -> "application/json"),
        s"""{"contents":[{"parts":[{"text":"${jsonEscape(prompt)}"}]}]}"""),
      extractField(_, "text"),
      transport)
}
