package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** Network-free: asserts each provider adapter's request SHAPE
  * (endpoint, auth header, body structure) and the response
  * extraction, with a recording fake transport.
  */
class ProvidersSpec extends AnyFunSuite {

  private def recording(response: String): (Providers.Transport, () => Providers.RequestSpec) = {
    var last: Providers.RequestSpec = null
    (req => { last = req; response }, () => last)
  }

  private val prompt = "Analyse week:\n\"W1\" stats"

  test("openai request shape and extraction") {
    val (t, last) = recording("""{"choices":[{"message":{"role":"assistant","content":"looks fine"}}]}""")
    val client = Providers.openAi("sk-test", "gpt-4o", t)
    assert(client.complete(prompt) == "looks fine")
    val req = last()
    assert(req.url == "https://api.openai.com/v1/chat/completions")
    assert(req.headers("Authorization") == "Bearer sk-test")
    assert(req.body.contains(""""model":"gpt-4o""""))
    assert(req.body.contains(""""role":"user""""))
    assert(req.body.contains("\\n")) // newline escaped, not literal
    assert(req.body.contains("\\\"W1\\\"")) // quotes escaped
  }

  test("azure request shape: deployment path + api-key header, no model in body") {
    val (t, last) = recording("""{"choices":[{"message":{"content":"ok"}}]}""")
    val client = Providers.azureOpenAi("https://myres.openai.azure.com/", "prod-gpt", "azkey", t)
    assert(client.complete(prompt) == "ok")
    val req = last()
    assert(req.url ==
      "https://myres.openai.azure.com/openai/deployments/prod-gpt/chat/completions?api-version=2024-06-01")
    assert(req.headers("api-key") == "azkey")
    assert(!req.body.contains("\"model\""))
  }

  test("anthropic request shape: messages endpoint, version header, max_tokens") {
    val (t, last) = recording("""{"content":[{"type":"text","text":"anomaly in W1"}]}""")
    val client = Providers.anthropic("ak-test", "claude-sonnet-4-5", t, maxTokens = 512)
    assert(client.complete(prompt) == "anomaly in W1")
    val req = last()
    assert(req.url == "https://api.anthropic.com/v1/messages")
    assert(req.headers("x-api-key") == "ak-test")
    assert(req.headers("anthropic-version") == "2023-06-01")
    assert(req.body.contains(""""max_tokens":512"""))
    assert(req.body.contains(""""model":"claude-sonnet-4-5""""))
  }

  test("google request shape: model-scoped generateContent, contents/parts body") {
    val (t, last) = recording("""{"candidates":[{"content":{"parts":[{"text":"drift detected"}]}}]}""")
    val client = Providers.google("gk-test", "gemini-1.5-pro", t)
    assert(client.complete(prompt) == "drift detected")
    val req = last()
    assert(req.url ==
      "https://generativelanguage.googleapis.com/v1beta/models/gemini-1.5-pro:generateContent")
    assert(req.headers("x-goog-api-key") == "gk-test")
    assert(req.body.contains(""""contents":[{"parts":[{"text":"""))
  }

  test("adapters satisfy the LlmClient seam used by WeeklySummary.analyse") {
    val (t, _) = recording("""{"content":[{"type":"text","text":"summary"}]}""")
    val client: WeeklySummary.LlmClient = Providers.anthropic("k", "m", t)
    assert(client.complete("p") == "summary")
  }

  test("json escaping round-trips control characters") {
    assert(Providers.jsonEscape("a\"b\\c\nd\te") == "a\\\"b\\\\c\\nd\\te")
    assert(Providers.jsonEscape("\u0001") == "\\u0001")
  }
  test("extraction unescapes ALL legal JSON escapes, including \\/ \\b \\f") {
    // serializers commonly escape forward slashes; a missed escape
    // leaves stray backslashes in the assistant text
    val body = """{"content":"a\/b\b\f end"}"""
    val got = Providers.extractField(body, "content")
    assert(got == "a/b\b\f end", got.map(_.toInt).mkString(","))
  }
}
