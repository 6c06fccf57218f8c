package graft.llm

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Default EXECUTING transport for [[Providers]] — the piece that
  * actually performs the provider HTTP call (the reference's provider
  * switch calls its SDKs directly; reference:
  * Requirements/ExampleAiCode.md:421-495). Built on `java.net.http`
  * (JDK 11+, no extra dependency) with the same retry discipline as
  * the JDBC connector ([[graft.sources.Jdbc]]): bounded attempts,
  * linear backoff, retry ONLY on transient signals — HTTP 429/5xx/408
  * and connect/timeout I/O errors — and fail fast on everything else
  * (a 401 or a malformed request never loops).
  *
  * Providers stay network-free to construct and test (the transport is
  * still injected); this is the production default a caller plugs in:
  *
  * {{{
  * val llm = Providers.anthropic(key, model, HttpTransport())
  * }}}
  */
object HttpTransport {

  /** Non-2xx response, carried as an exception so the retry loop can
    * classify by status; the body rides along for diagnostics.
    */
  final case class HttpStatusException(status: Int, body: String)
    extends RuntimeException(s"HTTP $status: ${body.take(200)}")

  /** Retry ONLY transient failures; permanent I/O faults (bad cert,
    * unknown host) fail fast like a 4xx — the same
    * whitelist-the-transient discipline as the JDBC classifier.
    * NOTE: a retried 5xx MAY double-submit on a non-idempotent
    * endpoint (the server can have processed the request before
    * failing to reply); callers for whom that matters should pass
    * `maxAttempts = 1` and handle retries with an idempotency key.
    */
  private[llm] def retryable(e: Throwable): Boolean = e match {
    case HttpStatusException(s, _) => s == 429 || s == 408 || s / 100 == 5
    case _: javax.net.ssl.SSLException => false // misconfigured TLS never heals
    case _: java.net.UnknownHostException => false // typo'd host never heals
    case _: java.net.http.HttpTimeoutException => true
    case _: java.net.ConnectException => true
    case _: java.io.IOException => true // reset / broken pipe / GOAWAY
    case _ => false
  }

  /** A [[Providers.Transport]] that POSTs the spec and returns the
    * response body, retrying transient failures up to `maxAttempts`
    * with linear backoff (`backoffMs * attempt`).
    */
  def apply(
      maxAttempts: Int = 3,
      backoffMs: Long = 200L,
      timeout: Duration = Duration.ofSeconds(60),
      client: HttpClient = defaultClient): Providers.Transport = {
    require(maxAttempts >= 1, s"maxAttempts=$maxAttempts must be >= 1")
    spec => graft.core.Retry.withRetries(maxAttempts, backoffMs)(retryable)(
      send(client, spec, timeout))
  }

  private def send(client: HttpClient, spec: Providers.RequestSpec, timeout: Duration): String = {
    val builder = HttpRequest.newBuilder(URI.create(spec.url))
      .timeout(timeout)
      .POST(HttpRequest.BodyPublishers.ofString(spec.body, StandardCharsets.UTF_8))
    spec.headers.foreach { case (k, v) => builder.header(k, v) }
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 == 2) resp.body()
    else throw HttpStatusException(resp.statusCode(), resp.body())
  }

  // Redirect.NEVER: the JDK client rewrites a redirected POST into a
  // body-less GET, so a 3xx from a provider endpoint would silently
  // send an empty request. Refusing to follow makes the 3xx surface
  // as HttpStatusException (non-retryable) instead.
  private lazy val defaultClient: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .followRedirects(HttpClient.Redirect.NEVER)
    .build()
}
