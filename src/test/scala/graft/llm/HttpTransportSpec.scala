package graft.llm

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the executing transport against an IN-PROCESS loopback
  * HTTP stub (JDK `com.sun.net.httpserver`) — a real socket round-trip
  * with zero external network: retry-on-5xx to eventual success, fail
  * fast on 4xx, and a full provider-client round-trip through
  * [[Providers.anthropic]] including header delivery.
  */
class HttpTransportSpec extends AnyFunSuite {

  /** Starts a stub whose behavior is (attempt number -> (status,
    * body)); returns (baseUrl, seenCounter, lastHeaders, stop).
    */
  private def withServer(
      respond: Int => (Int, String))(
      run: (String, AtomicInteger, () => Map[String, String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new AtomicInteger(0)
    @volatile var lastHeaders: Map[String, String] = Map.empty
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val n = seen.incrementAndGet()
        val it = ex.getRequestHeaders.entrySet().iterator()
        var hs = Map.empty[String, String]
        while (it.hasNext) {
          val e = it.next()
          hs += (e.getKey.toLowerCase -> e.getValue.get(0))
        }
        lastHeaders = hs
        ex.getRequestBody.readAllBytes() // drain
        val (status, body) = respond(n)
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    })
    server.start()
    try run(s"http://127.0.0.1:${server.getAddress.getPort}", seen, () => lastHeaders)
    finally server.stop(0)
  }

  private val ok = """{"content":[{"type":"text","text":"all clear"}]}"""

  test("retries 5xx with backoff and succeeds on a later attempt") {
    withServer(n => if (n < 3) (503, """{"error":"overloaded"}""") else (200, ok)) {
      (base, seen, _) =>
        val t = HttpTransport(maxAttempts = 3, backoffMs = 1L)
        val body = t(Providers.RequestSpec(s"$base/v1/messages", Map.empty, "{}"))
        assert(body == ok)
        assert(seen.get() == 3) // two failures + the success
    }
  }

  test("429 is retryable; exhausting attempts surfaces the last status") {
    withServer(_ => (429, """{"error":"rate_limited"}""")) { (base, seen, _) =>
      val t = HttpTransport(maxAttempts = 2, backoffMs = 1L)
      val e = intercept[HttpTransport.HttpStatusException] {
        t(Providers.RequestSpec(s"$base/v1/messages", Map.empty, "{}"))
      }
      assert(e.status == 429)
      assert(seen.get() == 2)
    }
  }

  test("4xx fails fast: exactly one request, no retry loop") {
    withServer(_ => (401, """{"error":"bad key"}""")) { (base, seen, _) =>
      val t = HttpTransport(maxAttempts = 3, backoffMs = 1L)
      val e = intercept[HttpTransport.HttpStatusException] {
        t(Providers.RequestSpec(s"$base/v1/messages", Map.empty, "{}"))
      }
      assert(e.status == 401)
      assert(seen.get() == 1)
    }
  }

  test("connection refused is retryable and surfaces after exhausting attempts") {
    // a just-closed ephemeral port: nothing listens there
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val deadPort = server.getAddress.getPort
    server.start(); server.stop(0)
    val t = HttpTransport(maxAttempts = 2, backoffMs = 1L, timeout = Duration.ofSeconds(2))
    intercept[java.io.IOException] {
      t(Providers.RequestSpec(s"http://127.0.0.1:$deadPort/x", Map.empty, "{}"))
    }
  }

  test("full provider round-trip: anthropic client over the real transport, headers delivered") {
    withServer(n => if (n == 1) (500, "oops") else (200, ok)) { (base, seen, headers) =>
      val client = Providers.anthropic(
        "ak-test", "m1", HttpTransport(maxAttempts = 3, backoffMs = 1L), baseUrl = base)
      assert(client.complete("weekly stats") == "all clear")
      assert(seen.get() == 2) // one 500, then success
      val hs = headers()
      assert(hs("x-api-key") == "ak-test")
      assert(hs("content-type") == "application/json")
    }
  }
}
