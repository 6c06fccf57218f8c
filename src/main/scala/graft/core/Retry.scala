package graft.core

/** Shared bounded-retry loop: `maxAttempts` tries with linear backoff
  * (`backoffMs * attempt`), retrying only failures `isRetryable`
  * accepts and failing fast on everything else. The single
  * implementation behind both the JDBC connector policy
  * ([[graft.sources.Jdbc]] supplies its SQLState classifier) and the
  * LLM HTTP transport ([[graft.llm.HttpTransport]] supplies its
  * status/IO classifier) — one place to fix interruption handling,
  * jitter, or backoff capping for every connector.
  */
object Retry {

  def withRetries[T](
      maxAttempts: Int,
      backoffMs: Long)(
      isRetryable: Throwable => Boolean)(
      f: => T): T = {
    require(maxAttempts >= 1, s"maxAttempts=$maxAttempts must be >= 1")
    var attempt = 0
    var last: Throwable = null
    while (attempt < maxAttempts) {
      try return f
      catch {
        case e: Throwable if isRetryable(e) && attempt < maxAttempts - 1 =>
          last = e
          attempt += 1
          Thread.sleep(backoffMs * attempt)
        case e: Throwable => throw e
      }
    }
    throw last
  }
}
