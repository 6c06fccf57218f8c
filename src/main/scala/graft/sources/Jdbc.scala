package graft.sources

import java.sql.SQLException
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC read path (S3/S4) — the reference's MySQL connector
  * (reference: src/plugins/mysql_plugin.py:137-192) re-expressed
  * Spark-first: `spark.read.format("jdbc")` owns the executor-side
  * reads (predicate pushdown, column pruning and partitioned scans are
  * engine-level), so what remains of the hand-written connector is
  * exactly its control-plane policy — the fatal-vs-retryable error
  * classification (mysql_plugin.py:177-192: auth/syntax fail fast,
  * connection loss reconnects and retries) applied around the
  * driver-side connection Spark opens to resolve the schema.
  *
  * Scale notes: a single-partition JDBC read funnels the table through
  * one task; [[readPartitioned]] shards on a numeric column so N
  * executors each open their own cursor — the only JDBC shape worth
  * using on a big table. Pushdown goes to the database
  * (`PushedFilters` in the plan), so `WHERE` + projection run
  * DB-side.
  */
object Jdbc {

  sealed trait ErrorClass
  /** Wrong credentials / SQL / schema: retrying cannot help. */
  case object Fatal extends ErrorClass
  /** Connection loss, timeout, deadlock: a fresh attempt can succeed. */
  case object Retryable extends ErrorClass

  /** Classify a failure by ANSI SQLState class (public JDBC
    * semantics), mirroring the reference's split (fatal classes at
    * mysql_plugin.py:177-178 — access denied / bad db / syntax;
    * reconnect-and-retry otherwise at :181-192):
    *   - 08xxx connection exception, 40xxx transaction rollback
    *     (deadlock/serialization), XX000 internal, HYT00/HYT01
    *     timeouts -> Retryable;
    *   - 28xxx auth, 42xxx syntax/access-rule, 3D/3F bad catalog or
    *     schema -> Fatal;
    *   - unknown states -> Fatal (never loop on an undiagnosed error).
    * Non-SQLExceptions walk the cause chain looking for one.
    */
  def classify(e: Throwable): ErrorClass = {
    // Walk the full cause chain: wrappers (SparkException, runtime
    // shims) often bury both the SQLState and the transient-sounding
    // message one or more levels down.
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
    val state = chain.collectFirst {
      case s: SQLException if s.getSQLState != null => s.getSQLState
    }
    state match {
      case Some(st) if st.startsWith("08") => Retryable
      case Some(st) if st.startsWith("40") => Retryable
      case Some("XX000") | Some("HYT00") | Some("HYT01") => Retryable
      // fatal states short-circuit BEFORE the message heuristic: an
      // auth failure whose message happens to contain "timeout" (SQL
      // Server's "Login failed ... connection timeout expired") must
      // fail fast, not loop on an undiagnosed credential problem
      case Some(st) if st.startsWith("28") || st.startsWith("42") => Fatal
      case _ =>
        // Driver-agnostic transient signals without a usable SQLState —
        // checked on every message in the chain, not just the wrapper's.
        val msgs = chain.flatMap(t => Option(t.getMessage)).map(_.toLowerCase)
        val transient = Seq("connection reset", "connection refused", "timeout", "timed out",
          "communications link failure", "broken pipe")
        if (msgs.exists(m => transient.exists(m.contains))) Retryable else Fatal
    }
  }

  /** Run `f` with a TOTAL budget of `maxRetries` ATTEMPTS (the name
    * is the connector-option convention; the semantics are attempts:
    * `maxRetries = 3` means one initial try plus up to two retries,
    * `maxRetries = 1` means a single try and no retry — exactly
    * [[graft.core.Retry.withRetries]]'s `maxAttempts`, and exactly
    * the reference's 3-ATTEMPT reconnect loop,
    * mysql_plugin.py:181-192 / adx_plugin.py:131-165). Retries only
    * [[Retryable]] failures, with linear backoff; [[Fatal]] failures
    * propagate immediately.
    */
  private[sources] def withRetries[T](maxRetries: Int = 3, backoffMs: Long = 200L)(f: => T): T =
    graft.core.Retry.withRetries(maxRetries, backoffMs)(classify(_) == Retryable)(f)

  private def baseReader(
      spark: SparkSession,
      url: String,
      dbtable: String,
      props: Map[String, String]) = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", dbtable)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** Read a table (or `(SELECT ...) t` subquery) over JDBC. The
    * `.load()` resolves the schema through a driver-side connection —
    * that is the step the retry policy guards; executor reads inherit
    * Spark task retry.
    */
  def read(
      spark: SparkSession,
      url: String,
      dbtable: String,
      props: Map[String, String] = Map.empty,
      maxRetries: Int = 3): DataFrame =
    withRetries(maxRetries) { baseReader(spark, url, dbtable, props).load() }

  /** Partitioned read — the at-scale shape: `numPartitions` concurrent
    * cursors sharded on `[lowerBound, upperBound)` of a numeric/date
    * `partitionColumn`.
    */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      dbtable: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: Map[String, String] = Map.empty,
      maxRetries: Int = 3): DataFrame =
    withRetries(maxRetries) {
      baseReader(spark, url, dbtable, props)
        .option("partitionColumn", partitionColumn)
        .option("lowerBound", lowerBound)
        .option("upperBound", upperBound)
        .option("numPartitions", numPartitions)
        .load()
    }

  /** Register a JDBC table in the [[SourceRegistry]] under `name` —
    * rows->table (S4) collapses to this plus a subquery dbtable.
    * The inner read runs with maxRetries = 1: [[SourceRegistry.read]]
    * applies the retry policy around the registered reader, and a
    * retrying reader inside a retrying registry would multiply the
    * attempt budget (up to 9 connects with compounded backoff on a
    * down database — review r19). One layer owns the policy.
    */
  def register(
      name: String,
      url: String,
      dbtable: String,
      props: Map[String, String] = Map.empty): Unit =
    SourceRegistry.register(name,
      (spark, _) => read(spark, url, dbtable, props, maxRetries = 1))
}
