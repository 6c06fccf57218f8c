package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture readers + ingest normalization.
  *
  * The reference reaches data through per-backend connectors (ADX/KQL:
  * reference src/plugins/adx_plugin.py:131-165; MySQL:
  * mysql_plugin.py:137-192) with hand-written retry loops. On Spark the
  * source layer is `spark.read` — task retry, predicate pushdown and
  * column pruning are engine-level (Catalyst + parquet/JDBC), so the
  * connector surface collapses to readers plus a normalization select
  * (the Kusto type-conversion layer, adx_plugin.py:198-276, becomes
  * [[normalizeKustoLike]]).
  */
object Sources {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, d: String): DataFrame = read(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = read(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = read(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = read(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = read(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = read(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = read(spark, d, "region")
  /** The events fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark's reader rejects by default. We flip the session to read
    * nanos as long and rebuild a microsecond TimestampType column (the
    * fixture's nanos are all whole microseconds, so this is lossless).
    * Integer division (`DIV`) is required: the ns epoch (~1.7e18)
    * exceeds double's exact integer range.
    *
    * SESSION-WIDE side effect, by necessity: the flag is consulted at
    * EXECUTION time too (the vectorized reader re-checks it when
    * materializing the scan), so restoring it after this call would
    * break the lazy frame it returns. After the first events() call,
    * any OTHER TIMESTAMP(NANOS) parquet read in the session loads as
    * raw-nanos LongType instead of failing loudly — if you ingest
    * foreign nanos tables in the same session, rebuild their
    * timestamps the way this reader does (review r19).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(spark, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = read(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = read(spark, d, "embeddings")

  /** Ingest normalization mirroring the reference's Kusto->frame
    * conversion (reference: src/plugins/adx_plugin.py:198-276):
    * timestamps floored to whole seconds (adx_plugin.py:259-262),
    * string-typed reals with "NaN"/"Infinity"/"-Infinity" coerced to
    * float specials and parse failures to null (adx_plugin.py:252-257).
    * Apply per-column with [[graft.ops.Scalars]]; this variant floors
    * every timestamp column in the frame.
    */
  def normalizeKustoLike(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    df.schema.fields.foldLeft(df) { (acc, f) =>
      f.dataType match {
        case TimestampType => acc.withColumn(f.name, date_trunc("second", col(f.name)))
        case _ => acc
      }
    }
  }
}

/** Named source registry — Spark re-expression of the reference's
  * `PluginManager` singleton connector registry (reference:
  * src/plugins/manager.py:19-74, src/plugins/base.py:51-58). Connection
  * pooling/caching is the storage layer's job on Spark; what remains is
  * the name -> reader indirection used by pipeline configs.
  */
object SourceRegistry {
  type Reader = (SparkSession, String) => DataFrame

  private val registry = scala.collection.concurrent.TrieMap.empty[String, Reader]

  Sources.tableNames.foreach(n => register(n, (s, d) => Sources.read(s, d, n)))
  // events is NOT the generic parquet reader: its ts column is parquet
  // TIMESTAMP(NANOS), which Sources.events rebuilds into a real
  // TimestampType — the bare reader would either throw (flag off) or
  // hand registry consumers raw nanos as a LongType (flag on)
  register("events", (s, d) => Sources.events(s, d))

  def register(name: String, reader: Reader): Unit = registry.put(name, reader)

  def get(name: String): Reader =
    registry.getOrElse(name, throw new NoSuchElementException(s"no source registered under '$name'"))

  /** Read through the registry with the connector retry policy (S1)
    * applied to the driver-side reader invocation — transient
    * connection failures (classified by [[Jdbc.classify]]) retry with
    * backoff, fatal ones fail fast. Executor-side reads inherit Spark
    * task retry; this guards the planning/connection step the same way
    * the reference's connectors wrap their own connect+execute
    * (adx_plugin.py:131-165, mysql_plugin.py:181-192).
    */
  def read(name: String, spark: SparkSession, dir: String, maxRetries: Int = 3): DataFrame =
    Jdbc.withRetries(maxRetries) { get(name)(spark, dir) }

  def registered: Set[String] = registry.keySet.toSet
}
