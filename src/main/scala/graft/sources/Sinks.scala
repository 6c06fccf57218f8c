package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sinks (S8). The reference has no programmatic sink in-repo; its
  * documented downstream writes are a display path and "Update the
  * alert threshold database with the calculated thresholds (if the
  * power variance is low enough)" (reference:
  * Requirements/requirements.md:43-46). Here: parquet writers (the
  * harness contract) including a date-partitioned layout for partition
  * pruning at scale, and the guarded threshold write-back.
  */
object Sinks {

  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Date-partitioned layout: queries with a date predicate then prune
    * whole partitions at planning time — the 100 TB default for any
    * time-series table.
    */
  def writePartitionedByDate(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("dt", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dt")
      .parquet(path)

  /** Bucketed managed table: rows hash-partitioned into `numBuckets`
    * files per partition by `keys` and registered in the session
    * catalog. Two tables bucketed the same way join WITHOUT a shuffle
    * (both sides already satisfy the join's clustering) — the
    * co-located-join layout for repeatedly-joined 100 TB fact tables.
    * Requires `saveAsTable` (bucket metadata lives in the catalog, not
    * the files).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      keys: Seq[String],
      numBuckets: Int,
      sortBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
    (if (sortBy.nonEmpty) w.sortBy(sortBy.head, sortBy.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Threshold write-back, guarded: only rows with a defined threshold
    * (i.e. Low-variance stages) are appended — the reference's "if the
    * power variance is low enough" condition. The harness writes
    * parquet; [[writeBackThresholdsJdbc]] is the database form.
    */
  def writeBackThresholds(thresholds: DataFrame, path: String): Unit =
    thresholds
      .filter(col("threshold").isNotNull)
      .write.mode(SaveMode.Append)
      .parquet(path)

  /** JDBC writer. Retry policy is IDEMPOTENCY-AWARE: only
    * `Overwrite`/`Truncate` writes (which restart from a clean table)
    * go through the reconnect-and-retry loop; an `Append` that fails
    * mid-job may already have committed some partitions' INSERTs, so
    * blind re-running would duplicate rows — it runs once and
    * surfaces the failure for the caller to reconcile (executor-side
    * task retry still applies within the job either way).
    */
  def writeJdbc(
      df: DataFrame,
      url: String,
      dbtable: String,
      props: Map[String, String] = Map.empty,
      mode: SaveMode = SaveMode.Append,
      maxRetries: Int = 3): Unit = {
    def save(): Unit = {
      val w = df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
      props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
        .mode(mode)
        .save()
    }
    if (mode == SaveMode.Overwrite) Jdbc.withRetries(maxRetries)(save()) else save()
  }

  /** The reference's actual write-back target shape: guarded threshold
    * rows appended to an alert-threshold DATABASE table
    * (requirements.md:43-46 + mysql_plugin's DML branch).
    */
  def writeBackThresholdsJdbc(
      thresholds: DataFrame,
      url: String,
      dbtable: String,
      props: Map[String, String] = Map.empty): Unit =
    writeJdbc(thresholds.filter(col("threshold").isNotNull), url, dbtable, props)
}
