package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered/segmentation operators (SURVEY.md §2.5).
  *
  * Scale note: every window here partitions by device/entity keys —
  * never a global `Window.orderBy` — so the computation shards across
  * executors at 100 TB (the reference always scopes to one device,
  * Requirements/ExamplePipelineCode.md:50-66; we keep the key columns
  * explicit so multi-device frames parallelize).
  */
object Segmentation {

  /** W1 — run-length "cycle" labeling (gaps-and-islands): assign an
    * incrementing integer id to maximal runs of constant `stateCol`
    * over the chronologically ordered stream, per partition key.
    * First cycle is 1. (reference semantics:
    * Requirements/ExamplePipelineCode.md:421-422 "Cycles are
    * consecutive time series measurements ... marked by a change in the
    * tstate value"; Requirements/ExampleAiCode.md:131.)
    *
    * `orderCols` must make the order total (include a unique id as
    * tiebreak) — Spark guarantees no implicit row order.
    */
  def labelCycles(
      df: DataFrame,
      partitionCols: Seq[String],
      orderCols: Seq[Column],
      stateCol: String,
      outCol: String = "cycle"): DataFrame = {
    val w =
      if (partitionCols.isEmpty) Window.orderBy(orderCols: _*)
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(orderCols: _*)
    val prev = lag(col(stateCol), 1).over(w)
    val change = when(prev.isNull || prev =!= col(stateCol), 1).otherwise(0)
    // Two projections: nesting lag() inside the running sum's window is
    // not allowed by the analyzer.
    df.withColumn("__chg", change)
      .withColumn(
        outCol,
        sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__chg")
  }

  /** W2 — per-group most-recent-N cap (reference caps GMM input to the
    * 5000 most recent samples per stage,
    * Requirements/ExamplePipelineCode.md:232,246-247). Implemented as a
    * ranked window + filter; Spark >= 3.5 rewrites this to a
    * per-partition group-limit (`WindowGroupLimit`), so no full sort of
    * the losers happens at scale.
    */
  def recencyTopK(
      df: DataFrame,
      partitionCols: Seq[String],
      tsCol: String,
      k: Int,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val order = col(tsCol).desc +: tieBreak
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }
}
