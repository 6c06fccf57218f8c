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
    *
    * NULL states are a state value like any other: the change detector
    * is null-safe equality (`IS DISTINCT FROM` — exactly the oracle
    * SQL's form), so a run of null states is ONE cycle, and entering or
    * leaving it is a change. (The previous `prev.isNull || prev =!=
    * cur` form silently merged the first null row into the prior cycle
    * and then shattered the rest of the null run — and disagreed with
    * the engine's own DuckDB oracle.) One degenerate corner is shared
    * with the oracle: a partition-LEADING null run labels cycle 0,
    * because lag() cannot distinguish "no previous row" from "previous
    * state was null".
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
    val change = when(prev <=> col(stateCol), 0).otherwise(1)
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
