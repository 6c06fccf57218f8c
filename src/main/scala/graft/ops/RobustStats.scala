package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A8 — robust coefficient of variation: rCV = MAD / median where
  * MAD = median(|x - median(x)|) (reference spec:
  * Requirements/ExampleAiCode.md:295-306; inline example
  * Architectural Options/Opus.md:442-452; "High" gate at > 0.35).
  *
  * Two grouped aggregation passes joined on the group key — both
  * aggregates hash-partition on the same key so the join adds no
  * exchange; no custom Catalyst code needed.
  */
object RobustStats {

  val DefaultRcvThreshold = 0.35

  /** Per-group rCV. Output: groupCols :+ (median, mad, rcv).
    * NULL group keys form a group like groupBy's own semantics: the
    * join back is NULL-SAFE (`<=>` per key) — a plain using-columns
    * equi-join silently dropped the null-key group that both
    * aggregation passes produced a row for (review r19).
    */
  def robustCV(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val g = groupCols.map(col)
    val medians = df
      .groupBy(g: _*)
      .agg(GroupStats.exactMedian(col(valueCol)).as("median"))
      .select(groupCols.map(c => col(c).as(s"__m_$c")) :+ col("median"): _*)
    val joined = df
      .join(medians, groupCols.map(c => col(c) <=> col(s"__m_$c")).reduce(_ && _))
      .drop(groupCols.map(c => s"__m_$c"): _*)
    joined
      .groupBy(g: _*)
      .agg(
        first(col("median")).as("median"),
        GroupStats.exactMedian(abs(col(valueCol) - col("median"))).as("mad"))
      .withColumn("rcv", when(col("median") =!= 0, col("mad") / col("median")))
  }

  def isHighRcv(rcv: Column, threshold: Double = DefaultRcvThreshold): Column =
    rcv.isNotNull && rcv > threshold
}
