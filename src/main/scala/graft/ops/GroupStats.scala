package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped aggregates A1-A7 (SURVEY.md §2.4) with the reference's
  * pinned semantics: exact interpolated medians, pandas mode tie-break,
  * order-deterministic "first".
  */
object GroupStats {

  /** Exact interpolated median — matches `pandas.Series.median`
    * including even-count interpolation (reference:
    * Requirements/ExamplePipelineCode.md:183-186). `percentile_approx`
    * does NOT match and must not be used on the oracle path; the
    * 100 TB variant is `approx_percentile` behind [[approxMedian]].
    */
  def exactMedian(c: Column): Column = percentile(c, lit(0.5))

  /** Sketch median for the scale path (t-digest-style, bounded error). */
  def approxMedian(c: Column, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(0.5), lit(accuracy))

  /** A4 — grouped mode with pandas `idxmax` tie-break: among tied
    * counts pick the SMALLEST value (reference vectorized mode:
    * Requirements/ExamplePipelineCode.md:188-202; pandas groupby sorts
    * keys so idxmax lands on the smallest). Two-level aggregate +
    * ranked window; do NOT swap in Spark's `mode()` (tie-break
    * unspecified).
    *
    * Returns one row per group: groupCols :+ outCol.
    */
  def modeWithTieBreak(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    val counted = df
      .filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val w = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col("__cnt").desc, col(valueCol).asc)
    counted
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(groupCols.map(col) :+ col(valueCol).as(outCol): _*)
  }

  /** A1+A2+A4+A5 in ONE shuffle: per-cycle count, exact median, mode
    * (tie-broken), and chronologically-first timestamp/state.
    *
    * Shape: two-level aggregation on progressively coarser keys —
    * `groupBy(keys :+ value)` first (massive map-side partial
    * reduction: one row per distinct value per cycle), then
    * `groupBy(keys)` where
    *   - median = weighted exact `percentile(value, 0.5, cnt)`
    *     (identical to the exact median over the expanded multiset,
    *     so pandas/DuckDB parity holds);
    *   - mode   = `max_by(value, (cnt, -value))` — the pandas idxmax
    *     tie-break (smallest value among tied counts) without a join
    *     (reference: Requirements/ExamplePipelineCode.md:188-202);
    *   - first  = min over (ts, state) structs — order-deterministic,
    *     never bare `first()` (ExamplePipelineCode.md:438-441).
    * Both aggregations hash-partition on a prefix of the same keys, so
    * the plan has exactly one exchange — this is the 100 TB shape
    * (the earlier base-join-modes form shuffled twice and joined).
    */
  def cycleStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tsCol: String,
      stateCol: String): DataFrame = {
    // NOTE: stateCol must stay an AGGREGATE here (min over (ts,state)
    // structs), not a level-1 grouping key — this helper makes no
    // functional-dependence assumption, and grouping by state would
    // split the per-value counts that feed the mode. The events query
    // core applies that optimization where state IS constant per cycle.
    val perValue = df
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(
        count(lit(1)).as("__cnt"),
        min(struct(col(tsCol), col(stateCol))).as("__first"))
    // NULL values follow pandas: Series.count()/median()/mode() all
    // drop NaN, so the null-value group contributes to NOTHING except
    // the ordered first (whose row still exists). Without the guards a
    // 10-null/4-real cycle reports count=14 and mode=null — the latter
    // flipping validCyclePredicate against a cycle pandas accepts.
    .withColumn("__real_cnt", when(col(valueCol).isNotNull, col("__cnt")).otherwise(lit(0L)))
    perValue
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("__real_cnt")).as("count"),
        percentile(col(valueCol), lit(0.5), col("__cnt")).as("median_" + valueCol),
        max_by(col(valueCol),
          when(col(valueCol).isNotNull, struct(col("__cnt"), -col(valueCol))))
          .as("mode_" + valueCol),
        min(col("__first")).getField(tsCol).as("first_" + tsCol),
        min(col("__first")).getField(stateCol).as("first_" + stateCol))
  }

  /** P5 + P6 — the reference's valid-cycle predicate: at least
    * `minCount` rows, positive median, computable positive mode
    * (reference: Requirements/ExamplePipelineCode.md:210-215).
    */
  def validCyclePredicate(valueCol: String, minCount: Long = 4): Column =
    col("count") >= minCount &&
      col(s"median_$valueCol") > 0 &&
      col(s"mode_$valueCol").isNotNull && col(s"mode_$valueCol") > 0

  /** J2 — keep only rows whose group key passes `validCyclePredicate`:
    * a left-semi join against the aggregated valid-key set (reference:
    * Requirements/ExamplePipelineCode.md:211-218). NO broadcast hint:
    * the valid set is one row per CYCLE — data-plane sized, linear in
    * the corpus (a year of a million devices is billions of cycles),
    * so a forced broadcast would hit the 8 GB hard limit exactly at
    * the scale this operator exists for (review r19). At small scale
    * AQE still picks a broadcast semi-join from the runtime size of
    * the aggregated side; at crawl scale the semi-join shuffles
    * co-partitioned on `groupCols`, which cycleStats already hash-
    * partitions on.
    */
  def filterValidCycles(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tsCol: String,
      stateCol: String,
      minCount: Long = 4): DataFrame = {
    val valid = cycleStats(df, groupCols, valueCol, tsCol, stateCol)
      .filter(validCyclePredicate(valueCol, minCount))
      .select(groupCols.map(col): _*)
    df.join(valid, groupCols, "left_semi")
  }
}
