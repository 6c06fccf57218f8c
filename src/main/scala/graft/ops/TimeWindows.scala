package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F5/F6 + A3 — Sunday-aligned weekly aggregation (the reference's
  * weekly per-stage summary feeding the LLM stage,
  * Requirements/ExampleAiCode.md:156-248).
  */
object TimeWindows {

  /** Weekly per-(week, group) stats. Week buckets are Sunday-started,
    * matching the reference's snap-back/snap-forward arithmetic
    * (Requirements/ExampleAiCode.md:206-211): every row lands in the
    * week starting at its enclosing Sunday, so the bucket set equals
    * `pd.date_range(snappedStart, snappedEnd, freq="W-SUN")` restricted
    * to non-empty weeks.
    *
    * Stats per the reference (ExampleAiCode.md:236-241): count, mean,
    * exact median, POPULATION std (ddof=0 -> `stddev_pop`, not the
    * sample default). Rounding to int is applied by the caller (the
    * reference rounds for the prompt; we keep full precision on the
    * data path).
    */
  def weeklyStats(
      df: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val withWeek = df
      .withColumn("week_start", Scalars.sundayWeekStart(col(tsCol)))
      .withColumn("week_label", Scalars.weekLabel(col(tsCol)))
    withWeek
      .groupBy((Seq("week_start", "week_label") ++ groupCols).map(col): _*)
      .agg(
        count(lit(1)).as("count"),
        avg(col(valueCol)).as("mean"),
        GroupStats.exactMedian(col(valueCol)).as("median"),
        stddev_pop(col(valueCol)).as("std_dev"))
  }

  /** The reference's prompt-facing rounded form: `int(round(x, 0))`
    * (Requirements/ExampleAiCode.md:238-241). Python's float round is
    * HALF_EVEN (banker's), so this is `bround`, not Spark's HALF_UP
    * `round` — medians of even-count integer data land on exact .5
    * constantly, and those round the other way under HALF_UP.
    */
  def roundedWeeklyStats(
      df: DataFrame,
      tsCol: String,
      groupCols: Seq[String],
      valueCol: String): DataFrame =
    weeklyStats(df, tsCol, groupCols, valueCol)
      .withColumn("mean", bround(col("mean"), 0).cast("int"))
      .withColumn("median", bround(col("median"), 0).cast("int"))
      .withColumn("std_dev", bround(col("std_dev"), 0).cast("int"))
}
