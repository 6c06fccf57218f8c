package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, attach the most recent right row
  * with the same keys whose timestamp is <= the left timestamp
  * (optionally within a staleness tolerance). Spark has no built-in
  * as-of join; the preference-order answer (SURVEY.md §2.3/J1) is to
  * COMPOSE existing operators, not hand-roll a SparkPlan:
  *
  * union both sides tagged -> one `last(payloadStruct, ignoreNulls)`
  * window over (keys, time) -> keep left rows. One shuffle on the
  * keys, one sort per partition — same cost as a sort-merge join, no
  * range explosion. The whole right row travels as a single struct so
  * the matched timestamp and payload always come from the SAME right
  * row (per-column fills could mix rows when payload fields are null).
  */
object AsOfJoin {

  /** @param keys equi-join key columns present on both sides
    * @param rightPayload right columns to attach as `right_<name>`
    *   (all-null when nothing matches); the matched right timestamp is
    *   returned as `right_ts`
    * @param toleranceSeconds optional max staleness of the match
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightPayload: Seq[String],
      toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftRest = left.columns.filterNot(keys.contains).toSeq
    val payStruct = struct((col(rightTs).as("__rts") +: rightPayload.map(col)): _*)
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__ts"), lit(1).as("__isLeft"),
          lit(null).cast(right.select(payStruct).schema.head.dataType).as("__pay")) ++
        leftRest.map(c => col(c).as(s"__l_$c")): _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__ts"), lit(0).as("__isLeft"), payStruct.as("__pay")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    // Right rows sort BEFORE left rows at equal timestamps, so a right
    // row at exactly the left timestamp matches (<= semantics). The
    // trailing `__pay` term makes the order TOTAL when the right side
    // has DUPLICATE timestamps per key: without it, which duplicate
    // `last` picks depends on shuffle layout — run-to-run
    // nondeterministic right_* output (review r19). Ties now
    // deterministically resolve to the LARGEST payload tuple (struct
    // ordering is lexicographic over (right_ts, payload...)); left
    // rows carry a null __pay, ordered first within their slot.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__isLeft").asc, col("__pay").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
    // Staleness as a timestamp DIFFERENCE (DayTimeInterval), never
    // unix_timestamp: that truncates to whole seconds (admitting
    // matches up to ~1s past tolerance) and coerces TIMESTAMP_NTZ
    // through the session zone (wrong by 3600s across a DST edge) —
    // the exact pitfalls IntervalJoin documents. Subtraction is
    // microsecond-exact and type-correct for both timestamp flavors.
    val gated = toleranceSeconds match {
      case Some(tol) =>
        filled.withColumn(
          "__match",
          when(
            col("__match").isNotNull &&
              (col("__ts") - col("__match.__rts")) <=
                make_dt_interval(lit(0), lit(0), lit(0), lit(tol.toDouble)),
            col("__match")))
      case None => filled
    }
    gated
      .filter(col("__isLeft") === 1)
      .select(
        keys.map(col) ++
          leftRest.map(c => col(s"__l_$c").as(c)) ++
          rightPayload.map(c => col(s"__match.$c").as(s"right_$c")) :+
          col("__match.__rts").as("right_ts"): _*)
  }
}
