package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar column functions (SURVEY.md §2.8), all built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs.
  */
object Scalars {

  /** Last `n` characters, lower-cased; n <= 0 -> ""; n >= length ->
    * whole string lowered (reference: src/plugins/adx_plugin.py:278-286).
    * Spark's negative-start substring already yields the tail and
    * handles n >= len; only n <= 0 needs a guard.
    */
  def stringTailLower(c: Column, n: Int): Column =
    if (n <= 0) lit("") else lower(substring(c, -n, n))

  /** Kusto ticks (1 tick = 100 ns) -> day-time interval
    * (reference: src/plugins/adx_plugin.py:182-195, numeric branch).
    * Ticks/10 = microseconds, exact in Long for any realistic span.
    */
  def ticksToInterval(ticks: Column): Column =
    make_dt_interval(lit(0), lit(0), lit(0), (ticks.cast("long") / lit(10)).cast("double") / lit(1000000.0))

  /** `[d.]hh:mm:ss[.fffffff]` timespan string -> day-time interval
    * (reference: src/plugins/adx_plugin.py:182-195, string branch).
    */
  def timespanStringToInterval(s: Column): Column = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val re = "^(?:(\\d+)\\.)?(\\d{1,2}):(\\d{2}):(\\d{2}(?:\\.\\d+)?)$"
    // try_cast: a non-matching group extracts as "", which ANSI cast rejects.
    val days = coalesce(regexp_extract(s, re, 1).try_cast(LongType), lit(0L))
    val h = regexp_extract(s, re, 2).try_cast(LongType)
    val m = regexp_extract(s, re, 3).try_cast(LongType)
    val sec = regexp_extract(s, re, 4).try_cast(DoubleType)
    when(s.rlike(re), make_dt_interval(days.cast("int"), h.cast("int"), m.cast("int"), sec))
  }

  /** Floor timestamps to whole seconds — the reference floors every
    * ingested datetime (reference: src/plugins/adx_plugin.py:259-262).
    */
  def floorToSecond(ts: Column): Column = date_trunc("second", ts)

  /** String-typed real -> double with Kusto special-value coercion:
    * "NaN"/"Infinity"/"-Infinity" to float specials, parse failures to
    * null (reference: src/plugins/adx_plugin.py:252-257).
    */
  def coerceSpecialDouble(s: Column): Column =
    when(s === "NaN", lit(Double.NaN))
      .when(s === "Infinity", lit(Double.PositiveInfinity))
      .when(s === "-Infinity", lit(Double.NegativeInfinity))
      .otherwise(s.try_cast(org.apache.spark.sql.types.DoubleType))

  /** Snap a date back to the enclosing Sunday-started week's Sunday
    * (reference: Requirements/ExampleAiCode.md:206-209 — start -=
    * days(weekday+1) unless already Sunday). Spark `dayofweek`: Sun=1.
    */
  def sundayWeekStart(d: Column): Column = date_sub(to_date(d), dayofweek(to_date(d)) - lit(1))

  /** Snap a date forward to the Saturday closing its Sunday-started
    * week (reference: Requirements/ExampleAiCode.md:206-209 — end +=
    * days((5 - weekday) % 7 + 1) lands on the following Saturday...
    * expressed directly: Saturday = weekStart + 6).
    */
  def saturdayWeekEnd(d: Column): Column = date_add(sundayWeekStart(d), 6)

  /** `"{weekStart} - {weekEnd}"` label used by the weekly summary
    * (reference: Requirements/ExampleAiCode.md:216-218).
    */
  def weekLabel(d: Column): Column =
    concat(date_format(sundayWeekStart(d), "yyyy-MM-dd"), lit(" - "), date_format(saturdayWeekEnd(d), "yyyy-MM-dd"))
}
