package graft.queries

import graft.ops.{GroupStats, Scalars, Segmentation}
import graft.sources.Sources
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-checked time-series pack over the `events` fixture — the
  * HVAC workload's operators (SURVEY.md §2.4/2.5/2.8) with
  * `user_id ~ device`, `event_type ~ tstate`, `value ~ energy`,
  * `ts ~ timeStamp`.
  *
  * Exactness: `value` has 2 decimals, so medians interpolate on exact
  * cent values — both engines compute median over BIGINT cents and
  * divide by 100.0, giving bit-identical doubles. Mean/stddev use
  * exact DECIMAL sums cast to DOUBLE with the identical final-step
  * arithmetic on both engines.
  */
object EventsQueries {

  /** Shared DuckDB CTE: cycle labeling (two levels — nested window
    * functions are illegal in one projection on both engines).
    */
  private val labSql: String =
    """WITH chg AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS c
      |  FROM events
      |), lab AS (
      |  SELECT user_id, ts, event_id, event_type, value,
      |    CAST(SUM(c) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cycle
      |  FROM chg
      |)""".stripMargin

  private def labeled(spark: SparkSession, dir: String): DataFrame =
    Segmentation.labelCycles(
      Sources.events(spark, dir),
      partitionCols = Seq("user_id"),
      orderCols = Seq(col("ts"), col("event_id")),
      stateCol = "event_type")

  /** Single-shuffle per-cycle stats core (see GroupStats.cycleStats
    * doc): level-1 groupBy adds `value` to the keys (map-side partial
    * agg), level-2 computes weighted exact median (in cents), max_by
    * mode with the smallest-value tie-break, ordered-first ts/state.
    *
    * NULL-value semantics here are SQL's, deliberately NOT the
    * pandas-parity operator's ([[graft.ops.GroupStats.cycleStats]],
    * which drops nulls from count/mode like Series.count/mode): this
    * core's contract is hash-exactness against its own oracle SQL,
    * whose `count(*)` counts null-value rows and whose mode ranking
    * places the null group exactly where Spark's struct max_by does
    * (strictly-max count wins, ties lose to any real value).
    */
  private def cycleStatsCore(lab: DataFrame): DataFrame =
    lab
      // event_type rides in the level-1 GROUPING KEYS, not as an
      // aggregate: it is constant within a cycle (cycles are runs of
      // constant state), so the grouping is unchanged — but a
      // min(string) aggregate buffer would force SortAggregate, while
      // key-only strings keep level 1 a codegen'd HashAggregate.
      .groupBy(col("user_id"), col("cycle"), col("value"), col("event_type"))
      .agg(
        count(lit(1)).as("__cnt"),
        min(col("ts")).as("__mts"))
      .groupBy(col("user_id"), col("cycle"))
      .agg(
        sum(col("__cnt")).as("n"),
        (percentile(round(col("value") * 100, 0).cast("long"), lit(0.5), col("__cnt")) / lit(100.0))
          .as("median_value"),
        (percentile(col("value"), lit(0.5), col("__cnt"))).as("median_raw"),
        max_by(col("value"), struct(col("__cnt"), -col("value"))).as("mode_value"),
        min(col("__mts")).as("first_ts"),
        min(col("event_type")).as("state"))

  /** W1 + A1/A2/A4/A5 — per-cycle stats: count, median, mode
    * (tie-broken), chronologically-first timestamp, state.
    */
  def q12CycleStats(spark: SparkSession, dir: String): DataFrame =
    cycleStatsCore(labeled(spark, dir))
      .select("user_id", "cycle", "n", "median_value", "first_ts", "state", "mode_value")
      .orderBy("user_id", "cycle")

  val q12Sql: String = labSql +
    """, base AS (
      |  SELECT user_id, cycle, count(*) AS n,
      |    quantile_cont(CAST(round(value*100, 0) AS BIGINT), 0.5)/100.0 AS median_value,
      |    CAST(min(ts) AS TIMESTAMP) AS first_ts, min(event_type) AS state
      |  FROM lab GROUP BY user_id, cycle
      |), md AS (
      |  SELECT user_id, cycle, value AS mode_value FROM (
      |    SELECT user_id, cycle, value,
      |      row_number() OVER (PARTITION BY user_id, cycle ORDER BY count(*) DESC, value ASC) AS rk
      |    FROM lab GROUP BY user_id, cycle, value)
      |  WHERE rk = 1
      |)
      |SELECT base.user_id, base.cycle, n, median_value, first_ts, state, mode_value
      |FROM base JOIN md ON base.user_id = md.user_id AND base.cycle = md.cycle
      |ORDER BY base.user_id, base.cycle""".stripMargin

  /** P5 + J2 — rows surviving the valid-cycle predicate (>= 4 rows,
    * positive median, positive mode).
    *
    * Single-subtree form: the per-cycle stats are WINDOW aggregates
    * over the labeled frame instead of a groupBy joined back — the
    * round-2 audit flagged the join form for planning the labeling
    * scan->exchange->sort->window chain twice (build + probe side).
    * The labeling exchange hash(user_id) already satisfies the
    * windows' ClusteredDistribution(user_id, cycle), so the whole
    * query is ONE scan, ONE shuffle, and sorts within partitions.
    * The per-value frequency (mode's input) comes from a RANGE
    * CURRENT ROW..CURRENT ROW frame ordered by value — the peer count
    * — which shares the (user_id, cycle) partitioning.
    */
  def q13ValidCycleRows(spark: SparkSession, dir: String): DataFrame = {
    val lab = labeled(spark, dir)
    val wCycle = Window.partitionBy("user_id", "cycle")
    val wPeers = Window.partitionBy("user_id", "cycle").orderBy("value")
      .rangeBetween(Window.currentRow, Window.currentRow)
    lab
      .withColumn("__cnt_v", count(lit(1)).over(wPeers))
      .withColumn("__n", count(lit(1)).over(wCycle))
      .withColumn("__med", percentile(col("value"), lit(0.5)).over(wCycle))
      .withColumn("__mode", max_by(col("value"), struct(col("__cnt_v"), -col("value"))).over(wCycle))
      .filter(col("__n") >= 4 && col("__med") > 0 && col("__mode") > 0)
      .select("user_id", "cycle", "event_id", "event_type", "value")
      .orderBy("event_id")
  }

  val q13Sql: String = labSql +
    """, stats AS (
      |  SELECT user_id, cycle, count(*) AS n,
      |    quantile_cont(value, 0.5) AS med
      |  FROM lab GROUP BY user_id, cycle
      |), md AS (
      |  SELECT user_id, cycle, value AS mode_v FROM (
      |    SELECT user_id, cycle, value,
      |      row_number() OVER (PARTITION BY user_id, cycle ORDER BY count(*) DESC, value ASC) AS rk
      |    FROM lab GROUP BY user_id, cycle, value)
      |  WHERE rk = 1
      |), valid AS (
      |  SELECT stats.user_id, stats.cycle
      |  FROM stats JOIN md ON stats.user_id = md.user_id AND stats.cycle = md.cycle
      |  WHERE n >= 4 AND med > 0 AND mode_v > 0
      |)
      |SELECT lab.user_id, lab.cycle, event_id, event_type, value
      |FROM lab SEMI JOIN valid ON lab.user_id = valid.user_id AND lab.cycle = valid.cycle
      |ORDER BY event_id""".stripMargin

  /** A2/A5 — curation: valid cycles collapsed to their median value +
    * first timestamp + state (ExamplePipelineCode.md:418-441). No
    * semi-join needed at all: the stats core already holds the
    * per-cycle aggregates, so curation is a filter + projection of it.
    */
  def q14CycleCuration(spark: SparkSession, dir: String): DataFrame =
    cycleStatsCore(labeled(spark, dir))
      .filter(col("n") >= 4 && col("median_raw") > 0 && col("mode_value") > 0)
      .select(
        col("user_id"), col("cycle"),
        col("median_value").as("median_energy_cycle"),
        col("first_ts"), col("state"))
      .orderBy("user_id", "cycle")

  private val validCte: String =
    """, stats AS (
      |  SELECT user_id, cycle, count(*) AS n, quantile_cont(value, 0.5) AS med
      |  FROM lab GROUP BY user_id, cycle
      |), md AS (
      |  SELECT user_id, cycle, value AS mode_v FROM (
      |    SELECT user_id, cycle, value,
      |      row_number() OVER (PARTITION BY user_id, cycle ORDER BY count(*) DESC, value ASC) AS rk
      |    FROM lab GROUP BY user_id, cycle, value)
      |  WHERE rk = 1
      |), valid AS (
      |  SELECT stats.user_id, stats.cycle
      |  FROM stats JOIN md ON stats.user_id = md.user_id AND stats.cycle = md.cycle
      |  WHERE n >= 4 AND med > 0 AND mode_v > 0
      |), curated AS (
      |  SELECT lab.user_id, lab.cycle,
      |    quantile_cont(CAST(round(value*100, 0) AS BIGINT), 0.5)/100.0 AS median_energy_cycle,
      |    CAST(min(ts) AS TIMESTAMP) AS first_ts, min(event_type) AS state
      |  FROM lab SEMI JOIN valid ON lab.user_id = valid.user_id AND lab.cycle = valid.cycle
      |  GROUP BY lab.user_id, lab.cycle
      |)""".stripMargin

  val q14Sql: String = labSql + validCte +
    """
      |SELECT user_id, cycle, median_energy_cycle, first_ts, state
      |FROM curated
      |ORDER BY user_id, cycle""".stripMargin

  /** A7 — per-stage baseline threshold: round(median of per-cycle
    * medians) (ExamplePipelineCode.md:456-484; variance gating lives in
    * the pipeline, not this oracle query). Median-of-medians works in
    * half-cents, still exact. The OUTER round is the reference's
    * Python round() — HALF_EVEN, so `bround` here and `round_even` in
    * the oracle; the inner cents/half-cents rounds are the engine's
    * own quantization and stay HALF_UP on both sides.
    */
  def q15BaselineThresholds(spark: SparkSession, dir: String): DataFrame =
    cycleStatsCore(labeled(spark, dir))
      .filter(col("n") >= 4 && col("median_raw") > 0 && col("mode_value") > 0)
      .select(col("state").as("event_type"), col("median_value").as("mec"))
      .groupBy(col("event_type"))
      .agg(
        bround(GroupStats.exactMedian(round(col("mec") * 200, 0).cast("long")) / lit(200.0), 0).as("threshold"),
        count(lit(1)).as("n_cycles"))
      .orderBy("event_type")

  val q15Sql: String = labSql +
    """, curated AS (
      |  SELECT lab.user_id, event_type, lab.cycle,
      |    quantile_cont(CAST(round(value*100, 0) AS BIGINT), 0.5)/100.0 AS mec
      |  FROM lab SEMI JOIN (
      |    SELECT s.user_id, s.cycle FROM
      |      (SELECT user_id, cycle, count(*) AS n, quantile_cont(value, 0.5) AS med
      |       FROM lab GROUP BY user_id, cycle) s
      |    JOIN (SELECT user_id, cycle, value AS mode_v FROM (
      |            SELECT user_id, cycle, value,
      |              row_number() OVER (PARTITION BY user_id, cycle ORDER BY count(*) DESC, value ASC) AS rk
      |            FROM lab GROUP BY user_id, cycle, value) WHERE rk = 1) m
      |      ON s.user_id = m.user_id AND s.cycle = m.cycle
      |    WHERE n >= 4 AND med > 0 AND mode_v > 0
      |  ) valid ON lab.user_id = valid.user_id AND lab.cycle = valid.cycle
      |  GROUP BY lab.user_id, event_type, lab.cycle
      |)
      |SELECT event_type,
      |  round_even(quantile_cont(CAST(round(mec*200, 0) AS BIGINT), 0.5)/200.0, 0) AS threshold,
      |  count(*) AS n_cycles
      |FROM curated
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** F5/F6 + A3 — Sunday-aligned weekly per-stage stats with exact
    * decimal sums; stddev_pop via the explicit sum-of-squares form so
    * both engines run the identical double arithmetic.
    */
  def q16WeeklyStats(spark: SparkSession, dir: String): DataFrame = {
    val dv = col("value").cast(DecimalType(18, 2))
    Sources.events(spark, dir)
      .withColumn("week_start", Scalars.sundayWeekStart(col("ts")))
      .groupBy(col("week_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(dv).cast("double").as("sum_value"),
        sum(dv * dv).cast("double").as("sum_sq"))
      .select(
        col("week_start"), col("event_type"), col("n"),
        (col("sum_value") / col("n")).as("mean"),
        sqrt(greatest(
          col("sum_sq") / col("n") - (col("sum_value") / col("n")) * (col("sum_value") / col("n")),
          lit(0.0))).as("std_dev"))
      .orderBy("week_start", "event_type")
  }

  val q16Sql: String =
    """WITH agg AS (
      |  SELECT CAST(ts AS DATE) - CAST(dayofweek(CAST(ts AS DATE)) AS INT) AS week_start,
      |    event_type, count(*) AS n,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |    CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_sq
      |  FROM events
      |  GROUP BY 1, 2
      |)
      |SELECT week_start, event_type, n,
      |  sum_value / n AS mean,
      |  sqrt(greatest(sum_sq / n - (sum_value / n) * (sum_value / n), 0.0)) AS std_dev
      |FROM agg
      |ORDER BY week_start, event_type""".stripMargin

  /** W2/O3 — per-stage recency top-k (k=3 here; the pipeline uses
    * k=5000 for the GMM cap).
    */
  def q17RecencyTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts").desc, col("event_id").desc)
    Sources.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("event_type", "rn", "event_id", "ts", "value")
      .orderBy("event_type", "rn")
  }

  val q17Sql: String =
    """SELECT event_type, CAST(rn AS INT) AS rn, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |FROM (SELECT event_type, event_id, ts, value,
      |        row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn <= 3
      |ORDER BY event_type, rn""".stripMargin

  /** F1/F3/F4/F9-style scalar pack: string tail lower, second floor,
    * date extraction, regex JSON field extraction.
    */
  def q18ScalarPack(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .select(
        col("event_id"),
        lower(expr("right(event_type, 2)")).as("tail2"),
        date_trunc("second", col("ts")).as("ts_sec"),
        to_date(col("ts")).as("d"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
      .orderBy("event_id")

  val q18Sql: String =
    """SELECT event_id,
      |  lower(right(event_type, 2)) AS tail2,
      |  CAST(date_trunc('second', ts) AS TIMESTAMP) AS ts_sec,
      |  CAST(ts AS DATE) AS d,
      |  CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** S7 — time-bucketed source-style aggregate: hourly event counts and
    * exact sums per stage.
    */
  def q19HourlyAgg(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")

  val q19Sql: String =
    """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour, event_type""".stripMargin

  /** As-of join (composed operator — see [[graft.ops.AsOfJoin]]): for
    * every error event, the most recent purchase of the same user at
    * or before it. Right side pre-deduped to one purchase per
    * (user, ts) so tie behavior is deterministic on both engines.
    */
  def q32AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error").select("user_id", "event_id", "ts")
    val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "ts", "event_id", "value")
    graft.ops.AsOfJoin.asOf(errors, purchases, Seq("user_id"), "ts", "ts", Seq("event_id", "value"))
      .select(
        col("user_id"), col("event_id"),
        col("right_event_id"), col("right_value"), col("right_ts"))
      .orderBy("event_id")
  }

  val q32Sql: String =
    """WITH e AS (SELECT * FROM events WHERE event_type = 'error'),
      |p AS (SELECT * FROM (
      |        SELECT *, row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      |        FROM events WHERE event_type = 'purchase') WHERE rn = 1)
      |SELECT e.user_id, e.event_id,
      |  p.event_id AS right_event_id, p.value AS right_value, CAST(p.ts AS TIMESTAMP) AS right_ts
      |FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND p.ts <= e.ts
      |ORDER BY e.event_id""".stripMargin

  /** Interval join (composed operator — see [[graft.ops.IntervalJoin]]):
    * purchases that happened during an error-spike window. Windows are
    * the half-open days `[day, day+1d)` whose error count reaches 70
    * (derived from the same table, so the whole query is
    * deterministic); points are purchase events. The join is the
    * bucketed equi-join form — 6-hour buckets, so each day window
    * explodes to exactly 4 bucket rows and the plan is a
    * BroadcastHashJoin + residual, never a nested loop.
    */
  def q56IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Sources.events(spark, dir)
    val windows = ev.filter(col("event_type") === "error")
      .groupBy(date_trunc("day", col("ts")).as("window_lo"))
      .agg(count(lit(1)).as("n_errors"))
      .filter(col("n_errors") >= 70)
      .withColumn("window_hi", col("window_lo") + expr("INTERVAL 1 DAY"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "ts", "user_id", "value")
    graft.ops.IntervalJoin.pointInInterval(
        purchases, windows, "ts", "window_lo", "window_hi",
        bucketSeconds = 21600L, broadcastIntervals = true)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"),
        col("window_lo"), col("n_errors"))
      .orderBy("event_id")
  }

  val q56Sql: String =
    """WITH w AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_lo, count(*) AS n_errors
      |  FROM events WHERE event_type = 'error'
      |  GROUP BY 1 HAVING count(*) >= 70)
      |SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts, e.user_id, e.value,
      |  w.window_lo, w.n_errors
      |FROM events e
      |JOIN w ON e.ts >= w.window_lo AND e.ts < w.window_lo + INTERVAL 1 DAY
      |WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin

  /** Analytic window frame (moving aggregate) — 5-row trailing sum and
    * mean per device; decimal window sums keep both engines bit-equal
    * (segment-tree vs incremental evaluation reassociate double adds).
    */
  def q34MovingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id")).rowsBetween(-4, 0)
    Sources.events(spark, dir)
      .select(
        col("user_id"), col("event_id"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double").as("mov_sum"),
        count(lit(1)).over(w).as("n_window"))
      .withColumn("mov_avg", col("mov_sum") / col("n_window"))
      .orderBy("event_id")
  }

  val q34Sql: String =
    """SELECT user_id, event_id,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
      |  count(*) OVER w AS n_window,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / (count(*) OVER w) AS mov_avg
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** q73: JSON property extraction (SURVEY §2.8's planned
    * `from_json`/`get_json_object` extension over the `events.props`
    * fixture column) — both mechanisms exercised: `from_json` with an
    * explicit schema parses the typed struct (codegen-friendly,
    * schema-checked — the production form), `get_json_object` does the
    * path lookup (the ad-hoc form), and the query CROSS-CHECKS them
    * (`n_agree` counts rows where both extract the same value). The
    * oracle recomputes the extraction with a dialect-neutral regexp.
    */
  def q73JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Sources.events(spark, dir)
      .select(
        col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"),
        get_json_object(col("props"), "$.k").cast("int").as("k2"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum((col("k") === col("k2")).cast("long")).as("n_agree"),
        sum(col("k")).as("sum_k"),
        GroupStats.exactMedian(col("k")).as("p50_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  val q73Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) AS k
      |  FROM events
      |)
      |SELECT event_type, count(*) AS n, count(*) AS n_agree,
      |  CAST(sum(k) AS BIGINT) AS sum_k,
      |  quantile_cont(k, 0.5) AS p50_k,
      |  CAST(max(k) AS INT) AS max_k
      |FROM e GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_json_extract" -> (q73JsonExtract _),
    "q32_asof_join" -> (q32AsofJoin _),
    "q34_moving_avg" -> (q34MovingAvg _),
    "q56_interval_join" -> (q56IntervalJoin _),
    "q12_cycle_stats" -> (q12CycleStats _),
    "q13_valid_cycle_rows" -> (q13ValidCycleRows _),
    "q14_cycle_curation" -> (q14CycleCuration _),
    "q15_baseline_thresholds" -> (q15BaselineThresholds _),
    "q16_weekly_stats" -> (q16WeeklyStats _),
    "q17_recency_topk" -> (q17RecencyTopK _),
    "q18_scalar_pack" -> (q18ScalarPack _),
    "q19_hourly_agg" -> (q19HourlyAgg _))

  val oracle: Map[String, String] = Map(
    "q73_json_extract" -> q73Sql,
    "q32_asof_join" -> q32Sql,
    "q34_moving_avg" -> q34Sql,
    "q56_interval_join" -> q56Sql,
    "q12_cycle_stats" -> q12Sql,
    "q13_valid_cycle_rows" -> q13Sql,
    "q14_cycle_curation" -> q14Sql,
    "q15_baseline_thresholds" -> q15Sql,
    "q16_weekly_stats" -> q16Sql,
    "q17_recency_topk" -> q17Sql,
    "q18_scalar_pack" -> q18Sql,
    "q19_hourly_agg" -> q19Sql)
}
