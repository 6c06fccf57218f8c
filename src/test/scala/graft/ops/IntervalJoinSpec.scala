package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def points(rows: (Long, String)*): DataFrame = {
    import sqlImplicits._
    rows.map { case (k, t) => (k, ts(t)) }.toDF("k", "ts")
  }

  private def intervals(rows: (Long, String, String, String)*): DataFrame = {
    import sqlImplicits._
    rows.map { case (k, lo, hi, tag) => (k, ts(lo), ts(hi), tag) }
      .toDF("k", "lo", "hi", "tag")
  }

  /** The semantics spec: the naive range predicate, as a cross join
    * (fine at test size — the operator exists so production never
    * plans this).
    */
  private def naive(p: DataFrame, i: DataFrame): Set[(Long, String, String)] =
    p.crossJoin(i.withColumnRenamed("k", "ik"))
      .filter(col("k") === col("ik") && col("lo") <= col("ts") && col("ts") < col("hi"))
      .select(col("k"), col("ts").cast("string"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  private def bucketed(p: DataFrame, i: DataFrame, bucketSeconds: Long,
      broadcastIntervals: Boolean = false): Set[(Long, String, String)] =
    IntervalJoin.pointInInterval(p, i, "ts", "lo", "hi", Seq("k"),
      bucketSeconds, maxBucketsPerInterval = 1 << 20,
      broadcastIntervals = broadcastIntervals)
      .select(col("k"), col("ts").cast("string"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet

  test("matches the naive range join: keys, overlap, boundaries, multi-bucket spans") {
    val p = points(
      (1L, "2024-01-01 10:00:00"), // inside both overlapping intervals of key 1
      (1L, "2024-01-01 11:59:59"), // inside A only
      (1L, "2024-01-01 09:00:00"), // lo of A — inclusive
      (1L, "2024-01-01 12:00:00"), // hi of A — EXCLUSIVE, still inside B
      (1L, "2024-01-01 20:00:00"), // inside nothing
      (2L, "2024-01-01 10:00:00"), // same instant, other key: only C
      (3L, "2024-01-03 05:00:00")) // long interval D spans many buckets
    val i = intervals(
      (1L, "2024-01-01 09:00:00", "2024-01-01 12:00:00", "A"),
      (1L, "2024-01-01 09:30:00", "2024-01-01 13:00:00", "B"),
      (2L, "2024-01-01 09:00:00", "2024-01-01 12:00:00", "C"),
      (3L, "2024-01-02 00:00:00", "2024-01-04 00:00:00", "D"))
    val want = naive(p, i)
    assert(want.nonEmpty && want.exists(_._3 == "D"))
    for (w <- Seq(60L, 3600L, 86400L))
      assert(bucketed(p, i, w) == want, s"bucketSeconds=$w")
  }

  test("no duplicate pairs: a point meets an interval in exactly one bucket") {
    val p = points((1L, "2024-01-01 10:30:00"))
    val i = intervals((1L, "2024-01-01 00:00:00", "2024-01-02 00:00:00", "X"))
    // 96 buckets of 15 min cover the interval; the pair must appear once.
    val out = IntervalJoin.pointInInterval(p, i, "ts", "lo", "hi", Seq("k"), 900L)
    assert(out.count() == 1L)
  }

  test("interval ending exactly on a grid line does not leak into the next bucket") {
    // [09:00, 10:00) at 1h buckets: a 10:00:00 point shares no bucket
    // with the interval AND fails the residual — and the interval must
    // explode to exactly one bucket row, not two.
    val i = intervals((1L, "2024-01-01 09:00:00", "2024-01-01 10:00:00", "E"))
    assert(bucketed(points((1L, "2024-01-01 10:00:00")), i, 3600L).isEmpty)
    assert(bucketed(points((1L, "2024-01-01 09:59:59")), i, 3600L).size == 1)
  }

  test("empty and inverted intervals match nothing") {
    val i = intervals(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:00:00", "empty"),
      (1L, "2024-01-01 12:00:00", "2024-01-01 11:00:00", "inverted"))
    assert(bucketed(points((1L, "2024-01-01 10:00:00")), i, 3600L).isEmpty)
  }

  test("fan-out past maxBucketsPerInterval fails fast with a named error") {
    val p = points((1L, "2024-01-01 10:00:00"))
    val i = intervals((1L, "2024-01-01 00:00:00", "2024-01-08 00:00:00", "wide"))
    val ex = intercept[Exception] {
      IntervalJoin.pointInInterval(p, i, "ts", "lo", "hi", Seq("k"),
        bucketSeconds = 60L, maxBucketsPerInterval = 100).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("maxBucketsPerInterval")))
  }

  test("plans an equi-join on (keys, bucket) — no cartesian, broadcast on request") {
    val p = points((1L, "2024-01-01 10:00:00"))
    val i = intervals((1L, "2024-01-01 09:00:00", "2024-01-01 12:00:00", "A"))
    val plain = IntervalJoin.pointInInterval(p, i, "ts", "lo", "hi", Seq("k"), 3600L)
      .queryExecution.executedPlan.toString
    assert(!plain.contains("CartesianProduct") && !plain.contains("BroadcastNestedLoop"))
    val bcast = IntervalJoin.pointInInterval(p, i, "ts", "lo", "hi", Seq("k"), 3600L,
      broadcastIntervals = true).queryExecution.executedPlan.toString
    assert(bcast.contains("BroadcastHashJoin"))
  }

  test("no keys: the bucket alone is the equi key") {
    val p = points((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 20:00:00"))
    val i = intervals((99L, "2024-01-01 09:00:00", "2024-01-01 12:00:00", "G"))
    val out = IntervalJoin.pointInInterval(
      p, i.drop("k"), "ts", "lo", "hi", Nil, 3600L)
    assert(out.select("k").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("TIMESTAMP_NTZ columns join identically to TIMESTAMP (parquet zone-less default)") {
    // pyarrow-default parquet timestamps surface as TIMESTAMP_NTZ,
    // which unix_micros rejects — the operator casts internally, and
    // the session-zone shift cancels because BOTH sides shift. Pin the
    // whole matrix: ntz points x ts intervals and every other combo
    // must produce the zoned result (q56 found this at analysis time).
    val p = points(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 12:00:00"),
      (1L, "2024-01-01 20:00:00"), (3L, "2024-01-03 05:00:00"))
    val i = intervals(
      (1L, "2024-01-01 09:00:00", "2024-01-01 12:00:00", "A"),
      (1L, "2024-01-01 09:30:00", "2024-01-01 13:00:00", "B"),
      (3L, "2024-01-02 00:00:00", "2024-01-04 00:00:00", "D"))
    def ntz(df: DataFrame, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c,
        col(c).cast(org.apache.spark.sql.types.TimestampNTZType)))
    val want = bucketed(p, i, 3600L)
    assert(want.nonEmpty)
    for ((pp, ii, tag) <- Seq(
        (ntz(p, "ts"), i, "ntz points"),
        (p, ntz(i, "lo", "hi"), "ntz intervals"),
        (ntz(p, "ts"), ntz(i, "lo", "hi"), "ntz both")))
      assert(bucketed(pp, ii, 3600L) == want, tag)
  }

  test("all-NTZ join survives a DST session timezone: points inside the spring-forward gap match") {
    // under America/New_York, 2025-03-09 02:30 does not exist as an
    // instant — a session-zone cast collapses it onto 03:30's instant,
    // desyncing the bucket grid from the wall-time residual predicate.
    // The all-NTZ path derives micros from wall-clock fields, so the
    // contained point must survive regardless of the session zone.
    // Isolation: an own newSession() carries the DST zone (shared-
    // session mutation would race parallel suites), and NTZ values are
    // built by a string->NTZ cast (zone-free wall-time parse) — going
    // through java.sql.Timestamp.valueOf would silently normalize the
    // nonexistent local time on a DST-zone JVM.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    import s2.implicits._
    val ntzType = org.apache.spark.sql.types.TimestampNTZType
    val p = Seq(
      (1L, "2025-03-09 02:30:00"),   // inside the DST gap
      (1L, "2025-03-09 03:15:00"),
      (1L, "2025-03-09 04:00:00")).toDF("k", "s")
      .select(col("k"), col("s").cast(ntzType).as("ts"))
    val i = Seq((1L, "2025-03-09 01:00:00", "2025-03-09 03:30:00", "A"))
      .toDF("k", "lo_s", "hi_s", "tag")
      .select(col("k"), col("lo_s").cast(ntzType).as("lo"),
        col("hi_s").cast(ntzType).as("hi"), col("tag"))
    val got = IntervalJoin.pointInInterval(p, i, "ts", "lo", "hi", Seq("k"), 1800L)
      .select(col("k"), col("ts").cast("string"), col("tag"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "2025-03-09 02:30:00", "A"), (1L, "2025-03-09 03:15:00", "A")),
      got.toString)
  }
}
