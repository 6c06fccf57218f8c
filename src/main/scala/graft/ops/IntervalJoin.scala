package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — for each point row, every
  * interval row with the same keys whose half-open window
  * `[lo, hi)` contains the point's timestamp. Spark has no built-in
  * range join: writing `points.join(intervals, lo <= ts && ts < hi)`
  * plans a BroadcastNestedLoopJoin (or a cartesian product), which
  * the suite-wide plan contract forbids and which melts at corpus
  * scale — every point is tested against every interval.
  *
  * The composed-operator answer (SURVEY.md §2.3 preference order) is
  * time bucketing: floor both sides onto a coarse bucket grid, join
  * on the EQUI key `(keys..., bucket)`, and keep the exact range
  * predicate as a residual filter.
  *
  *  - a point lives in exactly ONE bucket, so a (point, interval)
  *    pair can only meet once — no post-join dedup is ever needed;
  *  - an interval explodes into `span / bucketSeconds + 1` bucket
  *    rows via `sequence(...)` — bounded and chosen by the caller;
  *  - the join is a plain hash/sort-merge equi-join: shuffles
  *    partition on `(keys, bucket)`, AQE's skew split stays eligible,
  *    and a small interval side broadcasts.
  *
  * Cost model: `bucketSeconds` trades interval fan-out (span/width
  * rows per interval) against residual selectivity (points share a
  * bucket with intervals they miss). Pick it near the typical
  * interval length. A mis-sized width on long intervals is a silent
  * blow-up, so the fan-out is GUARDED: any interval exploding past
  * `maxBucketsPerInterval` fails the job with a named error at
  * execution time (same fail-fast discipline as the near-dup
  * candidate budget, `similarity/Similarity.scala`).
  */
object IntervalJoin {

  /** Join each point to every same-key interval containing it.
    *
    * Output: the point's columns plus the interval's (intervals'
    * key columns are dropped — they equal the point's). Inner join:
    * points in no interval vanish; a point inside k overlapping
    * intervals yields k rows.
    *
    * @param pointTs   timestamp column on `points`
    * @param loCol     interval start on `intervals` (inclusive)
    * @param hiCol     interval end on `intervals` (EXCLUSIVE)
    * @param keys      equi-key columns present on both sides
    * @param bucketSeconds bucket grid width; choose near the typical
    *   interval span
    * @param maxBucketsPerInterval fail-fast ceiling on per-interval
    *   fan-out (execution-time `raise_error`, names the interval)
    * @param broadcastIntervals hint the exploded interval side as
    *   broadcastable (alert tables, config epochs — control-plane
    *   sized sides)
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointTs: String,
      loCol: String,
      hiCol: String,
      keys: Seq[String] = Nil,
      bucketSeconds: Long = 3600L,
      maxBucketsPerInterval: Int = 1024,
      broadcastIntervals: Boolean = false): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds=$bucketSeconds must be positive")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval=$maxBucketsPerInterval must be positive")
    Seq(points -> "points", intervals -> "intervals").foreach { case (d, side) =>
      require(!d.columns.contains("__ij_bk"),
        s"$side must not contain reserved column __ij_bk")
    }

    // unix_micros only accepts TIMESTAMP; parquet timestamps without
    // a zone annotation (pyarrow's default) arrive as TIMESTAMP_NTZ.
    // The bucket grid must use the SAME interpretation the exact
    // residual predicate below uses, or grid and predicate disagree
    // near the mismatch and true matches silently vanish:
    //  - ALL columns NTZ: the residual compares wall times directly,
    //    so micros come from the wall-clock FIELDS — uniform and
    //    timezone-free. A session-zone cast here would be non-uniform
    //    under a DST zone (the spring-forward gap maps distinct wall
    //    times to one instant) and could drop points near a
    //    transition. Field arithmetic is valid pre-1970 too (fields
    //    are within-day offsets of the possibly-negative epoch day).
    //  - any column zoned: the residual coerces NTZ through the
    //    session zone, so micros must take the identical cast on
    //    every column. (Mixed types under a DST session zone inherit
    //    the cast's gap/overlap semantics — prefer homogeneous
    //    timestamp types there.)
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    val allNtz =
      points.schema(pointTs).dataType == TimestampNTZType &&
        intervals.schema(loCol).dataType == TimestampNTZType &&
        intervals.schema(hiCol).dataType == TimestampNTZType
    def micros(ts: Column): Column =
      if (allNtz)
        unix_date(ts.cast(DateType)).cast("long") * lit(86400000000L) +
          hour(ts).cast("long") * lit(3600000000L) +
          minute(ts).cast("long") * lit(60000000L) +
          (date_part(lit("SECOND"), ts) * lit(1000000)).cast("long")
      else unix_micros(ts.cast(TimestampType))
    def bucketOf(m: Column): Column =
      floor(m / lit(bucketSeconds * 1000000L))

    // hi is exclusive: an interval ending exactly on a grid line does
    // not reach into the next bucket, so the last covered bucket is
    // bucketOf(hi - 1 microsecond).
    val loBk = bucketOf(micros(col(loCol)))
    val hiBk = bucketOf(micros(col(hiCol)) - lit(1L))
    val fanOut = hiBk - loBk + lit(1L)
    val overBudgetMsg = concat(
      lit(s"IntervalJoin: interval fan-out exceeds maxBucketsPerInterval=" +
        s"$maxBucketsPerInterval at bucketSeconds=$bucketSeconds (["),
      col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
      lit(")); widen bucketSeconds or split the interval"))
    val guarded = when(
      fanOut > lit(maxBucketsPerInterval.toLong),
      raise_error(overBudgetMsg).cast("long")
    ).otherwise(lit(0L))
    val exploded = intervals
      .filter(col(loCol) < col(hiCol))
      .withColumn("__ij_bk", explode(sequence(loBk + guarded, hiBk)))
    val rhs = if (broadcastIntervals) broadcast(exploded) else exploded

    points
      .withColumn("__ij_bk", bucketOf(micros(col(pointTs))))
      .join(rhs, keys :+ "__ij_bk")
      .filter(col(loCol) <= col(pointTs) && col(pointTs) < col(hiCol))
      .drop("__ij_bk")
  }
}
