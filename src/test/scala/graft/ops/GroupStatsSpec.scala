package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GroupStatsSpec extends SparkSpec {

  // `modeTieBreak` fixture: two values tie on frequency; pandas idxmax
  // semantics pick the SMALLEST (SURVEY.md §7.4#2).
  test("mode tie-break picks smallest value among tied counts") {
    import sqlImplicits._
    val df = Seq((1, 5.0), (1, 5.0), (1, 3.0), (1, 3.0), (1, 9.0)).toDF("cycle", "energy")
    val m = GroupStats.modeWithTieBreak(df, Seq("cycle"), "energy", "mode_energy")
      .select("mode_energy").as[Double].head()
    assert(m == 3.0)
  }

  // `medianEvenCount` fixture: exact interpolation, not approx.
  test("exact median interpolates on even counts like pandas") {
    import sqlImplicits._
    val df = Seq((1, 1.0), (1, 2.0), (1, 7.0), (1, 100.0)).toDF("cycle", "energy")
    val m = df.groupBy("cycle").agg(GroupStats.exactMedian(col("energy")).as("m"))
      .select("m").as[Double].head()
    assert(m == 4.5)
  }

  // `filterCyclesBasic` fixture (Opus.md:673-695 mirror): 3 cycles with
  // counts 3/2/5, one all-zero-energy; only the >=4-row positive cycle
  // survives.
  test("filterValidCycles keeps only >=4-row positive-median/mode cycles") {
    import sqlImplicits._
    val rows =
      (1 to 3).map(i => (i.toLong, 1, 1, 10.0)) ++ // cycle 1: only 3 rows
        (4 to 5).map(i => (i.toLong, 1, 2, 20.0)) ++ // cycle 2: 2 rows
        (6 to 10).map(i => (i.toLong, 1, 3, 0.0)) // cycle 3: 5 rows but zero energy
    val surviving = (11 to 14).map(i => (i.toLong, 1, 4, 30.0)) // cycle 4: 4 rows positive
    val df = (rows ++ surviving).toDF("ts", "tstate", "cycle", "energy")
    val out = GroupStats.filterValidCycles(df, Seq("cycle"), "energy", "ts", "tstate")
    assert(out.select("cycle").distinct().as[Int].collect().toSeq == Seq(4))
    assert(out.count() == 4)
  }

  test("cycleStats: null values drop from count/median/mode like pandas (first-row survives)") {
    import sqlImplicits._
    // pandas Series.count()/median()/mode() all skip NaN: a
    // 3-null/4-real cycle counts 4 and its mode is a real value —
    // without the guards count=7 and the null group wins max_by,
    // flipping validCyclePredicate against a cycle pandas accepts
    val df = Seq(
      (1, Option.empty[Double], 1L, "run"), (1, None, 2L, "run"), (1, None, 3L, "run"),
      (1, Some(5.0), 4L, "run"), (1, Some(5.0), 5L, "run"),
      (1, Some(7.0), 6L, "run"), (1, Some(7.0), 7L, "run"))
      .toDF("cycle", "energy", "ts", "state")
    val row = GroupStats.cycleStats(df, Seq("cycle"), "energy", "ts", "state").head()
    assert(row.getAs[Long]("count") == 4L)
    assert(row.getAs[Double]("mode_energy") == 5.0) // tie -> smallest real value
    assert(row.getAs[Double]("median_energy") == 6.0)
    assert(row.getAs[Long]("first_ts") == 1L) // the null-value row still holds "first"
    // an all-null cycle reports count 0 and null mode (and so fails the
    // valid-cycle gate), never a phantom count
    val allNull = Seq((1, Option.empty[Double], 1L, "run"), (1, None, 2L, "run"),
      (1, None, 3L, "run"), (1, None, 4L, "run"))
      .toDF("cycle", "energy", "ts", "state")
    val r2 = GroupStats.cycleStats(allNull, Seq("cycle"), "energy", "ts", "state").head()
    assert(r2.getAs[Long]("count") == 0L && r2.isNullAt(r2.fieldIndex("mode_energy")))
  }

  test("cycleStats: ordered-first semantics via min/min_by") {
    import sqlImplicits._
    val df = Seq((3L, 9, 1, 5.0), (1L, 7, 1, 6.0), (2L, 8, 1, 6.0)).toDF("ts", "tstate", "cycle", "energy")
    val r = GroupStats.cycleStats(df, Seq("cycle"), "energy", "ts", "tstate").collect()(0)
    assert(r.getAs[Long]("first_ts") == 1L)
    assert(r.getAs[Int]("first_tstate") == 7)
    assert(r.getAs[Long]("count") == 3L)
    assert(r.getAs[Double]("median_energy") == 6.0)
    assert(r.getAs[Double]("mode_energy") == 6.0)
  }
}
