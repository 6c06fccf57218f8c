package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SegmentationSpec extends SparkSpec {

  // `cycleBoundaries` fixture (FIXTURES.md §2): tstate 1,1,2,2,2,1 +
  // single-row runs; cycles increment exactly at state changes.
  test("labelCycles: boundaries, single-row runs, first row starts cycle 1") {
    import sqlImplicits._
    val df = Seq(
      (1L, 1, 1), (2L, 1, 1), (3L, 2, 1), (4L, 2, 1), (5L, 2, 1), (6L, 1, 1), (7L, 3, 1))
      .toDF("ts", "tstate", "dev")
    val out = Segmentation.labelCycles(df, Seq("dev"), Seq(col("ts")), "tstate")
      .orderBy("ts").select("cycle").as[Long].collect()
    assert(out.toSeq == Seq(1L, 1L, 2L, 2L, 2L, 3L, 4L))
  }

  test("labelCycles: a null state is a state value — null runs are one cycle (IS DISTINCT FROM)") {
    import sqlImplicits._
    // the oracle SQL's own change detector; [A, null, null, A] must be
    // three cycles, not the first null merging into A's cycle
    val df = Seq(
      (1L, Some("A"), 1), (2L, None, 1), (3L, None, 1), (4L, Some("A"), 1))
      .toDF("ts", "tstate", "dev")
    val out = Segmentation.labelCycles(df, Seq("dev"), Seq(col("ts")), "tstate")
      .orderBy("ts").select("cycle").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 2L, 3L))
    // shared lag() degeneracy: a partition-LEADING null run is cycle 0
    val lead = Seq((1L, None, 1), (2L, None, 1), (3L, Some("A"), 1))
      .toDF("ts", "tstate", "dev")
    val out2 = Segmentation.labelCycles(lead, Seq("dev"), Seq(col("ts")), "tstate")
      .orderBy("ts").select("cycle").as[Long].collect()
    assert(out2.toSeq == Seq(0L, 0L, 1L))
  }

  test("labelCycles: independent numbering per partition key") {
    import sqlImplicits._
    val df = Seq((1L, 1, 1), (2L, 2, 1), (1L, 5, 2), (2L, 5, 2)).toDF("ts", "tstate", "dev")
    val out = Segmentation.labelCycles(df, Seq("dev"), Seq(col("ts")), "tstate")
      .orderBy("dev", "ts").select("cycle").as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 1L, 1L))
  }

  test("labelCycles: cycle ids non-decreasing, increment only at changes (property)") {
    import sqlImplicits._
    val states = Vector.tabulate(200)(i => (i % 7) * (i % 3)) // deterministic pseudo-pattern
    val df = states.zipWithIndex.map { case (s, i) => (i.toLong, s, 1) }.toDF("ts", "tstate", "dev")
    val rows = Segmentation.labelCycles(df, Seq("dev"), Seq(col("ts")), "tstate")
      .orderBy("ts").select("tstate", "cycle").as[(Int, Long)].collect()
    rows.sliding(2).foreach {
      case Array((s1, c1), (s2, c2)) =>
        assert(c2 - c1 == (if (s1 == s2) 0 else 1))
      case _ =>
    }
  }

  test("recencyTopK keeps the k most recent per group") {
    import sqlImplicits._
    val df = (1 to 10).map(i => (i.toLong, "a")).toDF("ts", "g")
    val out = Segmentation.recencyTopK(df, Seq("g"), "ts", 3).select("ts").as[Long].collect().sorted
    assert(out.toSeq == Seq(8L, 9L, 10L))
  }
}
