package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left row, per key") {
    import sqlImplicits._
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3")) // key 2 has no earlier right row
      .toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 10.0),
      (1L, ts("2024-01-01 11:00:00"), 20.0),
      (1L, ts("2024-01-01 13:00:00"), 30.0), // after every left row
      (2L, ts("2024-01-01 09:30:00"), 40.0)) // after l3
      .toDF("user_id", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("v"))
      .orderBy("user_id", "ts").collect()
    assert(out(0).getAs[String]("tag") == "l1" && out(0).getAs[Double]("right_v") == 10.0)
    assert(out(1).getAs[String]("tag") == "l2" && out(1).getAs[Double]("right_v") == 20.0)
    assert(out(2).getAs[String]("tag") == "l3" && out(2).isNullAt(out(2).fieldIndex("right_v")))
  }

  test("exact-timestamp right row matches (<= semantics)") {
    import sqlImplicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00"), 7.0)).toDF("user_id", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("v")).collect()
    assert(out(0).getAs[Double]("right_v") == 7.0)
  }

  test("tolerance drops stale matches") {
    import sqlImplicits._
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "l")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 08:00:00"), 7.0)).toDF("user_id", "ts", "v")
    val strict = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("v"),
      toleranceSeconds = Some(3600)).collect()
    assert(strict(0).isNullAt(strict(0).fieldIndex("right_v")))
    val loose = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("v"),
      toleranceSeconds = Some(3 * 3600)).collect()
    assert(loose(0).getAs[Double]("right_v") == 7.0)
  }

  test("tolerance is microsecond-exact, not truncated to whole seconds") {
    import sqlImplicits._
    // staleness 60.8s vs tolerance 60: unix_timestamp would truncate
    // both stamps to seconds and keep the stale match (60 <= 60)
    val left = Seq((1L, ts("2024-01-01 10:01:00.9"), "l")).toDF("user_id", "ts", "tag")
    val right = Seq((1L, ts("2024-01-01 10:00:00.1"), 7.0)).toDF("user_id", "ts", "v")
    val strict = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("v"),
      toleranceSeconds = Some(60)).collect()
    assert(strict(0).isNullAt(strict(0).fieldIndex("right_v")))
    val loose = AsOfJoin.asOf(left, right, Seq("user_id"), "ts", "ts", Seq("v"),
      toleranceSeconds = Some(61)).collect()
    assert(loose(0).getAs[Double]("right_v") == 7.0)
  }

  test("duplicate right timestamps resolve deterministically (largest payload tuple)") {
    import sqlImplicits._
    // two right rows at the SAME (key, ts): without a total window
    // order, which one `last` picked depended on shuffle layout —
    // run-to-run nondeterminism (review r19). The tie now resolves
    // by the payload struct ordering: largest (right_ts, payload...)
    // tuple wins, on every run and every partition count.
    val left = Seq((1L, ts("2024-01-01 10:05:00"), "l")).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "A"),
      (1L, ts("2024-01-01 10:00:00"), "B")).toDF("user_id", "ts", "v")
    (1 to 5).foreach { i =>
      val out = AsOfJoin.asOf(
        left, right.repartition(i), Seq("user_id"), "ts", "ts", Seq("v")).collect()
      assert(out.length == 1 && out(0).getAs[String]("right_v") == "B",
        s"partitions=$i: ${out.mkString(",")}")
    }
  }
}
