package graft.ops

import graft.SparkSpec

/** A8's DataFrame-level rCV (the per-group [[graft.ops.Variance]]
  * classifier carries its own array-based twin — VarianceSpec pins
  * the numbers; this spec pins the frame-level surface, including the
  * null-key group a using-columns join silently dropped, review r19).
  */
class RobustStatsSpec extends SparkSpec {

  test("robustCV: exact median/MAD per group, rcv null when median is 0") {
    import sqlImplicits._
    val df = Seq(
      ("a", 10.0), ("a", 12.0), ("a", 14.0), ("a", 100.0),
      ("z", 0.0), ("z", 0.0)).toDF("g", "v")
    val out = RobustStats.robustCV(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    // group a: median = (12+14)/2 = 13; |v-13| = (3,1,1,87) -> MAD = 2
    assert(out("a")._1 == 13.0 && out("a")._2 == 2.0)
    assert(out("a")._3.contains(2.0 / 13.0))
    // zero median -> rcv NULL (never a division blowup)
    assert(out("z")._1 == 0.0 && out("z")._3.isEmpty)
  }

  test("robustCV keeps the NULL group key as its own group, like groupBy") {
    import sqlImplicits._
    val df = Seq(
      (Some("a"), 10.0), (Some("a"), 12.0),
      (None, 5.0), (None, 7.0), (None, 9.0)).toDF("g", "v")
    val out = RobustStats.robustCV(df, Seq("g"), "v").collect()
      .map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    // the null-key group aggregates and SURVIVES the join back
    assert(out.keySet == Set(Some("a"), None), out.toString)
    assert(out(None) == 7.0)
  }
}
