package graft.ops

import graft.SparkSpec

class CurriculumSpec extends SparkSpec {
  import sqlImplicits._

  test("equal strata interleave as a perfect round-robin") {
    val df = (0L until 12L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val order = Curriculum.interleave(df, "doc_id", "source", seed = 7L)
      .collect().map(_.getAs[String]("source"))
    // every window of 3 consecutive positions holds all 3 sources
    order.grouped(3).foreach { w =>
      assert(w.toSet.size == 3, s"window $w is not a full rotation of the 3 sources")
    }
  }

  test("proportional interleave: a prefix holds floor(t*n_s + 0.5) items of each source") {
    val df = ((0L until 40L).map(i => (i, "big")) ++ (100L until 110L).map(i => (i, "small")))
      .toDF("doc_id", "source")
    val rows = Curriculum.interleave(df, "doc_id", "source", seed = 3L).collect()
    // closed form: source s contributes exactly floor(t*n_s + 0.5) rows
    // with pos_key <= t, so counts never drift from proportionality
    for (t <- Seq(0.25, 0.5, 0.75)) {
      val prefix = rows.filter(_.getAs[Double]("pos_key") <= t)
      val big = prefix.count(_.getAs[String]("source") == "big")
      val small = prefix.count(_.getAs[String]("source") == "small")
      assert(big == math.floor(t * 40 + 0.5).toInt, s"t=$t big=$big")
      assert(small == math.floor(t * 10 + 0.5).toInt, s"t=$t small=$small")
    }
  }

  test("same seed reproduces the order; a different seed permutes it") {
    val df = (0L until 50L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    def order(seed: Long) =
      Curriculum.interleave(df, "doc_id", "source", seed).collect().map(_.getLong(0)).toSeq
    assert(order(42L) == order(42L))
    assert(order(42L) != order(43L), "different seeds should reshuffle (MINSTD is a bijection)")
    assert(order(42L).sorted == order(43L).sorted, "a reshuffle is a permutation, not a filter")
  }
}
