package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted join equals plain join on skewed data") {
    import sqlImplicits._
    // 90% of fact rows on one hot key
    val fact = ((1 to 900).map(i => (1L, i.toLong)) ++ (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"), (6L, "e"), (7L, "f"), (8L, "g"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("name").count()
    val salted = Skew.saltedJoin(fact, dim, Seq("k"), saltFactor = 8, saltFrom = Seq("payload"))
      .groupBy("name").count()
    val p = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val s = salted.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(p == s)
  }

  test("non-fact-preserving join types are rejected (exploded dim would duplicate)") {
    import sqlImplicits._
    val fact = Seq((1L, "a")).toDF("k", "f")
    val dim = Seq((1L, "d"), (2L, "d2")).toDF("k", "d")
    Seq("right", "right_outer", "full", "full_outer").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(fact, dim, Seq("k"), 4, Seq("f"), jt)
      }
      assert(e.getMessage.contains("fact-preserving"), jt)
    }
    // the fact-preserving set still works
    assert(Skew.saltedJoin(fact, dim, Seq("k"), 4, Seq("f"), "left_anti").count() == 0)
    assert(Skew.saltedJoin(fact, dim, Seq("k"), 4, Seq("f"), "left_semi").count() == 1)
  }

  test("salt spreads a hot key across buckets") {
    import sqlImplicits._
    val df = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val buckets = df.select(Skew.salt(8, col("payload")).as("s")).distinct().count()
    assert(buckets == 8)
  }
}
