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

  test("salt spreads a hot key across buckets") {
    import sqlImplicits._
    val df = (1 to 1000).map(i => (1L, i.toLong)).toDF("k", "payload")
    val buckets = df.select(Skew.salt(8, col("payload")).as("s")).distinct().count()
    assert(buckets == 8)
  }
}
