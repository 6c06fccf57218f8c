package graft.ops

import graft.SparkSpec

class SplitsSpec extends SparkSpec {
  import sqlImplicits._

  private val fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  test("exact-dup documents always share a split (cluster cohesion)") {
    val docs = (0L until 300L).map { i =>
      (i, if (i % 3 == 0) "shared duplicate text" else s"unique text $i")
    }.toDF("doc_id", "text")
    val got = Splits.assign(docs, "text", "doc_id", fractions, seed = 5L).collect()
    val dupSplits = got.filter(_.getLong(1) == 0L).map(_.getString(2)).toSet
    assert(got.count(_.getLong(1) == 0L) == 100, "all %3==0 docs share canonical 0")
    assert(dupSplits.size == 1, s"dup cluster straddles splits: $dupSplits")
  }

  test("every document is assigned; fractions hold within binomial tolerance") {
    val docs = (0L until 5000L).map(i => (i, s"u $i")).toDF("doc_id", "text")
    val got = Splits.assign(docs, "text", "doc_id", fractions, seed = 1L)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.sum == 5000L, s"unassigned rows: $got")
    assert(math.abs(got("train") - 4000.0) < 4 * math.sqrt(5000 * 0.8 * 0.2), got)
    assert(math.abs(got("val") - 500.0) < 4 * math.sqrt(5000 * 0.1 * 0.9), got)
  }

  test("assignment is a pure function of the canonical id: reruns and layouts agree") {
    val docs = (0L until 400L).map(i => (i, s"t $i")).toDF("doc_id", "text")
    def m(df: org.apache.spark.sql.DataFrame) =
      Splits.assign(df, "text", "doc_id", fractions, seed = 2L)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m(docs) == m(docs.repartition(13)))
  }

  test("assignWith honors near-dup clusters and defaults absentees to their own id") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (9L, "d")).toDF("doc_id", "text")
    // 1,2,3 form one near-dup cluster anchored at 1; 9 is absent
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "canonical_id")
    val got = Splits.assignWith(docs, clusters, "doc_id", fractions, seed = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val bySplit = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet).toMap
    assert(bySplit(1L).size == 1, "cluster 1 must be split-cohesive")
    assert(got.find(_._1 == 9L).get._2 == 9L, "absent doc is its own cluster")
  }

  test("thresholdTable covers the whole modulus and respects normalization") {
    val t = Splits.thresholdTable(Seq("a" -> 2.0, "b" -> 1.0, "c" -> 1.0))
    assert(t.map(_._1) == Seq("a", "b", "c"))
    assert(t.last._2 == 2147483647L, "last threshold pinned to the modulus")
    assert(t.head._2 == math.floor(0.5 * 2147483647L.toDouble).toLong)
  }
}
