package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row

class CorpusStatsSpec extends SparkSpec {

  private def docs = {
    import sqlImplicits._
    Seq(
      (1L, "the cat sat"),           // bigrams: {the cat, cat sat}
      (2L, "the cat ran"),           // bigrams: {the cat, cat ran}
      (3L, "zq"),                    // 1 token -> no bigrams, absent
      (4L, "the cat the cat sat")    // distinct bigrams: {the cat, cat the, cat sat}
    ).toDF("doc_id", "text")
  }

  test("docFrequency counts documents, not occurrences") {
    val df = CorpusStats.docFrequency(docs, "text", n = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc 4 repeats "the cat" twice but counts once (per-doc distinct)
    assert(df("the cat") == 3L)
    assert(df("cat sat") == 2L)
    assert(df("cat ran") == 1L)
    assert(df("cat the") == 1L)
    assert(df.size == 4)
  }

  test("noveltyReport: exact integer stats; sub-n-token docs absent") {
    val got = CorpusStats.noveltyReport(docs, "text", "doc_id", n = 2, rareMaxDf = 1)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L)) // doc 3 absent
    def row(r: Row) = (r.getInt(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5))
    // doc 1: grams {the cat(df3), cat sat(df2)} -> 0 rare, max 3, mean 2.5
    assert(row(got(0)) == ((2, 0L, 3L, 0.0, 2.5)))
    // doc 2: {the cat(3), cat ran(1)} -> 1 rare, mean 2.0
    assert(row(got(1)) == ((2, 1L, 3L, 0.5, 2.0)))
    // doc 4: {the cat(3), cat the(1), cat sat(2)} -> 1 rare, mean 2.0
    assert(row(got(2)) == ((3, 1L, 3L, 1.0 / 3.0, 2.0)))
  }

  test("noveltyReportWith scores against a snapshot; unseen grams are dropped") {
    import sqlImplicits._
    // snapshot built from docs 1 and 2 only: dfs there are
    // {the cat: 2, cat sat: 1, cat ran: 1}
    val snapshot = CorpusStats.docFrequency(
      docs.filter($"doc_id".isin(1L, 2L)), "text", n = 2)
    val got = CorpusStats.noveltyReportWith(
      docs, snapshot, "text", "doc_id", n = 2, rareMaxDf = 1)
      .orderBy("doc_id").collect()
    // doc 4's gram "cat the" is unknown to the snapshot -> dropped:
    // scored grams {the cat(2), cat sat(1)} -> n_ngrams 2, 1 rare
    val r4 = got.find(_.getLong(0) == 4L).get
    assert(r4.getInt(1) == 2 && r4.getLong(2) == 1L && r4.getLong(3) == 2L)
    // docs fully covered by the snapshot score exactly like inline
    // noveltyReport over docs 1+2 would
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getInt(1) == 2 && r1.getLong(2) == 1L && r1.getLong(3) == 2L)
  }

  test("noveltyReport rejects a non-positive rare ceiling") {
    intercept[IllegalArgumentException] {
      CorpusStats.noveltyReport(docs, "text", "doc_id", n = 2, rareMaxDf = 0)
    }
  }
}
