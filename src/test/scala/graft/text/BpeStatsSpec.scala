package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeStatsSpec extends SparkSpec {

  // The published algorithm's own worked example (Sennrich et al.
  // 2016 §3.2): vocabulary {low:5, lower:2, newest:6, widest:3},
  // realized here as documents whose word frequencies are exactly
  // those counts.
  private def fixture() = {
    import sqlImplicits._
    val words =
      Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    // split across two docs to prove counts are corpus-wide
    Seq((1L, words.take(7).mkString(" ")), (2L, words.drop(7).mkString(" ")))
      .toDF("doc_id", "text")
  }

  test("pairCounts: frequency-weighted character pairs with the end-of-word marker") {
    val got = BpeStats.pairCounts(fixture(), "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // 'es' occurs in newest (6) and widest (3) -> 9; 'st' likewise;
    // 't</w>' closes both -> 9; 'lo' in low(5)+lower(2) -> 7
    assert(got(("e", "s")) == 9L)
    assert(got(("s", "t")) == 9L)
    assert(got(("t", BpeStats.EndOfWord)) == 9L)
    assert(got(("l", "o")) == 7L)
    assert(got(("o", "w")) == 7L)
    assert(got(("w", BpeStats.EndOfWord)) == 5L) // only 'low' ends in w
    assert(got(("e", "r")) == 2L)
    // total pair mass = sum over words freq * len (len+1 symbols -> len pairs)
    assert(got.values.sum == 5L * 3 + 2L * 5 + 6L * 6 + 3L * 6)
  }

  test("trainMerges: the published example's first merges, deterministic tie-break") {
    val vocab = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = BpeStats.trainMerges(vocab, 4)
    // round 1: es/st/t</w> all count 9 -> lexicographic ('e','s') wins;
    // round 2: fused 'es' pairs 't' at 9, 's','t' is gone; then 'est</w>'
    assert(merges.map(_._1).take(3) ==
      Seq(("e", "s"), ("es", "t"), ("est", BpeStats.EndOfWord)))
    assert(merges.take(3).forall(_._2 == 9L))
    // round 4: 'l','o' at 7 beats everything remaining
    assert(merges(3) == (("l", "o"), 7L))
  }

  test("trainMerges: stops when no pair repeats") {
    val merges = BpeStats.trainMerges(Array(("ab", 1L)), 10)
    assert(merges.isEmpty) // every pair count is 1 — nothing to learn
  }

  test("segmentWord: greedy by merge rank, unknown pairs stay split") {
    val vocab = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    // 4 merges: es, est, est</w>, lo (pinned by the training test)
    val ranks = BpeStats.trainMerges(vocab, 4).map(_._1).zipWithIndex.toMap
    assert(BpeStats.segmentWord("newest", ranks) == Seq("n", "e", "w", "est</w>"))
    // a word UNSEEN in training reuses the learned suffix subword
    assert(BpeStats.segmentWord("tallest", ranks).last == "est</w>")
    assert(BpeStats.segmentWord("", ranks).isEmpty)
    // with enough merges the most frequent word fuses to ONE symbol
    val full = BpeStats.trainMerges(vocab, 20).map(_._1).zipWithIndex.toMap
    assert(BpeStats.segmentWord("newest", full) == Seq("newest" + BpeStats.EndOfWord))
  }

  test("subtokenCounts: vocab-grain segmentation joined back, per-doc totals") {
    import sqlImplicits._
    val df = fixture()
    val merges = BpeStats.trainMerges(BpeStats.cappedVocab(df, "text", 100), 4)
    val got = BpeStats.subtokenCounts(df, "text", "doc_id", merges)
      .select("doc_id", "n_subtokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after 4 merges: low -> [lo,w,</w>]=3, lower -> [lo,w,e,r,</w>]=5,
    // newest -> [n,e,w,est</w>]=4, widest -> [w,i,d,est</w>]=4
    val perWord = Map("low" -> 3L, "lower" -> 5L, "newest" -> 4L, "widest" -> 4L)
    val docs = df.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").map(perWord).sum).toMap
    assert(got == docs)
    // sanity: the plan broadcasts the vocab-grain segmentation table
    val plan = BpeStats.subtokenCounts(df, "text", "doc_id", merges)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // EVERY input row survives: a wordless doc counts 0 (the old
    // aggregate-only form silently omitted it), and the caller's
    // columns pass through per the doc contract (review r19)
    import sqlImplicits._
    val withEmpty = df.unionByName(Seq((3L, ""), (4L, "   ")).toDF("doc_id", "text"))
    val full = BpeStats.subtokenCounts(withEmpty, "text", "doc_id", merges)
    assert(full.columns.toSeq == Seq("doc_id", "text", "n_subtokens"))
    val m = full.select("doc_id", "n_subtokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set(1L, 2L, 3L, 4L) && m(3L) == 0L && m(4L) == 0L, m.toString)
  }

  test("cappedVocab: top-N by (freq desc, word asc) — deterministic truncation") {
    val vocab = BpeStats.cappedVocab(fixture(), "text", 2)
    assert(vocab.toSeq == Seq(("newest", 6L), ("low", 5L)))
  }
}
