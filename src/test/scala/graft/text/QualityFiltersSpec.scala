package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityFiltersSpec extends SparkSpec {

  private def signals(texts: Seq[String]) = {
    import sqlImplicits._
    QualityFilters.withSignals(texts.zipWithIndex.map(_.swap).toDF("id", "text"), "text")
      .orderBy("id")
      .collect()
  }

  test("repetition signals: hand-computed values on known texts") {
    val rows = signals(Seq(
      "a b c d",        // all distinct: dup 0, top_tok 1/4, top_bigram 1/3
      "a a a a",        // one token repeated: dup 3/4, top_tok 1, top_bigram 1
      "a b a b a"))     // alternating: dup 3/5, top_tok 3/5, bigram 'a b' 2/4
    val r0 = rows(0)
    assert(r0.getAs[Int]("n_tokens") == 4)
    assert(r0.getAs[Double]("dup_token_frac") == 0.0)
    assert(r0.getAs[Double]("top_token_frac") == 0.25)
    assert(r0.getAs[Double]("top_bigram_frac") == 1.0 / 3.0)
    val r1 = rows(1)
    assert(r1.getAs[Double]("dup_token_frac") == 0.75)
    assert(r1.getAs[Double]("top_token_frac") == 1.0)
    assert(r1.getAs[Double]("top_bigram_frac") == 1.0)
    val r2 = rows(2)
    assert(r2.getAs[Double]("dup_token_frac") == 1.0 - 2.0 / 5.0)
    assert(r2.getAs[Double]("top_token_frac") == 3.0 / 5.0)
    assert(r2.getAs[Double]("top_bigram_frac") == 0.5)
  }

  test("single-token document: no bigram slots, fraction 0, gated out by length") {
    val r = signals(Seq("lonely")).head
    assert(r.getAs[Int]("n_tokens") == 1)
    assert(r.getAs[Double]("top_bigram_frac") == 0.0)
    assert(r.getAs[Int]("keep") == 0)
  }

  test("distinct stopword count ignores repeats and non-stopwords") {
    val r = signals(Seq("the the the cat of of xyzzy")).head
    assert(r.getAs[Int]("n_stop_distinct") == 2) // {the, of}
  }

  test("keep gate: a natural doc passes, a degenerate repeat of the same length fails") {
    val natural = ("the quick brown fox jumps over a lazy dog near the old stone " +
      "bridge and then runs off to find some food in the quiet green valley")
    val degenerate = Seq.fill(27)("spam").mkString(" ")
    val rows = signals(Seq(natural, degenerate))
    assert(rows(0).getAs[Int]("keep") == 1, rows(0).toString)
    assert(rows(1).getAs[Int]("keep") == 0, rows(1).toString)
    // gophered() returns exactly the kept rows
    import sqlImplicits._
    val kept = QualityFilters.gophered(
      Seq(natural, degenerate).zipWithIndex.map(_.swap).toDF("id", "text"), "text")
    assert(kept.select("id").as[Int].collect().toSeq == Seq(0))
  }

  test("signals agree with a brute-force Scala recount on the sf0.001 corpus") {
    val docs = graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
    val got = QualityFilters.withSignals(docs, "text")
      .select("doc_id", "text", "n_tokens", "dup_token_frac", "top_token_frac", "top_bigram_frac")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val toks = r.getAs[String]("text").split(" ", -1).toSeq
      val n = toks.size
      val topTok = toks.groupBy(identity).values.map(_.size).max
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      assert(r.getAs[Int]("n_tokens") == n)
      assert(r.getAs[Double]("dup_token_frac") == 1.0 - toks.distinct.size.toDouble / n)
      assert(r.getAs[Double]("top_token_frac") == topTok.toDouble / n)
      val expBg =
        if (n < 2) 0.0
        else bigrams.groupBy(identity).values.map(_.size).max.toDouble / (n - 1).toDouble
      assert(r.getAs[Double]("top_bigram_frac") == expBg)
    }
  }

  test("the gate is one shuffle-free scan (no exchange below the local sort)") {
    val docs = graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
    val plan = QualityFilters.gophered(docs, "text").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
