package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** Bigram-LM perplexity: exact semantics against a from-first-
  * principles recomputation, the two unseen fallbacks, regime parity
  * (broadcast vs shuffle LM joins), and the scale-shape pins.
  */
class NgramLmSpec extends SparkSpec {
  import sqlImplicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat", "en"),
    (2L, "the dog sat on the rug", "en"),
    (3L, "the cat ran to the dog", "en"),
    (4L, "der hund lief zum haus", "de"),
    (5L, "the cat sat on the rug", "en"),
    (6L, "cat the on sat mat the", "fr") // en vocabulary, scrambled order
  ).toDF("doc_id", "text", "lang")

  private def toks(t: String): Seq[String] = t.split(" ", -1).toSeq

  /** Reference: add-one bigram model on the lang=en subset, integer
    * microunit log-probs split as ln(c12+1) - ln(c1+V).
    */
  private def reference(rows: Seq[(Long, String, String)]): Map[Long, (Long, Long)] = {
    val train = rows.filter(_._3 == "en")
    val uni = train.flatMap(r => toks(r._2)).groupBy(identity).map { case (w, xs) => w -> xs.size }
    val bi = train.flatMap(r => toks(r._2).sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
      .groupBy(identity).map { case (g, xs) => g -> xs.size }
    val v = uni.size
    def lp(g: String): Long = {
      val w1 = g.substring(0, g.indexOf(' '))
      val a = math.round(math.log(bi.getOrElse(g, 0) + 1.0) * 1e6)
      val d = math.round(math.log(uni.getOrElse(w1, 0) + v.toDouble) * 1e6)
      a - d
    }
    rows.flatMap { case (id, t, _) =>
      val gs = toks(t).sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      if (gs.isEmpty) None else Some(id -> (gs.size.toLong, gs.map(lp).sum))
    }.toMap
  }

  test("perplexityReport matches the from-first-principles recomputation exactly") {
    val rows = docs.as[(Long, String, String)].collect().toSeq
    val got = NgramLm.perplexityReport(docs, col("lang") === "en", "text", "doc_id")
      .select("doc_id", "n_bigrams", "lp_micro_sum")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == reference(rows))
  }

  test("in-distribution docs score lower log_ppl than off-vocabulary and scrambled docs") {
    val ppl = NgramLm.perplexityReport(docs, col("lang") === "en", "text", "doc_id")
      .select("doc_id", "log_ppl").as[(Long, Double)].collect().toMap
    val inDist = Seq(1L, 2L, 3L, 5L).map(ppl).max
    assert(inDist < ppl(6L), "scrambled word order must read as surprising")
    assert(inDist < ppl(4L), "unseen vocabulary must read as surprising")
    // Add-one smoothing artifact, pinned so a smoothing change shows up
    // here: an unseen CONTEXT prices its bigrams at ln(V), which is
    // CHEAPER than an unseen bigram under a frequent seen context
    // (ln(c1+V) > ln(V)) — so the whole-vocabulary-unseen German doc
    // scores below the scrambled-English one.
    assert(ppl(4L) < ppl(6L))
  }

  test("fully-unseen doc: every bigram costs exactly ln(V) (numerator 0, context d0)") {
    val lm = NgramLm.fit(docs.filter(col("lang") === "en"), "text")
    val v = lm.vocab.select("v").as[Long].head()
    val d0 = math.round(math.log(v.toDouble) * 1e6)
    val out = NgramLm.logProb(
      Seq((99L, "qq ww ee")).toDF("doc_id", "text"), lm, "text", "doc_id")
      .select("n_bigrams", "lp_micro_sum").as[(Long, Long)].head()
    assert(out == ((2L, -2L * d0)))
  }

  test("documents with fewer than two tokens are absent") {
    val out = NgramLm.perplexityReport(
      docs.union(Seq((7L, "solo", "en"), (8L, "", "en")).toDF("doc_id", "text", "lang")),
      col("lang") === "en", "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(!out.contains(7L) && !out.contains(8L))
  }

  test("broadcast and shuffle LM regimes are bit-identical") {
    val a = NgramLm.perplexityReport(docs, col("lang") === "en", "text", "doc_id",
      carry = Seq("lang"), broadcastLm = true)
      .orderBy("doc_id").collect().toSeq
    val b = NgramLm.perplexityReport(docs, col("lang") === "en", "text", "doc_id",
      carry = Seq("lang"), broadcastLm = false)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
      case _ => p.children ++ p.subqueries
    }
    p +: inner.flatMap(nodes)
  }

  test("plan shape: no tokenizer leak, text never shuffles, no nested-loop join " +
    "(the vocab scalar is an uncorrelated scalar subquery, not a constant-key join)") {
    val df = NgramLm.perplexityReport(docs, col("lang") === "en", "text", "doc_id",
      carry = Seq("lang"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("split("), s"tokenizer leaked into the plan:\n$opt")
    df.collect()
    val all = nodes(df.queryExecution.executedPlan)
    assert(!all.exists(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]),
      s"unbounded join shape in:\n${all.map(_.nodeName).distinct}")
    val shuffleOut = all.collect { case s: ShuffleExchangeLike => s.output.map(_.name) }
    assert(shuffleOut.forall(cols => !cols.contains("text")),
      s"document text crossed an exchange: $shuffleOut")
  }
}
