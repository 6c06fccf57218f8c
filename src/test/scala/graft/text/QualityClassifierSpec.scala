package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** Seed-trained NB quality gate: exact semantics against a
  * from-first-principles recomputation (llr table, prior, unseen,
  * sigmoid, Pareto keep rule), label handling (null = unlabeled),
  * outside-corpus scoring through the unseen constant, degenerate
  * empty-seed fit, snapshot-model structure (local bucket relation,
  * literal constants), and the score-pass plan pin (one document-grain
  * shuffle, broadcast bucket join, no scalar subqueries).
  */
class QualityClassifierSpec extends SparkSpec {
  import sqlImplicits._

  // Two vocabularies: "good" docs (aa/bb/cc), "bad" docs (xx/yy/zz);
  // docs 7-9 are unlabeled (null) and must not influence the fit.
  private lazy val docs = Seq(
    (1L, "aa bb cc aa bb", Some(true)),
    (2L, "aa cc bb aa", Some(true)),
    (3L, "bb aa cc cc", Some(true)),
    (4L, "xx yy zz xx", Some(false)),
    (5L, "yy zz xx yy zz", Some(false)),
    (6L, "zz xx yy", Some(false)),
    (7L, "aa xx bb yy", None),
    (8L, "cc cc zz", None),
    (9L, "aa bb cc", None)
  ).toDF("doc_id", "text", "label")

  private def grams(text: String): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def md5b(s: String, hexChars: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.substring(0, hexChars)
  }

  private def minstd(id: Long, seed: Long): Long = {
    val m = 2147483647L; val a = 48271L
    val h0 = java.lang.Math.floorMod(id * a + seed % m, m)
    val h1 = java.lang.Math.floorMod(h0 * a, m)
    java.lang.Math.floorMod(h1 * a, m)
  }

  /** From-first-principles expectation of the FULL gate row:
    * (n_grams, score_nano, prob_nano, keep) per doc id.
    */
  private def referenceGate(
      rows: Seq[(Long, String, Option[Boolean])],
      hexChars: Int,
      alpha: Double = 9.0,
      seed: Long = 41L): Map[Long, (Long, Long, Long, Boolean)] = {
    val buckets = math.pow(16, hexChars).toInt
    val seedGrams = rows.collect { case (_, t, Some(pos)) =>
      grams(t).map(g => (md5b(g, hexChars), pos)) }.flatten
    val pc = seedGrams.filter(_._2).groupBy(_._1).map { case (b, x) => b -> x.size.toLong }
    val nc = seedGrams.filterNot(_._2).groupBy(_._1).map { case (b, x) => b -> x.size.toLong }
    val pt = pc.values.sum; val nt = nc.values.sum
    val observed = (pc.keySet ++ nc.keySet)
    val llr = observed.map { b =>
      b -> math.round((math.log((pc.getOrElse(b, 0L) + 1.0) / (pt + buckets.toDouble)) -
        math.log((nc.getOrElse(b, 0L) + 1.0) / (nt + buckets.toDouble))) * 1e9)
    }.toMap
    val unseen = math.round((math.log(1.0 / (pt + buckets.toDouble)) -
      math.log(1.0 / (nt + buckets.toDouble))) * 1e9)
    val nPos = rows.count(_._3.contains(true)).toLong
    val nNeg = rows.count(_._3.contains(false)).toLong
    val prior = math.round((math.log((nPos + 1.0) / (nPos + nNeg + 2.0)) -
      math.log((nNeg + 1.0) / (nPos + nNeg + 2.0))) * 1e9)
    rows.map { case (id, t, _) =>
      val bs = grams(t).map(g => md5b(g, hexChars))
      val score = prior + bs.map(b => llr.getOrElse(b, unseen)).sum
      val prob = math.round(1e9 / (1.0 + math.exp(-score / 1e9)))
      val u = (minstd(id, seed) + 0.5) / 2147483647.0
      val pareto = math.round((math.pow(1.0 - u, -1.0 / alpha) - 1.0) * 1e9)
      id -> (bs.size.toLong, score, prob, pareto > 1000000000L - prob)
    }.toMap
  }

  test("gateReport matches the from-first-principles recomputation exactly") {
    val rows = docs.as[(Long, String, Option[Boolean])].collect().toSeq
    for (hexChars <- Seq(1, 2)) {
      val expected = referenceGate(rows, hexChars)
      val got = QualityClassifier.gateReport(
        docs, col("label"), "text", "doc_id", hexChars = hexChars)
        .select("doc_id", "n_grams", "score_nano", "prob_nano", "keep")
        .as[(Long, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
      assert(got == expected, s"hexChars=$hexChars")
    }
  }

  test("fit counts labeled documents only; unlabeled rows are still scored") {
    val m = QualityClassifier.fit(docs, col("label"), "text")
    assert(m.nPos == 3L && m.nNeg == 3L)
    val scored = QualityClassifier.score(docs, m, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(scored == (1L to 9L).toSet)
  }

  test("good-vocabulary docs score above bad-vocabulary docs; carry survives") {
    val got = QualityClassifier.gateReport(
      docs.withColumn("lang", concat(lit("l"), col("doc_id"))),
      col("label"), "text", "doc_id", carry = Seq("lang"))
      .select("doc_id", "lang", "score_nano")
      .as[(Long, String, Long)].collect()
    val s = got.map(r => r._1 -> r._3).toMap
    assert(Seq(1L, 2L, 3L, 9L).map(s).min > Seq(4L, 5L, 6L, 8L).map(s).max,
      s"expected clean-vocab docs above bad-vocab docs, got $s")
    assert(got.forall(r => r._2 == s"l${r._1}"))
  }

  test("scoring outside the fitted corpus applies unseenNano to novel buckets") {
    val m = QualityClassifier.fit(docs, col("label"), "text")
    val fitted = docs.as[(Long, String, Option[Boolean])].collect()
      .filter(_._3.isDefined).flatMap(r => grams(r._2)).map(g => md5b(g, 2)).toSet
    val novel = (1 to 1000).map(i => s"novel$i").find(t => !fitted(md5b(t, 2))).get
    val out = QualityClassifier.score(
      Seq((99L, novel)).toDF("doc_id", "text"), m, "text", "doc_id")
      .select("n_grams", "score_nano").as[(Long, Long)].head()
    assert(out == ((1L, m.priorNano + m.unseenNano)))
  }

  test("empty seed set degenerates to the zero model and still scores") {
    val m = QualityClassifier.fit(docs, lit(null).cast("boolean"), "text")
    assert(m.nPos == 0L && m.nNeg == 0L && m.priorNano == 0L && m.unseenNano == 0L)
    assert(m.bucketLlr.count() == 0L)
    val out = QualityClassifier.score(docs, m, "text", "doc_id")
      .select("score_nano", "prob_nano").as[(Long, Long)].collect()
    assert(out.length == 9 && out.forall(_ == ((0L, 500000000L))))
  }

  test("the keep gate lets some low-probability docs through at heavy tails") {
    // alpha -> 0+ makes the Pareto noise huge (keep everything);
    // alpha huge makes it ~0 (keep iff prob_nano > 1e9, i.e. nothing).
    val all = QualityClassifier.gateReport(
      docs, col("label"), "text", "doc_id", alpha = 0.05)
      .select("keep").as[Boolean].collect()
    assert(all.forall(identity))
    val none = QualityClassifier.gateReport(
      docs, col("label"), "text", "doc_id", alpha = 1e6)
      .select("keep").as[Boolean].collect()
    assert(!none.exists(identity))
  }

  test("label flip negates every score exactly (NB antisymmetry survives rounding)") {
    // Swapping the classes negates the prior, every bucket llr, and
    // the unseen constant; HALF_UP rounds away from zero, so
    // round(-x) == -round(x) and the integer sums negate EXACTLY.
    def scores(label: org.apache.spark.sql.Column) =
      QualityClassifier.gateReport(docs, label, "text", "doc_id")
        .select("doc_id", "n_grams", "score_nano")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pos = scores(col("label"))
    val neg = scores(!col("label"))
    assert(pos.keySet == neg.keySet)
    pos.foreach { case (id, (n, s)) =>
      assert(neg(id) == ((n, -s)), s"doc $id: $s vs ${neg(id)._2}")
    }
  }

  test("keep sets are nested as alpha tightens the Pareto tail") {
    // (1-u)^(-1/alpha) is pointwise non-increasing in alpha, and
    // HALF_UP rounding is monotone, so a larger alpha can only shrink
    // the keep set — never trade members.
    val keeps = Seq(0.5, 2.0, 9.0, 50.0).map { a =>
      QualityClassifier.gateReport(docs, col("label"), "text", "doc_id", alpha = a)
        .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    }
    keeps.sliding(2).foreach { case Seq(looser, tighter) =>
      assert(tighter.subsetOf(looser), s"$tighter not within $looser")
    }
  }

  private def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(s.plan)
      case _ => p.children ++ p.subqueries
    }
    p +: inner.flatMap(nodes)
  }

  test("snapshot model: local bucket relation, literal constants, 1-shuffle score plan") {
    val m = QualityClassifier.fit(docs, col("label"), "text")
    // the model's bucket table must be a LOCAL relation — broadcasting
    // it costs no job and no scan (the fit ran eagerly, once)
    assert(m.bucketLlr.queryExecution.optimizedPlan.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      m.bucketLlr.queryExecution.optimizedPlan.toString)
    val scored = QualityClassifier.score(docs, m, "text", "doc_id")
    val plan = nodes(scored.queryExecution.executedPlan)
    assert(plan.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      "score must shuffle only at the document grain")
    assert(plan.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      "bucket table must ride a broadcast hash join")
    assert(plan.forall(_.expressions.forall(_.collect {
      case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery => s
    }.isEmpty)), "no scalar subqueries in the score plan")
  }
}
