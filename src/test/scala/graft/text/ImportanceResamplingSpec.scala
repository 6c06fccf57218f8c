package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** DSIR importance weighting: semantics against a from-first-
  * principles recomputation, self-scoring completeness, unseen-bucket
  * handling, Gumbel top-k determinism, and the scale-shape plan pins
  * (two gram passes, broadcast bucket join, TakeOrderedAndProject
  * resampling, no corpus-width shuffles beyond the document grain).
  */
class ImportanceResamplingSpec extends SparkSpec {
  import sqlImplicits._

  // Small bimodal corpus: "target-ish" docs reuse the aa/bb/cc
  // vocabulary, "raw-ish" docs the xx/yy/zz one; doc 7 mixes.
  private lazy val docs = Seq(
    (1L, "aa bb cc aa bb", "en"),
    (2L, "aa cc bb aa", "en"),
    (3L, "bb aa cc cc", "en"),
    (4L, "xx yy zz xx", "de"),
    (5L, "yy zz xx yy zz", "de"),
    (6L, "zz xx yy", "fr"),
    (7L, "aa xx bb yy", "es")
  ).toDF("doc_id", "text", "lang")

  private def grams(text: String): Seq[String] = {
    val toks = text.split(" ", -1).toSeq
    toks ++ toks.sliding(2).filter(_.size == 2).map(_.mkString(" "))
  }

  private def md5b(s: String, hexChars: Int): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.substring(0, hexChars)
  }

  /** From-first-principles reference: bucket counts, smoothed nano
    * log-ratios, exact integer per-doc sums.
    */
  private def referenceWeights(
      rows: Seq[(Long, String, String)], hexChars: Int): Map[Long, (Long, Long)] = {
    val buckets = math.pow(16, hexChars).toInt
    val all = rows.flatMap { case (id, t, lang) => grams(t).map(g => (id, md5b(g, hexChars), lang)) }
    val rc = all.groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val tc = all.filter(_._3 == "en").groupBy(_._2).map { case (b, xs) => b -> xs.size.toLong }
    val rt = rc.values.sum; val tt = tc.values.sum
    val lr = rc.map { case (b, r) =>
      val t = tc.getOrElse(b, 0L)
      b -> math.round((math.log((t + 1.0) / (tt + buckets.toDouble)) -
        math.log((r + 1.0) / (rt + buckets.toDouble))) * 1e9)
    }
    all.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.size.toLong, xs.map(x => lr(x._2)).sum)
    }
  }

  test("weightsReport matches the from-first-principles recomputation exactly") {
    val rows = docs.as[(Long, String, String)].collect().toSeq
    for (hexChars <- Seq(1, 2)) {
      val expected = referenceWeights(rows, hexChars)
      val got = ImportanceResampling.weightsReport(
        docs, col("lang") === "en", "text", "doc_id", hexChars = hexChars)
        .select("doc_id", "n_grams", "weight_nano")
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(got == expected, s"hexChars=$hexChars")
    }
  }

  test("target-vocabulary docs score above off-target docs; the mixed doc sits between") {
    val w = ImportanceResampling.weightsReport(
      docs, col("lang") === "en", "text", "doc_id")
      .select("doc_id", "weight_nano").as[(Long, Long)].collect().toMap
    val target = Seq(1L, 2L, 3L).map(w); val off = Seq(4L, 5L, 6L).map(w)
    assert(target.min > w(7L) && w(7L) > off.max,
      s"expected target > mixed > off-target, got $w")
  }

  test("self-scoring never hits the unseen-bucket default") {
    // poison default: if any gram missed the fitted table, sums shift
    val lr = ImportanceResampling.fitLogRatios(docs, col("lang") === "en", "text")
    val clean = ImportanceResampling.weights(docs, lr, "text", "doc_id")
      .select("doc_id", "weight_nano").as[(Long, Long)].collect().toMap
    val poisoned = ImportanceResampling.weights(
      docs, lr, "text", "doc_id", defaultNano = 999999999L)
      .select("doc_id", "weight_nano").as[(Long, Long)].collect().toMap
    assert(clean == poisoned)
  }

  test("scoring an outside frame applies unseenBucketNano to novel grams") {
    val lr = ImportanceResampling.fitLogRatios(docs, col("lang") === "en", "text")
    val (tt, rt) = {
      val rows = docs.as[(Long, String, String)].collect().toSeq
      val all = rows.flatMap { case (_, t, lang) => grams(t).map(g => (g, lang)) }
      (all.count(_._2 == "en").toLong, all.size.toLong)
    }
    val default = ImportanceResampling.unseenBucketNano(tt, rt)
    // one token no fitted doc contains: its unigram bucket is unseen
    // with probability 255/256 — pick one whose bucket IS unseen
    val fitted = docs.as[(Long, String, String)].collect()
      .flatMap(r => grams(r._2)).map(g => md5b(g, 2)).toSet
    val novel = (1 to 1000).map(i => s"novel$i").find(t => !fitted(md5b(t, 2))).get
    val out = ImportanceResampling.weights(
      Seq((99L, novel)).toDF("doc_id", "text"), lr, "text", "doc_id",
      defaultNano = default)
      .select("n_grams", "weight_nano").as[(Long, Long)].head()
    assert(out == ((1L, default)))
  }

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
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

  test("plan shape: two gram passes, no tokenizer leak, broadcast bucket join, " +
    "document text never shuffles") {
    val df = ImportanceResampling.weightsReport(
      docs, col("lang") === "en", "text", "doc_id", carry = Seq("lang"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert("gram_occurrences\\(".r.findAllIn(opt).length == 2,
      s"expected 2 gram_occurrences sites (fit + score), plan:\n$opt")
    assert(!opt.contains("split("), s"tokenizer leaked into the plan:\n$opt")
    val all = nodes(finalPlan(df))
    assert(all.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"bucket table should broadcast-join the gram stream")
    val shuffleOut = all.collect { case s: ShuffleExchangeLike => s.output.map(_.name) }
    assert(shuffleOut.forall(cols => !cols.contains("text")),
      s"document text crossed an exchange: $shuffleOut")
  }

  test("gumbelTopK: deterministic per seed, k rows, plans TakeOrderedAndProject") {
    val w = ImportanceResampling.weightsReport(
      docs, col("lang") === "en", "text", "doc_id")
    val a = ImportanceResampling.gumbelTopK(w, "doc_id", 3, seed = 7L)
    val b = ImportanceResampling.gumbelTopK(w, "doc_id", 3, seed = 7L)
    val ra = a.select("doc_id").as[Long].collect().toSet
    assert(ra == b.select("doc_id").as[Long].collect().toSet)
    assert(ra.size == 3)
    assert(nodes(finalPlan(a)).exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      "resampling must plan per-partition top-k, not a global sort")
    // exp(weight) gaps between the vocab modes dwarf Gumbel noise at
    // nano scale only in expectation — assert the invariant that holds
    // surely: selection is a subset of the input ids
    assert(ra.subsetOf(Set(1L, 2L, 3L, 4L, 5L, 6L, 7L)))
  }

  test("gumbelTopK favors high-importance docs: across seeds, target docs dominate") {
    val w = ImportanceResampling.weightsReport(
      docs, col("lang") === "en", "text", "doc_id")
    val picks = (1L to 20L).flatMap(s =>
      ImportanceResampling.gumbelTopK(w, "doc_id", 2, seed = s)
        .select("doc_id").as[Long].collect())
    val targetShare = picks.count(Set(1L, 2L, 3L)).toDouble / picks.size
    assert(targetShare >= 0.8, s"target docs picked only ${targetShare * 100}% of the time")
  }
}
