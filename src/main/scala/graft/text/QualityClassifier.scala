package graft.text

import graft.ops.Sampling
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Seed-trained quality classifier with Pareto-thresholded keeping —
  * the GPT-3/LLaMA curation gate (Brown et al. 2020 appendix A;
  * Touvron et al. 2023): train a linear classifier on hashed gram
  * features with known-good documents as positives and unfiltered
  * documents as negatives, score EVERY document, and keep a document
  * iff `pareto_noise > 1 - p(good)` — the published trick that keeps
  * mostly-high-scoring documents while letting a long tail of
  * low-scoring ones through for diversity (a hard threshold would
  * carve the corpus at one operating point).
  *
  * The classifier is multinomial Naive Bayes over hashed
  * unigram+bigram buckets — fastText's feature space with NB's
  * closed-form fit, so training is ONE aggregation instead of an
  * iterative optimizer and every statistic is oracle-reproducible.
  * Log-odds split per bucket:
  * `llr(b) = ln((pc_b+1)/(pt+B)) - ln((nc_b+1)/(nt+B))` (add-one over
  * the B = 16^hexChars bucket space), plus a document-level prior
  * `ln((np+1)/(n+2)) - ln((nn+1)/(n+2))`.
  *
  * Determinism discipline (the [[ImportanceResampling]] /
  * [[NgramLm]] house rules): every log is rounded ONCE at its own
  * grain — llr per bucket to integer nanounits, the prior once
  * globally — and per-document scores are exact integer sums.
  * `p(good)` is sigmoid of the integer score; it re-enters the exact
  * domain by rounding to nanounits at the DOCUMENT grain, and the
  * keep decision compares INTEGERS: `pareto_nano > 1e9 - prob_nano`.
  * The Pareto noise derives from the [[Sampling.sampleScore]] MINSTD
  * stream (plain BIGINT arithmetic, engine-portable), so membership
  * is a pure function of (doc id, seed, corpus counts) and the q57
  * oracle reproduces the exact keep set.
  *
  * Scale shape: [[fit]] collapses the seed documents to the
  * FIXED-SIZE bucket grain (16^hexChars rows) in one map-side-
  * combined exchange — gram text never crosses an exchange
  * ([[GramOccurrences]] byte-span views); the prior and totals ride
  * scalar subqueries over that fixed-size table. [[score]] is one
  * corpus pass: grams broadcast-join the (always broadcastable)
  * bucket table and collapse to the document grain. Fit/score as
  * separate passes is the [[CorpusStats]] snapshot discipline — a
  * production pipeline fits on seeds once per release and scores
  * every shard/stream against the frozen table.
  */
object QualityClassifier {

  /** Fitted model: `bucketLlr` (bucket `b`, `llr_nano`) over observed
    * buckets; `priors` (ONE row: `n_pos`, `n_neg`, `prior_nano`,
    * `unseen_nano` — the smoothed llr of a bucket no seed hit, for
    * scoring outside the fitted corpus).
    */
  final case class NbModel(bucketLlr: DataFrame, priors: DataFrame, hexChars: Int)

  /** Train on the labeled subset of `df`: rows where `isPositive` is
    * true are good-seed documents, rows where it is false are
    * negative seeds, rows where it is NULL are unlabeled and ignored
    * by the fit (they are still scorable). One corpus pass to the
    * bucket grain; doc-level seed counts ride a second, seed-sized
    * aggregation.
    */
  def fit(
      df: DataFrame,
      isPositive: Column,
      textCol: String,
      hexChars: Int = 2): NbModel = {
    val buckets = numBuckets(hexChars)
    val seeds = df.select(isPositive.as("__pos"), col(textCol))
      .filter(col("__pos").isNotNull)
    val stats = seeds
      .select(col("__pos"),
        explode(ImportanceResampling.gramOccurrences(col(textCol))).as("__g"))
      .select(col("__pos"),
        ImportanceResampling.bucketOf(col("__g"), hexChars).as("b"))
      .groupBy(col("b"))
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("__pc"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__nc"))
    // Gram totals per class: scalar aggregates over the FIXED-SIZE
    // bucket table (<= 16^hexChars rows) — constant work at any
    // corpus scale, and subquery reuse shares the bucket exchange.
    val pt = ColumnBridge.scalar(stats.agg(sum(col("__pc"))))
    val nt = ColumnBridge.scalar(stats.agg(sum(col("__nc"))))
    val bucketLlr = stats.select(
      col("b"),
      llrNano(col("__pc"), pt, col("__nc"), nt, buckets))
    val priors = seeds
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("n_neg"))
      .select(
        col("n_pos"), col("n_neg"),
        round((log((col("n_pos") + lit(1)).cast("double") /
                   (col("n_pos") + col("n_neg") + lit(2)).cast("double")) -
               log((col("n_neg") + lit(1)).cast("double") /
                   (col("n_pos") + col("n_neg") + lit(2)).cast("double"))) * lit(1e9))
          .cast("long").as("prior_nano"),
        round((log(lit(1.0) / (pt + lit(buckets)).cast("double")) -
               log(lit(1.0) / (nt + lit(buckets)).cast("double"))) * lit(1e9))
          .cast("long").as("unseen_nano"))
    NbModel(bucketLlr, priors, hexChars)
  }

  private def numBuckets(hexChars: Int): Int = {
    require(hexChars >= 1 && hexChars <= 7, s"hexChars=$hexChars must be in [1, 7]")
    var b = 1
    (0 until hexChars).foreach(_ => b *= 16)
    b
  }

  private def llrNano(pc: Column, pt: Column, nc: Column, nt: Column, buckets: Int): Column =
    round(
      (log((pc + lit(1)).cast("double") / (pt + lit(buckets)).cast("double")) -
        log((nc + lit(1)).cast("double") / (nt + lit(buckets)).cast("double"))) * lit(1e9))
      .cast("long").as("llr_nano")

  /** Score every document of `df` against a fitted (or snapshot)
    * model and decide keeping:
    *
    * (`idCol`, carry..., `n_grams`, `score_nano` — prior + exact
    * integer sum of bucket llrs, `prob_nano` — round(sigmoid(score)
    * * 1e9), `keep` — `pareto_nano > 1e9 - prob_nano` with
    * `pareto_nano = round(((1-u)^(-1/alpha) - 1) * 1e9)` and `u`
    * uniform from the MINSTD stream of (`idCol`, seed)).
    *
    * Buckets absent from the model (possible only when scoring
    * outside the fitted corpus) contribute the priors' `unseen_nano`.
    * Documents with NO grams (empty/null text) are absent, as in the
    * novelty and perplexity reports.
    *
    * `alpha` is the Pareto shape — 9 in the GPT-3 configuration;
    * larger keeps the gate tighter around high scores.
    */
  def score(
      df: DataFrame,
      model: NbModel,
      textCol: String,
      idCol: String,
      carry: Seq[String] = Nil,
      alpha: Double = 9.0,
      seed: Long = 41L): DataFrame = {
    require(alpha > 0.0, s"alpha=$alpha must be positive")
    val prior = ColumnBridge.scalar(model.priors.select(col("prior_nano")))
    val unseen = ColumnBridge.scalar(model.priors.select(col("unseen_nano")))
    val carried = carry.map(c => min(col(c)).as(c))
    val aggs = Seq(
      count(lit(1)).as("n_grams"),
      (sum(coalesce(col("llr_nano"), unseen)) + prior).as("score_nano")) ++ carried
    val u = (Sampling.sampleScore(col(idCol), seed).cast("double") + lit(0.5)) /
      lit(2147483647.0)
    val paretoNano =
      round((pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)) * lit(1e9)).cast("long")
    df.select(col(idCol) +: col(textCol) +: carry.map(col): _*)
      .select(col(idCol) +:
        explode(ImportanceResampling.gramOccurrences(col(textCol))).as("__g") +:
        carry.map(col): _*)
      .select(col(idCol) +:
        ImportanceResampling.bucketOf(col("__g"), model.hexChars).as("b") +:
        carry.map(col): _*)
      .join(broadcast(model.bucketLlr), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("prob_nano",
        round(lit(1e9) / (lit(1.0) + exp(-col("score_nano").cast("double") / lit(1e9))))
          .cast("long"))
      .withColumn("keep", paretoNano > lit(1000000000L) - col("prob_nano"))
  }

  /** [[fit]] + [[score]] end-to-end — two corpus passes by design
    * (snapshot discipline; see the object Scaladoc).
    */
  def gateReport(
      df: DataFrame,
      isPositive: Column,
      textCol: String,
      idCol: String,
      carry: Seq[String] = Nil,
      hexChars: Int = 2,
      alpha: Double = 9.0,
      seed: Long = 41L): DataFrame =
    score(df, fit(df, isPositive, textCol, hexChars), textCol, idCol, carry, alpha, seed)
}
