package graft.text

import graft.ops.Sampling
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * ([[GramOccurrences]] byte-span views) — and SNAPSHOTS it: the
  * fitted model is a collected local bucket table plus plain Long
  * constants that enter score plans as literals (never scalar
  * subqueries, which would re-plan the fit pass per reference, nor
  * constant-key joins, which the optimizer folds into nested-loop
  * joins). [[score]] is one corpus pass: grams broadcast-join the
  * (local, job-free) bucket table and collapse to the document
  * grain. Fit/score as
  * separate passes is the [[CorpusStats]] snapshot discipline — a
  * production pipeline fits on seeds once per release and scores
  * every shard/stream against the frozen table.
  */
object QualityClassifier {

  /** Fitted model — a SNAPSHOT, not a lazy plan (the
    * [[Decontamination.gramBloom]] discipline: a production pipeline
    * fits once per release and scores every shard against the frozen
    * artifact). `bucketLlr` is a materialized LOCAL relation (bucket
    * `b`, `llr_nano`) over the <= 16^hexChars observed buckets —
    * broadcast-joining it costs no job; the class/document counts and
    * the derived constants (`priorNano`; `unseenNano` — the smoothed
    * llr of a bucket no seed hit, for scoring outside the fitted
    * corpus) are plain driver values that enter score plans as
    * literals, never as scalar subqueries that would re-plan the fit
    * pass per reference.
    */
  final case class NbModel(
      bucketLlr: DataFrame,
      nPos: Long,
      nNeg: Long,
      priorNano: Long,
      unseenNano: Long,
      hexChars: Int)

  /** Train on the labeled subset of `df`: rows where `isPositive` is
    * true are good-seed documents, rows where it is false are
    * negative seeds, rows where it is NULL are unlabeled and ignored
    * by the fit (they are still scorable). EAGER: one corpus pass
    * collapses the seeds to the fixed-size bucket grain and collects
    * it (<= 16^hexChars tiny rows), plus one seed-sized aggregation
    * for the document priors. All rounded statistics are computed
    * IN-ENGINE over the collected integers (literal folding through
    * Catalyst's own round/log), so they are bit-identical to the
    * previous all-lazy form and to the ANSI oracle.
    */
  def fit(
      df: DataFrame,
      isPositive: Column,
      textCol: String,
      hexChars: Int = 2): NbModel = {
    val buckets = numBuckets(hexChars)
    val spark = df.sparkSession
    val seeds = df.select(isPositive.as("__pos"), col(textCol))
      .filter(col("__pos").isNotNull)
    val statRows = seeds
      .select(col("__pos"),
        explode(ImportanceResampling.gramOccurrences(col(textCol))).as("__g"))
      .select(col("__pos"),
        ImportanceResampling.bucketOf(col("__g"), hexChars).as("b"))
      .groupBy(col("b"))
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("__pc"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("__nc"))
      .collect()
    // Exact integer gram totals per class — driver sums over the
    // bounded bucket table, no float involved.
    val pt = statRows.map(_.getLong(1)).sum
    val nt = statRows.map(_.getLong(2)).sum
    val priorRow = seeds
      .agg(
        sum(when(col("__pos"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("n_neg"))
      .collect().head
    val nPos = if (priorRow.isNullAt(0)) 0L else priorRow.getLong(0)
    val nNeg = if (priorRow.isNullAt(1)) 0L else priorRow.getLong(1)
    // Rounded model constants and the per-bucket llr are evaluated by
    // Spark's OWN round/log expressions (over a local relation /
    // literals), keeping double->nano rounding bit-identical to the
    // lazy column form — driver math.round would diverge on negative
    // half-way values (floor(x+0.5) vs HALF_UP).
    import spark.implicits._
    val bucketLlr = statRows.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toDF("b", "__pc", "__nc")
      .select(col("b"),
        llrNano(col("__pc"), lit(pt), col("__nc"), lit(nt), buckets))
    val consts = spark.range(1).select(
      round((log((lit(nPos) + lit(1)).cast("double") /
                 (lit(nPos) + lit(nNeg) + lit(2)).cast("double")) -
             log((lit(nNeg) + lit(1)).cast("double") /
                 (lit(nPos) + lit(nNeg) + lit(2)).cast("double"))) * lit(1e9))
        .cast("long").as("prior_nano"),
      round((log(lit(1.0) / (lit(pt) + lit(buckets)).cast("double")) -
             log(lit(1.0) / (lit(nt) + lit(buckets)).cast("double"))) * lit(1e9))
        .cast("long").as("unseen_nano"))
      .collect().head
    NbModel(bucketLlr, nPos, nNeg, consts.getLong(0), consts.getLong(1), hexChars)
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
    * outside the fitted corpus) contribute `model.unseenNano`.
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
    graft.ops.Sampling.requireIntegralId(df, idCol, "QualityClassifier.score")
    val carried = carry.map(c => min(col(c)).as(c))
    val aggs = Seq(
      count(lit(1)).as("n_grams"),
      (sum(coalesce(col("llr_nano"), lit(model.unseenNano))) +
        lit(model.priorNano)).as("score_nano")) ++ carried
    val u = (Sampling.sampleScore(col(idCol), seed).cast("double") + lit(0.5)) /
      lit(2147483647.0)
    // The noise is clamped at 2e9 BEFORE the long cast: the keep rule
    // compares it against 1e9 - prob_nano <= 1e9, so any value past
    // the clamp decides identically, and small alphas (heavy tails)
    // can push the raw double past Long range, which ANSI cast rejects.
    val paretoNano =
      round(least((pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0)) * lit(1e9),
        lit(2e9))).cast("long")
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
