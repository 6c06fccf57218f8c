package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bigram language-model perplexity scoring — the CCNet quality
  * signal (Wenzek et al. 2020: score web documents by the perplexity
  * of an LM trained on a high-quality corpus; documents the model
  * finds surprising are noise, documents it finds too predictable are
  * boilerplate). There a KenLM 5-gram over Wikipedia; here the
  * engine-portable core: an add-one-smoothed bigram model
  * `p(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V)` trained on a target
  * corpus, scoring every document by mean negative log-probability
  * per bigram (= log perplexity).
  *
  * Determinism discipline (same as [[ImportanceResampling]]): the
  * smoothed log-probability SPLITS as
  * `ln(c12 + 1) - ln(c1 + V)` — a bigram-keyed numerator and a
  * CONTEXT-keyed denominator. Each is rounded to integer microunits
  * at its own table grain (once per distinct bigram / distinct
  * context), per-document scores are exact integer sums, and the two
  * unseen fallbacks are exact constants: an unseen bigram contributes
  * `ln(0 + 1) = 0` to the numerator, an unseen context
  * `ln(0 + V) = ln(V)` to the denominator. No chained coalesce, no
  * order-dependent float summation — the q55 oracle compares
  * hash-exact.
  *
  * Scale shape: [[fit]] collapses the training corpus to the vocab /
  * bigram-type grain with map-side combine (text never shuffles);
  * the vocabulary size is ONE integer, collected eagerly at fit and
  * entering every later expression as a LITERAL (the snapshot
  * discipline of [[QualityClassifier.NbModel]] — the previous scalar
  * subquery re-planned the unigram pass at each of its references,
  * 10 planned exchanges for q55 vs 4 now; a constant-key join was
  * never an option, the optimizer collapses it into a nested-loop
  * join). [[logProb]] is one
  * corpus pass: the bigram stream joins the two model tables —
  * broadcast by default (`broadcastLm = true`; vocab-grain tables
  * fit a broadcast far beyond test scale), or hint-free for
  * planner-chosen shuffle joins when a 100 TB vocabulary outgrows
  * it (the [[Decontamination.reportWith]] regime-switch pattern) —
  * and collapses to the document grain in the pass's only wide
  * exchange. A production pipeline snapshots the fitted model per
  * target-corpus release and scores many shards against it
  * ([[CorpusStats]] discipline); documents with fewer than two
  * tokens have no bigrams and are absent, as in the novelty report.
  */
object NgramLm {

  /** Fitted model: `pairLogNum` (bigram string `g`, `a_micro` =
    * round(ln(c12+1) * 1e6)), `ctxLogDen` (context `w1`, `d_micro` =
    * round(ln(c1+V) * 1e6)) — both lazy, vocab-grain, potentially
    * corpus-vocab-sized; plus the SNAPSHOT scalars `v` (vocabulary
    * size) and `d0Micro` (round(ln(V) * 1e6), the unseen-context
    * denominator), collected once at fit and entering score plans as
    * literals (the [[graft.text.QualityClassifier.NbModel]]
    * discipline — a scalar subquery here would re-plan the unigram
    * pass at every reference; q55 planned 10 exchanges that way, 4
    * with literals). `vocab` keeps the one-row (v, d0_micro) frame as
    * a local relation for snapshot consumers.
    */
  final case class BigramLm(
      pairLogNum: DataFrame,
      ctxLogDen: DataFrame,
      vocab: DataFrame,
      v: Long,
      d0Micro: Long)

  private def bigrams(text: Column): Column =
    ColumnBridge.column(GramOccurrences(ColumnBridge.expression(text), 2, 2))

  private def unigrams(text: Column): Column =
    ColumnBridge.column(GramOccurrences(ColumnBridge.expression(text), 1, 1))

  /** Train on `train`'s `textCol`: unigram context counts, bigram
    * counts, and the vocabulary size (distinct token TYPES), each at
    * its own grain. The two model TABLES stay lazy (they can be
    * vocab-sized); the vocabulary size is ONE integer, so it is
    * collected eagerly — one job over the train subset's vocab grain
    * — and `ln(c1+V)` / `ln(V)` fold it as a literal. Both rounded
    * constants are computed IN-ENGINE (Catalyst round/log over the
    * collected count), bit-identical to the scalar-subquery form.
    */
  def fit(train: DataFrame, textCol: String): BigramLm = {
    val spark = train.sparkSession
    val toks = train.select(explode(unigrams(col(textCol))).as("w"))
    val uni = toks.groupBy(col("w").as("w1")).agg(count(lit(1)).as("__c1"))
    // V = distinct token types = row count of the unigram table: the
    // aggregate runs over the VOCAB-grain frame, not the corpus.
    val v = uni.agg(count(lit(1)).as("v")).collect().head.getLong(0)
    // ln(0) would be NULL and the d0 collect an NPE — fail with a
    // real message when the training predicate matched no tokens
    require(v > 0,
      "NgramLm.fit: training subset has no tokens (empty predicate?) — cannot fit a bigram LM")
    val d0Micro = spark.range(1)
      .select(round(log(lit(v).cast("double")) * lit(1e6)).cast("long"))
      .collect().head.getLong(0)
    import spark.implicits._
    val vocab = Seq((v, d0Micro)).toDF("v", "d0_micro")
    val ctx = uni
      .select(col("w1"),
        round(log((col("__c1") + lit(v)).cast("double")) * lit(1e6))
          .cast("long").as("d_micro"))
    val pairs = train.select(explode(bigrams(col(textCol))).as("g"))
      .groupBy(col("g"))
      .agg(round(log((count(lit(1)) + lit(1)).cast("double")) * lit(1e6))
        .cast("long").as("a_micro"))
    BigramLm(pairs, ctx, vocab, v, d0Micro)
  }

  /** Per-document log-probability report against a fitted (or
    * snapshot) model: (`idCol`, `n_bigrams`, `lp_micro_sum`,
    * `log_ppl`, carry...) — the exact integer sum of per-bigram
    * `a_micro - d_micro` and the mean negative log-probability
    * per bigram (natural-log perplexity exponent), a single exact
    * integer division. Documents with no bigrams are absent.
    */
  def logProb(
      df: DataFrame,
      lm: BigramLm,
      textCol: String,
      idCol: String,
      carry: Seq[String] = Nil,
      broadcastLm: Boolean = true): DataFrame = {
    val hint: DataFrame => DataFrame = if (broadcastLm) broadcast else identity
    val carried = carry.map(c => min(col(c)).as(c))
    val aggs = Seq(
      count(lit(1)).as("n_bigrams"),
      sum(coalesce(col("a_micro"), lit(0L)) -
        coalesce(col("d_micro"), lit(lm.d0Micro))).as("lp_micro_sum")) ++ carried
    df.select(col(idCol) +: col(textCol) +: carry.map(col): _*)
      .select(col(idCol) +: explode(bigrams(col(textCol))).as("g") +: carry.map(col): _*)
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(hint(lm.pairLogNum), Seq("g"), "left")
      .join(hint(lm.ctxLogDen), Seq("w1"), "left")
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("log_ppl",
        (-col("lp_micro_sum")).cast("double") /
          (col("n_bigrams") * lit(1000000L)).cast("double"))
  }

  /** [[fit]] + [[logProb]] end-to-end: train on the `isTarget` subset,
    * score the whole frame.
    */
  def perplexityReport(
      df: DataFrame,
      isTarget: Column,
      textCol: String,
      idCol: String,
      carry: Seq[String] = Nil,
      broadcastLm: Boolean = true): DataFrame =
    logProb(df, fit(df.filter(isTarget), textCol), textCol, idCol, carry, broadcastLm)
}
