package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-and-quality gates in the style of the published Gopher /
  * C4 curation rules (Rae et al. 2021 §A1.1, Raffel et al. 2020 §2.2 —
  * public papers), adapted to the token domain: documents dominated by
  * repeated tokens or n-grams are low-quality training data and get
  * filtered before tokenization.
  *
  * Every signal is a codegen'd column expression over ONE materialized
  * `split` of the text — [[withSignals]] binds the token array (and
  * the bigram array) as its own projected column, so every signal and
  * every higher-order-function lambda references a bound attribute;
  * HOF lambdas get no common-subexpression elimination, so an inline
  * `split` tree would re-tokenize per ELEMENT. Per-row work is bounded
  * by document length (documents are context-window-scale by
  * construction), there are no UDFs, and the whole gate is a single
  * shuffle-free scan at any corpus size. The top-token / top-bigram
  * counts are one O(n) pass each via the [[MostFrequentCount]]
  * expression — the naive count-per-distinct-token column form is
  * quadratic on the large documents the gate itself admits
  * (MaxTokens = 100k).
  */
object QualityFilters {

  /** Thresholds of the keep gate (token-domain adaptation of the
    * Gopher rules; values chosen to split the fixture corpus — a real
    * deployment tunes them per source).
    */
  final val MinTokens = 20
  final val MaxTokens = 100000
  final val MaxDupTokenFrac = 0.6
  final val MaxTopTokenFrac = 0.2
  final val MaxTopBigramFrac = 0.1
  final val MinMeanTokLen = 3.0
  final val MaxMeanTokLen = 10.0
  final val MinDistinctStopwords = 2

  private def toks(text: Column): Column = split(text, " ")

  /** Exact count of the most frequent element — the
    * [[MostFrequentCount]] expression: one O(n) hash-map pass, no
    * sort, no per-element lambda dispatch. The naive count-per-
    * distinct-element column form is a real 100 TB cliff, not a style
    * point: MaxTokens admits 100k-token documents, where distinct x n
    * is ~5e9 comparisons for ONE row.
    */
  private def mostFrequentCount(arr: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MostFrequentCount(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(arr)))

  /** Count of occurrences of the most frequent token in an
    * already-tokenized document. `ts` must be a bound attribute; a
    * computed tree here would be rebuilt at each structural
    * reference.
    */
  def topTokenCountOfTokens(ts: Column): Column =
    mostFrequentCount(ts)

  /** Count of occurrences of the most frequent token. Convenience
    * form for ad-hoc column use; hot paths go through a materialized
    * token column + [[topTokenCountOfTokens]].
    */
  def topTokenCount(text: Column): Column = topTokenCountOfTokens(toks(text))

  /** Adjacent space-joined bigrams of an already-tokenized document
    * (empty for single-token docs, which have no bigram slots).
    */
  def bigramsOfTokens(ts: Column): Column =
    when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1), i => array_join(slice(ts, i, lit(2)), " ")))
      .otherwise(typedlit(Seq.empty[String]))

  /** Fraction of adjacent-bigram slots taken by the most frequent
    * bigram, from bound token + bigram attributes — same single-pass
    * exact counting as [[topTokenCountOfTokens]].
    */
  def topBigramFracOfTokens(ts: Column, bigrams: Column): Column =
    when(size(ts) >= 2,
      mostFrequentCount(bigrams).cast("double") /
        (size(ts) - 1).cast("double"))
      .otherwise(lit(0.0))

  /** Fraction of adjacent-bigram slots taken by the most frequent
    * bigram (0.0 for single-token docs). Convenience form — the token
    * array is re-evaluated at each structural reference here; hot
    * paths use [[withSignals]] / the `OfTokens` variants.
    */
  def topBigramFrac(text: Column): Column = {
    val ts = toks(text)
    topBigramFracOfTokens(ts, bigramsOfTokens(ts))
  }

  /** Distinct English stopwords present — the Gopher "must contain
    * stop words" naturalness signal.
    */
  def distinctStopwordCount(text: Column, lang: String = "en"): Column =
    distinctStopwordCountOfTokens(toks(text), lang)

  /** Stopword signal from a bound token attribute. */
  def distinctStopwordCountOfTokens(ts: Column, lang: String = "en"): Column =
    size(array_intersect(array_distinct(ts), lit(TextAnalysis.stopwords(lang).toArray)))

  /** Adds the signal columns and the boolean gate (`keep`, as 0/1 so
    * the oracle compare is engine-neutral) to `df`:
    * `n_tokens, dup_token_frac, top_token_frac, top_bigram_frac,
    * mean_tok_len, n_stop_distinct, keep`.
    *
    * The token and bigram arrays are materialized in their own
    * projections (Catalyst does not collapse projects that would
    * duplicate a non-cheap expression, SPARK-36718), so `split` runs
    * exactly once per row no matter how many signals read it.
    */
  def withSignals(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val ts = col("__qf_toks")
    val bg = col("__qf_bigrams")
    val nt = size(ts).cast("double")
    df.withColumn("__qf_toks", toks(text))
      .withColumn("__qf_bigrams", bigramsOfTokens(ts))
      .withColumn("n_tokens", size(ts))
      .withColumn("dup_token_frac",
        lit(1.0) - size(array_distinct(ts)).cast("double") / nt)
      .withColumn("top_token_frac", topTokenCountOfTokens(ts).cast("double") / nt)
      .withColumn("top_bigram_frac", topBigramFracOfTokens(ts, bg))
      .withColumn("mean_tok_len", (length(text).cast("double") - (nt - lit(1.0))) / nt)
      .withColumn("n_stop_distinct", distinctStopwordCountOfTokens(ts))
      .withColumn("keep",
        (col("n_tokens").between(MinTokens, MaxTokens) &&
          col("dup_token_frac") <= MaxDupTokenFrac &&
          col("top_token_frac") <= MaxTopTokenFrac &&
          col("top_bigram_frac") <= MaxTopBigramFrac &&
          col("mean_tok_len").between(MinMeanTokLen, MaxMeanTokLen) &&
          col("n_stop_distinct") >= MinDistinctStopwords).cast("int"))
      .drop("__qf_toks", "__qf_bigrams")
  }

  /** The gate applied: only documents passing every rule survive.
    *
    * The keep filter must NOT be allowed to push through the signal
    * projections: predicate pushdown substitutes aliases with no cost
    * guard, which would inline every signal's definition — split,
    * bigram construction and all — into one scan-level predicate that
    * re-tokenizes per reference (measured: 21 split sites and ~30x
    * the runtime at sf0.1). The barrier: a non-deterministic column
    * in the projection under the filter, REFERENCED by the filter via
    * an always-true conjunct — pushdown only crosses
    * all-deterministic projects, and the reference keeps column
    * pruning from deleting the barrier (an unused barrier is pruned
    * and the now-deterministic project is pushed through again; a
    * bare non-deterministic conjunct alone also fails, because the
    * rule splits conjunctions and pushes the deterministic part).
    * The column is dropped immediately; the gate's OUTPUT is
    * unchanged and still deterministic. Trade-off: caller predicates
    * above `gophered` stay above the gate too, so filter source
    * columns (partitions, languages) BEFORE gating, not after.
    * TextPlanSpec pins the barrier (one split site in the gated
    * plan). The barrier is [[graft.plans.PushdownFence]] — a
    * dedicated always-true expression whose only job is declaring
    * `deterministic = false`, so the plan names the intent
    * (`pushdown_fence()`) instead of hiding it in a `rand() >= 0`
    * that reads as an accident. It is value-deterministic (retries
    * agree) and, being a stateless leaf, runs unchanged on streaming
    * DataFrames (StreamingOpsSpec pins the parity; streaming rejects
    * `monotonically_increasing_id`, the other idiom).
    *
    * UPGRADE CANARY: this barrier leans on two internal Catalyst
    * behaviors (pushdown refusing non-deterministic projects; column
    * pruning keeping referenced columns). A Spark version bump that
    * relaxes either would silently reintroduce the ~30x
    * re-tokenization — which is exactly what TextPlanSpec's
    * one-split-site assertion exists to catch: keep that spec in any
    * upgrade CI run and treat its failure as this barrier breaking,
    * not as a flaky test. PushdownFenceSpec pins the mechanism in
    * isolation (with-fence vs without-fence plan shapes).
    */
  def gophered(df: DataFrame, textCol: String): DataFrame =
    withSignals(df, textCol)
      .withColumn("__qf_barrier", graft.plans.PushdownFence.fence)
      .filter(col("keep") === 1 && col("__qf_barrier"))
      .drop("__qf_barrier")
}
