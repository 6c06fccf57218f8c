package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-and-quality gates in the style of the published Gopher /
  * C4 curation rules (Rae et al. 2021 §A1.1, Raffel et al. 2020 §2.2 —
  * public papers), adapted to the token domain: documents dominated by
  * repeated tokens or n-grams are low-quality training data and get
  * filtered before tokenization.
  *
  * Every signal is a codegen'd column expression over one `split` of
  * the text — per-row work is bounded by document length (documents
  * are context-window-scale by construction), there are no UDFs, and
  * the whole gate is a single shuffle-free scan at any corpus size.
  * The top-token / top-bigram counts are the O(distinct x n) nested
  * higher-order-function form; that stays cheap because n is a
  * document, not a corpus.
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

  /** Count of occurrences of the most frequent token. */
  def topTokenCount(text: Column): Column = {
    val ts = toks(text)
    array_max(transform(array_distinct(ts), t => size(filter(ts, x => x === t))))
  }

  /** Fraction of adjacent-bigram slots taken by the most frequent
    * bigram (0.0 for single-token docs, which have no bigram slots).
    */
  def topBigramFrac(text: Column): Column = {
    val ts = toks(text)
    val bigrams = transform(sequence(lit(1), size(ts) - 1),
      i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1)))
    when(size(ts) >= 2,
      array_max(transform(array_distinct(bigrams),
        g => size(filter(bigrams, x => x === g)))).cast("double") /
        (size(ts) - 1).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Distinct English stopwords present — the Gopher "must contain
    * stop words" naturalness signal.
    */
  def distinctStopwordCount(text: Column, lang: String = "en"): Column =
    size(array_intersect(array_distinct(toks(text)), lit(TextAnalysis.stopwords(lang).toArray)))

  /** Adds the signal columns and the boolean gate (`keep`, as 0/1 so
    * the oracle compare is engine-neutral) to `df`:
    * `n_tokens, dup_token_frac, top_token_frac, top_bigram_frac,
    * mean_tok_len, n_stop_distinct, keep`.
    */
  def withSignals(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val ts = toks(text)
    val nt = size(ts).cast("double")
    val dupFrac = lit(1.0) - size(array_distinct(ts)).cast("double") / nt
    val topTokFrac = topTokenCount(text).cast("double") / nt
    val meanTokLen = (length(text).cast("double") - (nt - lit(1.0))) / nt
    df.withColumn("n_tokens", size(ts))
      .withColumn("dup_token_frac", dupFrac)
      .withColumn("top_token_frac", topTokFrac)
      .withColumn("top_bigram_frac", topBigramFrac(text))
      .withColumn("mean_tok_len", meanTokLen)
      .withColumn("n_stop_distinct", distinctStopwordCount(text))
      .withColumn("keep",
        (col("n_tokens").between(MinTokens, MaxTokens) &&
          col("dup_token_frac") <= MaxDupTokenFrac &&
          col("top_token_frac") <= MaxTopTokenFrac &&
          col("top_bigram_frac") <= MaxTopBigramFrac &&
          col("mean_tok_len").between(MinMeanTokLen, MaxMeanTokLen) &&
          col("n_stop_distinct") >= MinDistinctStopwords).cast("int"))
  }

  /** The gate applied: only documents passing every rule survive. */
  def gophered(df: DataFrame, textCol: String): DataFrame =
    withSignals(df, textCol).filter(col("keep") === 1)
}
