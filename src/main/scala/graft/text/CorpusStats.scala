package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics quality signals (engine addition): score each
  * document against n-gram frequencies of the WHOLE corpus, the
  * CCNet-style second pass of a curation pipeline (Wenzek et al. 2020,
  * public paper — there a KenLM perplexity; here the engine-portable
  * integer core of the same idea: how much of a document is made of
  * n-grams the rest of the corpus never uses?).
  *
  * Unlike the per-document gates in [[QualityFilters]] (one stateless
  * scan), this is a genuinely TWO-PASS corpus operator: pass 1 builds
  * the n-gram document-frequency table, pass 2 scores every document
  * against it. High `rare_frac` flags machine-generated noise and
  * boilerplate-free gibberish; very low `rare_frac` plus high
  * `mean_df` flags boilerplate (the same text stamped everywhere).
  *
  * All emitted statistics are integer counts or a single division of
  * two exactly-representable integers, so the DuckDB oracle matches
  * hash-exactly — no order-dependent floating-point summation
  * anywhere.
  *
  * Scale shape: each pass explodes distinct per-document n-grams into
  * a narrow (id, gram) relation — `split` runs once per row and the
  * n-gram array is built once, consumed only by the generate (see
  * [[Decontamination]] on HOF evaluation discipline) — and no
  * exchange ever carries document text. The score join shuffles both
  * sides on the gram; the frequency side partial-aggregates before
  * its exchange (map-side combine absorbs hot n-grams). The two
  * passes each re-scan the corpus: deliberately so — reusing one
  * shuffled exchange for both sides would halve the scans but
  * disqualify the join from AQE skew splitting, and a power-law hot
  * gram with no split is the worse 100 TB failure mode.
  *
  * SKEW ELIGIBILITY (measured, CorpusStatsSpec): AQE's
  * OptimizeSkewedJoin only matches a SortMergeJoin whose children are
  * `Sort` DIRECTLY over a shuffle stage. In the inline
  * [[noveltyReport]] form the df-table's FINAL aggregate sits between
  * its exchange and the join, so the rule never fires there — the
  * spec pins that limitation. The form that actually runs at 100 TB,
  * [[noveltyReportWith]] over a MATERIALIZED `docFrequency` snapshot
  * (a production pipeline snapshots the table per corpus release and
  * reuses it across scoring runs; `noveltyReport` recomputes it
  * inline only because the fixture corpus is the snapshot), plans
  * both join children as Sort-over-shuffle and IS skew-split
  * eligible: CorpusStatsSpec and the ScaleBench
  * `corpus_novelty_hotgram` entry show `SortMergeJoin(skew=true)`
  * splitting a boilerplate hot gram carrying half the corpus's rows,
  * with results identical to the unsplit run.
  */
object CorpusStats {

  /** Document frequency of every distinct n-gram in the corpus: one
    * row per n-gram with the number of documents containing it.
    * Per-document distinctness comes from [[Decontamination.ngramsOfTokens]],
    * so a gram repeated inside one document still counts once.
    */
  def docFrequency(df: DataFrame, textCol: String, n: Int = 2): DataFrame =
    df.select(explode(Decontamination.distinctNgrams(col(textCol), n)).as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("df"))

  /** Top-`k` most document-frequent n-grams per stratum — the
    * boilerplate-discovery report (cookie banners, license headers,
    * navigation chrome surface as grams with outsized df within one
    * source/language; pipelines review this list to seed
    * [[RepeatedSpans.pruneSpans]] / stop-gram filters).
    *
    * Scale shape: the corpus collapses to the (stratum, gram) grain in
    * ONE map-side-combined exchange; the top-k filter `rank <= k` is a
    * LITERAL bound, so Spark plans a partial `WindowGroupLimit` below
    * the window's exchange — each map task forwards at most k gram
    * rows per stratum, and the window input is bounded by tasks x k x
    * strata regardless of vocabulary size. Ties break to the
    * lexicographically smallest gram (total order, oracle-stable).
    */
  def topGrams(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      n: Int = 2,
      k: Int = 10): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    df.select(col(strataCol).as("stratum"),
        explode(Decontamination.distinctNgrams(col(textCol), n)).as("g"))
      .groupBy(col("stratum"), col("g"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("stratum"))
          .orderBy(col("n_docs").desc, col("g").asc)))
      .filter(col("rank") <= k)
  }

  /** Per-document novelty report: distinct n-gram count, how many of
    * those are corpus-rare (document frequency ≤ `rareMaxDf`), the
    * rare fraction, and the mean/max document frequency of the
    * document's n-grams. Documents with fewer than `n` tokens have no
    * n-grams and are absent (scoring them is meaningless, and keeping
    * the explode inner keeps the pass narrow).
    */
  def noveltyReport(
      df: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 2,
      rareMaxDf: Int = 2): DataFrame =
    noveltyReportWith(df, docFrequency(df, textCol, n), textCol, idCol, n, rareMaxDf)

  /** Score documents against a SUPPLIED document-frequency snapshot —
    * the production single-pass form (snapshot `docFrequency` per
    * corpus release, reuse it across scoring runs and the streaming
    * twin). Grams absent from the snapshot are dropped by the inner
    * join — exactly the [[noveltyReport]] semantics when the snapshot
    * IS this corpus's table, which is also why the inline two-pass
    * form needs no row-count correction: every gram then has df >= 1,
    * so the join preserves one row per (doc, distinct gram) and the
    * per-doc row count IS n_ngrams with no second evaluation of the
    * n-gram array.
    */
  def noveltyReportWith(
      df: DataFrame,
      dfTable: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 2,
      rareMaxDf: Int = 2): DataFrame = {
    require(rareMaxDf >= 1, s"rareMaxDf=$rareMaxDf must be >= 1")
    val grams = Decontamination.explodedGrams(df, textCol, idCol, n)
    grams.join(dfTable, Seq("g"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_ngrams"),
        sum(when(col("df") <= rareMaxDf, 1L).otherwise(0L)).as("n_rare"),
        sum(col("df")).as("__cs_sum_df"),
        max(col("df")).as("max_df"))
      .withColumn("rare_frac",
        col("n_rare").cast("double") / col("n_ngrams").cast("double"))
      .withColumn("mean_df",
        col("__cs_sum_df").cast("double") / col("n_ngrams").cast("double"))
      .drop("__cs_sum_df")
  }
}
