package graft.text

import graft.ops.GroupStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus data-card report — the per-stratum summary a dataset release
  * ships with (public lineage: "Datasheets for Datasets" / model-card
  * practice, and the corpus composition tables in the LLM corpus
  * papers: docs, tokens, dup share and quality per source × language).
  * Everything downstream mixing decides on — stratum sizes for
  * temperature mixing ([[graft.ops.Sampling.temperatureMix]]), dup
  * shares for dedup budgeting, token distributions for packing
  * capacity — reads off this one table.
  *
  * Scale shape: ONE corpus scan computes the per-doc row (token count,
  * md5 fingerprint, quality — text is DROPPED after this projection);
  * the exact-dup share derives from a corpus-wide fingerprint
  * aggregate joined back on the 32-hex key it was just shuffled on;
  * the stratum rollup is a map-side-combined aggregate to the (tiny)
  * stratum grain. Text never crosses an exchange.
  *
  * Determinism discipline: sums are exact BIGINTs (quality rounded
  * ONCE per doc to integer nanounits — the [[graft.text.NgramLm]]
  * convention), means are divisions of those exact integers, and the
  * token median is the exact interpolated `percentile`
  * ([[GroupStats.exactMedian]] — oracle-parity with DuckDB
  * `quantile_cont`).
  */
object DataCard {

  /** `(strataCols..., n_docs, n_dup_docs, sum_tokens, mean_tokens,
    * p50_tokens, max_tokens, sum_quality_nano)` — one row per stratum.
    * `n_dup_docs` counts documents whose exact text fingerprint occurs
    * >= 2 times CORPUS-WIDE (a cross-stratum duplicate counts in both
    * strata — the "how much of this source is copies" number).
    */
  /** SCALE NOTE: `exact = true` (the oracle form) uses Spark's exact
    * `percentile`, whose aggregation buffer holds every distinct value
    * with counts PER GROUP — fine up to millions of docs per stratum,
    * wrong at web scale. `exact = false` swaps in the bounded-memory
    * t-digest sketch ([[GroupStats.approxMedian]]) — the 100 TB form,
    * same plan shape, median within sketch tolerance.
    */
  def report(
      df: DataFrame,
      textCol: String,
      idCol: String,
      strataCols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(strataCols.nonEmpty, "at least one stratum column")
    require(!df.columns.contains("__dc_toks"),
      "input must not contain reserved column __dc_toks")
    // BIND the token array to an attribute before multi-referencing it
    // (the TextAnalysis discipline: Catalyst does not de-duplicate
    // structural references to non-cheap trees, so the raw split tree
    // re-tokenized every document ~7x across size() + the quality
    // score's internal uses — review r19)
    val toksCol = col("__dc_toks")
    // null text counts as 0 tokens / 0 quality (coalesce), so every
    // stat aggregates over the SAME population n_docs reports — bare
    // NULLs would drop those docs from sums/median/max while still
    // inflating the mean's denominator
    val perDoc = df
      .withColumn("__dc_toks", TextAnalysis.tokens(col(textCol)))
      .select(
      (strataCols.map(col) :+
        col(idCol) :+
        coalesce(size(toksCol), lit(0)).as("__nt") :+
        // null text fingerprints to a sentinel (all-null texts are one
        // duplicate group) — a bare md5(NULL) is NULL and the inner
        // copies join would silently drop those docs from every stat
        coalesce(md5(col(textCol).cast("binary")), lit("__null_text__")).as("__fp") :+
        coalesce(round(TextAnalysis.qualityScoreOfTokens(toksCol, col(textCol)) * lit(1e9))
          .cast("long"), lit(0L)).as("__qn")): _*)
    val copies = perDoc.groupBy(col("__fp")).agg(count(lit(1)).as("__copies"))
    perDoc
      .join(copies, "__fp")
      .groupBy(strataCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum((col("__copies") > 1).cast("long")).as("n_dup_docs"),
        sum(col("__nt")).cast("long").as("sum_tokens"),
        (if (exact) GroupStats.exactMedian(col("__nt"))
         else GroupStats.approxMedian(col("__nt")).cast("double")).as("p50_tokens"),
        max(col("__nt")).as("max_tokens"),
        sum(col("__qn")).as("sum_quality_nano"))
      .withColumn("mean_tokens",
        col("sum_tokens").cast("double") / col("n_docs"))
      .select(
        (strataCols.map(col) :+ col("n_docs") :+ col("n_dup_docs") :+
          col("sum_tokens") :+ col("mean_tokens") :+ col("p50_tokens") :+
          col("max_tokens") :+ col("sum_quality_nano")): _*)
  }
}
