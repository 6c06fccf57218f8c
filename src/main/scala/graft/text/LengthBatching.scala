package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Length-bucketed batching (engine addition): group documents of
  * similar token length into fixed-size training batches so each
  * batch pads to its own max length instead of the corpus max — the
  * standard padding-efficiency move for non-packed (padded) training.
  *
  * Bucketing is pure integer arithmetic (`bucket = n_tokens div
  * bucketWidth`), and the within-bucket batch ordinal REUSES
  * [[SequencePacking]]'s machinery: assigning unit "token" counts
  * with capacity `batchSize` makes the packing bin exactly
  * `floor(rank_in_bucket / batchSize)` — so both the window form and
  * the chunked-prefix-sum distributed form (and their pinned
  * bit-identity) come for free, and the scale analysis is
  * [[SequencePacking]]'s: one hash exchange on the bucket column;
  * parallelism = buckets (window form) or buckets x chunks
  * (distributed form, the dominant-bucket 100 TB path).
  *
  * The token count is pluggable: [[assignBatches]] counts whitespace
  * words ([[TextAnalysis.tokenCount]]); [[assignBatchesByBpe]] counts
  * trained-tokenizer tokens ([[BpeTokenizer.countsFromModel]]) — what
  * the accelerator actually pads; [[assignBatchesFromCounts]] takes
  * any pre-computed count column (an upstream pass that already
  * collapsed text to the document grain).
  */
object LengthBatching {

  /** Per-document batch assignment: adds `n_tokens`, `bucket`,
    * `batch_id` to `df`. `idCol` must be unique (it orders documents
    * inside a bucket) and integral when `distributed = true` (the
    * chunked form's contract).
    */
  def assignBatches(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bucketWidth: Int,
      batchSize: Int,
      distributed: Boolean = false,
      numChunks: Int = 64): DataFrame = {
    require(!df.columns.contains("n_tokens"),
      "input must not contain reserved column n_tokens")
    assignBatchesFromCounts(
      df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long")),
      "n_tokens", idCol, bucketWidth, batchSize, distributed, numChunks)
  }

  /** [[assignBatches]] over a PRE-COMPUTED token-count column: adds
    * `bucket` and `batch_id` (the count column rides through under
    * its own name). This is the core the whitespace and BPE facades
    * share — same bucketing arithmetic, same [[SequencePacking]]
    * rank machinery, any count unit.
    */
  def assignBatchesFromCounts(
      df: DataFrame,
      tokensCol: String,
      idCol: String,
      bucketWidth: Int,
      batchSize: Int,
      distributed: Boolean = false,
      numChunks: Int = 64): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    require(batchSize > 0, s"batchSize=$batchSize must be positive")
    // the output columns too: a pre-existing bucket would be silently
    // replaced AND re-selected twice (ambiguous downstream)
    val reserved = Seq("__lb_one", "bucket", "batch_id", "start_offset", "bin")
    reserved.foreach(c => require(!df.columns.contains(c), s"input must not contain reserved column $c"))
    // Integral `div`, not `Column./` + floor: double division loses
    // exactness past 2^53, and this is a generic entry point for
    // arbitrary caller-supplied count columns (the repo-wide
    // div-vs-slash convention — see chunksByBpe, videoDupPairs). The
    // bigint cast keeps fractional count columns working (truncation,
    // identical to the old floor for non-negative counts). A NEGATIVE
    // count fails fast: a token count cannot be negative, and div's
    // truncation toward zero would silently merge legacy -1 sentinels
    // into bucket 0 with genuinely empty documents (nulls ride through
    // as null buckets, matching the facades' null-count behavior).
    val bucketed = df
      .withColumn("bucket",
        when(col(tokensCol) < 0, raise_error(lit(
          s"assignBatchesFromCounts: negative $tokensCol — token counts must be >= 0 " +
            "(a -1 missing-count sentinel would silently land in bucket 0)")))
          .otherwise(expr(s"cast(`$tokensCol` as bigint) div ${bucketWidth.toLong}")))
      .withColumn("__lb_one", lit(1L))
    val assigned =
      if (distributed)
        SequencePacking.assignBinsDistributedFromCounts(
          bucketed, "__lb_one", "bucket", idCol, batchSize, numChunks)
      else
        SequencePacking.assignBinsFromCounts(bucketed, "__lb_one", "bucket", idCol, batchSize)
    assigned
      .withColumn("batch_id", col("bin"))
      .select((df.columns.toIndexedSeq.map(col) ++ Seq(col("bucket"), col("batch_id"))): _*)
  }

  /** [[assignBatches]] by BPE token count: adds `n_bpe_tokens`,
    * `bucket`, `batch_id`. Buckets then reflect PADDED accelerator
    * cost in real tokens — whitespace buckets drift from it by each
    * document's tokens-per-word fertility (see
    * [[BpeTokenizer.countsFromModel]]). `idCol` must be globally
    * unique (it keys the count join and orders within buckets).
    */
  def assignBatchesByBpe(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: BpeTokenizer.BpeModel,
      bucketWidth: Int,
      batchSize: Int,
      distributed: Boolean = false,
      numChunks: Int = 64): DataFrame =
    assignBatchesFromCounts(
      BpeTokenizer.countsFromModel(df, textCol, idCol, model),
      "n_bpe_tokens", idCol, bucketWidth, batchSize, distributed, numChunks)

  /** Batch manifest: one row per (bucket, batch_id) with document and
    * token counts, the padded cost (`n_docs x max_tokens` — what the
    * accelerator actually processes), and the padding efficiency
    * (real tokens / padded tokens). The batching exchange on `bucket`
    * also satisfies this groupBy's clustering, so the summary adds no
    * second data-plane shuffle.
    */
  def batchSummary(
      df: DataFrame,
      textCol: String,
      idCol: String,
      bucketWidth: Int,
      batchSize: Int,
      distributed: Boolean = false): DataFrame =
    summarize(assignBatches(df, textCol, idCol, bucketWidth, batchSize, distributed), "n_tokens")

  /** [[batchSummary]] with BPE token counts (see
    * [[assignBatchesByBpe]]) — `max_tokens`/`sum_tokens`/
    * `padded_tokens`/`pad_efficiency` are then measured in trained
    * tokenizer tokens, the unit the padded batch actually costs.
    */
  def batchSummaryByBpe(
      df: DataFrame,
      textCol: String,
      idCol: String,
      model: BpeTokenizer.BpeModel,
      bucketWidth: Int,
      batchSize: Int,
      distributed: Boolean = false): DataFrame =
    summarize(
      assignBatchesByBpe(df, textCol, idCol, model, bucketWidth, batchSize, distributed),
      "n_bpe_tokens")

  private def summarize(assigned: DataFrame, tokensCol: String): DataFrame =
    assigned
      .groupBy(col("bucket"), col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col(tokensCol)).as("max_tokens"),
        sum(col(tokensCol)).as("sum_tokens"),
        (count(lit(1)) * max(col(tokensCol))).as("padded_tokens"))
      // try_divide: bucket 0 can hold all-empty documents (0 tokens,
      // 0 padded cost) — its efficiency is undefined, and ANSI x/0
      // would kill the whole manifest for it. NULL matches SQL (and
      // the DuckDB oracle's) division semantics exactly.
      .withColumn("pad_efficiency",
        try_divide(col("sum_tokens").cast("double"), col("padded_tokens").cast("double")))
}
