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
    require(bucketWidth > 0, s"bucketWidth=$bucketWidth must be positive")
    require(batchSize > 0, s"batchSize=$batchSize must be positive")
    // the output columns too: a pre-existing n_tokens would be
    // silently replaced AND re-selected twice (ambiguous downstream)
    val reserved = Seq("__lb_one", "n_tokens", "bucket", "batch_id", "start_offset", "bin")
    reserved.foreach(c => require(!df.columns.contains(c), s"input must not contain reserved column $c"))
    val bucketed = df
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("bucket", floor(col("n_tokens") / lit(bucketWidth.toLong)))
      .withColumn("__lb_one", lit(1L))
    val assigned =
      if (distributed)
        SequencePacking.assignBinsDistributedFromCounts(
          bucketed, "__lb_one", "bucket", idCol, batchSize, numChunks)
      else
        SequencePacking.assignBinsFromCounts(bucketed, "__lb_one", "bucket", idCol, batchSize)
    assigned
      .withColumn("batch_id", col("bin"))
      .select((df.columns.map(col) ++ Seq(col("n_tokens"), col("bucket"), col("batch_id"))): _*)
  }

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
    assignBatches(df, textCol, idCol, bucketWidth, batchSize, distributed)
      .groupBy(col("bucket"), col("batch_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).as("sum_tokens"),
        (count(lit(1)) * max(col("n_tokens"))).as("padded_tokens"))
      .withColumn("pad_efficiency",
        col("sum_tokens").cast("double") / col("padded_tokens").cast("double"))
}
