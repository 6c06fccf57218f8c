package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-aware sequence packing (engine addition): assign documents to
  * fixed-capacity context windows ("bins") without splitting a
  * document — the batch-construction step of an LLM training pipeline.
  *
  * Strict first-fit packing is inherently sequential (each decision
  * depends on every earlier bin's fill), so it cannot be expressed as
  * a distributed plan without a per-stratum serial pass. This
  * implements the standard streaming relaxation, START-OFFSET packing:
  * within each stratum, documents are laid on one contiguous token
  * tape in a deterministic order and
  *
  *   `bin = floor(start_offset / capacity)`
  *
  * where `start_offset` is the running token count BEFORE the
  * document. Every document lands in exactly one bin, bins are dense
  * (0..k) per stratum, and a bin's total tokens is < capacity +
  * max_doc_tokens (a document whose start sits near the boundary
  * spills its tail past it — the caller either truncates the tail or
  * sizes capacity >> max doc, both standard).
  *
  * Scale shape: one hash exchange on the stratum column, then a
  * per-stratum window running sum — no global sort, no driver state.
  * Strata (source shard / language / date bucket) are exactly the
  * unit a 100 TB corpus is already partitioned by, so parallelism is
  * the stratum count. Fully deterministic in (stratum, order column):
  * the DuckDB oracle reproduces it bit-for-bit with the same window
  * sum.
  */
object SequencePacking {

  /** Per-document bin assignment: adds `n_tokens`, `start_offset`,
    * `bin` to `df`. `orderCol` must be unique per stratum for the
    * layout to be deterministic (doc ids are).
    */
  def assignBins(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity=$capacity must be positive")
    val w = Window.partitionBy(strataCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("start_offset", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("bin", floor(col("start_offset") / lit(capacity.toLong)))
  }

  /** Packed-bin summary: one row per (stratum, bin) with document and
    * token counts plus the id span — the manifest a downstream batch
    * loader reads. The window exchange on `strataCol` also satisfies
    * the groupBy's clustering, so the summary adds no second shuffle.
    */
  def packedBins(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int): DataFrame =
    assignBins(df, textCol, strataCol, orderCol, capacity)
      .groupBy(col(strataCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col(orderCol)).as("first_id"),
        max(col(orderCol)).as("last_id"))
}
