package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-balanced sampling over k-means cells — the diversity
  * counterpart of [[graft.ops.Sampling]]'s stratified samplers: where
  * those balance by a LABEL column, this balances by embedding-space
  * GEOMETRY, capping how many points any one semantic region
  * contributes. The standard cure for web-crawl corpora where one
  * template family (boilerplate, listings, near-identical product
  * pages) dominates the embedding space: a uniform sample reproduces
  * the imbalance, a cluster-capped sample keeps the rare regions
  * whole and downsamples only the gluts.
  *
  * Selection inside a cell is by the deterministic
  * [[graft.ops.Sampling.sampleScore]] hash order, so the sample is
  *
  *   - reproducible bit-for-bit on any cluster shape (membership
  *     depends only on (id, seed, cap, model), never on partition
  *     layout);
  *   - NESTED across caps: cap 10 ⊂ cap 20 per cell (the per-cell
  *     order is fixed; a larger cap only extends the kept prefix) —
  *     ablation series stay comparable exactly as with the
  *     rate-nested uniform sampler.
  *
  * Scale shape: cell assignment is one map-side [[NearestCell]] loop
  * per row (no join — argmax dot is invariant under the row's
  * positive norm, so the raw vector assigns identically to the
  * normalized one); the per-cell cap is a `row_number <= literal`
  * ranked window that Spark plans as a partial WindowGroupLimit, so
  * each map task forwards at most `cap` rows per cell and the
  * exchange carries at most mapPartitions x k x cap rows NO MATTER
  * the corpus size — the one shuffle is bounded by the OUTPUT, not
  * the input. k cells means k reducer groups, each holding that same
  * bounded row set.
  *
  * Degenerate vectors (null / NaN elements, zero norm) are dropped by
  * the same guard as [[Ivf.index]]: they carry no direction, so they
  * belong to no cell.
  */
object ClusterSampling {

  /** Keep at most `perCellCap` rows per k-means cell of `model`,
    * chosen in deterministic (id, seed) hash order. Output: the
    * surviving input rows plus their `cell` assignment.
    */
  def clusterBalancedSample(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      model: Ivf.Model,
      perCellCap: Long,
      seed: Long = 0L): DataFrame = {
    require(perCellCap >= 1, s"perCellCap=$perCellCap must be >= 1")
    val n: Column = Similarity.norm(col(vecCol))
    val withCell = df
      .filter(n > 0 && !isnan(n))
      .withColumn("cell", Ivf.cellOf(col(vecCol), model))
    withCell
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(graft.ops.Sampling.sampleScore(col(idCol), seed).asc, col(idCol).asc)))
      .filter(col("__rk") <= lit(perCellCap))
      .drop("__rk")
  }

  /** Per-cell census of a balanced sample against its source: how
    * many rows each cell held and how many survived the cap — the
    * audit artifact a curation run logs next to the sample itself.
    * Output: `(cell, n_total, n_kept)`, one row per non-empty cell.
    */
  def cellCensus(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      model: Ivf.Model,
      perCellCap: Long,
      seed: Long = 0L): DataFrame = {
    // ONE ranked pass: the cell assignment (k x dim MACs per row — the
    // dominant cost) and its exchange run once, and both counts fall
    // out of the same aggregate; a sample-branch + totals-branch join
    // would run the full-corpus assignment twice for numbers derivable
    // together.
    val n: Column = Similarity.norm(col(vecCol))
    df.filter(n > 0 && !isnan(n))
      .withColumn("cell", Ivf.cellOf(col(vecCol), model))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("cell"))
          .orderBy(graft.ops.Sampling.sampleScore(col(idCol), seed).asc, col(idCol).asc)))
      .groupBy(col("cell"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("__rk") <= lit(perCellCap), 1L).otherwise(0L)).as("n_kept"))
  }
}
