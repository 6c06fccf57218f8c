package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-order generation — the step between a
  * curated corpus and the trainer: every epoch needs a reproducible
  * shuffle in which the sources stay INTERLEAVED (a sorted-by-source
  * corpus trains on one distribution for hours, then another —
  * public lineage: the data-ordering/shuffling discussion around
  * large-LM training and stride scheduling).
  *
  * Mechanism: each document gets a deterministic per-source rank
  * (MINSTD score of (id, seed) — [[Sampling.sampleScore]], the
  * engine-portable integer hash), and its global sort key is the
  * FRACTIONAL POSITION `(rank - 0.5) / n_source` — source s's
  * documents sit at uniform offsets within [0, 1], so sorting by the
  * key yields a proportional round-robin interleave (a source with
  * 10x the documents appears 10x as often in any window of the
  * order) WITHOUT any global coordination: no single-partition
  * window, no driver-side schedule. Changing `seed` reshuffles every
  * epoch reproducibly.
  *
  * Scale shape: one window partitioned by source (rank + count share
  * the exchange), then a global `orderBy(pos_key)` — a range exchange,
  * which is exactly what writing the epoch manifest in training order
  * needs (range-partitioned output files ARE the schedule; no stronger
  * coordination exists to pay for).
  */
object Curriculum {

  /** `(idCol, sourceCol, src_rank, pos_key)` in training order.
    * Ties in the MINSTD score break by id, so the order is total and
    * reproducible on any engine/layout.
    */
  def interleave(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      seed: Long = 0L): DataFrame = {
    Sampling.requireIntegralId(df, idCol, "interleave")
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(Sampling.sampleScore(col(idCol), seed), col(idCol))
    val wAll = Window.partitionBy(col(sourceCol))
    df.select(col(idCol), col(sourceCol))
      .withColumn("src_rank", row_number().over(w))
      .withColumn("pos_key",
        (col("src_rank").cast("double") - lit(0.5)) /
          count(lit(1)).over(wAll).cast("double"))
      .orderBy(col("pos_key"), col(idCol))
  }
}
