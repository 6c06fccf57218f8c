package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast => bcast, _}

/** Deterministic, leakage-safe train/val/test assignment — the split
  * step run AFTER dedup, with the property naive splitting loses:
  * every document in the same duplicate CLUSTER lands in the same
  * split, so identical or near-identical content can never straddle
  * train and eval (the contamination path that document-level random
  * splits reopen after dedup flagged it; public lineage: the
  * train-test overlap analyses in the GPT-2/GPT-3 papers and the
  * dedup literature's leakage warnings).
  *
  * Mechanism: the split is a pure function of the CLUSTER's canonical
  * id — MINSTD score ([[Sampling.sampleScore]]) against cumulative
  * integer thresholds — so it is reproducible on any engine, layout,
  * or rerun, and moving a document between releases cannot flip its
  * cluster's split unless the cluster's canonical changes.
  *
  * Scale shape: the exact-dup canonical table is one fingerprint-grain
  * aggregate (md5 keys shuffle, text never does) joined back
  * co-partitioned; the threshold CASE chain is a zero-shuffle map-side
  * projection. The near-dup form ([[assignWith]]) takes any
  * `(id, canonical_id)` table — e.g. [[graft.dedup.Dedup]]'s
  * transitive `dupClusters` — and pays only the broadcast/shuffle of
  * that narrow table.
  */
object Splits {

  private val Mod = 2147483647L

  /** Normalize `fractions` and return the cumulative integer
    * thresholds, the last pinned to the modulus so floating rounding
    * can never leave a score unassigned.
    */
  private def thresholds(fractions: Seq[(String, Double)]): Seq[(String, Long)] = {
    require(fractions.nonEmpty, "at least one split")
    require(fractions.forall(_._2 > 0.0), "split weights must be positive")
    val total = fractions.map(_._2).sum
    val cum = fractions.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val ts = cum.map(c => math.floor(c * Mod.toDouble).toLong)
    fractions.map(_._1).zip(ts.init :+ Mod)
  }

  /** Assignment against a PRECOMPUTED cluster table `(idCol,
    * canonical_id)` — pass [[graft.dedup.Dedup]] cluster labels for
    * near-dup cohesion. Documents absent from the table are their own
    * cluster (`canonical_id = id`). Returns
    * `(idCol, canonical_id, split)`.
    */
  def assignWith(
      df: DataFrame,
      clusters: DataFrame,
      idCol: String,
      fractions: Seq[(String, Double)],
      seed: Long = 0L): DataFrame = {
    val th = thresholds(fractions)
    Sampling.requireIntegralId(df, idCol, "assignWith")
    Sampling.requireIntegralId(clusters, "canonical_id", "assignWith")
    val joined = df.select(col(idCol))
      .join(clusters.select(col(idCol), col("canonical_id")), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("canonical_id"), col(idCol)).as("canonical_id"))
    val score = Sampling.sampleScore(col("canonical_id"), seed)
    val split = th.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (name, t)) => when(score < lit(t), lit(name)).otherwise(acc)
    }
    joined.withColumn("split", split)
  }

  /** Exact-dup-cohesive assignment inline: the canonical table is the
    * md5 fingerprint group's `min(id)` (the q21 exact-dedup canonical)
    * derived from `df` itself. Returns `(idCol, canonical_id, split)`.
    */
  def assign(
      df: DataFrame,
      textCol: String,
      idCol: String,
      fractions: Seq[(String, Double)],
      seed: Long = 0L): DataFrame = {
    val fp = df.select(col(idCol), md5(col(textCol).cast("binary")).as("__f"))
    val canon = fp.groupBy(col("__f")).agg(min(col(idCol)).as("canonical_id"))
    val clusters = fp.join(canon, "__f").select(col(idCol), col("canonical_id"))
    assignWith(df, clusters, idCol, fractions, seed)
  }

  /** The integer thresholds as data, for oracle mirrors and release
    * manifests: `(split, upper_threshold)` in assignment order.
    */
  def thresholdTable(fractions: Seq[(String, Double)]): Seq[(String, Long)] =
    thresholds(fractions)
}
