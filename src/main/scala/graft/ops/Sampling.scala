package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation (engine addition
  * beyond the reference surface — the rebalancing step of a corpus
  * pipeline: downsample over-represented strata, keep rare ones).
  *
  * Spark's own `df.sample` is seed-stable only per partitioning — the
  * SAME rows land in the sample only while the physical partition
  * layout is identical, which no 100 TB pipeline can promise across
  * reruns, compaction, or cluster resize. These samplers instead hash
  * the ROW IDENTITY: a row is kept iff its score clears the rate
  * threshold, where the score is THREE Lehmer/MINSTD rounds
  *
  *   `h0 = mod(id * 48271 + seed, 2147483647); h = h0 * 48271 mod m; ...`
  *
  * (multiplier from the public MINSTD spec; one round is a bijection
  * but leaves a small contiguous id range unwrapped and therefore
  * unmixed — the extra rounds wrap the modulus hundreds of times, so
  * even ids 0..n score uniformly). Every intermediate stays below
  * (m-1) * 48271 < 2^63: no overflow under Spark's ANSI arithmetic on
  * any engine. Membership depends only on (id, seed, rate), so the
  * sample is
  *
  *   - reproducible bit-for-bit on any cluster shape or engine (the
  *     arithmetic is plain BIGINT mod — the DuckDB oracle runs the
  *     same formula);
  *   - NESTED across rates: rate 0.1 ⊂ rate 0.2 ⊂ ... (the keep
  *     predicate is a threshold on one score), which is what makes
  *     ablation series comparable;
  *   - a pure map-side filter: zero shuffle, zero state at any scale.
  *
  * Not cryptographic — fine for sampling, not for adversarial inputs.
  */
object Sampling {

  private val Mod = 2147483647L // 2^31 - 1 (prime)
  private val Mult = 48271L     // MINSTD multiplier

  /** Uniform [0, m) sampling score of an integral id column —
    * overflow-safe in BIGINT for |id| < ~1.9e14 (the first round's
    * id * 48271 must stay inside Long; fixture ids and the scale
    * harness's 1e7-strided copies are far below that).
    */
  def sampleScore(id: Column, seed: Long): Column = {
    val h0 = pmod(id.cast("long") * lit(Mult) + lit(seed % Mod), lit(Mod))
    val h1 = pmod(h0 * lit(Mult), lit(Mod))
    pmod(h1 * lit(Mult), lit(Mod))
  }

  /** Keep each row with probability `rate`, deterministically in
    * (idCol, seed).
    */
  def uniform(df: DataFrame, idCol: String, rate: Double, seed: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate=$rate must be in [0,1]")
    df.filter(sampleScore(col(idCol), seed) < lit((rate * Mod).toLong))
  }

  /** Stratified sampling: per-stratum keep rates (e.g. downsample the
    * dominant language), strata absent from `rates` keep
    * `defaultRate`. One map-side filter — the rate lookup is a
    * CASE/WHEN chain over the (small, driver-known) strata map, never
    * a join.
    */
  def stratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      seed: Long = 0L): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "all rates must be in [0,1]")
    val threshold = rates.foldLeft(lit((defaultRate * Mod).toLong)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === lit(stratum), lit((rate * Mod).toLong)).otherwise(acc)
    }
    df.filter(sampleScore(col(idCol), seed) < threshold)
  }
}
