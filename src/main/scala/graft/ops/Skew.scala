package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salted joins. AQE's skew-join handling covers
  * sort-merge joins at runtime; salting is the explicit, planner-
  * independent form for the pathological case — a handful of hot keys
  * holding most rows (device with millions of events, null-ish key).
  *
  * Shape: the fact side gets a random-ish salt in [0, saltFactor);
  * the dimension side is exploded saltFactor times so every
  * (key, salt) bucket finds its dimension row. The hot key's rows
  * spread over saltFactor tasks instead of one. Salt derives from a
  * hash of stable row content, so results stay deterministic.
  */
object Skew {

  /** Deterministic salt column in [0, saltFactor) from stable columns. */
  def salt(saltFactor: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(saltFactor.toLong)).cast("int")

  /** Join a skewed fact table to a (small-ish) dimension on `keys`,
    * spreading each key across `saltFactor` buckets.
    *
    * Only FACT-preserving join types are accepted: the dim side is
    * exploded `saltFactor` times, so a right/full outer join would
    * emit up to `saltFactor - 1` spurious null-extended copies of any
    * dim row whose (key, salt) bucket holds no fact row.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      saltFrom: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase(java.util.Locale.ROOT).replace("_", "")),
      s"saltedJoin: joinType=$joinType is not fact-preserving — the exploded dim side " +
        "would duplicate unmatched dim rows; use inner/left/left_semi/left_anti")
    val saltedFact = fact.withColumn("__salt", salt(saltFactor, saltFrom.map(col): _*))
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFact
      .join(saltedDim, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
