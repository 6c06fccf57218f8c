package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{broadcast => bcast}

/** Deterministic seeded corpus shuffle (engine addition): the global
  * training-order permutation an LLM data loader consumes. Training
  * runs need the corpus in a reproducible pseudo-random order —
  * re-runnable from the same seed, stable across cluster sizes and
  * retries — which a `rand()`-keyed sort cannot give (Spark's rand is
  * per-partition-seeded, so the order changes with the partitioning).
  *
  * The permutation key is `md5(seed ":" id)` — a pure function of the
  * (seed, id) pair, so the order is identical on any cluster, any
  * partitioning, any engine (the DuckDB oracle reproduces it
  * bit-for-bit from the same md5).
  *
  * Scale shape: a single global `row_number() OVER (ORDER BY key)` is
  * a one-task sort — the classic scale-killer. Instead the key's own
  * hex PREFIX is the shard: ordering by (shard, key) equals ordering
  * by key (the shard is a prefix of the key), so the global position
  * decomposes into
  *
  *   `global_pos = shard_base(shard) + shard_pos`
  *
  * where `shard_pos` is a per-shard window (parallelism 16^shardChars,
  * md5-uniform so skew-free by construction) and `shard_base` is the
  * exclusive running sum of per-shard counts — a control-plane-sized
  * table (≤ 16^shardChars rows) broadcast back. Same chunked
  * prefix-sum discipline as
  * [[graft.text.SequencePacking.assignBinsDistributed]]. At 100 TB
  * raise `shardChars` to 3–4 (4096 / 65536 shards) and shuffle the
  * doc-id MANIFEST, not the payload — the loader reads shards in
  * order and each shard is internally ordered by the key.
  */
object CorpusShuffle {

  /** Adds `shuffle_key` (md5 hex of seed:id), `shard` (its first
    * `shardChars` hex chars), `shard_pos` (0-based rank within the
    * shard by (key, id) — the id tie-break keeps the order total even
    * under a birthday-improbable digest collision), and `global_pos`
    * (the whole-corpus permutation index). One data-plane exchange on
    * `shard` plus one control-plane aggregate for the shard bases.
    */
  def shuffled(df: DataFrame, idCol: String, seed: String, shardChars: Int = 2): DataFrame = {
    // 4 hex chars = 65536 shards, ample parallelism for any cluster;
    // beyond that the shard-base table stops being control-plane
    // sized (its cumsum runs in one task by design)
    require(shardChars >= 1 && shardChars <= 4, s"shardChars=$shardChars must be in [1, 4]")
    val reserved = Seq("shuffle_key", "shard", "shard_pos", "global_pos", "__cs_count", "__cs_base")
    reserved.foreach(c => require(!df.columns.contains(c), s"input must not contain reserved column $c"))
    val keyed = df
      // null ids fail fast: concat_ws SKIPS null arguments, so every
      // null-id row would share the one key md5(seed) with a null
      // tie-break — their relative order (and global_pos) would then
      // differ run to run, the exact nondeterminism this operator
      // exists to prevent
      .withColumn("shuffle_key",
        when(col(idCol).isNull, raise_error(lit(
          s"shuffled: null $idCol — the permutation key is a pure function of the id; " +
            "assign unique non-null ids first")))
          .otherwise(md5(concat_ws(":", lit(seed), col(idCol).cast("string")).cast("binary"))))
      .withColumn("shard", substring(col("shuffle_key"), 1, shardChars))
    val w = Window.partitionBy(col("shard")).orderBy(col("shuffle_key"), col(idCol))
    // shard bases: per-shard counts cumulative-summed over the shard
    // axis — a window over <= 16^shardChars rows (control plane).
    val carry = Window.orderBy(col("shard")).rowsBetween(Window.unboundedPreceding, -1)
    val bases = keyed.groupBy(col("shard")).agg(count(lit(1)).as("__cs_count"))
      .withColumn("__cs_base", coalesce(sum(col("__cs_count")).over(carry), lit(0L)))
      .select(col("shard"), col("__cs_base"))
    keyed
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1L)
      .join(bcast(bases), Seq("shard"))
      .withColumn("global_pos", col("__cs_base") + col("shard_pos"))
      .select((df.columns.toIndexedSeq.map(col) ++
        Seq(col("shuffle_key"), col("shard"), col("shard_pos"), col("global_pos"))): _*)
  }

  /** Epoch re-shuffle: same corpus, a different (deterministic) order
    * per epoch — the seed is extended with the epoch index, so epoch 0
    * reproduces `shuffled(seed)` exactly and each later epoch is an
    * independent permutation, all replayable.
    */
  def shuffledEpoch(df: DataFrame, idCol: String, seed: String, epoch: Int, shardChars: Int = 2): DataFrame = {
    require(epoch >= 0, s"epoch=$epoch must be >= 0")
    shuffled(df, idCol, if (epoch == 0) seed else s"$seed:e$epoch", shardChars)
  }

  /** Materialize the shuffled corpus for a training loader: parquet
    * partitioned by `shard`, rows inside each shard file sorted by the
    * permutation key — so a loader that walks shard directories in
    * name order and rows in file order replays the exact global
    * permutation, and NO global sort ever ran to produce it. Each
    * shard lands in exactly one task (hash-repartitioned on the shard
    * value), hence one file per shard directory; at 100 TB raise
    * `shardChars` so per-shard bytes fit a task, exactly as
    * [[shuffled]] prescribes.
    */
  def writeShards(df: DataFrame, idCol: String, seed: String, path: String, shardChars: Int = 2): Unit =
    // no repartition: [[shuffled]]'s window exchange already
    // hash-partitioned every row by shard (the broadcast join and
    // projection preserve it), so an explicit repartition would move
    // the whole payload a second time for nothing — sorting within
    // the existing partitions keeps one file per shard directory
    shuffled(df, idCol, seed, shardChars)
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col(idCol))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
}
