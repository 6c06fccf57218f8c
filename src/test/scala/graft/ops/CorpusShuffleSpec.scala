package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusShuffleSpec extends SparkSpec {

  private def ids(n: Int) = spark.range(n.toLong).select(col("id").as("doc_id"))

  test("a null id fails fast — concat_ws would silently collapse null-id rows onto one key") {
    import sqlImplicits._
    val df = Seq(Some(1L), None, Some(2L)).toDF("doc_id")
    val e = intercept[Exception] {
      CorpusShuffle.shuffled(df, "doc_id", seed = "s1").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("null doc_id")), e.toString)
  }

  test("global_pos is a permutation of 0..n-1 and decomposes as shard_base + shard_pos") {
    val out = CorpusShuffle.shuffled(ids(5000), "doc_id", seed = "s1").cache()
    try {
      val pos = out.select("global_pos").collect().map(_.getLong(0)).sorted.toSeq
      assert(pos == (0L until 5000L).toSeq, "global_pos must be a permutation")
      // the sharded decomposition must equal the one-task global sort
      // it replaces: rank by (key, id) over the whole frame
      val byKey = out.orderBy(col("shuffle_key"), col("doc_id"))
        .select("global_pos").collect().map(_.getLong(0))
      assert(byKey.sameElements(byKey.indices.map(_.toLong)),
        "ordering by the full key must enumerate global_pos densely")
    } finally { out.unpersist(); () }
  }

  test("deterministic across partitioning; different seeds give different orders") {
    val df = ids(2000)
    def order(d: org.apache.spark.sql.DataFrame, seed: String) =
      CorpusShuffle.shuffled(d, "doc_id", seed)
        .select("doc_id", "global_pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = order(df, "s")
    val b = order(df.repartition(17), "s")
    assert(a == b, "the permutation must not depend on the physical partitioning")
    val c = order(df, "t")
    assert(a != c, "a different seed must give a different permutation")
    // ... but both are permutations of the same index set
    assert(c.values.toSeq.sorted == (0L until 2000L).toSeq)
  }

  test("shards are md5-uniform: no shard exceeds 3x the mean occupancy") {
    val out = CorpusShuffle.shuffled(ids(10000), "doc_id", seed = "u", shardChars = 2)
    val counts = out.groupBy("shard").count().collect().map(_.getLong(1))
    val mean = 10000.0 / 256.0
    assert(counts.max <= 3 * mean, s"max shard ${counts.max} vs mean $mean")
  }

  test("shard_pos is dense 0..k within each shard and shard is the key prefix") {
    val out = CorpusShuffle.shuffled(ids(1000), "doc_id", seed = "d", shardChars = 1).cache()
    try {
      assert(out.filter(substring(col("shuffle_key"), 1, 1) =!= col("shard")).count() == 0)
      val bad = out.groupBy("shard")
        .agg(count(lit(1)).as("n"), max("shard_pos").as("mx"), min("shard_pos").as("mn"),
          countDistinct("shard_pos").as("nd"))
        .filter(col("mn") =!= 0L || col("mx") =!= col("n") - 1L || col("nd") =!= col("n"))
      assert(bad.count() == 0, "shard_pos must be dense per shard")
    } finally { out.unpersist(); () }
  }

  test("epoch 0 reproduces the base seed; later epochs permute differently") {
    val df = ids(500)
    def posMap(d: org.apache.spark.sql.DataFrame) =
      d.select("doc_id", "global_pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = posMap(CorpusShuffle.shuffled(df, "doc_id", "z"))
    assert(posMap(CorpusShuffle.shuffledEpoch(df, "doc_id", "z", epoch = 0)) == base)
    val e1 = posMap(CorpusShuffle.shuffledEpoch(df, "doc_id", "z", epoch = 1))
    assert(e1 != base)
    assert(e1.values.toSeq.sorted == (0L until 500L).toSeq)
  }

  test("writeShards materializes one sorted file per shard that replays the global permutation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    try {
      CorpusShuffle.writeShards(ids(3000), "doc_id", seed = "w", path = dir, shardChars = 1)
      val shardDirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
      assert(shardDirs.length == 16, "one directory per hex shard")
      // one data file per shard (each shard lands in exactly one task)
      shardDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${d.getName}: ${files.length} files")
      }
      // walking shards in name order and rows in FILE order replays the
      // exact global permutation — no re-sort on read
      val replayed = shardDirs.flatMap { d =>
        spark.read.parquet(d.getAbsolutePath).select("global_pos")
          .collect().map(_.getLong(0))
      }
      assert(replayed.toSeq == (0L until 3000L).toSeq,
        "file order must enumerate global_pos densely in shard order")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
  }

  test("input columns pass through untouched and reserved names are rejected") {
    import sqlImplicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "payload")
    val out = CorpusShuffle.shuffled(df, "doc_id", "p")
    assert(out.columns.toSeq == Seq("doc_id", "payload", "shuffle_key", "shard", "shard_pos", "global_pos"))
    assert(out.filter(col("doc_id") === 1L).head().getString(1) == "a")
    intercept[IllegalArgumentException] {
      CorpusShuffle.shuffled(df.withColumn("shard", lit("x")), "doc_id", "p")
    }
    intercept[IllegalArgumentException] {
      CorpusShuffle.shuffled(df, "doc_id", "p", shardChars = 0)
    }
  }
}
