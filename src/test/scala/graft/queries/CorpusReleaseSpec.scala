package graft.queries

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** q77 (corpus release) — composition semantics and the plan-shape
  * facts the 12-exchange budget rests on: the planned count includes
  * REPEATED subtrees (the shard-base control plane and the
  * decontamination flag list each re-derive their upstream), which
  * exchange reuse collapses at execution.
  */
class CorpusReleaseSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("release is the intersection of the stage keep-sets, with a total permutation") {
    val docs = Sources.documents(spark, dir)
    val out = PipelineQueries.q77CorpusRelease(spark, dir).cache()
    try {
      val released = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(released.nonEmpty)
      // 1. no bench docs
      assert(released.forall(_ % 97 != 0))
      // 2. every released doc is its md5 group's canonical
      val canon = docs.groupBy(md5(col("text").cast("binary")))
        .agg(min("doc_id").as("c")).select("c").collect().map(_.getLong(0)).toSet
      assert(released.subsetOf(canon), "a non-canonical duplicate was released")
      // 3. every released doc passes the quality gate
      val gateFail = graft.text.QualityFilters.withSignals(docs, "text")
        .filter(col("keep") === 0).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(released.intersect(gateFail).isEmpty, "a gate-failing doc was released")
      // 4. no released doc is contamination-flagged
      val flagged = graft.text.Decontamination.report(
        docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L),
        docs.filter(pmod(col("doc_id"), lit(97L)) === 0L),
        "text", "doc_id").filter(col("flagged") === 1)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(released.intersect(flagged).isEmpty, "a contaminated doc was released")
      // 5. the permutation is total over exactly the released set
      val pos = out.select("global_pos").collect().map(_.getLong(0)).sorted.toSeq
      assert(pos == (0L until released.size.toLong).toSeq)
    } finally { out.unpersist(); () }
  }

  test("writeShards materializes the FULL q77 release and replays its exact permutation") {
    // The trainer-facing contract, end to end over the real release
    // (not synthetic ids): materializing the release's survivors with
    // the same seed and walking shard directories in name order, rows
    // in file order, must replay q77's global_pos 0..N-1 byte for
    // byte — the loader never re-sorts, and no global sort ever ran.
    val release = PipelineQueries.q77CorpusRelease(spark, dir).cache()
    val outDir = java.nio.file.Files.createTempDirectory("graft-release-shards").toString
    try {
      val expected = release
        .select("global_pos", "doc_id", "lang", "source")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .sortBy(_._1).toSeq
      assert(expected.nonEmpty)
      graft.ops.CorpusShuffle.writeShards(
        release.select("doc_id", "lang", "source"), "doc_id", seed = "release", path = outDir)
      val shardDirs = new java.io.File(outDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard=")).sortBy(_.getName)
      val replayed = shardDirs.toSeq.flatMap { d =>
        // FILE order within the shard — the loader's read path
        spark.read.parquet(d.getAbsolutePath)
          .select("global_pos", "doc_id", "lang", "source")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      }
      assert(replayed.map(_._1) == expected.indices.map(_.toLong),
        "shard-order file-order read must enumerate global_pos densely")
      assert(replayed == expected,
        "the materialized release must replay q77's exact permutation, payload included")
    } finally {
      release.unpersist()
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(outDir))
    }
  }

  test("the executed plan reuses the repeated subtrees the 12-exchange budget counts") {
    val df = PipelineQueries.q77CorpusRelease(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      "expected the control-plane/flag-list subtree recomputations to be deduplicated " +
        "by exchange reuse; if this stops firing, the planned-12 budget is real work")
  }
}
