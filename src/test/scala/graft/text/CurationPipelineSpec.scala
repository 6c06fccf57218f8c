package graft.text

import graft.SparkSpec

class CurationPipelineSpec extends SparkSpec {

  test("curation pipeline on fixture: monotone survival, near-dups removed") {
    val ctx = CurationPipeline.run(spark, "/root/testdata/sf0.01")
    val stats = ctx.result[Map[String, Long]]("curation_stats")
    assert(ctx.errors.isEmpty)
    // monotone shrinkage through the stages
    assert(stats("input") >= stats("after_exact_dedup"))
    assert(stats("after_exact_dedup") >= stats("after_near_dedup"))
    assert(stats("after_near_dedup") >= stats("curated"))
    assert(stats("curated") > 0)
    // the fixture has 25 near-dup pairs and no exact dups
    assert(stats("input") == stats("after_exact_dedup"))
    assert(stats("after_exact_dedup") - stats("after_near_dedup") > 0)
    // no near-dup pair survives in the curated output
    val survivors = ctx.table("near_deduped")
    val residual = graft.dedup.Dedup.minhashCandidatePairs(survivors, "text", "doc_id")
      .filter(org.apache.spark.sql.functions.col("est_jaccard") >= 0.5)
    assert(residual.count() == 0)
  }

  test("quality gate threshold is honored") {
    val strict = CurationPipeline.run(spark, "/root/testdata/sf0.001", minQuality = 0.9)
    val loose = CurationPipeline.run(spark, "/root/testdata/sf0.001", minQuality = 0.0)
    val ns = strict.result[Map[String, Long]]("curation_stats")
    val nl = loose.result[Map[String, Long]]("curation_stats")
    assert(ns("curated") <= nl("curated"))
    assert(nl("curated") == nl("after_near_dedup")) // threshold 0 keeps everything
  }
}
