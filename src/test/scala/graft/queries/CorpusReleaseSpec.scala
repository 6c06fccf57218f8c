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

  test("the executed plan reuses the repeated subtrees the 12-exchange budget counts") {
    val df = PipelineQueries.q77CorpusRelease(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      "expected the control-plane/flag-list subtree recomputations to be deduplicated " +
        "by exchange reuse; if this stops firing, the planned-12 budget is real work")
  }
}
