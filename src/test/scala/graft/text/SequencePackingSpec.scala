package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencePackingSpec extends SparkSpec {

  private def docs() = {
    import sqlImplicits._
    // deterministic word-soup docs of varying token counts, 3 strata
    val rows = (0 until 300).map { i =>
      val n = 5 + (i * 37) % 90
      (i.toLong, s"s${i % 3}", Seq.fill(n)("w").mkString(" "))
    }
    rows.toDF("doc_id", "source", "text")
  }

  test("every document lands in exactly one bin and bins are dense per stratum") {
    val assigned = SequencePacking.assignBins(docs(), "text", "source", "doc_id", capacity = 512)
    assert(assigned.count() == 300)
    val perStratum = assigned.groupBy("source")
      .agg(min("bin").as("lo"), max("bin").as("hi"), countDistinct("bin").as("n"))
      .collect()
    perStratum.foreach { r =>
      assert(r.getLong(1) == 0L, s"bins must start at 0: $r")
      assert(r.getLong(3) == r.getLong(2) + 1, s"bins must be dense: $r")
    }
  }

  test("bin token totals respect the start-offset bound: total < capacity + max doc tokens") {
    val cap = 512
    val assigned = SequencePacking.assignBins(docs(), "text", "source", "doc_id", cap)
    val maxDoc = assigned.agg(max("n_tokens")).head().getLong(0)
    val worst = assigned.groupBy("source", "bin").agg(sum("n_tokens").as("t"))
      .agg(max("t")).head().getLong(0)
    assert(worst < cap + maxDoc, s"worst=$worst cap=$cap maxDoc=$maxDoc")
    // and all but each stratum's LAST bin are at least half full — the
    // tape layout cannot leave arbitrary holes
    val lastBins = assigned.groupBy("source").agg(max("bin").as("last"))
    val inner = assigned.join(lastBins, "source").filter(col("bin") < col("last"))
      .groupBy("source", "bin").agg(sum("n_tokens").as("t"))
    assert(inner.filter(col("t") < cap / 2).count() == 0)
  }

  test("bin assignment is a pure function of (stratum, order): layout-invariant") {
    val a = SequencePacking.assignBins(docs(), "text", "source", "doc_id", 512)
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SequencePacking.assignBins(
      docs().repartition(13, col("doc_id")), "text", "source", "doc_id", 512)
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("bins never mix strata and the manifest matches the assignment") {
    val cap = 256
    val assigned = SequencePacking.assignBins(docs(), "text", "source", "doc_id", cap)
    val manifest = SequencePacking.packedBins(docs(), "text", "source", "doc_id", cap)
    val fromAssigned = assigned.groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val fromManifest = manifest.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(fromAssigned == fromManifest)
  }

  test("the plan shuffles once on the stratum column: window + groupBy share the exchange") {
    val plan = SequencePacking.packedBins(docs(), "text", "source", "doc_id", 512)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }
}
