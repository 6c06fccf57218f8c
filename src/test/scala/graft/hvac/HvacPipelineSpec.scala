package graft.hvac

import graft.SparkSpec

class HvacPipelineSpec extends SparkSpec {

  test("flagship pipeline end-to-end on sf0.001: thresholds & invariants") {
    val ctx = HvacPipeline.run(spark, "/root/testdata/sf0.001")
    val verdicts = ctx.result[Seq[VarianceVerdict]]("variance_final")
    val thresholds = ctx.result[Seq[StageThreshold]]("thresholds")
    val issues = ctx.result[Seq[StageIssues]]("issues")
    assert(verdicts.nonEmpty)
    assert(thresholds.nonEmpty)
    assert(issues.nonEmpty)
    // invariant (ExamplePipelineCode.md:470-480): threshold defined <=> variance Low
    val lows = verdicts.filter(_.variance == "Low").map(_.stage).toSet
    thresholds.foreach { t =>
      assert(t.threshold.isDefined == lows.contains(t.stage), s"$t vs lows=$lows")
    }
    // every step ran
    assert(ctx.executionLog.map(_.processor).toSet.size == HvacPipeline.steps.size)
    assert(ctx.errors.isEmpty)
  }

  test("entry returns >0 rows (driver smoke)") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
