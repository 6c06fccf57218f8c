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

  test("mergeFeeds joins minute-aligned control and energy feeds (J1)") {
    import sqlImplicits._
    val control = Seq((1L, 100L, 2), (1L, 160L, 2), (1L, 220L, 0)).toDF("dev", "ts", "tstate")
    val energy = Seq((1L, 100L, 500.0), (1L, 160L, 520.0), (1L, 280L, 0.0)).toDF("dev", "ts", "energy")
    val merged = HvacPipeline.mergeFeeds(control, energy, Seq("dev"), "ts")
    assert(merged.columns.toSet == Set("dev", "ts", "tstate", "energy"))
    assert(merged.count() == 2) // only aligned minutes survive
  }
}
