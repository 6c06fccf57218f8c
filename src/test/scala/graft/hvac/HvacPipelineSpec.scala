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

  test("issues count cycles at the (device, cycle) grain, not bare cycle ids") {
    import sqlImplicits._
    // two devices, each with 8 valid heat cycles whose per-device
    // cycle ids COINCIDE (labelCycles restarts numbering per device):
    // 16 real heat cycles. The bare-cycle grain counted the distinct
    // ids (8 < MinCyclesForIssues = 10) and wrongly flagged
    // lowCycleCount on any multi-device frame (review r19).
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    var eid = 0L
    val rows = for {
      dev <- Seq(1L, 2L)
      run <- 0 until 16 // alternate heat/idle -> 8 heat cycles/device
      i <- 0 until 4
    } yield {
      eid += 1
      val stage = if (run % 2 == 0) "heat" else "idle"
      val value = if (stage == "heat") 500.0 + i else 1.0
      (eid, ts(f"2024-01-0${dev} ${run}%02d:0$i:00"), dev, stage, value)
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val ctx = HvacPipeline.pipeline.run(
      graft.core.PipelineContext("multidev", tables = Map("events" -> events)))
    assert(ctx.errors.isEmpty, ctx.errors.toString)
    val issues = ctx.result[Seq[StageIssues]]("issues")
    val heat = issues.find(_.stage == "heat").get
    assert(!heat.lowCycleCount,
      s"16 (device, cycle) heat cycles must clear MinCyclesForIssues: $issues")
  }
}
