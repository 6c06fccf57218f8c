package graft.hvac

import graft.core.{Pipeline, PipelineContext, Processor}
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** E3 — the flagship analytics workload, re-expressed as composable
  * processors over lazy DataFrames (reference:
  * `PowerAnalysisPipeline`, Requirements/ExamplePipelineCode.md:50-131;
  * step trace in SURVEY.md §3/E3).
  *
  * Fixture mapping (TESTDATA/FIXTURES): `events.user_id` ~ device key
  * (locationId/controlId), `event_type` ~ tstate/stage, `value` ~
  * energy (watts), `ts` ~ timeStamp. All windows partition by the
  * device key so every step shards at 100 TB.
  *
  * Only the variance verdicts and thresholds are collect()ed — pipeline
  * *control flow* reads them (conditional curation/baselines,
  * ExamplePipelineCode.md:444-453,470-474); every data-plane table
  * stays a lazy plan.
  */
object HvacPipeline {

  val MaxRawSamplesPerStage = 5000 // ExamplePipelineCode.md:232
  val MinSamplesRaw = 50 // ExamplePipelineCode.md:234
  val MinSamplesCurated = 20 // ExamplePipelineCode.md:303
  val MinCyclesForIssues = 10 // ExamplePipelineCode.md:347,353

  /** J1 — minute-level feed merge: the reference joins the thermostat
    * feed (timeStamp, tstate) with the energy feed (timeStamp, energy)
    * for one device window (reference:
    * Requirements/ExamplePipelineCode.md:25-26,108-112; output schema
    * :140-147). Both feeds are minute-aligned, so an equi-join on
    * (device, ts) suffices; drifting feeds would go through
    * [[graft.ops.AsOfJoin]] instead.
    */
  def mergeFeeds(control: DataFrame, energy: DataFrame, keys: Seq[String], tsCol: String): DataFrame =
    control.join(energy, keys :+ tsCol, "inner")

  /** Step 1 — ingest + cycle labeling (J1/W1; the merge of feeds is a
    * no-op for the single events fixture; cycles per device key).
    */
  val getData: Processor = Processor("GetData", required = Seq("events")) { ctx =>
    val labeled = Segmentation.labelCycles(
      ctx.table("events"),
      partitionCols = Seq("user_id"),
      orderCols = Seq(col("ts"), col("event_id")),
      stateCol = "event_type")
    ctx.withTable("labeled", labeled.select("user_id", "ts", "event_id", "event_type", "value", "cycle"))
  }

  /** Step 2 — drop invalid cycles (A1/A2/A4 + P5 + J2). */
  val filterValidCycles: Processor = Processor("FilterValidCycles", required = Seq("labeled")) { ctx =>
    val cleaned = GroupStats.filterValidCycles(
      ctx.table("labeled"),
      groupCols = Seq("user_id", "cycle"),
      valueCol = "value",
      tsCol = "ts",
      stateCol = "event_type")
    // eager localCheckpoint: four later steps fire separate driver
    // actions over this frame (variance collect, cycle counts,
    // short-cycling, curation) — without it each one re-executes the
    // scan + two-level cycleStats aggregation + semi-join; blocks are
    // reclaimed when the context becomes unreachable
    ctx.withTable("cleaned", cleaned.localCheckpoint(true))
  }

  private def classifyPerStage(
      spark: SparkSession,
      df: DataFrame,
      params: Variance.Params): Seq[VarianceVerdict] = {
    import spark.implicits._
    // null values never reach the typed decode: filterValidCycles
    // deliberately keeps a valid cycle's null-value rows (they cannot
    // disqualify it), and the pandas reference drops NaN from every
    // variance statistic — without the filter the non-nullable Double
    // decode kills the whole pipeline on one null watt reading
    df.select(col("event_type").as("stage"), col("value"))
      .filter(col("value").isNotNull)
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapGroups { (stage, rows) =>
        Variance.classify(stage, rows.map(_._2).toArray, params)
      }
      .collect()
      .toSeq
      .sortBy(_.stage)
  }

  /** Step 3 — raw per-stage variance classification (A8+A9), capped to
    * the most recent 5000 samples per stage (W2).
    */
  val varianceRaw: Processor = Processor("IdentifyPowerVarianceRaw", required = Seq("cleaned")) { ctx =>
    val spark = ctx.table("cleaned").sparkSession
    val capped = Segmentation.recencyTopK(
      ctx.table("cleaned"), Seq("event_type"), "ts", MaxRawSamplesPerStage, Seq(col("event_id").desc))
    val verdicts = classifyPerStage(spark, capped, Variance.Params(minSamples = MinSamplesRaw))
    ctx.withResult("variance_raw", verdicts)
  }

  /** Step 4 — per-stage issues: low distinct-cycle count (A6) +
    * short-cycling on High-variance stages with enough cycles.
    */
  val identifyIssues: Processor = Processor("IdentifyIssues", required = Seq("cleaned"),
    requiredRes = Seq("variance_raw")) { ctx =>
    val verdicts = ctx.result[Seq[VarianceVerdict]]("variance_raw")
    val high = verdicts.filter(_.variance == "High").map(_.stage).toSet
    val cleaned = ctx.table("cleaned")
    // Cycle identity is (user_id, cycle) — labelCycles restarts
    // numbering per device key, and Step 2 already filters at that
    // grain. A bare `cycle` here merged device A's cycle 3 with
    // device B's cycle 3: distinct counts read as one device's worth
    // and merged pseudo-cycles spanned devices, inflating durations
    // (review r19; the single-device fixture tests never caught it).
    val cycleCounts = cleaned
      .groupBy("event_type")
      .agg(countDistinct(col("user_id"), col("cycle")).as("n_cycles"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val shortByStage: Map[String, Boolean] =
      if (high.isEmpty) Map.empty
      else
        ShortCycling
          .detect(
            cleaned.filter(col("event_type").isInCollection(high))
              .withColumn("__cycle_key", struct(col("user_id"), col("cycle"))),
            Seq("event_type"), "__cycle_key", "ts")
          .collect()
          .map(r => r.getString(0) -> r.getAs[Boolean]("short_cycling"))
          .toMap
    val issues = cycleCounts.keys.toSeq.sorted.map { stage =>
      StageIssues(
        stage,
        lowCycleCount = cycleCounts(stage) < MinCyclesForIssues,
        shortCycling = shortByStage.getOrElse(stage, false))
    }
    ctx.withResult("issues", issues)
  }

  /** Step 5 — curation: for Low-variance stages, collapse each cycle to
    * its median (A2) + chronologically-first timestamp (A5); High
    * stages contribute nothing (the reference refuses to curate them,
    * ExamplePipelineCode.md:444-453).
    */
  val curate: Processor = Processor("CurateStageData", required = Seq("cleaned"),
    requiredRes = Seq("variance_raw")) { ctx =>
    val verdicts = ctx.result[Seq[VarianceVerdict]]("variance_raw")
    val low = verdicts.filter(_.variance == "Low").map(_.stage)
    val cleaned = ctx.table("cleaned")
    val curated = cleaned
      .filter(col("event_type").isInCollection(low))
      .groupBy("user_id", "event_type", "cycle")
      .agg(
        GroupStats.exactMedian(col("value")).as("median_energy_cycle"),
        min(col("ts")).as("first_ts"))
    // two later steps (re-classification, thresholds) each fire a
    // driver action over this aggregate — same eager-snapshot
    // rationale as "cleaned"
    ctx.withTable("curated", curated.localCheckpoint(true))
  }

  /** Step 6 — re-classify on per-cycle medians; a stage that looks
    * multimodal on its curated medians is upgraded to High
    * (ExamplePipelineCode.md:275-332).
    */
  val varianceCurated: Processor = Processor("IdentifyPowerVarianceCurated", required = Seq("curated"),
    requiredRes = Seq("variance_raw")) { ctx =>
    val spark = ctx.table("curated").sparkSession
    // same recency cap as the RAW classification: classifyPerStage
    // materializes one stage's samples in one task, so an uncapped
    // curated path would hold every cycle median of a stage in memory
    // — fine on the fixture, an OOM at billions of cycles. The cap is
    // a deliberate engine guard beyond the reference (whose pandas
    // frame is already all-in-memory); 5000 most recent cycles is the
    // same statistical budget the raw pass runs on.
    val cappedCurated = Segmentation.recencyTopK(
      ctx.table("curated"), Seq("event_type"), "first_ts", MaxRawSamplesPerStage,
      Seq(col("user_id").desc, col("cycle").desc))
    val curatedVerdicts = classifyPerStage(
      spark,
      cappedCurated.select(col("event_type"), col("median_energy_cycle").as("value")),
      Variance.Params(minSamples = MinSamplesCurated))
    val raw = ctx.result[Seq[VarianceVerdict]]("variance_raw")
    val byStage = curatedVerdicts.map(v => v.stage -> v).toMap
    val merged = raw.map { v =>
      if (v.variance == "High") v
      else byStage.get(v.stage).map(c => if (c.variance == "High") c else v).getOrElse(v)
    }
    ctx.withResult("variance_final", merged).withResult("variance_curated", curatedVerdicts)
  }

  /** Step 7 — baseline thresholds: round(median of per-cycle medians)
    * per stage; None for High-variance or empty stages
    * (ExamplePipelineCode.md:456-484).
    */
  val thresholds: Processor = Processor("CalculateBaselines", required = Seq("curated"),
    requiredRes = Seq("variance_final")) { ctx =>
    val fin = ctx.result[Seq[VarianceVerdict]]("variance_final")
    val low = fin.filter(_.variance == "Low").map(_.stage).toSet
    val medians = ctx
      .table("curated")
      .filter(col("event_type").isInCollection(low))
      .groupBy("event_type")
      // bround = Python round() (HALF_EVEN) — the reference's
      // round(median, 0); Spark's HALF_UP round flips every exact .5,
      // which medians of even-count integer watt data hit constantly
      .agg(bround(GroupStats.exactMedian(col("median_energy_cycle")), 0).as("threshold"))
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .toMap
    val out = fin.map(v => StageThreshold(v.stage, if (low(v.stage)) medians.get(v.stage) else None))
    ctx.withResult("thresholds", out)
  }

  val steps: Seq[Processor] =
    Seq(getData, filterValidCycles, varianceRaw, identifyIssues, curate, varianceCurated, thresholds)

  def pipeline: Pipeline = new Pipeline(steps)

  /** Run end-to-end over an sf fixture dir; returns the final context. */
  def run(spark: SparkSession, sfDir: String): PipelineContext = {
    val ctx = PipelineContext(
      pipelineName = "power-analysis",
      tables = Map("events" -> graft.sources.Sources.events(spark, sfDir)))
    pipeline.run(ctx)
  }

  /** Thresholds as a DataFrame — the flagship's visible output. */
  def thresholdsDf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    run(spark, sfDir).result[Seq[StageThreshold]]("thresholds")
      .toDF("stage", "threshold").orderBy("stage")
  }
}
