package graft.hvac

/** Typed result rows for the flagship pipeline — the Spark analogue of
  * the reference's per-stage result dicts
  * (reference: Requirements/ExamplePipelineCode.md:36-49,79-99).
  */
final case class VarianceVerdict(
    stage: String,
    variance: String, // "High" | "Low"
    reason: String,
    nComponents: Int,
    means: Seq[Double],
    weights: Seq[Double],
    variances: Seq[Double],
    rcv: Option[Double],
    nSamples: Long)

final case class StageIssues(
    stage: String,
    lowCycleCount: Boolean,
    shortCycling: Boolean)

final case class StageThreshold(
    stage: String,
    threshold: Option[Double]) // None when variance High or no curated data

final case class StageSample(stage: String, value: Double, tsMicros: Long)
