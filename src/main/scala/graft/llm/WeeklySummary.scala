package graft.llm

import graft.ops.TimeWindows
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** The reference's GenAI analysis stage re-expressed Spark-first
  * (reference: Requirements/ExampleAiCode.md:156-495): weekly
  * Sunday-aligned per-stage statistics, stage-pair expansion for
  * High-variance stages, prompt assembly, and a pluggable LLM client.
  *
  * The data plane stays lazy DataFrames; ONLY the final weekly summary
  * (tiny by construction: weeks x stages rows) is collected for prompt
  * assembly, exactly as the reference keeps the LLM call out of the
  * data path (ExampleAiCode.md:387-417 is a driver-side provider
  * switch; ExamplePipelineCode.md:486-493 pins it as manual-trigger).
  */
object WeeklySummary {

  /** Stage-pair expansion: for every High-variance stage, analysis
    * covers the stage plus its configured counterpart (the reference's
    * Python-set algebra over stage names,
    * ExampleAiCode.md:177-191) — driver-side Scala, not a data op.
    */
  def stagesToAnalyse(
      highVariance: Set[String],
      pairs: Seq[(String, String)]): Set[String] =
    pairs.foldLeft(highVariance) { case (acc, (a, b)) =>
      if (acc.contains(a) || acc.contains(b)) acc + a + b else acc
    }

  /** Weekly per-stage stats over the analysis window (F5/F6 + A2/A3):
    * Sunday week buckets, count, mean, exact median, population std —
    * all rounded to int for the prompt (ExampleAiCode.md:236-241;
    * `count` is the reference's `len(stage_df)`, so it counts
    * null-value rows too). The aggregation is
    * [[graft.ops.TimeWindows.roundedWeeklyStats]] — ONE definition of
    * the week bucket + HALF_EVEN rounding, this facade only scopes the
    * stages and renames for the prompt.
    */
  def weeklyStats(
      df: DataFrame,
      tsCol: String,
      stageCol: String,
      valueCol: String,
      stages: Set[String]): DataFrame =
    TimeWindows.roundedWeeklyStats(
      df.filter(col(stageCol).isInCollection(stages)), tsCol, Seq(stageCol), valueCol)
      .withColumnRenamed(stageCol, "stage")
      .orderBy("week_start", "stage")

  /** Prompt assembly from the *collected* weekly summary — the f-string
    * report of the reference (ExampleAiCode.md:246-269,250-383),
    * driver-side by design.
    */
  def buildPrompt(deviceId: String, weekly: Array[Row]): String = {
    // a stage whose values are ALL null has count > 0 (len semantics)
    // but null mean/median/std — render n/a, never a fabricated 0
    // (getAs[Int] silently unboxes null to 0) that the LLM would read
    // as a real zero-watt anomaly
    def stat(r: Row, c: String): String =
      if (r.isNullAt(r.fieldIndex(c))) "n/a" else r.getAs[Int](c).toString
    val byWeek = weekly.groupBy(_.getAs[String]("week_label")).toSeq.sortBy(_._1)
    val body = byWeek.map { case (label, rows) =>
      val lines = rows.sortBy(_.getAs[String]("stage")).map { r =>
        s"  ${r.getAs[String]("stage")}: count=${r.getAs[Long]("count")}, " +
          s"mean=${stat(r, "mean")}, median=${stat(r, "median")}, " +
          s"std_dev=${stat(r, "std_dev")}"
      }
      s"Week $label:\n" + lines.mkString("\n")
    }.mkString("\n\n")
    s"""You are an HVAC power-consumption analyst. Device: $deviceId.
       |Weekly per-stage power statistics (watts):
       |
       |$body
       |
       |Identify anomalous weeks, likely equipment issues (e.g. short
       |cycling, stage failure), and whether consumption is drifting.
       |""".stripMargin
  }

  /** Pluggable LLM boundary. The engine ships only [[EchoLlm]] — this
    * environment has no network; a production client implements this
    * trait per provider (the reference's OpenAI/Azure/Anthropic/Google
    * switch, ExampleAiCode.md:387-417).
    */
  trait LlmClient { def complete(prompt: String): String }

  /** Deterministic stub: summarizes the prompt instead of calling out. */
  object EchoLlm extends LlmClient {
    def complete(prompt: String): String =
      s"[stub-llm] analysed ${prompt.linesIterator.count(_.startsWith("Week "))} weeks; " +
        s"prompt_chars=${prompt.length}"
  }

  /** End-to-end AI stage: weekly stats -> collect -> prompt -> client.
    * Returns (prompt, response).
    */
  def analyse(
      df: DataFrame,
      deviceId: String,
      tsCol: String,
      stageCol: String,
      valueCol: String,
      highVariance: Set[String],
      pairs: Seq[(String, String)] = Seq(("cooling_stage_1", "cooling_stage_2"), ("heating_stage_1", "heating_stage_2")),
      client: LlmClient = EchoLlm): (String, String) = {
    val stages = stagesToAnalyse(highVariance, pairs)
    val weekly = weeklyStats(df, tsCol, stageCol, valueCol, stages).collect()
    val prompt = buildPrompt(deviceId, weekly)
    (prompt, client.complete(prompt))
  }
}
