package graft.core

import org.apache.spark.sql.DataFrame

/** One executed (or skipped) pipeline step, mirroring the reference's
  * `execution_log` entries (reference: src/core/context.py:93-109,
  * src/core/processor.py:152-155).
  */
final case class LogEntry(
    processor: String,
    timestampMs: Long,
    executionTimeSec: Double,
    skipped: Boolean = false)

/** A recorded step failure (reference: src/core/processor.py:162-166). */
final case class StepError(processor: String, message: String, timestampMs: Long)

/** Immutable pipeline state threaded through every [[Processor]].
  *
  * Spark-first re-expression of the reference's `PipelineContext`
  * (reference: src/core/context.py:8-88): the single `raw_data` frame
  * plus the `processed_data` dict collapse into one `tables` map of
  * *lazy* DataFrames; pydantic `model_copy(deep=True)` becomes a plain
  * `copy` because DataFrame plans are immutable — "deep copy" of a
  * lazy plan is a no-op reference.
  *
  * `results` holds small driver-side structured outputs (variance
  * verdicts, thresholds, issues — reference: src/core/context.py:77-88)
  * that pipeline *control flow* reads; these are the only values a
  * processor should ever `collect()`.
  */
final case class PipelineContext(
    pipelineName: String,
    correlationId: String = "",
    config: Map[String, String] = Map.empty,
    tables: Map[String, DataFrame] = Map.empty,
    results: Map[String, Any] = Map.empty,
    executionLog: Vector[LogEntry] = Vector.empty,
    errors: Vector[StepError] = Vector.empty,
    warnings: Vector[String] = Vector.empty) {

  def table(name: String): DataFrame =
    tables.getOrElse(name, throw new NoSuchElementException(s"table '$name' not in context (have: ${tables.keys.mkString(", ")})"))

  def hasTable(name: String): Boolean = tables.contains(name)

  def withTable(name: String, df: DataFrame): PipelineContext =
    copy(tables = tables + (name -> df))

  def withResult(name: String, value: Any): PipelineContext =
    copy(results = results + (name -> value))

  def result[T](name: String): T = results(name).asInstanceOf[T]

  def resultOpt[T](name: String): Option[T] = results.get(name).map(_.asInstanceOf[T])

  def withWarning(msg: String): PipelineContext = copy(warnings = warnings :+ msg)

  private[core] def logStep(name: String, seconds: Double, skipped: Boolean = false): PipelineContext =
    copy(executionLog = executionLog :+ LogEntry(name, System.currentTimeMillis(), seconds, skipped))

  private[core] def logError(name: String, message: String): PipelineContext =
    copy(errors = errors :+ StepError(name, message, System.currentTimeMillis()))
}
