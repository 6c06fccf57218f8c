package graft.core

import org.apache.spark.sql.types.StructType

/** A single stateless transform step, the engine's user extension point.
  *
  * Spark re-expression of the reference's `Processor` ABC (reference:
  * src/core/processor.py:56-156): `process` builds *lazy* DataFrame
  * plans into a new context; `validatePrerequisites` /
  * `validateOutput` are the declarative required-tables /
  * required-columns hooks (reference: src/core/processor.py:79-110;
  * required-columns example: Architectural Options/Opus.md:385-392).
  *
  * Timing + logging of each call mirrors processor.__call__
  * (reference: src/core/processor.py:112-156).
  */
trait Processor extends Serializable {

  def name: String = getClass.getSimpleName.stripSuffix("$")

  /** Tables that must exist in the context before this step runs. */
  def requiredTables: Seq[String] = Nil

  /** Per-table columns that must be present (table -> column names). */
  def requiredColumns: Map[String, Seq[String]] = Map.empty

  /** Driver-side `results` keys that must exist before this step runs
    * — the control-plane twin of [[requiredTables]] (a step gated off
    * by a Pipeline condition, or a runPartial slice starting past the
    * producer, should fail with the framework's named error rather
    * than a bare `key not found` from Map.apply).
    */
  def requiredResults: Seq[String] = Nil

  def process(ctx: PipelineContext): PipelineContext

  /** Throws IllegalStateException on a missing table or column —
    * analysis-time schema checks, the Spark analogue of the reference's
    * runtime column validation (src/core/processor.py:79-93).
    */
  def validatePrerequisites(ctx: PipelineContext): Unit = {
    requiredTables.foreach { t =>
      if (!ctx.hasTable(t))
        throw new IllegalStateException(s"$name: required table '$t' missing from context")
    }
    requiredResults.foreach { k =>
      if (!ctx.results.contains(k))
        throw new IllegalStateException(
          s"$name: required result '$k' missing from context (producer step gated off or not in the slice?)")
    }
    requiredColumns.foreach { case (t, cols) =>
      val schema: StructType = ctx.table(t).schema
      val have = schema.fieldNames.toSet
      val missing = cols.filterNot(have)
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"$name: table '$t' missing required columns ${missing.mkString(", ")} (has: ${have.mkString(", ")})")
    }
  }

  /** Hook for output invariants (reference: src/core/processor.py:95-110). */
  def validateOutput(ctx: PipelineContext): Unit = ()

  /** Validate -> process -> validate -> log, with wall-time capture. */
  final def apply(ctx: PipelineContext): PipelineContext = {
    val t0 = System.nanoTime()
    validatePrerequisites(ctx)
    val out = process(ctx)
    validateOutput(out)
    out.logStep(name, (System.nanoTime() - t0) / 1e9)
  }
}

object Processor {
  /** Lift a plain function into a named Processor. */
  def apply(
      stepName: String,
      required: Seq[String] = Nil,
      requiredRes: Seq[String] = Nil)(fn: PipelineContext => PipelineContext): Processor =
    new Processor {
      override def name: String = stepName
      override def requiredTables: Seq[String] = required
      override def requiredResults: Seq[String] = requiredRes
      override def process(ctx: PipelineContext): PipelineContext = fn(ctx)
    }
}
