package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, TrueLiteral}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** An explicit optimizer fence: a boolean expression that always
  * evaluates to `true` but DECLARES itself non-deterministic, so
  * Catalyst's predicate pushdown (`PushPredicateThroughNonJoin`
  * crosses only all-deterministic Projects) will not move a filter
  * referencing it below the projection it guards, and common
  * projections under it are not inlined into scan-level predicates.
  *
  * This exists to make a load-bearing plan shape an EXPLICIT intent
  * rather than a side effect of `rand()`: the quality gate
  * ([[graft.text.QualityFilters.gophered]]) computes six signals from
  * one tokenization, and letting the keep-filter push through the
  * signal project re-inlines the tokenizer per reference (measured
  * ~30x at sf0.1, 21 split sites). `rand() >= 0` achieves the same
  * block but reads as an accident; a future reader deleting the
  * "pointless" random column reintroduces the regression silently.
  * `pushdown_fence()` in a plan names the contract.
  *
  * Properties, each load-bearing:
  *  - `deterministic = false` — the only bit the pushdown rule reads;
  *    value-wise the expression IS deterministic (always true), so
  *    results are reproducible and retries/speculative tasks agree.
  *  - leaf, stateless, no `Nondeterministic` init — safe on
  *    streaming DataFrames (the gate runs unchanged on streams;
  *    unlike `monotonically_increasing_id`, which streaming rejects).
  *  - not foldable — `ConstantFolding`/`BooleanSimplification` can't
  *    erase it (they only match `Literal(true)`).
  *  - codegen emits the literal `true` — zero cost inside
  *    whole-stage codegen, no function call, no state.
  *
  * Usage contract (same as the rand() form it replaces): project the
  * fence as a column, reference that column in the filter conjunct,
  * drop it after — an UNREFERENCED fence column is removed by column
  * pruning and the now-deterministic project is pushed through again.
  * TextPlanSpec's one-split-site assertions pin the end-to-end
  * behavior against Spark upgrades.
  */
case class PushdownFence() extends LeafExpression {

  override def prettyName: String = "pushdown_fence"

  override def nullable: Boolean = false

  override def dataType: DataType = BooleanType

  // The whole point. NOT the Nondeterministic trait: that adds
  // per-partition init we don't need and streaming-unsupported checks
  // key off specific classes, not this flag.
  override lazy val deterministic: Boolean = false

  override def foldable: Boolean = false

  override def eval(input: InternalRow): Any = true

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ExprCode.forNonNullValue(TrueLiteral)
}

object PushdownFence {
  /** The fence as a Column, for `withColumn("__fence", fence)`. */
  def fence: Column = ColumnBridge.column(PushdownFence())
}
