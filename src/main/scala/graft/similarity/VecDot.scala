package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** dot(a, b) as a single Catalyst expression: one multiply-accumulate
  * loop per pair, accumulated in double left-to-right. For DOUBLE
  * arrays this is bit-identical to the column-function form
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` it replaces on hot
  * paths; for FLOAT arrays it is deliberately NOT — the HOF form
  * multiplies two FloatType operands in float before widening, while
  * this expression widens each operand to double first, matching how
  * a DuckDB `DOUBLE[]` oracle computes the same product (that widen-
  * first arithmetic is what makes q28/q38 cosine doubles hash-exact).
  * It keeps the HOF form's malformed-input contract: mismatched
  * lengths or a null element yield NULL (zip_with pads the shorter
  * side with nulls, poisoning the sum), so truncated or hole-y
  * embeddings fall out of threshold filters and top-k instead of
  * ranking with a silently-wrong score.
  * The HOF form evaluates interpreted (CodegenFallback, boxing per
  * element); on per-candidate verification in all-pairs mining that
  * is the dominant cost once candidate generation is banded. Mixed
  * float/double operands are fine (each side widens to double).
  */
case class VecDot(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  // null even for non-null children: mismatched lengths / null elements
  override def nullable: Boolean = true

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs two array<float|double>, got ${left.dataType} x ${right.dataType}")

  @transient private lazy val leftFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val rightFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

object VecDot {
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
