package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane signature as a single Catalyst expression: packs
  * sign(vec . plane_i) bits into one long in a tight JVM loop.
  *
  * The column-function form costs `numPlanes` interpreted
  * `aggregate(zip_with(...))` passes per row (higher-order functions
  * are CodegenFallback and box per element); here the planes live in a
  * flat primitive array and the inner loop is plain
  * multiply-accumulate — ~10x on signature-heavy paths (ANN, all-pairs
  * mining). Bit semantics identical to [[Similarity.rhpSignature]]
  * (dot accumulated in double, left to right).
  *
  * `planes` is a Seq (value equality) so plan canonicalization/CSE
  * still works; it is flattened once per executor at eval setup.
  */
case class RhpSig(child: Expression, planes: Seq[Seq[Float]]) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val flat: Array[Float] = planes.flatten.toArray
  @transient private lazy val numPlanes: Int = planes.length
  @transient private lazy val dim: Int = if (planes.isEmpty) 0 else planes.head.length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rhp_sig needs array<float|double>, got $other")
    }

  // lazy: child.dataType is only callable after analysis resolves it
  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    // a null ELEMENT poisons the whole signature to NULL — mirroring
    // [[VecDot]]'s contract — instead of silently reading 0.0, which
    // would collapse every such vector onto signature 0 (one
    // degenerate mega-bucket passing the refine prune at distance 0)
    var chk = 0
    while (chk < n) {
      if (arr.isNullAt(chk)) return null
      chk += 1
    }
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var acc = 0.0
      val base = p * dim
      var i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += v * flat(base + i)
        i += 1
      }
      if (acc > 0) sig |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSig = copy(child = newChild)
  override def prettyName: String = "rhp_sig"
}

object RhpSig {
  def rhpSig(vec: Column, planes: Array[Array[Float]]): Column =
    ColumnBridge.column(RhpSig(ColumnBridge.expression(vec), planes.map(_.toSeq).toSeq))
}
