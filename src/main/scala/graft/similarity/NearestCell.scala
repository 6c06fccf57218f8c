package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** IVF cell assignment as a single Catalyst expression: argmax of
  * dot(vec, centroid_c) over all centroids, ties to the smallest cell
  * index — exactly the semantics of the former column form
  * (`array_min` over (neg-dot, cell) structs), but one flat
  * multiply-accumulate loop per row instead of k interpreted
  * higher-order dot products (higher-order functions are
  * CodegenFallback and box per element).
  *
  * `centroids` is a Seq-of-Seq (value equality) so plan
  * canonicalization/CSE work; flattened once per executor at eval
  * setup, same pattern as [[RhpSig]].
  */
case class NearestCell(child: Expression, centroids: Seq[Seq[Float]])
  extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "at least one centroid")

  override def dataType: DataType = IntegerType

  @transient private lazy val flat: Array[Float] = centroids.flatten.toArray
  @transient private lazy val k: Int = centroids.length
  @transient private lazy val dim: Int = centroids.head.length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cell needs array<float|double>, got $other")
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dim
      var i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += v * flat(base + i)
        i += 1
      }
      if (acc > bestDot) { bestDot = acc; best = c }
      c += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCell = copy(child = newChild)
  override def prettyName: String = "nearest_cell"
}

object NearestCell {
  def nearestCell(vec: Column, centroids: Array[Array[Float]]): Column =
    ColumnBridge.column(NearestCell(ColumnBridge.expression(vec), centroids.map(_.toSeq).toSeq))
}

/** The `nprobe` nearest cells (by dot product, descending; ties to the
  * smaller index) as an `array<int>` — the multi-cell probe assignment
  * used by batch KNN joins. Same tight-loop pattern as [[NearestCell]]
  * with a small partial selection instead of a single argmax.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Float]], nprobe: Int)
  extends UnaryExpression with CodegenFallback {

  require(centroids.nonEmpty, "at least one centroid")
  require(nprobe >= 1 && nprobe <= centroids.length, s"nprobe=$nprobe of ${centroids.length}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val flat: Array[Float] = centroids.flatten.toArray
  @transient private lazy val k: Int = centroids.length
  @transient private lazy val dim: Int = centroids.head.length

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cells needs array<float|double>, got $other")
    }

  @transient private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = math.min(arr.numElements(), dim)
    val dots = new Array[Double](k)
    var c = 0
    while (c < k) {
      var acc = 0.0
      val base = c * dim
      var i = 0
      while (i < n) {
        val v = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        acc += v * flat(base + i)
        i += 1
      }
      // NaN dots (a NaN query element or NaN centroid) sanitize to
      // -Inf so a NaN cell can never out-rank a finite one: NaN never
      // wins '>' but also never LOSES it once it is the incumbent, so
      // an unsanitized NaN at a low index would block every genuinely
      // nearer cell behind it.
      dots(c) = if (java.lang.Double.isNaN(acc)) Double.NegativeInfinity else acc
      c += 1
    }
    // selection sort of the top nprobe — k is small (k-means cells).
    // With all dots finite (post-sanitize) the best == -1 clause takes
    // the first untaken cell on all-(-Inf) ties, keeping the probe
    // list total and deterministic even for degenerate query vectors.
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var s = 0
    while (s < nprobe) {
      var best = -1
      var bestDot = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        if (!taken(j) && (best == -1 || dots(j) > bestDot)) { bestDot = dots(j); best = j }
        j += 1
      }
      taken(best) = true
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells = copy(child = newChild)
  override def prettyName: String = "nearest_cells"
}

object NearestCells {
  def nearestCells(vec: Column, centroids: Array[Array[Float]], nprobe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(vec), centroids.map(_.toSeq).toSeq, nprobe))
}
