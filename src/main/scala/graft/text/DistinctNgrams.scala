package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct space-joined word n-grams of a text column as ONE Catalyst
  * expression, replacing the staged column pipeline
  * `split -> transform(sequence, array_join(slice(...))) ->
  * array_distinct` on the decontamination/novelty hot paths. That
  * pipeline is interpreted (higher-order functions are
  * CodegenFallback) and allocates a slice array plus a joined string
  * per gram per row; here the key observation is that with
  * single-space tokenization the join is the IDENTITY on the
  * underlying bytes — an n-gram "t_i .. t_{i+n-1}" joined by one
  * space is exactly the byte span of the original text from the
  * start of token i to the end of token i+n-1. So each gram is one
  * `UTF8String` view over a span of the row's bytes: a single scan
  * finds token starts, each window emits a span, and a linked hash
  * set dedups in FIRST-OCCURRENCE order (the `array_distinct`
  * contract, making this a bit-exact drop-in — pinned by
  * DistinctNgramsSpec against the column form, empty/repeated-space
  * tokens included).
  *
  * Texts with fewer than `n` tokens yield an empty array, same as
  * [[Decontamination.ngramsOfTokens]].
  */
case class DistinctNgrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"n=$n must be positive")

  override def prettyName: String = "distinct_ngrams"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_ngrams needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // Token boundaries at every 0x20 byte — safe in UTF-8
    // (continuation/lead bytes are all >= 0x80) and identical to
    // `split(text, " ")` incl. empty tokens from repeated spaces.
    var tokCount = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) tokCount += 1; i += 1 }
    if (tokCount < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](tokCount)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val out = new java.util.LinkedHashSet[UTF8String](math.max(8, tokCount * 2))
    var g = 0
    val last = tokCount - n
    while (g <= last) {
      // span: start of token g .. end of token g+n-1 (the byte before
      // the next separator, or end of text for the final token)
      val from = starts(g)
      val until = if (g + n < tokCount) starts(g + n) - 1 else bytes.length
      out.add(UTF8String.fromBytes(bytes, from, until - from))
      g += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctNgrams =
    copy(child = newChild)
}
