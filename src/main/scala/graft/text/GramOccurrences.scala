package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Every word n-gram OCCURRENCE of a text column for n = `minN`..
  * `maxN`, as ONE Catalyst expression — the occurrence-weighted
  * sibling of [[DistinctNgrams]] (same byte-span construction, no
  * dedup, all requested orders in a single scan).
  *
  * This is the feature stream of hashed-n-gram importance weighting
  * (DSIR, Xie et al. 2023): unlike the decontamination/novelty paths,
  * which score MEMBERSHIP and therefore want per-document distinct
  * grams, importance weights are sums over gram OCCURRENCES — a word
  * used five times contributes five times. The column-algebra
  * equivalent (`concat(split(...), transform(sequence(...), ...))`)
  * evaluates its higher-order functions interpreted and, as a
  * generator input, gets re-inlined into optimizer-inferred filters
  * (see [[DistinctNgrams]]); one expression evaluated once per row
  * sidesteps both.
  *
  * Output order is scan order (all unigrams, then all bigrams, ...);
  * consumers aggregate, so only multiset equality is contractual —
  * pinned bit-exact against the staged column form by
  * GramOccurrencesSpec, repeated/empty tokens included. Texts with
  * fewer than n tokens contribute no n-grams of that order; null
  * texts yield null (UnaryExpression null-propagation).
  */
case class GramOccurrences(child: Expression, maxN: Int, minN: Int = 1)
  extends UnaryExpression with CodegenFallback {

  require(minN >= 1, s"minN=$minN must be positive")
  require(maxN >= minN, s"maxN=$maxN must be >= minN=$minN")

  override def prettyName: String = "gram_occurrences"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_occurrences needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // Token boundaries at every 0x20 byte — identical to
    // `split(text, " ")` incl. empty tokens from repeated spaces
    // (and UTF-8-safe: continuation/lead bytes are >= 0x80).
    var tokCount = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) tokCount += 1; i += 1 }
    val starts = new Array[Int](tokCount)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    // total grams = sum over n of max(0, tokCount - n + 1)
    var total = 0
    var n = minN
    while (n <= maxN) { total += math.max(0, tokCount - n + 1); n += 1 }
    val out = new Array[Any](total)
    var o = 0
    n = minN
    while (n <= maxN) {
      var g = 0
      val last = tokCount - n
      while (g <= last) {
        val from = starts(g)
        val until = if (g + n < tokCount) starts(g + n) - 1 else bytes.length
        out(o) = UTF8String.fromBytes(bytes, from, until - from)
        o += 1
        g += 1
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): GramOccurrences =
    copy(child = newChild)
}
