package graft.text

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of the most frequent element of a string array as ONE
  * Catalyst expression: a single O(n) pass with a hash map of exact
  * `UTF8String` keys (no hashing-only shortcut — counts are exact,
  * which is what keeps the q42 oracle hash-exact).
  *
  * This replaces the column-algebra forms on the quality-gate hot
  * path: the naive `transform(array_distinct, t -> size(filter(...)))`
  * is O(distinct x n) per row — quadratic on the 100k-token documents
  * the gate itself admits — and the sort + longest-equal-run
  * `aggregate` form is O(n log n) and interpreted per lambda step.
  * Here there is no sort, no per-element lambda dispatch, and no
  * string allocation (keys are views into the array buffer, stable
  * for the duration of one eval).
  *
  * Empty arrays count 0 (a document with no tokens has no most
  * frequent token); null input is null (UnaryExpression default);
  * NULL ELEMENTS ARE SKIPPED — the column-algebra forms this replaces
  * null-propagate the `x === t` comparison so a null element never
  * contributes to any count, and the expression is SQL-registered
  * (`most_frequent_count`), so user arrays with nulls must get the
  * same answer as the documented replacement semantics (an all-null
  * array counts 0, like an empty one). Pinned by
  * GraftExtensionsSpec's null-element case.
  */
case class MostFrequentCount(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "most_frequent_count"

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"most_frequent_count needs array<string>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0
    val counts = new java.util.HashMap[UTF8String, Integer](math.max(8, n * 2))
    var best = 0
    var i = 0
    while (i < n) {
      // null elements (possible by type, absent from split() output)
      // are skipped: the column-algebra form's `x === t` comparison
      // null-propagates, so nulls contribute 0 there too
      if (!arr.isNullAt(i)) {
        val c: Int = counts.merge(arr.getUTF8String(i), Integer.valueOf(1), (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): MostFrequentCount =
    copy(child = newChild)
}
