package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes of a text column as ONE Catalyst
  * expression: tokenize the UTF-8 bytes on single spaces (identical
  * boundary semantics to `split(text, " ")` with Java's keep-trailing
  * -empties behavior), FNV-1a hash each token's bytes, then roll an
  * n-token window combining token hashes (FNV fold + splitmix64
  * avalanche), sort + dedup in a primitive array.
  *
  * This replaces the staged column pipeline
  * `tokens -> transform(sequence, concat_ws(element_at...)) ->
  * xxhash64(string)` on every dedup hot path. That pipeline is
  * interpreted (higher-order functions are CodegenFallback), builds an
  * n-word STRING per shingle per row, and re-walks the token array
  * 3x per gram; here the whole thing is one pass over the raw bytes
  * with zero string allocation. Equality of n-token sequences maps 1:1
  * to equality of shingle strings (tokens contain no spaces), so set
  * cardinalities — and therefore every Jaccard value computed from
  * these sets — are identical to the string form modulo 2^-64 hash
  * collisions.
  *
  * Texts with fewer than `n` tokens yield an empty array (same
  * contract as [[Dedup.shinglesFromTokens]]).
  */
case class ShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width n=$n must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes needs string, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    // Pass 1: token FNV-1a hashes. Boundaries at every 0x20 byte (safe
    // in UTF-8: continuation/lead bytes are all >= 0x80). Empty tokens
    // (leading/trailing/double spaces) hash to the FNV offset basis,
    // exactly like "".
    var tokCount = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) tokCount += 1; i += 1 }
    val tok = new Array[Long](tokCount)
    var t = 0
    var h = Fnv.Basis
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 0x20) { tok(t) = h; t += 1; h = Fnv.Basis }
      else { h = (h ^ (b & 0xffL)) * Fnv.Prime }
      i += 1
    }
    tok(t) = h
    if (tokCount < n) return new GenericArrayData(Array.emptyLongArray)
    // Pass 2: n-token windows — FNV fold over the token hashes, then a
    // splitmix64 avalanche so single-token differences diffuse.
    val grams = new Array[Long](tokCount - n + 1)
    var g = 0
    while (g < grams.length) {
      var acc = Fnv.Basis
      var j = 0
      while (j < n) { acc = (acc ^ tok(g + j)) * Fnv.Prime; j += 1 }
      grams(g) = Fnv.avalanche(acc)
      g += 1
    }
    // Sort + dedup in place: deterministic output order, no boxing.
    java.util.Arrays.sort(grams)
    var w = 1
    var r = 1
    while (r < grams.length) {
      if (grams(r) != grams(w - 1)) { grams(w) = grams(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == grams.length) grams else java.util.Arrays.copyOf(grams, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes = copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

private[dedup] object Fnv {
  final val Basis = 0xcbf29ce484222325L
  final val Prime = 0x100000001b3L
  def avalanche(x: Long): Long = {
    var h = x
    h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
    h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }
}

object ShingleHashes {
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(text), n))
}
