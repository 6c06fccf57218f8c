package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a single Catalyst expression: one pass over
  * the shingle array, computing all `numHashes` family minima per row.
  *
  * Rationale: the column-function form (`numHashes` x
  * `array_min(transform(...))`) evaluates interpreted per element —
  * higher-order functions are CodegenFallback and each family re-walks
  * the array through an expression tree. Here the inner loop is plain
  * JVM: hash each shingle's bytes once (FNV-1a 64), then derive family
  * i via one round of mixing — O(shingles x families) multiply/xor,
  * no per-element expression dispatch. Same LSH statistics (seeded
  * independent families), ~10x faster at corpus scale.
  */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType | LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs array<string> or array<long>, got $other")
    }

  // Pre-hashed shingles ([[ShingleHashes]]) skip the per-string FNV:
  // the element IS the base hash.
  @transient private lazy val longInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val base = if (longInput) arr.getLong(i) else fnv1a(arr.getUTF8String(i))
        var f = 0
        while (f < numHashes) {
          // splitmix64-style finalizer over (base ^ family-tweaked seed)
          var h = base ^ (seed + 0x9e3779b97f4a7c15L * (f + 1))
          h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
          h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
          h = h ^ (h >>> 31)
          if (h < mins(f)) mins(f) = h
          f += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  def minhashSig(shingles: Column, numHashes: Int = 32, seed: Long = 42L): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes, seed))
}
