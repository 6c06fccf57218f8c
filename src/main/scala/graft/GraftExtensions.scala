package graft

import graft.dedup.{MinHashSig, ShingleHashes, SimHash64}
import graft.similarity.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Session extensions exposing the engine's custom Catalyst
  * expressions to SQL:
  *
  *   spark.sql("SELECT simhash64(split(text, ' ')) FROM docs")
  *   spark.sql("SELECT minhash_sig(shingles, 32, 42) FROM docs")
  *   spark.sql("SELECT shingle_hashes(text, 3) FROM docs")
  *   spark.sql("SELECT vec_dot(a.embedding, b.embedding) FROM ...")
  *
  * Register with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`. Injection-based
  * registration is the supported extension point for adding functions
  * without patching Spark (SparkSessionExtensions.injectFunction).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Evaluate a scalar argument that must be a CONSTANT integral —
    * accepts any foldable integral expression (an INT or BIGINT
    * literal, `1 + 2`, a cast), not just a bare IntegerType Literal,
    * and rejects everything else at analysis time with an error that
    * names the expected type instead of a bare IllegalArgument from a
    * failed pattern match.
    */
  private def foldableLong(e: Expression, fn: String, arg: String): Long = {
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (!e.foldable || !integral) throw new IllegalArgumentException(
      s"$fn: argument '$arg' must be a foldable integral expression " +
        s"(INT/BIGINT literal or constant), got ${e.dataType.simpleString} ${e.sql}")
    e.eval() match {
      case null => throw new IllegalArgumentException(s"$fn: argument '$arg' must not be null")
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
    }
  }

  private def foldableInt(e: Expression, fn: String, arg: String): Int = {
    val l = foldableLong(e, fn, arg)
    if (l < Int.MinValue || l > Int.MaxValue) throw new IllegalArgumentException(
      s"$fn: argument '$arg' = $l overflows INT")
    l.toInt
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64(tokens)")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => children match {
        case Seq(sh) => MinHashSig(sh, 32, 42L)
        case Seq(sh, n) => MinHashSig(sh, foldableInt(n, "minhash_sig", "numHashes"), 42L)
        case Seq(sh, n, seed) => MinHashSig(sh, foldableInt(n, "minhash_sig", "numHashes"),
          foldableLong(seed, "minhash_sig", "seed"))
        case _ => throw new IllegalArgumentException("minhash_sig(shingles[, numHashes[, seed]])")
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => ShingleHashes(text, 3)
        case Seq(text, n) => ShingleHashes(text, foldableInt(n, "shingle_hashes", "n"))
        case _ => throw new IllegalArgumentException("shingle_hashes(text[, n])")
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_dot(a, b)")
        VecDot(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("distinct_ngrams"),
      new ExpressionInfo(classOf[graft.text.DistinctNgrams].getName, "distinct_ngrams"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => graft.text.DistinctNgrams(text, 3)
        case Seq(text, n) => graft.text.DistinctNgrams(text,
          foldableInt(n, "distinct_ngrams", "n"))
        case _ => throw new IllegalArgumentException("distinct_ngrams(text[, n])")
      }))
    ext.injectFunction((
      FunctionIdentifier("most_frequent_count"),
      new ExpressionInfo(classOf[graft.text.MostFrequentCount].getName, "most_frequent_count"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "most_frequent_count(array<string>)")
        graft.text.MostFrequentCount(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.text.NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "nfc_normalize(string)")
        graft.text.NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("pushdown_fence"),
      new ExpressionInfo(classOf[graft.plans.PushdownFence].getName, "pushdown_fence"),
      (children: Seq[Expression]) => {
        require(children.isEmpty, "pushdown_fence()")
        graft.plans.PushdownFence()
      }))
    // Flag-gated optimizer rule: exact percentile -> t-digest sketch
    // when spark.graft.approxRewrite=true (see ApproxRewrite scaladoc).
    ext.injectOptimizerRule(_ => new graft.plans.ApproxRewrite)
  }
}
