package graft

import graft.dedup.{MinHashSig, ShingleHashes, SimHash64}
import graft.similarity.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

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
      (children: Seq[Expression]) => {
        def litInt(e: Expression, d: Int): Int = e match {
          case Literal(v: Int, _) => v
          case Literal(v: Long, _) => v.toInt
          case _ => d
        }
        def litLong(e: Expression, d: Long): Long = e match {
          case Literal(v: Int, _) => v.toLong
          case Literal(v: Long, _) => v
          case _ => d
        }
        children match {
          case Seq(sh) => MinHashSig(sh, 32, 42L)
          case Seq(sh, n) => MinHashSig(sh, litInt(n, 32), 42L)
          case Seq(sh, n, seed) => MinHashSig(sh, litInt(n, 32), litLong(seed, 42L))
          case _ => throw new IllegalArgumentException("minhash_sig(shingles[, numHashes[, seed]])")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => ShingleHashes(text, 3)
        case Seq(text, Literal(n: Int, _)) => ShingleHashes(text, n)
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
        case Seq(text, Literal(n: Int, _)) => graft.text.DistinctNgrams(text, n)
        case _ => throw new IllegalArgumentException("distinct_ngrams(text[, n])")
      }))
    ext.injectFunction((
      FunctionIdentifier("most_frequent_count"),
      new ExpressionInfo(classOf[graft.text.MostFrequentCount].getName, "most_frequent_count"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "most_frequent_count(array<string>)")
        graft.text.MostFrequentCount(children.head)
      }))
    // Flag-gated optimizer rule: exact percentile -> t-digest sketch
    // when spark.graft.approxRewrite=true (see ApproxRewrite scaladoc).
    ext.injectOptimizerRule(_ => new graft.plans.ApproxRewrite)
  }
}
