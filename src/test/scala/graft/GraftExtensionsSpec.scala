package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Custom expressions are reachable from SQL via the injected
  * extensions (own session: extensions bind at session build time).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  // getOrCreate() would silently return the suite-shared session and
  // skip the extensions, so clear the default first (same underlying
  // SparkContext; the shared session is restored afterwards).
  private lazy val spark: SparkSession = {
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-tests")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    prev.foreach(SparkSession.setDefaultSession)
    s
  }

  test("simhash64 and minhash_sig are callable from SQL") {
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT simhash64(split('a b c a', ' ')) AS sh,
        |       minhash_sig(array('a b c', 'b c d'), 8, 42) AS mh""".stripMargin).head()
    assert(row.getLong(0) != 0L)
    assert(row.getSeq[Long](1).length == 8)
    // SQL result equals the Column-API result
    import spark.implicits._
    val viaColumn = Seq("a b c a").toDF("t")
      .select(graft.dedup.SimHash64.simhash64(org.apache.spark.sql.functions.split($"t", " ")))
      .head().getLong(0)
    assert(row.getLong(0) == viaColumn)
  }

  test("approx-rewrite rule swaps exact percentile for t-digest only when flagged") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("g", "v")
    df.createOrReplaceTempView("approx_src")
    def optimizedPlan: String = {
      val q = spark.sql("SELECT g, percentile(v, 0.5) AS med FROM approx_src GROUP BY g")
      q.queryExecution.optimizedPlan.toString
    }
    spark.conf.set(graft.plans.ApproxRewrite.Flag, "false")
    assert(optimizedPlan.contains("percentile(") && !optimizedPlan.contains("percentile_approx"))
    try {
      spark.conf.set(graft.plans.ApproxRewrite.Flag, "true")
      assert(optimizedPlan.contains("percentile_approx"), optimizedPlan)
      // value sanity: t-digest median of 1..1000 lands near 500
      val med = spark.sql("SELECT percentile(v, 0.5) FROM approx_src").head().getDouble(0)
      assert(math.abs(med - 500.0) < 20.0, med.toString)
      // weighted percentile (frequency column) must stay EXACT
      val weighted = spark.sql("SELECT percentile(v, 0.5, CAST(2 AS BIGINT)) FROM approx_src")
        .queryExecution.optimizedPlan.toString
      assert(!weighted.contains("percentile_approx"), weighted)
      // non-double value columns must stay exact too: Percentile returns
      // DOUBLE but ApproximatePercentile returns the child's type, so a
      // rewrite would change the aggregate's dataType mid-plan
      val intCol = spark.sql("SELECT percentile(CAST(v AS BIGINT), 0.5) FROM approx_src")
      assert(!intCol.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      val medInt = intCol.head().getDouble(0)
      assert(medInt == 500.5, medInt.toString) // still the exact interpolated median
      // a truthy-but-not-"true" spelling stays OFF (tolerant) but is
      // NOT silent: the first such value is recorded for the
      // once-per-JVM warning
      spark.conf.set(graft.plans.ApproxRewrite.Flag, "1")
      assert(!optimizedPlan.contains("percentile_approx"))
      assert(graft.plans.ApproxRewrite.warnedValue.get() == "1")
    } finally spark.conf.set(graft.plans.ApproxRewrite.Flag, "false")
  }

  test("shingle_hashes and vec_dot are callable from SQL") {
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT shingle_hashes('a b c d', 3) AS sh,
        |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""".stripMargin).head()
    assert(row.getSeq[Long](0).length == 2) // "a b c", "b c d"
    assert(row.getDouble(1) == 11.0)
    // SQL shingle hashes equal the Column-API hashes
    import spark.implicits._
    val viaColumn = Seq("a b c d").toDF("t")
      .select(graft.dedup.ShingleHashes.shingleHashes($"t", 3))
      .head().getSeq[Long](0)
    assert(row.getSeq[Long](0) == viaColumn)
  }

  test("pushdown_fence is callable from SQL, true-valued, and non-deterministic in the plan") {
    val df = spark.sql("SELECT pushdown_fence() AS f")
    assert(df.head().getBoolean(0))
    assert(!graft.plans.PushdownFence().deterministic)
    intercept[Exception](spark.sql("SELECT pushdown_fence(1)").head())
  }

  test("distinct_ngrams is callable from SQL") {
    val row = spark.sql(
      "SELECT distinct_ngrams('a b c d', 3) AS g3, distinct_ngrams('a b a b', 2) AS g2").head()
    assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(row.getSeq[String](1) == Seq("a b", "b a")) // first-occurrence order
  }

  test("nfc_normalize is callable from SQL and recomposes") {
    val row = spark.sql(
      "SELECT nfc_normalize('café') AS c, nfc_normalize(CAST(NULL AS STRING)) AS n").head()
    assert(row.getString(0) == "café")
    assert(row.isNullAt(1))
  }

  test("most_frequent_count is callable from SQL and counts exactly") {
    val row = spark.sql(
      """SELECT most_frequent_count(split('a b a b a', ' ')) AS c,
        |       most_frequent_count(CAST(array() AS ARRAY<STRING>)) AS empty,
        |       most_frequent_count(CAST(NULL AS ARRAY<STRING>)) AS n""".stripMargin).head()
    assert(row.getInt(0) == 3) // 'a' appears 3 times
    assert(row.getInt(1) == 0) // empty array: no most frequent token
    assert(row.isNullAt(2))    // null in, null out
  }

  test("most_frequent_count skips null elements like the column-algebra form it replaces") {
    // the `x === t` comparison in the documented replacement
    // null-propagates, so null elements contribute 0 — a user array
    // with nulls must not let the null "win"
    val row = spark.sql(
      """SELECT most_frequent_count(array('a', NULL, NULL)) AS skipped,
        |       most_frequent_count(array(CAST(NULL AS STRING))) AS allNull""".stripMargin).head()
    assert(row.getInt(0) == 1, "nulls must not out-count a real element")
    assert(row.getInt(1) == 0, "an all-null array counts like an empty one")
  }

  test("constant integral args accept any foldable integral expression, reject the rest") {
    // BIGINT literal, arithmetic, and a cast all fold to the same n
    val row = spark.sql(
      """SELECT distinct_ngrams('a b c d', CAST(3 AS BIGINT)) AS g1,
        |       distinct_ngrams('a b c d', 1 + 2) AS g2,
        |       shingle_hashes('a b c d', CAST(3 AS TINYINT)) AS sh,
        |       minhash_sig(array('a b c'), 2 + 6, CAST(42 AS BIGINT)) AS mh""".stripMargin).head()
    assert(row.getSeq[String](0) == Seq("a b c", "b c d"))
    assert(row.getSeq[String](1) == Seq("a b c", "b c d"))
    assert(row.getSeq[Long](2).length == 2)
    assert(row.getSeq[Long](3).length == 8)
    // non-integral / non-foldable n is an analysis-time error naming
    // the expected type, not a bare match failure
    val e = intercept[Exception] {
      spark.sql("SELECT distinct_ngrams('a b', 'x')").head()
    }
    assert(e.getMessage.contains("foldable integral"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT shingle_hashes('a b', 2.5)").head()
    }
    assert(e2.getMessage.contains("foldable integral"), e2.getMessage)
  }
}
