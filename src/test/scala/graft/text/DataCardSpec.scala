package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class DataCardSpec extends SparkSpec {
  import sqlImplicits._

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def collect(p: SparkPlan): Seq[ShuffleExchangeLike] =
      (p match { case s: ShuffleExchangeLike => Seq(s); case _ => Seq.empty }) ++
        p.children.flatMap(collect) ++ p.subqueries.flatMap(collect)
    collect(root)
  }

  private val corpus = Seq(
    (1L, "srcA", "en", "one two three four"),
    (2L, "srcA", "en", "one two three four"),      // dup of 1, same stratum
    (3L, "srcB", "en", "one two three four"),      // dup of 1, ACROSS strata
    (4L, "srcB", "en", "five six"),
    (5L, "srcB", "fr", "sept huit neuf dix onze douze")
  ).toDF("doc_id", "source", "lang", "text")

  test("per-stratum counts, cross-stratum dup share, exact token stats") {
    val rows = DataCard.report(corpus, "text", "doc_id", Seq("source", "lang"))
      .orderBy("source", "lang").collect()
    assert(rows.length == 3)
    val a = rows(0) // srcA/en: docs 1,2
    assert(a.getAs[Long]("n_docs") == 2 && a.getAs[Long]("n_dup_docs") == 2)
    assert(a.getAs[Long]("sum_tokens") == 8 && a.getAs[Double]("p50_tokens") == 4.0)
    val b = rows(1) // srcB/en: docs 3 (dup across strata), 4
    assert(b.getAs[Long]("n_docs") == 2 && b.getAs[Long]("n_dup_docs") == 1,
      "a duplicate counts in BOTH strata it appears in")
    assert(b.getAs[Double]("p50_tokens") == 3.0, "even-count interpolated median (4+2)/2")
    assert(b.getAs[Int]("max_tokens") == 4)
    val f = rows(2) // srcB/fr: doc 5
    assert(f.getAs[Long]("n_docs") == 1 && f.getAs[Long]("n_dup_docs") == 0)
    assert(f.getAs[Double]("mean_tokens") == 6.0)
  }

  test("quality nano sum equals the per-doc rounded quality, summed exactly") {
    val perDoc = corpus
      .select($"source", $"lang",
        TextAnalysis.qualityScoreOfTokens(TextAnalysis.tokens($"text"), $"text").as("q"))
      .collect()
      .groupBy(r => (r.getString(0), r.getString(1)))
      .map { case (k, rs) => k -> rs.map(r => math.round(r.getDouble(2) * 1e9)).sum }
    val got = DataCard.report(corpus, "text", "doc_id", Seq("source", "lang"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("sum_quality_nano")).toMap
    assert(got == perDoc)
  }

  test("approx form (the 100 TB path) agrees with exact on this fixture and keeps the schema") {
    val exact = DataCard.report(corpus, "text", "doc_id", Seq("source", "lang"))
      .orderBy("source", "lang").collect()
    val approx = DataCard.report(corpus, "text", "doc_id", Seq("source", "lang"), exact = false)
      .orderBy("source", "lang").collect()
    assert(exact.map(_.schema.fieldNames.toSeq).head == approx.map(_.schema.fieldNames.toSeq).head)
    // at 2-element groups the t-digest returns an exact element;
    // interpolation differences only matter on even counts
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e.getAs[Double]("p50_tokens") - a.getAs[Double]("p50_tokens")) <= 1.0)
      assert(e.getAs[Long]("sum_tokens") == a.getAs[Long]("sum_tokens"))
    }
  }

  test("document text never crosses an exchange") {
    val df = DataCard.report(corpus, "text", "doc_id", Seq("source", "lang"))
    df.collect()
    val leaked = shuffles(df).filter(_.output.exists(_.name == "text"))
    assert(leaked.isEmpty, s"text crossed an exchange: $leaked")
  }

  test("null-text documents are counted, not silently dropped from the card") {
    import sqlImplicits._
    val withNulls = Seq(
      (1L, "srcA", "one two"),
      (2L, "srcA", null: String),
      (3L, "srcA", null: String)
    ).toDF("doc_id", "source", "text")
    val row = DataCard.report(withNulls, "text", "doc_id", Seq("source")).head()
    assert(row.getAs[Long]("n_docs") == 3L, "every doc must reach the card")
    // the two null texts form one duplicate group under the sentinel
    assert(row.getAs[Long]("n_dup_docs") == 2L)
  }
}
