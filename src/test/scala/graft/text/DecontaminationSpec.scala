package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminationSpec extends SparkSpec {

  private def df(rows: Seq[(Long, String)]) = {
    import sqlImplicits._
    rows.toDF("doc_id", "text")
  }

  test("ngrams: distinct space-joined n-grams, empty under n tokens") {
    import sqlImplicits._
    val out = df(Seq((0L, "a b c d"), (1L, "a b a b"), (2L, "a b")))
      .select(Decontamination.ngrams(col("text"), 3).as("g"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b a", "b a b")) // distinct keeps first occurrence order
    assert(out(2) == Seq.empty)
  }

  test("report counts overlapping distinct trigrams and computes the fraction") {
    val bench = df(Seq((100L, "w1 w2 w3 w4")))
    // doc 1 shares only 'w1 w2 w3' (1 of its 4 distinct trigrams);
    // doc 2 shares nothing; doc 3 is a full copy (2 of 2).
    val corpus = df(Seq(
      (1L, "w1 w2 w3 w4x w1 w2"),
      (2L, "x y z w q"),
      (3L, "w1 w2 w3 w4")))
    val got = Decontamination.report(corpus, bench, "text", "doc_id")
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 3L)) // doc 2 absent
    val r1 = got(0)
    // doc 1 trigrams: {w1 w2 w3, w2 w3 w4x, w3 w4x w1, w4x w1 w2} -> 1 of 4 overlap
    assert(r1.getAs[Int]("n_ngrams") == 4)
    assert(r1.getAs[Long]("n_overlap") == 1L)
    assert(r1.getAs[Double]("contam_frac") == 0.25)
    assert(r1.getAs[Int]("flagged") == 1)
    val r3 = got(1)
    assert(r3.getAs[Int]("n_ngrams") == 2 && r3.getAs[Long]("n_overlap") == 2L)
    assert(r3.getAs[Double]("contam_frac") == 1.0)
  }

  test("decontaminated removes flagged docs, keeps sub-threshold and clean ones") {
    val bench = df(Seq((100L, "w1 w2 w3 w4")))
    val clean = (1 to 30).map(i => s"u$i").mkString(" ")
    // 1 shared trigram out of 28 -> frac ~0.036 < 0.05 stays
    val mild = (Seq("w1", "w2", "w3") ++ (1 to 27).map(i => s"v$i")).mkString(" ")
    val corpus = df(Seq((1L, clean), (2L, mild), (3L, "w1 w2 w3 w4")))
    val kept = Decontamination.decontaminated(corpus, bench, "text", "doc_id")
    import sqlImplicits._
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("plan shape: benchmark set broadcasts; corpus side joins without shuffling text") {
    val docs = graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
    val rpt = Decontamination.report(
      docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L),
      docs.filter(pmod(col("doc_id"), lit(97L)) === 0L),
      "text", "doc_id")
    rpt.collect()
    val plan = rpt.queryExecution.executedPlan.toString
    // join-with-marker: broadcast LEFT OUTER against the distinct
    // benchmark gram set; one downstream groupBy(doc) derives both
    // n_ngrams (count(1)) and n_overlap (count of the marker)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftOuter"), plan)
  }

  test("reportWith(broadcastBench = false): same rows via a shuffled gram join") {
    // at fixture scale AQE would auto-broadcast the tiny bench side
    // regardless of the missing hint; turn auto-broadcast off so the
    // plan shows the regime a beyond-broadcast benchmark would get
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
    try testBody() finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def testBody(): Unit = {
    val docs = graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
    val bench = docs.filter(pmod(col("doc_id"), lit(97L)) === 0L)
    val gramTable = bench
      .select(explode(Decontamination.distinctNgrams(col("text"), 3)).as("g")).distinct()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_ngrams", "n_overlap", "contam_frac", "flagged").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSet

    val shuffled = Decontamination.reportWith(
      corpus, gramTable, "text", "doc_id", broadcastBench = false)
    val want = rows(Decontamination.report(corpus, bench, "text", "doc_id"))
    assert(rows(shuffled) == want)
    assert(want.nonEmpty) // the fixture slice really contaminates

    // the regime really switched: without the hint the planner joins
    // the gram key with a shuffle on both sides, no broadcast of the
    // bench set (the trade for a beyond-broadcast benchmark release)
    shuffled.collect()
    val plan = shuffled.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("LeftOuter"), plan)

    // removal under the same regime: identical kept set either way
    val keptB = Decontamination.decontaminated(corpus, bench, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val keptS = Decontamination.decontaminated(
      corpus, bench, "text", "doc_id", broadcastFlagged = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(keptB.sameElements(keptS))
    assert(keptB.nonEmpty)
  }

  test("reportWithBloom: bit-identical to the exact regimes, survivors-only semi-join") {
    val docs = graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
    val bench = docs.filter(pmod(col("doc_id"), lit(97L)) === 0L)
    val gramTable = bench
      .select(explode(Decontamination.distinctNgrams(col("text"), 3)).as("g")).distinct()

    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "n_ngrams", "n_overlap", "contam_frac", "flagged").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSet

    val want = rows(Decontamination.report(corpus, bench, "text", "doc_id"))
    val bloomed = Decontamination.reportWithBloom(corpus, gramTable, "text", "doc_id")
    assert(rows(bloomed) == want)
    assert(want.nonEmpty)

    // plan: the probe runs map-side, the only join is the survivor
    // LeftSemi on the gram key — no join touches the corpus grain
    bloomed.collect()
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("LeftOuter"), plan)
  }

  test("reportWithBloom: a SATURATED filter (every probe positive) stays exact") {
    // expectedItems=1 over hundreds of grams saturates the filter, so
    // ~every gram survives the prefilter — the worst case the fpp
    // bound permits. Exactness must not depend on filter quality.
    val docs = graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
    val bench = docs.filter(pmod(col("doc_id"), lit(97L)) === 0L)
    val gramTable = bench
      .select(explode(Decontamination.distinctNgrams(col("text"), 3)).as("g")).distinct()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getInt(4))).toSet
    val got = rows(Decontamination.reportWithBloom(
      corpus, gramTable, "text", "doc_id", fpp = 0.5, expectedGrams = 1L))
    assert(got == rows(Decontamination.report(corpus, bench, "text", "doc_id")))
  }

  test("fuzzyReport: equals the exhaustive cross-corpus Jaccard join, bit-exact") {
    val docs = graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0L)
    val bench = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
    val fuzzy = Decontamination.fuzzyReport(corpus, bench, "text", "doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // exhaustive oracle: all-pairs cross join over exact distinct-gram
    // sets (feasible only at fixture scale — that is the point)
    def grams(df: org.apache.spark.sql.DataFrame, id: String) = df.select(
      col("doc_id").as(id), Decontamination.distinctNgrams(col("text"), 3).as(s"gs_$id"))
    val want = rows(grams(corpus, "a").crossJoin(grams(bench, "b"))
      .withColumn("shared", size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
      .withColumn("jaccard",
        col("shared").cast("double") / (size(col("gs_a")) + size(col("gs_b")) - col("shared")))
      .filter(col("jaccard") >= 0.8)
      .select(col("a"), col("b"), col("jaccard")))
    assert(rows(fuzzy) == want, s"diff: ${(rows(fuzzy) diff want) ++ (want diff rows(fuzzy))}")
    assert(want.nonEmpty) // the %5 split really crosses near-dup pairs
    // and the engine path never went all-pairs to get there
    fuzzy.collect()
    val plan = fuzzy.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("fuzzyReport catches a paraphrase that gram-overlap under-counts") {
    // one word edited mid-document: trigram overlap loses the 3 grams
    // spanning the edit, whole-doc Jaccard barely moves
    val words = (1 to 40).map(i => s"t$i")
    val benchDoc = words.mkString(" ")
    val edited = words.updated(20, "EDIT").mkString(" ")
    val got = Decontamination.fuzzyReport(
      df(Seq((1L, edited))), df(Seq((100L, benchDoc))), "text", "doc_id").collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 100L)
    assert(got(0).getDouble(2) > 0.8) // 35 shared of 41 distinct union
  }

  test("gramBloom/BloomMightContain contract: no false negatives on inserted grams") {
    val docs = graft.sources.Sources.documents(spark, "/root/testdata/sf0.001")
    val gramTable = docs
      .select(explode(Decontamination.distinctNgrams(col("text"), 3)).as("g")).distinct()
    val bc = spark.sparkContext.broadcast(Decontamination.gramBloom(gramTable))
    val probe = org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("g")), bc))
    val n = gramTable.count()
    assert(n > 100) // the contract test actually exercises a population
    assert(gramTable.filter(probe).count() == n)
  }

  test("reportBySuite attributes hits per suite; shared grams hit every holding suite") {
    import sqlImplicits._
    // suite A holds 'w1 w2 w3'; suite B holds 'w1 w2 w3' AND 'x1 x2 x3'
    val bench = Seq(
      (100L, "w1 w2 w3", "A"),
      (101L, "w1 w2 w3 q9", "B"),
      (102L, "x1 x2 x3", "B")).toDF("doc_id", "text", "suite")
    // doc 1: 4 distinct trigrams, one shared with A and B, one with B only;
    // doc 2: clean
    val corpus = df(Seq(
      (1L, "w1 w2 w3 z x1 x2 x3"),
      (2L, "c1 c2 c3 c4")))
    val out = Decontamination.reportBySuite(corpus, bench, "text", "doc_id", "suite",
      flagThreshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getInt(2), r.getLong(3), r.getDouble(4), r.getInt(5))).toMap
    // doc 1 has 5 distinct trigrams: w1w2w3, w2w3z, w3zx1, zx1x2, x1x2x3
    assert(out((1L, "A")) == ((5, 1L, 0.2, 0)))
    assert(out((1L, "B")) == ((5, 2L, 0.4, 1)))
    assert(!out.keySet.exists(_._1 == 2L), "clean docs must be absent")
    // consistency with the union report: distinct-gram overlap vs union
    // bench is bounded by the per-suite sum and at least the per-suite max
    val union = Decontamination.report(corpus, bench, "text", "doc_id")
      .filter(col("doc_id") === 1L).head().getAs[Long]("n_overlap")
    assert(union == 2L) // w1w2w3, x1x2x3
    assert(out((1L, "B"))._2 <= union && union <= out((1L, "A"))._2 + out((1L, "B"))._2)
  }

  test("reportBySuite plan: one corpus exchange; the (doc, suite) re-agg rides it") {
    val bench = df(Seq((100L, "w1 w2 w3"))).withColumn("suite", lit("A"))
    val corpus = df(Seq((1L, "w1 w2 w3 z")))
    val plan = Decontamination.reportBySuite(corpus, bench, "text", "doc_id", "suite")
      .queryExecution.executedPlan
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => p.children ++ p.subqueries
      }
      (if (p.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) Seq(p)
       else Seq.empty) ++ inner.flatMap(shuffles)
    }
    // bench gram-grain + corpus doc-grain; NO third exchange for the
    // per-suite aggregate (doc partitioning satisfies (doc, suite))
    assert(shuffles(plan).length == 2, plan.toString)
  }
}
