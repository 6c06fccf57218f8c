package graft.text

import graft.SparkSpec
import org.apache.spark.sql.Row

class CorpusStatsSpec extends SparkSpec {

  private def docs = {
    import sqlImplicits._
    Seq(
      (1L, "the cat sat"),           // bigrams: {the cat, cat sat}
      (2L, "the cat ran"),           // bigrams: {the cat, cat ran}
      (3L, "zq"),                    // 1 token -> no bigrams, absent
      (4L, "the cat the cat sat")    // distinct bigrams: {the cat, cat the, cat sat}
    ).toDF("doc_id", "text")
  }

  test("docFrequency counts documents, not occurrences") {
    val df = CorpusStats.docFrequency(docs, "text", n = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // doc 4 repeats "the cat" twice but counts once (per-doc distinct)
    assert(df("the cat") == 3L)
    assert(df("cat sat") == 2L)
    assert(df("cat ran") == 1L)
    assert(df("cat the") == 1L)
    assert(df.size == 4)
  }

  test("noveltyReport: exact integer stats; sub-n-token docs absent") {
    val got = CorpusStats.noveltyReport(docs, "text", "doc_id", n = 2, rareMaxDf = 1)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L)) // doc 3 absent
    def row(r: Row) = (r.getInt(1), r.getLong(2), r.getLong(3),
      r.getDouble(4), r.getDouble(5))
    // doc 1: grams {the cat(df3), cat sat(df2)} -> 0 rare, max 3, mean 2.5
    assert(row(got(0)) == ((2, 0L, 3L, 0.0, 2.5)))
    // doc 2: {the cat(3), cat ran(1)} -> 1 rare, mean 2.0
    assert(row(got(1)) == ((2, 1L, 3L, 0.5, 2.0)))
    // doc 4: {the cat(3), cat the(1), cat sat(2)} -> 1 rare, mean 2.0
    assert(row(got(2)) == ((3, 1L, 3L, 1.0 / 3.0, 2.0)))
  }

  test("noveltyReportWith scores against a snapshot; unseen grams are dropped") {
    import sqlImplicits._
    // snapshot built from docs 1 and 2 only: dfs there are
    // {the cat: 2, cat sat: 1, cat ran: 1}
    val snapshot = CorpusStats.docFrequency(
      docs.filter($"doc_id".isin(1L, 2L)), "text", n = 2)
    val got = CorpusStats.noveltyReportWith(
      docs, snapshot, "text", "doc_id", n = 2, rareMaxDf = 1)
      .orderBy("doc_id").collect()
    // doc 4's gram "cat the" is unknown to the snapshot -> dropped:
    // scored grams {the cat(2), cat sat(1)} -> n_ngrams 2, 1 rare
    val r4 = got.find(_.getLong(0) == 4L).get
    assert(r4.getInt(1) == 2 && r4.getLong(2) == 1L && r4.getLong(3) == 2L)
    // docs fully covered by the snapshot score exactly like inline
    // noveltyReport over docs 1+2 would
    val r1 = got.find(_.getLong(0) == 1L).get
    assert(r1.getInt(1) == 2 && r1.getLong(2) == 1L && r1.getLong(3) == 2L)
  }

  test("noveltyReport rejects a non-positive rare ceiling") {
    intercept[IllegalArgumentException] {
      CorpusStats.noveltyReport(docs, "text", "doc_id", n = 2, rareMaxDf = 0)
    }
  }

  test("hot-gram skew: AQE splits the snapshot-scoring join; inline form is pinned ineligible") {
    import sqlImplicits._
    // adversarial corpus: half the docs ARE one stamped boilerplate
    // run (the crawled-cookie-banner pathology), so a single gram
    // carries half the score join's rows in ONE partition. The
    // production snapshot-scoring form (noveltyReportWith over a
    // materialized docFrequency) plans both join children as
    // Sort-over-shuffle, which is the shape OptimizeSkewedJoin
    // matches — assert the split actually fires (skew=true in the
    // final adaptive plan) with thresholds scaled to fixture size,
    // and that splitting changes nothing about the answer. The
    // inline noveltyReport form is pinned NOT to fire (its df-side
    // final aggregate sits between exchange and join — see the
    // CorpusStats scaladoc).
    val boiler = Seq.fill(12)("spam").mkString(" ")
    val rows = (0 until 10000).map { i =>
      (i.toLong, if (i % 2 == 0) boiler else s"u${i}a u${i}b u${i}c")
    }
    val df = rows.toDF("doc_id", "text").repartition(4)
    def run(dfTable: Option[org.apache.spark.sql.DataFrame]): (Long, String, Array[Row]) = {
      val report = dfTable match {
        case Some(t) => CorpusStats.noveltyReportWith(df, t, "text", "doc_id", n = 2, rareMaxDf = 2)
        case None => CorpusStats.noveltyReport(df, "text", "doc_id", n = 2, rareMaxDf = 2)
      }
      val sample = report.orderBy("doc_id").limit(2).collect()
      // collect() (not head()) so the Dataset's OWN adaptive query
      // execution runs to completion — head() builds a separate
      // limit plan and would leave this one isFinalPlan=false
      val agg = report.groupBy().count()
      val n = agg.collect()(0).getLong(0)
      (n, agg.queryExecution.executedPlan.toString, sample)
    }
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // the at-scale SMJ shape
      // Many partitions is what makes a hot key SKEWED: the median
      // partition shrinks with the partition count while the hot
      // gram's rows cannot subdivide — the local stand-in for a
      // cluster-scale shuffle (and why the 256 MB default only ever
      // fires there). Thresholds scale down with the fixture; the
      // hot partition stays well above 2x the median even under
      // shuffle compression (identical-gram rows compress hard).
      conf.set("spark.sql.shuffle.partitions", "64")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8192")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // materialized snapshot = the per-release docFrequency table a
      // production run reads back; localCheckpoint stands in for the
      // parquet round-trip
      val snapshot = CorpusStats.docFrequency(df, "text", n = 2).localCheckpoint(true)
      val (nSplit, planSplit, sampleSplit) = run(Some(snapshot))
      assert(planSplit.contains("skew=true"),
        s"hot-gram snapshot-scoring join must be skew-split under fixture-scaled thresholds:\n$planSplit")
      // the inline form's df-side aggregate blocks the rule: same data,
      // same thresholds, no split — the documented limitation, pinned
      val (nInline, planInline, _) = run(None)
      assert(!planInline.contains("skew=true"), planInline)
      assert(nInline == 10000L)
      conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (nPlain, planPlain, samplePlain) = run(Some(snapshot))
      assert(!planPlain.contains("skew=true"), planPlain)
      assert(nSplit == nPlain && nSplit == 10000L)
      assert(sampleSplit.toSeq == samplePlain.toSeq)
      // doc 0 is pure boilerplate: one distinct gram, df = 5000, not rare
      val d0 = sampleSplit(0)
      assert(d0.getLong(0) == 0L && d0.getInt(1) == 1 &&
        d0.getLong(2) == 0L && d0.getLong(3) == 5000L)
      // doc 1 is unique-only: 2 bigrams, both corpus-rare
      val d1 = sampleSplit(1)
      assert(d1.getLong(0) == 1L && d1.getInt(1) == 2 && d1.getLong(2) == 2L)
    } finally saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("topGrams: per-stratum doc-frequency top-k, ties to the smallest gram") {
    import sqlImplicits._
    val strat = Seq(
      (1L, "en", "the cat sat"),
      (2L, "en", "the cat ran"),
      (3L, "en", "the cat the cat sat"),
      (4L, "de", "der hund lief"),
      (5L, "de", "der hund sass")
    ).toDF("doc_id", "lang", "text")
    val top = CorpusStats.topGrams(strat, "text", "lang", n = 2, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSet
    // en: "the cat" in 3 docs; "cat sat" in 2 (beats "cat ran"/"cat the" at 1 by count)
    // de: "der hund" in 2; tie at 1 between "hund lief"/"hund sass" -> lexicographic
    assert(top == Set(
      ("en", "the cat", 3L, 1), ("en", "cat sat", 2L, 2),
      ("de", "der hund", 2L, 1), ("de", "hund lief", 1L, 2)), top)
  }

  test("topGrams plans the literal WindowGroupLimit prefilter below the window") {
    import sqlImplicits._
    val strat = (1L to 50L).map(i => (i, s"s${i % 3}", "a b c d")).toDF("doc_id", "lang", "text")
    val plan = CorpusStats.topGrams(strat, "text", "lang", n = 2, k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }
}
