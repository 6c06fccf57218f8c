package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencePackingSpec extends SparkSpec {

  private def docs() = {
    import sqlImplicits._
    // deterministic word-soup docs of varying token counts, 3 strata
    val rows = (0 until 300).map { i =>
      val n = 5 + (i * 37) % 90
      (i.toLong, s"s${i % 3}", Seq.fill(n)("w").mkString(" "))
    }
    rows.toDF("doc_id", "source", "text")
  }

  test("every document lands in exactly one bin and bins are dense per stratum") {
    val assigned = SequencePacking.assignBins(docs(), "text", "source", "doc_id", capacity = 512)
    assert(assigned.count() == 300)
    val perStratum = assigned.groupBy("source")
      .agg(min("bin").as("lo"), max("bin").as("hi"), countDistinct("bin").as("n"))
      .collect()
    perStratum.foreach { r =>
      assert(r.getLong(1) == 0L, s"bins must start at 0: $r")
      assert(r.getLong(3) == r.getLong(2) + 1, s"bins must be dense: $r")
    }
  }

  test("bin token totals respect the start-offset bound: total < capacity + max doc tokens") {
    val cap = 512
    val assigned = SequencePacking.assignBins(docs(), "text", "source", "doc_id", cap)
    val maxDoc = assigned.agg(max("n_tokens")).head().getLong(0)
    val worst = assigned.groupBy("source", "bin").agg(sum("n_tokens").as("t"))
      .agg(max("t")).head().getLong(0)
    assert(worst < cap + maxDoc, s"worst=$worst cap=$cap maxDoc=$maxDoc")
    // and all but each stratum's LAST bin are at least half full — the
    // tape layout cannot leave arbitrary holes
    val lastBins = assigned.groupBy("source").agg(max("bin").as("last"))
    val inner = assigned.join(lastBins, "source").filter(col("bin") < col("last"))
      .groupBy("source", "bin").agg(sum("n_tokens").as("t"))
    assert(inner.filter(col("t") < cap / 2).count() == 0)
  }

  test("bin assignment is a pure function of (stratum, order): layout-invariant") {
    val a = SequencePacking.assignBins(docs(), "text", "source", "doc_id", 512)
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = SequencePacking.assignBins(
      docs().repartition(13, col("doc_id")), "text", "source", "doc_id", 512)
      .select("doc_id", "bin").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("bins never mix strata and the manifest matches the assignment") {
    val cap = 256
    val assigned = SequencePacking.assignBins(docs(), "text", "source", "doc_id", cap)
    val manifest = SequencePacking.packedBins(docs(), "text", "source", "doc_id", cap)
    val fromAssigned = assigned.groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val fromManifest = manifest.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(fromAssigned == fromManifest)
  }

  /** Skewed corpus for the distributed twin: one dominant stratum
    * (web-crawl shape) with far more rows than numChunks, irregular id
    * spacing (i*i) so chunk populations are uneven, plus tiny strata
    * that fit in a single chunk.
    */
  private def skewedDocs() = {
    import sqlImplicits._
    val dominant = (0 until 500).map { i =>
      ((i.toLong * i), "crawl", Seq.fill(3 + (i * 53) % 120)("w").mkString(" "))
    }
    val small = (0 until 20).map { i =>
      (1000000L + i * 7, "books", Seq.fill(10 + i)("w").mkString(" "))
    }
    val tiny = Seq((5000000L, "code", Seq.fill(40)("w").mkString(" ")))
    (dominant ++ small ++ tiny).toDF("doc_id", "source", "text")
  }

  private def triple(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_tokens", "start_offset", "bin").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("assignBinsDistributed is bit-identical to assignBins on skewed multi-chunk data") {
    val df = skewedDocs().repartition(7)
    val oracle = triple(SequencePacking.assignBins(df, "text", "source", "doc_id", 512))
    val dist = triple(
      SequencePacking.assignBinsDistributed(df, "text", "source", "doc_id", 512, numChunks = 8))
    assert(dist.size == 521)
    assert(dist == oracle)
  }

  test("assignBinsDistributed matches when numChunks exceeds every stratum's row count") {
    val df = skewedDocs()
    val oracle = triple(SequencePacking.assignBins(df, "text", "source", "doc_id", 256))
    val dist = triple(
      SequencePacking.assignBinsDistributed(df, "text", "source", "doc_id", 256, numChunks = 1024))
    assert(dist == oracle)
    // and with a single chunk (degenerates to the window form's layout)
    val one = triple(
      SequencePacking.assignBinsDistributed(df, "text", "source", "doc_id", 256, numChunks = 1))
    assert(one == oracle)
  }

  test("assignBinsDistributed rejects a non-integral orderCol instead of silently diverging") {
    import sqlImplicits._
    // digit strings: "10" < "2" lexicographically, so numeric chunking
    // would disagree with the oracle's raw sort order
    val df = Seq(("2", "s", "a b c"), ("10", "s", "d e")).toDF("doc_id", "source", "text")
    val e = intercept[IllegalArgumentException] {
      SequencePacking.assignBinsDistributed(df, "text", "source", "doc_id", 512)
    }
    assert(e.getMessage.contains("integral"))
    // the window oracle itself accepts any orderable type
    assert(SequencePacking.assignBins(df, "text", "source", "doc_id", 512).count() == 2)
  }

  test("assignBinsDistributed parallelism is strata x chunks, not strata") {
    // the dominant stratum must NOT collapse into one window partition:
    // the pass-3 window partitions by (stratum, chunk), so with 8
    // chunks the 500-row stratum is split across 8 running sums whose
    // chunk bases stitch the tape back together
    val dist = SequencePacking.assignBinsDistributed(
      skewedDocs(), "text", "source", "doc_id", 512, numChunks = 8)
    val plan = dist.queryExecution.executedPlan.toString
    assert(plan.contains("__sp_chunk"), plan)
    // both carry joins are broadcast (control-plane tables), so the
    // document stream is never shuffled for the stitch
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2, plan)
  }

  test("packedBinsFromCounts equals packedBins given the same counts; the gate identity holds") {
    import sqlImplicits._
    val d = docs()
    val fromText = SequencePacking.packedBins(d, "text", "source", "doc_id", capacity = 512)
      .orderBy("source", "bin").collect().toSeq
    val withCounts = d.withColumn("tok",
      graft.text.TextAnalysis.tokenCount(col("text")).cast("long"))
    val fromCounts = SequencePacking.packedBinsFromCounts(
      withCounts, "tok", "source", "doc_id", capacity = 512)
      .orderBy("source", "bin").collect().toSeq
    assert(fromText == fromCounts)
    // the distributed counts form is bit-identical too (multi-chunk:
    // 100 rows per stratum with numChunks=8 forces real chunk carries)
    val distributed = SequencePacking.packedBinsFromCounts(
      withCounts, "tok", "source", "doc_id", capacity = 512,
      distributed = true, numChunks = 8)
      .orderBy("source", "bin").collect().toSeq
    assert(fromText == distributed)
    // the q58 composition identity: the gate's gram count determines
    // the token count exactly (unigrams + bigrams = 2n - 1)
    val mismatch = d
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("tok"),
        size(graft.text.ImportanceResampling.gramOccurrences(col("text"))).cast("long").as("g"))
      .filter(expr("(g + 1) div 2") =!= col("tok"))
      .count()
    assert(mismatch == 0L)
  }

  test("packBins routes on the largest stratum: window when small, distributed when big") {
    val df = skewedDocs() // dominant stratum = 500 rows
    // threshold above the dominant stratum -> window form (no joins in
    // the plan: assignBins is scan + window only)
    val win = SequencePacking.packBins(df, "text", "source", "doc_id", 512,
      windowThreshold = 1000L)
    assert(!win.queryExecution.executedPlan.toString.contains("Join"),
      "small strata must route to the join-free window form")
    // threshold below it -> distributed form (chunk-stitch broadcast
    // joins present)
    val dist = SequencePacking.packBins(df, "text", "source", "doc_id", 512,
      windowThreshold = 100L, numChunks = 8)
    assert(dist.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "a dominant stratum must route to the distributed form")
    // and routing never changes the answer
    assert(triple(win) == triple(dist))
  }

  test("packBins routing statistic: maxStratumRows, 0 on an empty frame") {
    val df = skewedDocs()
    assert(SequencePacking.maxStratumRows(df, "source") == 500L)
    assert(SequencePacking.maxStratumRows(df.filter(col("doc_id") < 0), "source") == 0L)
    // empty frame routes to the window form and yields an empty result
    val out = SequencePacking.packBins(
      df.filter(col("doc_id") < 0), "text", "source", "doc_id", 512)
    assert(out.count() == 0L)
  }

  test("the plan shuffles once on the stratum column: window + groupBy share the exchange") {
    val plan = SequencePacking.packedBins(docs(), "text", "source", "doc_id", 512)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }

  test("pre-existing output columns are rejected, not silently replaced or duplicated") {
    // bin: a previous packing pass being repacked would silently lose
    // its assignment (window form) or emit the column twice
    // (distributed form's final select) — both fail fast instead
    val repack = SequencePacking.assignBins(docs(), "text", "source", "doc_id", capacity = 512)
    val e1 = intercept[IllegalArgumentException] {
      SequencePacking.assignBins(repack, "text", "source", "doc_id", capacity = 256)
    }
    assert(e1.getMessage.contains("n_tokens"))
    val e2 = intercept[IllegalArgumentException] {
      SequencePacking.assignBinsFromCounts(
        repack.drop("n_tokens", "start_offset"), "bin", "source", "doc_id", capacity = 256)
    }
    assert(e2.getMessage.contains("bin"))
    val e3 = intercept[IllegalArgumentException] {
      SequencePacking.assignBinsDistributedFromCounts(
        repack.drop("n_tokens", "bin"), "start_offset", "source", "doc_id", capacity = 256)
    }
    assert(e3.getMessage.contains("start_offset"))
  }

  test("materializedBins: the tape is the layout-ordered concatenation, fingerprinted") {
    import sqlImplicits._
    // one stratum, capacity 4: docs of 2/3/2 tokens -> offsets 0,2,5 ->
    // bins 0,0,1 (doc 2 starts at 2 < 4 and spills its tail)
    val df = Seq(
      (1L, "s", "a b"),
      (2L, "s", "c d e"),
      (3L, "s", "f g")).toDF("doc_id", "source", "text")
    val out = SequencePacking.materializedBins(df, "text", "source", "doc_id", capacity = 4)
      .orderBy("bin").collect()
    assert(out.length == 2)
    def md5hex(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    assert(out(0).getAs[Long]("n_docs") == 2 && out(0).getAs[Long]("total_tokens") == 5)
    assert(out(0).getAs[String]("tape_fp") == md5hex("a b c d e"),
      "bin 0's tape must be docs 1,2 concatenated in id order")
    assert(out(1).getAs[String]("tape_fp") == md5hex("f g"))
    // the same single-exchange plan shape as the summary form
    val plan = SequencePacking.materializedBins(docs(), "text", "source", "doc_id", 512)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length - 1 == 1, plan)
  }

  test("null strata survive the distributed form identically to the window form") {
    import sqlImplicits._
    // a plain using-columns equi-join never matches null keys, so the
    // distributed twin silently DROPPED every null-stratum document
    // while the window form kept them as their own partition —
    // row-loss divergence between paths documented as bit-identical
    // (review r19; now a null-safe <=> join)
    val rows = (0 until 60).map { i =>
      val src = if (i % 3 == 0) None else Some(s"s${i % 2}")
      (i.toLong, src, Seq.fill(5 + i % 17)("w").mkString(" "))
    }
    val df = rows.toDF("doc_id", "source", "text").repartition(5)
    val oracle = triple(SequencePacking.assignBins(df, "text", "source", "doc_id", 64))
    val dist = triple(
      SequencePacking.assignBinsDistributed(df, "text", "source", "doc_id", 64, numChunks = 4))
    assert(oracle.size == 60, oracle.size.toString)
    assert(dist == oracle)
  }
}
