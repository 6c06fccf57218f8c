package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Packing and batching by TRAINED-TOKENIZER token count — the
  * [[BpeTokenizer.countsFromModel]] facade and its
  * [[SequencePacking.packedBinsByBpe]] / [[LengthBatching
  * .assignBatchesByBpe]] consumers, plus the fit==encode segmentation
  * identity q80/q81's DuckDB oracle leans on.
  */
class BpeCountPackingSpec extends SparkSpec {

  // small corpus with shared subwords so merges actually fire, plus a
  // wordless document (all separators) that must count 0
  private def docs = {
    import sqlImplicits._
    Seq(
      (0L, "lower lowest low low", "s0"),
      (1L, "newer newest new lower", "s0"),
      (2L, "wider widest wide newer", "s1"),
      (3L, "low lowest wider wider", "s1"),
      (4L, "   ", "s1"),
      (5L, "newest newest low", "s0")
    ).toDF("doc_id", "text", "source")
  }

  test("q80/q81/q85 oracle preconditions hold on the sf0.01 fixture (uncapped fit, BMP-safe tie order)") {
    // The DuckDB oracle re-derives the tokenizer fit UNCAPPED and
    // breaks pair-count ties by binary UTF-8 collation, while the
    // Scala fit caps at maxVocab=100000 and ties by Java UTF-16
    // order. Both are safe exactly when (a) the fixture's distinct
    // word count stays under the cap (cap never binds) and (b) no
    // text reaches the U+E000+ range where UTF-8 code-point order and
    // UTF-16 code-unit order can disagree across a surrogate
    // boundary. Pin both so fixture drift fails HERE with a named
    // reason instead of as an inscrutable oracle hash mismatch.
    val fixture = graft.sources.Sources.documents(spark, "/root/testdata/sf0.01")
    val distinctWords = fixture
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select("w").distinct().count()
    assert(distinctWords < 100000L,
      s"fixture has $distinctWords distinct words — the q80/q85 maxVocab=100000 'cap never binds' assumption broke")
    val highPlane = fixture.filter(col("text").rlike("[\\uE000-\\uFFFF]")).count()
    assert(highPlane == 0L,
      s"$highPlane docs contain U+E000..U+FFFF chars — UTF-8 vs UTF-16 merge tie order is no longer guaranteed equal")
  }

  test("chunksByBpe: prefix-sum chunk assignment, whole words, lossless reassembly, wordless -> none") {
    import sqlImplicits._
    val model = BpeTokenizer.fit(docs, "text", numMerges = 8, maxVocab = 100000)
    val perDoc = BpeTokenizer.countsFromModel(docs, "text", "doc_id", model)
      .select("doc_id", "n_bpe_tokens").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val budget = 4
    val out = Chunking.chunksByBpe(docs, "text", "doc_id", model, budget)
      .orderBy("doc_id", "chunk_idx").collect()
    // wordless doc 4 yields no chunks
    assert(!out.exists(_.getLong(0) == 4L))
    // FULL driver-side replay: segment every word with the model's own
    // ranks, prefix-sum, and rebuild the exact expected chunk table —
    // (doc, chunk_idx) -> (n_words, n_tokens, chunk_text) — so any
    // boundary off-by-one (e.g. using cum instead of cum - n) fails
    // here with the diverging chunk named
    val expected = docs.collect().flatMap { d =>
      val id = d.getLong(0)
      val ws = d.getString(1).split(" ").filter(_.nonEmpty)
      var cum = 0L
      ws.map { w =>
        val n = BpeStats.segmentWord(w, model.ranks).length.toLong
        val idx = cum / budget
        cum += n
        (id, idx, w, n)
      }
    }.groupBy(t => (t._1, t._2)).map { case ((id, idx), rows) =>
      (id, idx) -> ((rows.length.toLong, rows.map(_._4).sum, rows.map(_._3).mkString(" ")))
    }
    val got = out.map(r =>
      (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got == expected,
      s"chunk table diverged:\nextra=${got.keySet diff expected.keySet}\n" +
        s"missing=${expected.keySet diff got.keySet}\n" +
        s"diff=${got.collect { case (k, v) if expected.get(k).exists(_ != v) => (k, v, expected(k)) }}")
    // and the per-doc totals agree with the independent count facade
    val byDoc = out.groupBy(_.getLong(0))
    perDoc.filter(_._2 > 0L).foreach { case (id, n) =>
      assert(byDoc(id).map(_.getLong(3)).sum == n, s"doc $id token sum vs countsFromModel")
    }
    // a single word costing more than the budget still lands whole
    val big = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 chars + </w> > 4 tokens unmerged
    val bigModel = BpeTokenizer.fit(big, "text", numMerges = 0, maxVocab = 100000)
    val bigOut = Chunking.chunksByBpe(big, "text", "doc_id", bigModel, budget)
      .collect()
    assert(bigOut.length == 1 && bigOut.head.getLong(2) == 1L, "oversized word must stay whole")
  }

  test("countsFromModel equals encode's n_bpe_tokens for every document (wordless -> 0)") {
    val model = BpeTokenizer.fit(docs, "text", numMerges = 6, maxVocab = 1000)
    val viaEncode = BpeTokenizer.encode(docs, "text", "doc_id", model)
      .select("doc_id", "n_bpe_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCounts = BpeTokenizer.countsFromModel(docs, "text", "doc_id", model)
      .select("doc_id", "n_bpe_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaCounts == viaEncode, s"counts $viaCounts vs encode $viaEncode")
    assert(viaCounts(4L) == 0L, "all-separator document must count 0 tokens")
    // and the caller's columns all ride through
    assert(BpeTokenizer.countsFromModel(docs, "text", "doc_id", model).columns.toSet ==
      Set("doc_id", "text", "source", "n_bpe_tokens"))
  }

  test("fit-final segmentation equals segmentWord — the identity the q80/q81 oracle relies on") {
    // Run trainMerges keeping the final symbol tables (re-derive them
    // by replaying the merge list with segmentWord) and compare with
    // an INDEPENDENT re-segmentation; include an overlap-adversarial
    // word (aaaa: same-symbol runs exercise the greedy left-to-right
    // non-overlap rule the oracle's run-parity window replicates).
    import sqlImplicits._
    val adversarial = Seq(
      (0L, "aaaa aaa aa a"),
      (1L, "aaaa aaaa ab ba"),
      (2L, "abab ababab abba")
    ).toDF("doc_id", "text")
    val vocab = BpeStats.cappedVocab(adversarial, "text", maxVocab = 1000)
    val merged = BpeStats.trainMerges(vocab, numMerges = 5)
    val ranks = merged.map(_._1).zipWithIndex.toMap
    // replay the training loop by hand to get fit-final segment counts
    val words = vocab.map { case (w, f) =>
      (scala.collection.mutable.ArrayBuffer.from(w.map(_.toString)) += BpeStats.EndOfWord, w)
    }
    merged.foreach { case ((l, r), _) =>
      words.foreach { case (syms, _) =>
        var i = 0
        while (i < syms.length - 1) {
          if (syms(i) == l && syms(i + 1) == r) {
            syms(i) = l + r
            syms.remove(i + 1)
            if (i > 0) i -= 1
          } else i += 1
        }
      }
    }
    words.foreach { case (syms, w) =>
      assert(BpeStats.segmentWord(w, ranks) == syms.toSeq,
        s"fit/encode segmentation divergence on '$w': encode ${BpeStats.segmentWord(w, ranks)} vs fit $syms")
    }
  }

  test("countsFromModel rejects a pre-existing n_bpe_tokens column and drifted corpora") {
    val model = BpeTokenizer.fit(docs, "text", numMerges = 4, maxVocab = 1000)
    val e = intercept[IllegalArgumentException] {
      BpeTokenizer.countsFromModel(
        docs.withColumn("n_bpe_tokens", lit(1L)), "text", "doc_id", model)
    }
    assert(e.getMessage.contains("n_bpe_tokens"))
    // a character the fit never saw must fail like encode does, not
    // silently count tokens an encode could not emit
    import sqlImplicits._
    val drifted = Seq((9L, "lower zzz9!")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      BpeTokenizer.countsFromModel(drifted, "text", "doc_id", model).collect()
    }
    assert(ex.getMessage != null)
  }

  test("packedBinsByBpe equals the manual countsFromModel + packedBinsFromCounts composition") {
    val model = BpeTokenizer.fit(docs, "text", numMerges = 6, maxVocab = 1000)
    val facade = SequencePacking.packedBinsByBpe(
      docs, "text", "source", "doc_id", capacity = 16, model)
      .orderBy("source", "bin").collect().toSeq
    val manual = SequencePacking.packedBinsFromCounts(
      BpeTokenizer.countsFromModel(docs, "text", "doc_id", model),
      "n_bpe_tokens", "source", "doc_id", capacity = 16)
      .orderBy("source", "bin").collect().toSeq
    assert(facade == manual)
    assert(facade.nonEmpty)
  }

  test("assignBinsByBpe window and distributed forms are bit-identical") {
    val model = BpeTokenizer.fit(docs, "text", numMerges = 6, maxVocab = 1000)
    def key(distributed: Boolean) = SequencePacking.assignBinsByBpe(
      docs, "text", "source", "doc_id", capacity = 16, model,
      distributed = distributed, numChunks = 3)
      .select("doc_id", "start_offset", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(key(distributed = false) == key(distributed = true))
  }

  test("assignBatchesByBpe buckets by BPE count; whitespace batching is unchanged by the refactor") {
    val model = BpeTokenizer.fit(docs, "text", numMerges = 6, maxVocab = 1000)
    val byBpe = LengthBatching.assignBatchesByBpe(
      docs, "text", "doc_id", model, bucketWidth = 4, batchSize = 2)
    assert(byBpe.columns.toSet ==
      Set("doc_id", "text", "source", "n_bpe_tokens", "bucket", "batch_id"))
    val rows = byBpe.collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("bucket") == r.getAs[Long]("n_bpe_tokens") / 4L,
        s"bucket must be n_bpe_tokens div width: $r")
    }
    // whitespace path still buckets on word counts (regression guard
    // for the assignBatchesFromCounts refactor)
    val ws = LengthBatching.assignBatches(docs, "text", "doc_id", bucketWidth = 2, batchSize = 2)
    ws.collect().foreach { r =>
      assert(r.getAs[Long]("bucket") == r.getAs[Long]("n_tokens") / 2L)
    }
  }

  test("batchSummaryByBpe: padded cost measured in BPE tokens, exact arithmetic") {
    val model = BpeTokenizer.fit(docs, "text", numMerges = 6, maxVocab = 1000)
    val counts = BpeTokenizer.countsFromModel(docs, "text", "doc_id", model)
      .select("doc_id", "n_bpe_tokens")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s = LengthBatching.batchSummaryByBpe(
      docs, "text", "doc_id", model, bucketWidth = 4, batchSize = 2)
      .collect()
    assert(s.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(s.map(_.getAs[Long]("sum_tokens")).sum == counts.values.sum)
    s.foreach { r =>
      assert(r.getAs[Long]("padded_tokens") ==
        r.getAs[Long]("n_docs") * r.getAs[Long]("max_tokens"))
      if (r.getAs[Long]("padded_tokens") == 0L)
        // the wordless doc's bucket: 0 tokens, 0 padded cost —
        // efficiency is undefined and must surface as NULL, not an
        // ANSI divide-by-zero that kills the whole manifest
        assert(r.isNullAt(r.fieldIndex("pad_efficiency")))
      else
        assert(r.getAs[Double]("pad_efficiency") ==
          r.getAs[Long]("sum_tokens").toDouble / r.getAs[Long]("padded_tokens").toDouble)
    }
  }
}
