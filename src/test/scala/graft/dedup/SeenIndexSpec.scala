package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeenIndexSpec extends SparkSpec {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("seen_index_").toString

  test("two-epoch text ingest: epoch 1 seeds, epoch 2 gates against it, re-ingest gates to zero") {
    import sqlImplicits._
    val path = tmpDir()
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val other = (100 to 160).map(i => s"v$i").mkString(" ")
    val novel = (500 to 560).map(i => s"z$i").mkString(" ")
    // bootstrap: a missing index reads empty, so epoch 1 keeps all
    assert(SeenIndex.read(spark, path).count() == 0)
    val e1 = SeenIndex.gateAndUpdateSimhash(
      Seq((1L, base), (2L, other)).toDF("doc_id", "text"), "text", path)
    assert(e1.result.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    e1.release()
    // epoch 2: an exact re-ingest of epoch-1 content is gated, the
    // novel doc passes and is remembered in turn
    val batch2 = Seq((10L, base), (11L, novel)).toDF("doc_id", "text")
    val e2 = SeenIndex.gateAndUpdateSimhash(batch2, "text", path)
    val kept2 = e2.result.collect().map(_.getLong(0)).toSet
    e2.release()
    assert(kept2 == Set(11L), s"kept2=$kept2")
    // cross-session anchor: epoch-2 admission equals the stateless
    // gate against the union of all previously ADMITTED docs
    val statelessKept = Dedup.dropSeenSimhash(
      batch2, Seq((1L, base), (2L, other)).toDF("doc_id", "text"), "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == statelessKept)
    // epoch 3: re-ingesting epoch 2's survivor gates to ZERO — the
    // append in epoch 2 is what makes the index remember it
    val e3 = SeenIndex.gateAndUpdateSimhash(
      Seq((20L, novel)).toDF("doc_id", "text"), "text", path)
    assert(e3.result.isEmpty)
    e3.release()
    // the index holds exactly the admitted signatures (3 distinct)
    assert(SeenIndex.read(spark, path).distinct().count() == 3)
  }

  test("generic Hamming epochs: near signatures gate, the admitted frame keeps its columns") {
    import sqlImplicits._
    val path = tmpDir()
    val s0 = 0x0123456789abcdefL
    val e1 = SeenIndex.gateAndUpdateHamming(
      Seq((1L, s0, "a")).toDF("media_id", "ahash", "tag"), "ahash", path)
    assert(e1.result.columns.toSeq == Seq("media_id", "ahash", "tag"))
    assert(e1.result.count() == 1)
    e1.release()
    // near (hamming 2) and far arrivals: only the far one is admitted
    val e2 = SeenIndex.gateAndUpdateHamming(
      Seq((2L, s0 ^ 3L, "b"), (3L, ~s0, "c")).toDF("media_id", "ahash", "tag"), "ahash", path)
    val kept = e2.result.collect().map(r => (r.getLong(0), r.getString(2))).toSet
    e2.release()
    assert(kept == Set((3L, "c")), s"kept=$kept")
    // within-batch duplicates both pass (history-only contract), one sig lands
    val e3 = SeenIndex.gateAndUpdateHamming(
      Seq((4L, 0x7777L, "d"), (5L, 0x7777L, "e")).toDF("media_id", "ahash", "tag"), "ahash", path)
    assert(e3.result.count() == 2)
    e3.release()
    assert(SeenIndex.read(spark, path).filter(col("sig") === 0x7777L).count() == 1)
  }

  test("embedding epochs: near vectors gate, novel and degenerate vectors pass, re-ingest gates to zero") {
    import sqlImplicits._
    val path = tmpDir()
    val dim = 8
    val planes = graft.similarity.Similarity.hyperplanes(dim, numPlanes = 64)
    def gate(rows: Seq[(Long, Seq[Float])]) =
      SeenIndex.gateAndUpdateEmbedding(
        rows.toDF("vec_id", "embedding"), "embedding", "vec_id", path,
        threshold = 0.9, planes = planes, bands = 8, broadcastVerify = true)
    val e1 = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val e2 = Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)
    val novel = Seq(0f, 0f, 0f, 1f, 0f, 0f, 0f, 0f)
    // bootstrap: empty index admits everything
    val r1 = gate(Seq((1L, e1), (2L, e2)))
    assert(r1.result.collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    r1.release()
    // epoch 2: an exact copy of an admitted vector is gated (identical
    // unit vectors share every band, cosine 1.0 — no LSH luck needed);
    // the orthogonal novel vector passes; the zero-norm degenerate is
    // KEPT (unhashable rows can't be proven seen, the family rule)
    val r2 = gate(Seq((10L, e1), (11L, novel), (12L, Seq.fill(dim)(0f))))
    val kept2 = r2.result.collect().map(_.getLong(0)).toSet
    r2.release()
    assert(kept2 == Set(11L, 12L), s"kept2=$kept2")
    // epoch 3: re-ingesting epoch 2's finite survivor gates to ZERO;
    // the degenerate is admitted again (never enters the gate's
    // normalized space even though its row sits in the index)
    val r3 = gate(Seq((20L, novel), (21L, Seq.fill(dim)(0f))))
    assert(r3.result.collect().map(_.getLong(0)).toSet == Set(21L))
    r3.release()
    // the index holds every admitted non-null vector row
    assert(SeenIndex.readVectors(spark, path).count() == 5)
  }

  test("streaming ingest loop: each micro-batch gates against the GROWING index; a restarted query resumes from it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import sqlImplicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = tmpDir(); val out = tmpDir()
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val novel = (500 to 560).map(i => s"z$i").mkString(" ")
    val later = (900 to 960).map(i => s"y$i").mkString(" ")
    def admitted(): Set[Long] =
      spark.read.schema("doc_id LONG, text STRING").parquet(out)
        .collect().map(_.getLong(0)).toSet
    val input = MemoryStream[(Long, String)]
    val q = SeenIndex.gateStreamSimhash(
      input.toDF().toDF("doc_id", "text"), "text", idx, out, tmpDir())
    // batch 1 bootstraps: both docs admitted and remembered
    input.addData((1L, base), (2L, novel)); q.processAllAvailable()
    assert(admitted() == Set(1L, 2L))
    // batch 2 gates against batch 1's admissions — cross-BATCH state
    // the stateless stream-static twin cannot express
    input.addData((10L, base), (11L, later)); q.processAllAvailable()
    assert(admitted() == Set(1L, 2L, 11L))
    q.stop()
    // a brand-new query (fresh checkpoint, fresh stream) resumes from
    // the index directory: re-ingesting history gates to zero
    val input2 = MemoryStream[(Long, String)]
    val q2 = SeenIndex.gateStreamSimhash(
      input2.toDF().toDF("doc_id", "text"), "text", idx, out, tmpDir())
    input2.addData((20L, novel), (21L, later)); q2.processAllAvailable()
    q2.stop()
    assert(admitted() == Set(1L, 2L, 11L))
    // and the streamed lifecycle left the same index a batch epoch would
    assert(SeenIndex.read(spark, idx).distinct().count() == 3)
  }

  test("append drops null signatures; empty-dir bootstrap reads as empty") {
    import sqlImplicits._
    val path = tmpDir()
    SeenIndex.append(Seq(Some(1L), None, Some(1L)).toDF("sig"), "sig", path)
    assert(SeenIndex.read(spark, path).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("retention window: history expires, re-admission resets the clock, untagged rows never expire, compact preserves it all") {
    import sqlImplicits._
    val path = tmpDir()
    val docA = (1 to 50).map(i => s"w$i").mkString(" ")
    val docB = (100 to 160).map(i => s"v$i").mkString(" ")
    def gate(id: Long, text: String, epoch: Long, minEpoch: Long): Set[Long] = {
      val r = SeenIndex.gateAndUpdateSimhashWindow(
        Seq((id, text)).toDF("doc_id", "text"), "text", path, epoch, minEpoch)
      val kept = r.result.collect().map(_.getLong(0)).toSet
      r.release(); kept
    }
    // epoch 1 bootstraps; epoch 2's window still covers epoch 1 -> gated
    assert(gate(1L, docA, epoch = 1, minEpoch = 0) == Set(1L))
    assert(gate(2L, docA, epoch = 2, minEpoch = 1).isEmpty)
    // epoch 10 with a window starting at 5: the epoch-1 admission has
    // EXPIRED, so the same content is re-admitted and re-tagged at 10
    assert(gate(3L, docA, epoch = 10, minEpoch = 5) == Set(3L))
    // epoch 11, window from 6: the epoch-10 re-admission is live again
    assert(gate(4L, docA, epoch = 11, minEpoch = 6).isEmpty)
    // an UNTAGGED admission (the pre-retention API) never expires
    SeenIndex.gateAndUpdateSimhash(
      Seq((20L, docB)).toDF("doc_id", "text"), "text", path).release()
    assert(gate(21L, docB, epoch = 1000, minEpoch = 999).isEmpty)
    // compact: one row per sig, docA's sig keeps its LATEST epoch (10)
    // and docB's stays untagged — the SAME decisions replay after
    SeenIndex.compact(spark, path)
    assert(gate(5L, docA, epoch = 12, minEpoch = 6).isEmpty)  // epoch-10 tag survived
    assert(gate(6L, docA, epoch = 20, minEpoch = 11) == Set(6L)) // and still expires
    assert(gate(22L, docB, epoch = 2000, minEpoch = 1999).isEmpty) // untagged survived
    // plain read() sees every signature regardless of tags
    assert(SeenIndex.read(spark, path).distinct().count() == 2)
  }

  test("retention window for precomputed hashes: the media form expires and resets like the text form") {
    import sqlImplicits._
    val path = tmpDir()
    val s0 = 0x0f0f0f0f0f0f0f0fL
    def gate(id: Long, sig: Long, epoch: Long, minEpoch: Long): Set[Long] = {
      val r = SeenIndex.gateAndUpdateHammingWindow(
        Seq((id, sig)).toDF("media_id", "ahash"), "ahash", path, epoch, minEpoch)
      val kept = r.result.collect().map(_.getLong(0)).toSet
      r.release(); kept
    }
    assert(gate(1L, s0, epoch = 1, minEpoch = 0) == Set(1L))
    // a NEAR signature (hamming 2) inside the window is gated
    assert(gate(2L, s0 ^ 3L, epoch = 2, minEpoch = 1).isEmpty)
    // outside the window the epoch-1 admission has expired
    assert(gate(3L, s0, epoch = 10, minEpoch = 5) == Set(3L))
    assert(gate(4L, s0, epoch = 11, minEpoch = 6).isEmpty)
  }

  test("retention window for embeddings: vector history expires, untagged vectors never do") {
    import sqlImplicits._
    val path = tmpDir()
    val dim = 8
    val planes = graft.similarity.Similarity.hyperplanes(dim, numPlanes = 64)
    val e1 = Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)
    val e2 = Seq(0f, 0f, 1f, 0f, 0f, 0f, 0f, 0f)
    def gate(id: Long, v: Seq[Float], epoch: Long, minEpoch: Long): Set[Long] = {
      val r = SeenIndex.gateAndUpdateEmbeddingWindow(
        Seq((id, v)).toDF("vec_id", "embedding"), "embedding", "vec_id", path,
        epoch, minEpoch, threshold = 0.9, planes = planes, broadcastVerify = true)
      val kept = r.result.collect().map(_.getLong(0)).toSet
      r.release(); kept
    }
    assert(gate(1L, e1, epoch = 1, minEpoch = 0) == Set(1L))
    assert(gate(2L, e1, epoch = 2, minEpoch = 1).isEmpty)   // in window -> gated
    assert(gate(3L, e1, epoch = 10, minEpoch = 5) == Set(3L)) // expired -> re-admitted
    assert(gate(4L, e1, epoch = 11, minEpoch = 6).isEmpty)  // clock reset at 10
    // an UNTAGGED vector (pre-retention API) never expires
    SeenIndex.gateAndUpdateEmbedding(
      Seq((20L, e2)).toDF("vec_id", "embedding"), "embedding", "vec_id", path,
      threshold = 0.9, planes = planes, broadcastVerify = true).release()
    assert(gate(21L, e2, epoch = 1000, minEpoch = 999).isEmpty)
    // the un-windowed read sees every ADMITTED vector regardless of
    // tags: ids 1 and 3 (tagged epochs 1 and 10) plus 20 (untagged);
    // gated arrivals (2, 4, 21) never reached the index
    assert(SeenIndex.readVectors(spark, path).select("id").distinct().count() == 3)
  }

  test("compact collapses cross-epoch duplicate rows without changing any gate decision") {
    import sqlImplicits._
    val path = tmpDir()
    // three epochs appending overlapping signature sets
    SeenIndex.append(Seq(1L, 2L, 3L).toDF("sig"), "sig", path)
    SeenIndex.append(Seq(2L, 3L, 4L).toDF("sig"), "sig", path)
    SeenIndex.append(Seq(3L, 4L, 5L).toDF("sig"), "sig", path)
    assert(SeenIndex.read(spark, path).count() == 9)
    val gateBefore = Dedup.dropSeenHamming(
      Seq((1L, 5L), (2L, 1024L)).toDF("id", "sig"), SeenIndex.read(spark, path), "sig",
      maxHamming = 0).collect().map(_.getLong(0)).toSet
    SeenIndex.compact(spark, path)
    // physically one row per distinct signature now
    assert(SeenIndex.read(spark, path).count() == 5)
    assert(SeenIndex.read(spark, path).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L, 5L))
    val gateAfter = Dedup.dropSeenHamming(
      Seq((1L, 5L), (2L, 1024L)).toDF("id", "sig"), SeenIndex.read(spark, path), "sig",
      maxHamming = 0).collect().map(_.getLong(0)).toSet
    assert(gateBefore == gateAfter && gateAfter == Set(2L))
    // compacting a missing index is a no-op, not an error
    SeenIndex.compact(spark, tmpDir() + "/never-written")
  }
}
