package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class PqSpec extends SparkSpec {

  // Subvector vocabulary {e0, e1, -e0, -e1} in 2-dim: every full
  // vector norm is sqrt(m), so unit normalization scales all
  // subvectors uniformly and the per-subspace vocabulary stays
  // 4 distinct points — with ksub=4 Lloyd's recovers it EXACTLY and
  // PQ becomes lossless on this corpus.
  private val vocab = Array(
    Array(1f, 0f), Array(0f, 1f), Array(-1f, 0f), Array(0f, -1f))

  private def corpus(n: Int, m: Int): DataFrame = {
    import sqlImplicits._
    (0 until n).map { id =>
      val v = (0 until m).flatMap(s => vocab(((id >> (2 * s)) + id) % 4).toSeq)
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def brute(df: DataFrame, q: Array[Double], k: Int): Seq[Long] = {
    val rows = df.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val dot = v.zip(q).map { case (a, b) => a * b }.sum
      val nv = math.sqrt(v.map(x => x * x).sum)
      val nq = math.sqrt(q.map(x => x * x).sum)
      (r.getLong(0), dot / (nv * nq))
    }
    rows.sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSeq
  }

  test("on a codebook-sized vocabulary PQ is lossless: ADC top-k equals brute cosine top-k") {
    val m = 4
    val df = corpus(64, m)
    val model = Pq.train(df, "embedding", dim = 2 * m, m = m, ksub = 4, iters = 10, sampleSize = 64)
    val enc = Pq.encode(df, "embedding", "vec_id", model)
    val q = Array(1.0, 0.2, 0.9, -0.1, 0.3, 1.0, -0.7, 0.4)
    val got = Pq.topK(enc, model, q, k = 10).collect().map(_.getLong(0)).toSeq
    assert(got == brute(df, q, 10), s"got=$got want=${brute(df, q, 10)}")
  }

  test("codes are m bytes; decode via codebook reproduces each normalized subvector exactly") {
    val m = 4
    val df = corpus(32, m)
    val model = Pq.train(df, "embedding", dim = 2 * m, m = m, ksub = 4, iters = 10, sampleSize = 32)
    val enc = Pq.encode(df, "embedding", "vec_id", model).collect()
    assert(enc.length == 32)
    assert(enc.forall(_.code.length == m))
    val byId = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    enc.foreach { row =>
      val v = byId(row.id)
      val norm = math.sqrt(v.map(x => x * x).sum)
      (0 until m).foreach { s =>
        val rec = model.codebooks(s)(row.code(s) & 0xff)
        val want = v.slice(2 * s, 2 * s + 2).map(_ / norm)
        rec.zip(want).foreach { case (a, b) =>
          assert(math.abs(a - b) < 1e-5, s"id=${row.id} subspace $s: $a vs $b")
        }
      }
    }
  }

  test("degenerate vectors are dropped by encode; ksub > 256 is rejected") {
    import sqlImplicits._
    val m = 4
    val good = corpus(16, m)
    val bad = Seq(
      (9001L, Seq.fill(2 * m)(0f)),
      (9002L, Float.NaN +: Seq.fill(2 * m - 1)(1f)))
      .toDF("vec_id", "embedding")
    val model = Pq.train(good, "embedding", dim = 2 * m, m = m, ksub = 4, iters = 5, sampleSize = 16)
    val enc = Pq.encode(good.union(bad), "embedding", "vec_id", model)
    assert(enc.collect().map(_.id).toSet == (0 until 16).map(_.toLong).toSet)
    intercept[IllegalArgumentException] {
      Pq.Model(8, 4, 300, Array.empty)
    }
    intercept[IllegalArgumentException] {
      Pq.train(good, "embedding", dim = 2 * m, m = 3, ksub = 4)
    }
  }

  test("shared guard covers Inf norms and wrong-length rows; model-pair and nprobe misuse fails loud; empty index round-trips") {
    import sqlImplicits._
    val m = 4
    val good = corpus(16, m)
    // Inf element: norm=Inf passed the old guard, poisoned codebook 0
    // in training and scored garbage rows with finite ADC sums;
    // wrong-length rows crashed the executor index loops (review r18)
    val bad = Seq(
      (9003L, Float.PositiveInfinity +: Seq.fill(2 * m - 1)(1f)),
      (9004L, Seq.fill(2 * m - 3)(1f)), // too short
      (9005L, Seq.fill(2 * m + 5)(1f))) // too long
      .toDF("vec_id", "embedding")
    val model = Pq.train(good.union(bad), "embedding", dim = 2 * m, m = m, ksub = 4,
      iters = 5, sampleSize = 64)
    val enc = Pq.encode(good.union(bad), "embedding", "vec_id", model)
    assert(enc.collect().map(_.id).toSet == (0 until 16).map(_.toLong).toSet,
      "Inf-norm and wrong-length rows must be excluded, not crash or mis-encode")
    val ivf = Ivf.train(good, "embedding", k = 4, iters = 5, sampleSize = 64)
    val encIvf = Pq.encodeIvf(good.union(bad), "embedding", "vec_id", ivf,
      Pq.trainResidual(good, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64))
    assert(encIvf.collect().map(_.id).toSet == (0 until 16).map(_.toLong).toSet)
    // query-path misuse: zero probes and mismatched model pairs must
    // refuse instead of returning empty / probing the wrong cells
    val pq = Pq.trainResidual(good, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val q = Array.fill(2 * m)(1.0)
    intercept[IllegalArgumentException] { Pq.topKIvf(encIvf, pq, ivf, q, k = 3, nprobe = 0) }
    val smallIvf = Ivf.train(corpus(16, 2), "embedding", k = 2, iters = 3, sampleSize = 16)
    intercept[IllegalArgumentException] { Pq.topKIvf(encIvf, pq, smallIvf, q, k = 3) }
    // an all-degenerate corpus writes an EMPTY partitioned layout;
    // readIndex must return the empty Dataset, not fail inference
    val emptyDir = java.nio.file.Files.createTempDirectory("pq_empty_").toString + "/idx"
    Pq.writeIndex(Pq.encodeIvf(bad, "embedding", "vec_id", ivf, pq), emptyDir)
    assert(Pq.readIndex(spark, emptyDir).count() == 0L)
  }

  test("codes encoded under a different pq.m fail loud in topK and topKIvf, not mis-score") {
    import sqlImplicits._
    val m = 4
    val df = corpus(32, m)
    val model = Pq.train(df, "embedding", dim = 2 * m, m = m, ksub = 4, iters = 5, sampleSize = 32)
    val q = Array.fill(2 * m)(1.0)
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // a LONGER code (encoded under pq.m=6) would silently ignore
    // trailing bytes; a SHORTER one (pq.m=2) died with a bare AIOOBE
    // in the executor loop (ADVICE r18) — both must name the cause
    Seq(2, 6).foreach { wrongM =>
      val wrong = Pq.encode(df, "embedding", "vec_id", model)
        .map(r => Pq.CodeRow(r.id, Array.fill[Byte](wrongM)(0)))
      val e = intercept[Throwable] { Pq.topK(wrong, model, q, k = 3).collect() }
      assert(msgs(e).exists(_.contains("different PQ model")), s"m=$wrongM: ${msgs(e)}")
    }
    val ivf = Ivf.train(df, "embedding", k = 4, iters = 5, sampleSize = 32)
    val pq = Pq.trainResidual(df, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 32)
    val wrongIvf = Pq.encodeIvf(df, "embedding", "vec_id", ivf, pq)
      .map(r => Pq.IvfCodeRow(r.id, r.cell, Array.fill[Byte](2)(0)))
    val e = intercept[Throwable] { Pq.topKIvf(wrongIvf, pq, ivf, q, k = 3, nprobe = 4).collect() }
    assert(msgs(e).exists(_.contains("different PQ model")), msgs(e).toString)
  }

  test("appendToIndex grows an existing index without retraining: results equal one-shot encode of the union") {
    val m = 4
    val all = corpus(64, m)
    val base = all.filter("vec_id < 40")
    val batch = all.filter("vec_id >= 40")
    val ivf = Ivf.train(base, "embedding", k = 4, iters = 5, sampleSize = 64)
    val pq = Pq.trainResidual(base, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val dir = java.nio.file.Files.createTempDirectory("pq_append_").toString + "/idx"
    Pq.writeIndex(Pq.encodeIvf(base, "embedding", "vec_id", ivf, pq), dir)
    Pq.appendToIndex(batch, "embedding", "vec_id", ivf, pq, dir)
    val grown = Pq.readIndex(spark, dir).collect().map(r => (r.id, r.cell, r.code.toSeq)).toSet
    val oneShot = Pq.encodeIvf(all, "embedding", "vec_id", ivf, pq)
      .collect().map(r => (r.id, r.cell, r.code.toSeq)).toSet
    assert(grown == oneShot, "appended rows must be indistinguishable from one-shot encoding")
    // probes see the appended rows: a query near an appended vector finds it
    val q = Array(1.0, 0.2, 0.9, -0.1, 0.3, 1.0, -0.7, 0.4)
    val gotGrown = Pq.topKIvf(Pq.readIndex(spark, dir), pq, ivf, q, k = 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSeq
    val gotOneShot = Pq.topKIvf(Pq.encodeIvf(all, "embedding", "vec_id", ivf, pq),
      pq, ivf, q, k = 10, nprobe = 4).collect().map(_.getLong(0)).toSeq
    assert(gotGrown == gotOneShot)
  }

  test("quantizationError is ~0 on the lossless vocabulary, rises on a drifted corpus, and driftCheck fires") {
    import sqlImplicits._
    val m = 4
    val base = corpus(64, m)
    val ivf = Ivf.train(base, "embedding", k = 4, iters = 5, sampleSize = 64)
    val pq = Pq.trainResidual(base, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val baseline = Pq.quantizationError(base, "embedding", ivf, pq)
    assert(baseline >= 0 && baseline < 1e-9, s"lossless corpus must quantize exactly, got $baseline")
    // a drifted batch: vectors OFF the trained vocabulary directions
    val drifted = (0 until 32).map { i =>
      (1000L + i, (0 until m).flatMap(s => Seq(0.6f + 0.01f * ((i + s) % 7), 0.8f)))
    }.toDF("vec_id", "embedding")
    val current = Pq.quantizationError(drifted, "embedding", ivf, pq)
    assert(current > 1e-4, s"drifted corpus must show quantization error, got $current")
    // driftCheck needs a positive baseline: use a tiny-but-real one
    val eps = 1e-6
    val stat = Pq.driftCheck(drifted, "embedding", ivf, pq, baseline = math.max(baseline, eps))
    assert(stat.retrainDue, s"drift must fire: $stat")
    assert(!Pq.driftCheck(base, "embedding", ivf, pq, baseline = math.max(current, eps)).retrainDue)
    // empty batch: NaN current never fires
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val statE = Pq.driftCheck(empty, "embedding", ivf, pq, baseline = 1.0)
    assert(statE.current.isNaN && !statE.retrainDue)
    intercept[IllegalArgumentException] {
      Pq.driftCheck(base, "embedding", ivf, pq, baseline = 0.0)
    }
    // the most drastic drift: a NON-empty batch whose every row is
    // unusable (here: the embedding provider changed dimension) must
    // FAIL LOUD, not report NaN/"no drift" while appendToIndex
    // silently appends nothing (review r19)
    val wrongDim = (0 until 8).map(i => (2000L + i, Seq.fill(pq.dim + 4)(0.5f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Pq.driftCheck(wrongDim, "embedding", ivf, pq, baseline = 1.0)
    }
    assert(ex.getMessage.contains("unusable"), ex.getMessage)
    // a MIXED batch still measures over its usable rows only
    val mixed = drifted.unionByName(wrongDim)
    val statM = Pq.driftCheck(mixed, "embedding", ivf, pq, baseline = math.max(baseline, eps))
    assert(statM.retrainDue && math.abs(statM.current - current) < 1e-12,
      s"mixed batch must score its usable rows exactly: $statM vs $current")
  }

  test("PQ and IVF models round-trip through writeModel/readModel bit-exactly") {
    val m = 4
    val df = corpus(64, m)
    val ivf = Ivf.train(df, "embedding", k = 4, iters = 5, sampleSize = 64)
    val pq = Pq.trainResidual(df, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val pqDir = java.nio.file.Files.createTempDirectory("pq_model_").toString + "/pq"
    val ivfDir = java.nio.file.Files.createTempDirectory("ivf_model_").toString + "/ivf"
    Pq.writeModel(spark, pq, pqDir)
    Ivf.writeModel(spark, ivf, ivfDir)
    val pq2 = Pq.readModel(spark, pqDir)
    val ivf2 = Ivf.readModel(spark, ivfDir)
    assert(pq2.dim == pq.dim && pq2.m == pq.m && pq2.ksub == pq.ksub)
    assert(pq2.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    assert(ivf2.centroids.map(_.toSeq).toSeq == ivf.centroids.map(_.toSeq).toSeq)
    // loaded models encode identically to the originals
    val a = Pq.encodeIvf(df, "embedding", "vec_id", ivf, pq)
      .collect().map(r => (r.id, r.cell, r.code.toSeq)).toSet
    val b = Pq.encodeIvf(df, "embedding", "vec_id", ivf2, pq2)
      .collect().map(r => (r.id, r.cell, r.code.toSeq)).toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Pq.readModel(spark, java.nio.file.Files.createTempDirectory("pq_none_").toString)
    }
  }

  test("encodeIvf assigns the same cell as Ivf.cellOf — train/encode/expression parity") {
    val m = 4
    val df = corpus(64, m)
    val ivf = Ivf.train(df, "embedding", k = 4, iters = 5, sampleSize = 64)
    val pq = Pq.trainResidual(df, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val got = Pq.encodeIvf(df, "embedding", "vec_id", ivf, pq)
      .collect().map(r => r.id -> r.cell).toMap
    val want = Ivf.index(df, "embedding", "vec_id", ivf)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == want)
  }

  test("topKIvf scores are exactly dot(q_unit, centroid + decoded residual); nprobe=k equals full ADC") {
    val m = 4
    val df = corpus(64, m)
    val ivf = Ivf.train(df, "embedding", k = 4, iters = 5, sampleSize = 64)
    val pq = Pq.trainResidual(df, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val enc = Pq.encodeIvf(df, "embedding", "vec_id", ivf, pq)
    val q = Array(1.0, 0.2, 0.9, -0.1, 0.3, 1.0, -0.7, 0.4)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val qu = q.map(_ / qn)
    // driver-side full-ADC anchor over every encoded row
    val dsub = pq.dsub
    val adc = enc.collect().map { r =>
      val cent = ivf.centroids(r.cell)
      var sc = qu.zip(cent).map { case (a, b) => a * b }.sum
      (0 until pq.m).foreach { s =>
        val cw = pq.codebooks(s)(r.code(s) & 0xff)
        (0 until dsub).foreach(i => sc += qu(s * dsub + i) * cw(i))
      }
      (r.id, sc)
    }
    val wantTop = adc.sortBy { case (id, sc) => (-sc, id) }.take(10).toSeq
    val got = Pq.topKIvf(enc, pq, ivf, q, k = 10, nprobe = ivf.k)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got.map(_._1) == wantTop.map(_._1), s"got=${got.map(_._1)} want=${wantTop.map(_._1)}")
    got.zip(wantTop).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-9, s"score $g != driver ADC $w")
    }
  }

  test("nprobe=1 returns only rows of the query's nearest cell; rerank scores are true cosines") {
    val m = 4
    val df = corpus(64, m)
    val ivf = Ivf.train(df, "embedding", k = 4, iters = 5, sampleSize = 64)
    val pq = Pq.trainResidual(df, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val enc = Pq.encodeIvf(df, "embedding", "vec_id", ivf, pq)
    val q = Array(1.0, 0.2, 0.9, -0.1, 0.3, 1.0, -0.7, 0.4)
    val qn = math.sqrt(q.map(x => x * x).sum)
    val qu = q.map(_ / qn)
    val nearest = ivf.centroids.indices.maxBy { c =>
      // strict argmax with ties to the smaller index, as in assignment
      val d = qu.zip(ivf.centroids(c)).map { case (a, b) => a * b }.sum
      (d, -c)
    }
    val cellOf = enc.collect().map(r => r.id -> r.cell).toMap
    val got1 = Pq.topKIvf(enc, pq, ivf, q, k = 10, nprobe = 1)
      .collect().map(_.getLong(0))
    assert(got1.nonEmpty && got1.forall(cellOf(_) == nearest))
    // rerank: cosine column equals the exact recomputation per id
    val rer = Pq.topKIvfRerank(enc, pq, ivf, df, "embedding", "vec_id", q,
      k = 5, nprobe = ivf.k, expand = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(rer.map(_._3).toSeq == (1 to rer.length))
    val byId = df.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      val nv = math.sqrt(v.map(x => x * x).sum)
      r.getLong(0) -> v.zip(q).map { case (a, b) => a * b }.sum / (nv * qn)
    }.toMap
    rer.foreach { case (id, c, _) =>
      assert(math.abs(c - byId(id)) < 1e-6, s"id=$id cosine $c != exact ${byId(id)}")
    }
  }

  test("writeIndex/readIndex round-trips; a probe over the layout plans a cell PARTITION filter and matches in-memory") {
    val m = 4
    val df = corpus(64, m)
    val ivf = Ivf.train(df, "embedding", k = 4, iters = 5, sampleSize = 64)
    val pq = Pq.trainResidual(df, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val enc = Pq.encodeIvf(df, "embedding", "vec_id", ivf, pq)
    val path = java.nio.file.Files.createTempDirectory("pq_idx_spec").toString + "/idx"
    Pq.writeIndex(enc, path)
    val back = Pq.readIndex(spark, path)
    assert(back.collect().map(r => (r.id, r.cell, r.code.toSeq)).toSet ==
      enc.collect().map(r => (r.id, r.cell, r.code.toSeq)).toSet)
    val q = Array(1.0, 0.2, 0.9, -0.1, 0.3, 1.0, -0.7, 0.4)
    val probe = Pq.topKIvf(back, pq, ivf, q, k = 10, nprobe = 2)
    // the probed-cell isin must reach the scan as a PARTITION filter
    // — unprobed inverted lists are directories never opened
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"),
      s"expected a cell partition filter in:\n${plan.take(2000)}")
    val want = Pq.topKIvf(enc, pq, ivf, q, k = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"got=$got want=$want")
  }

  test("topK resolves as TakeOrderedAndProject — local top-k per partition, no global sort shuffle") {
    val m = 4
    val df = corpus(64, m)
    val model = Pq.train(df, "embedding", dim = 2 * m, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val enc = Pq.encode(df, "embedding", "vec_id", model)
    val plan = Pq.topK(enc, model, Array.fill(2 * m)(0.5), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
    val ivf = Ivf.train(df, "embedding", k = 4, iters = 5, sampleSize = 64)
    val pq = Pq.trainResidual(df, "embedding", ivf, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val ivfPlan = Pq.topKIvf(
      Pq.encodeIvf(df, "embedding", "vec_id", ivf, pq), pq, ivf,
      Array.fill(2 * m)(0.5), k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(ivfPlan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$ivfPlan")
    assert(ivfPlan.contains("cell"), s"expected the probed-cell filter in the plan:\n$ivfPlan")
  }
}
