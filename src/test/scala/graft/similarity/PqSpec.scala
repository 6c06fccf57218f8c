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

  test("topK resolves as TakeOrderedAndProject — local top-k per partition, no global sort shuffle") {
    val m = 4
    val df = corpus(64, m)
    val model = Pq.train(df, "embedding", dim = 2 * m, m = m, ksub = 4, iters = 5, sampleSize = 64)
    val enc = Pq.encode(df, "embedding", "vec_id", model)
    val plan = Pq.topK(enc, model, Array.fill(2 * m)(0.5), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$plan")
  }
}
