package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  private def doc(id: Long, nTokens: Int): (Long, String) =
    (id, (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("chunk geometry: coverage, overlap, short tail, short doc") {
    import sqlImplicits._
    // window 8, stride 6: 20 tokens -> starts 0, 6, 12 (ceil(12/6)=2)
    val df = Seq(doc(1L, 20), doc(2L, 8), doc(3L, 3)).toDF("doc_id", "text")
    val out = Chunking.chunks(df, "text", "doc_id", window = 8, stride = 6)
      .orderBy("doc_id", "chunk_idx")
      .collect()

    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ==
      Seq((0, 0, 8), (1, 6, 8), (2, 12, 8)))
    // overlap: chunk 1 starts at token 7 (1-based), so its first
    // window-stride=2 tokens repeat chunk 0's tail
    assert(d1(0).getString(4) == (1 to 8).map(i => s"t$i").mkString(" "))
    assert(d1(1).getString(4) == (7 to 14).map(i => s"t$i").mkString(" "))
    assert(d1(2).getString(4) == (13 to 20).map(i => s"t$i").mkString(" "))

    // exactly one window: a single chunk, no empty tail chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq == Seq((0, 0, 8)))

    // shorter than one window: one short chunk with all tokens
    val d3 = out.filter(_.getLong(0) == 3L)
    assert(d3.map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).toSeq == Seq((0, 0, 3)))
    assert(d3(0).getString(4) == "t1 t2 t3")
  }

  test("every token is covered and consecutive chunks overlap by window - stride") {
    import sqlImplicits._
    for (n <- Seq(1, 5, 47, 48, 49, 64, 65, 100, 111, 112, 113)) {
      val df = Seq(doc(1L, n)).toDF("doc_id", "text")
      val rows = Chunking.chunks(df, "text", "doc_id", window = 64, stride = 48)
        .orderBy("chunk_idx").collect()
      val covered = rows.flatMap(r => r.getInt(2) until (r.getInt(2) + r.getInt(3))).toSet
      assert(covered == (0 until n).toSet, s"n=$n: coverage hole")
      // last chunk must start new content: its start < n
      assert(rows.last.getInt(2) < n, s"n=$n: empty tail chunk")
      // chunk count matches the closed form
      val expected = 1 + math.max(0, math.ceil((n - 64) / 48.0).toInt)
      assert(rows.length == expected, s"n=$n: ${rows.length} chunks, want $expected")
    }
  }

  test("stride == window tiles without overlap; invalid strides rejected") {
    import sqlImplicits._
    val df = Seq(doc(1L, 10)).toDF("doc_id", "text")
    val rows = Chunking.chunks(df, "text", "doc_id", window = 4, stride = 4)
      .orderBy("chunk_idx").collect()
    assert(rows.map(r => (r.getInt(2), r.getInt(3))).toSeq == Seq((0, 4), (4, 4), (8, 2)))
    intercept[IllegalArgumentException] {
      Chunking.chunks(df, "text", "doc_id", window = 4, stride = 5)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunks(df, "text", "doc_id", window = 0, stride = 1)
    }
  }

  test("plan shape: single Generate, no shuffle") {
    import sqlImplicits._
    val df = Seq(doc(1L, 200), doc(2L, 10)).toDF("doc_id", "text")
    val out = Chunking.chunks(df, "text", "doc_id", window = 64, stride = 48)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
    assert("Generate".r.findAllIn(plan).length == 1, s"exactly one Generate:\n$plan")
  }
}
