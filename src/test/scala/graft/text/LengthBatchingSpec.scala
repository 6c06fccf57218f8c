package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LengthBatchingSpec extends SparkSpec {

  // docs whose token counts span several 32-wide buckets
  private def docs(n: Int) = spark.range(n.toLong).select(
    col("id").as("doc_id"),
    concat_ws(" ", transform(sequence(lit(1), (col("id") % 100 + 1).cast("int")),
      _ => lit("w"))).as("text"))

  test("bucket and batch arithmetic: bucket = n_tokens div width, batches sized <= batchSize") {
    val out = LengthBatching.assignBatches(docs(400), "text", "doc_id",
      bucketWidth = 32, batchSize = 16).cache()
    try {
      assert(out.filter(col("bucket") =!= floor(col("n_tokens") / lit(32L))).count() == 0)
      val sizes = out.groupBy("bucket", "batch_id").count()
      assert(sizes.filter(col("count") > 16).count() == 0, "no batch may exceed batchSize")
      // every batch but the last per bucket is FULL (dense rank div semantics)
      val lastPerBucket = sizes.groupBy("bucket").agg(max("batch_id").as("last"))
      val nonLast = sizes.join(lastPerBucket, Seq("bucket"))
        .filter(col("batch_id") =!= col("last"))
      assert(nonLast.filter(col("count") =!= 16).count() == 0,
        "non-final batches must be exactly batchSize")
    } finally { out.unpersist(); () }
  }

  test("window and distributed forms are bit-identical") {
    val d = docs(300)
    val a = LengthBatching.assignBatches(d, "text", "doc_id", 32, 16, distributed = false)
      .select("doc_id", "bucket", "batch_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = LengthBatching.assignBatches(d, "text", "doc_id", 32, 16, distributed = true, numChunks = 7)
      .select("doc_id", "bucket", "batch_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("batchSummary: padded cost and efficiency are exact, efficiency 1.0 for equal-length batches") {
    import sqlImplicits._
    // 20 docs of exactly 5 tokens -> one bucket, two minibatches of 16/4, max=sum/n
    val same = spark.range(20).select(col("id").as("doc_id"), lit("a b c d e").as("text"))
    val s = LengthBatching.batchSummary(same, "text", "doc_id", bucketWidth = 32, batchSize = 16)
      .orderBy("batch_id").collect()
    assert(s.length == 2)
    assert(s(0).getAs[Long]("n_docs") == 16 && s(1).getAs[Long]("n_docs") == 4)
    s.foreach { r =>
      assert(r.getAs[Long]("max_tokens") == 5L)
      assert(r.getAs[Long]("padded_tokens") == 5L * r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("pad_efficiency") == 1.0)
    }
    // mixed lengths within one bucket: efficiency = sum / (n * max) exactly
    val mixed = Seq((1L, "a"), (2L, "a b"), (3L, "a b c")).toDF("doc_id", "text")
    val m = LengthBatching.batchSummary(mixed, "text", "doc_id", 32, 16).head()
    assert(m.getAs[Long]("sum_tokens") == 6L && m.getAs[Long]("padded_tokens") == 9L)
    assert(m.getAs[Double]("pad_efficiency") == 6.0 / 9.0)
  }

  test("a negative pre-computed count fails fast instead of joining bucket 0") {
    import sqlImplicits._
    // div truncates toward zero: a legacy -1 missing-count sentinel
    // would silently share bucket 0 with genuinely empty documents
    val counts = Seq((1L, 10L), (2L, -1L)).toDF("doc_id", "n_tok")
    val e = intercept[Exception] {
      LengthBatching.assignBatchesFromCounts(counts, "n_tok", "doc_id",
        bucketWidth = 32, batchSize = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("negative n_tok")), e.toString)
    // nulls keep riding through as null buckets (the facades' null-count behavior)
    val withNull = Seq((1L, Some(10L)), (2L, None)).toDF("doc_id", "n_tok")
    val rows = LengthBatching.assignBatchesFromCounts(withNull, "n_tok", "doc_id",
      bucketWidth = 32, batchSize = 4).collect()
    assert(rows.length == 2 && rows.exists(r => r.isNullAt(r.fieldIndex("bucket"))))
  }

  test("bucketing cuts padding cost vs one global batch pool") {
    // padded cost with buckets must be <= the single-pool padded cost
    // (every batch's max <= global max)
    val d = docs(400)
    val bucketed = LengthBatching.batchSummary(d, "text", "doc_id", 32, 16)
      .agg(sum("padded_tokens")).head().getLong(0)
    val pooled = LengthBatching.batchSummary(d, "text", "doc_id", 1000000, 16)
      .agg(sum("padded_tokens")).head().getLong(0)
    assert(bucketed < pooled, s"bucketed $bucketed should beat pooled $pooled")
  }
}
