package graft.multimodal

import graft.SparkSpec
import graft.sources.Sources
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = Multimodal.syntheticMedia(
    spark, Sources.documents(spark, "/root/testdata/sf0.001").limit(30), "doc_id", "text")

  test("synthetic media table conforms to the canonical schema") {
    val df = media.toDF()
    assert(df.schema.fieldNames.toSeq == Multimodal.mediaSchema.fieldNames.toSeq)
    assert(df.count() == 30)
    assert(df.select("kind").distinct().count() == 3)
  }

  test("batched feature extraction: fixed dim, deterministic, byte-sensitive") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.media_id)
    assert(f1.length == 30)
    assert(f1.forall(_.features.length == 16))
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) }) // deterministic
    // distinct payloads -> distinct features
    assert(f1.map(_.features.toSeq).distinct.length == f1.length)
    assert(f1.forall(r => r.n_bytes > 0))
  }

  test("frame sampling explodes every-Nth frame index for videos only") {
    val frames = Multimodal.sampleFrames(media.toDF(), everyN = 5)
    val kinds = media.toDF().filter(col("kind") === "video").count()
    assert(frames.select("media_id").distinct().count() == kinds)
    val one = frames.filter(col("media_id") === frames.select("media_id").head().getLong(0))
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(one.zipWithIndex.forall { case (f, i) => f == i * 5 })
  }
}
