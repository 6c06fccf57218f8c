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

  test("ImageIoDecoder decodes a real PNG payload into pixel-derived features") {
    import sqlImplicits._
    // Two genuine PNGs rendered in-memory: one all-dark, one all-bright,
    // plus a half/half image whose left and right cells must differ.
    def png(fill: (Int, Int) => Int, w: Int = 32, h: Int = 32): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, fill(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val dark = png((_, _) => 0x000000)
    val bright = png((_, _) => 0xffffff)
    val split = png((x, _) => if (x < 16) 0x000000 else 0xffffff)
    val decoder = new Multimodal.ImageIoDecoder()

    val fDark = decoder.decode("image", dark, 16)
    val fBright = decoder.decode("image", bright, 16)
    val fSplit = decoder.decode("image", split, 16)
    assert(fDark.forall(v => math.abs(v - (-1.0f)) < 1e-3), fDark.mkString(","))
    assert(fBright.forall(v => math.abs(v - 1.0f) < 1e-3), fBright.mkString(","))
    // 4x4 grid over a left-dark/right-bright image: column 0 dark, column 3 bright
    assert(fSplit(0) < -0.9f && fSplit(3) > 0.9f, fSplit.mkString(","))

    // end-to-end through the batched mapPartitions path
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", dark, Map.empty),
      Multimodal.MediaRow(2L, "image", bright, Map.empty),
      Multimodal.MediaRow(3L, "audio", Array[Byte](1, 2, 3), Map.empty)) // falls back to stub
    val ds = spark.createDataset(rows)
    val out = Multimodal.extractFeatures(ds, dim = 16, decoder = decoder)
      .collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out(0).features.forall(_ < -0.9f))
    assert(out(1).features.forall(_ > 0.9f))
    assert(out(2).features.length == 16) // stub path still shapes correctly
  }

  test("AudioDecoder decodes a real WAV payload into amplitude-derived features") {
    import javax.sound.sampled._
    // 16-bit mono PCM: first half silence, second half full-amplitude square
    val rate = 8000f
    val n = 8000
    val pcm = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val v: Short = if (i % 8 < 4) 32000 else -32000
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    val decoder = new Multimodal.AudioDecoder()
    val f = decoder.decode("audio", wav, 8)
    assert(f.length == 8)
    // silent first half -> rms 0 -> -1; loud second half -> rms ~0.98 -> ~+0.95
    assert(f.take(4).forall(v => math.abs(v - (-1.0f)) < 1e-3), f.mkString(","))
    assert(f.drop(4).forall(_ > 0.8f), f.mkString(","))
    // non-audio payload falls back to the stub shape
    assert(new Multimodal.JdkMediaDecoder().decode("video", Array[Byte](1, 2), 8).length == 8)
  }

  test("VideoDecoder decodes a real 3-frame animated GIF into per-frame pixel features") {
    import sqlImplicits._
    // a genuine animated GIF written frame-by-frame with the JDK's own
    // GIF writer: black -> mid-gray -> white (palette-exact solids)
    def frame(gray: Int, w: Int = 16, h: Int = 16): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rgb = (gray << 16) | (gray << 8) | gray
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
      img
    }
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersBySuffix("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq(0, 128, 255).foreach(g =>
      writer.writeToSequence(new javax.imageio.IIOImage(frame(g), null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    val gif = bos.toByteArray

    // every decoded frame surfaces, in order, with pixel-true features
    val rows = Seq(Multimodal.MediaRow(7L, "video", gif, Map.empty))
    val perFrame = Multimodal.sampleFrameFeatures(spark.createDataset(rows), everyN = 1, dim = 4)
      .collect().sortBy(_.frame_idx)
    assert(perFrame.map(_.frame_idx).toSeq == Seq(0, 1, 2))
    assert(perFrame(0).features.forall(v => math.abs(v - (-1.0f)) < 1e-2), perFrame(0).features.mkString(","))
    assert(perFrame(1).features.forall(v => math.abs(v) < 0.05f), perFrame(1).features.mkString(","))
    assert(perFrame(2).features.forall(v => math.abs(v - 1.0f) < 1e-2), perFrame(2).features.mkString(","))
    // every-2nd sampling keeps real frame indices 0 and 2
    val sampled = Multimodal.sampleFrameFeatures(spark.createDataset(rows), everyN = 2, dim = 4)
      .collect().map(_.frame_idx).sorted
    assert(sampled.toSeq == Seq(0, 2))

    // the whole-clip embedding preserves temporal order: dim 48 ->
    // 3 slices of 16 cells, dark then mid then bright
    val vd = new Multimodal.VideoDecoder()
    val clip = vd.decode("video", gif, 48)
    assert(clip.take(16).forall(_ < -0.9f), clip.mkString(","))
    assert(clip.slice(16, 32).forall(v => math.abs(v) < 0.05f), clip.mkString(","))
    assert(clip.drop(32).forall(_ > 0.9f), clip.mkString(","))
    // a reversed clip embeds DIFFERENTLY (order is information)
    assert(!(clip sameElements clip.reverse))
    // JdkMediaDecoder routes video to the real path now; an
    // undecodable payload still falls back to the stub shape
    val jdk = new Multimodal.JdkMediaDecoder()
    assert(jdk.decode("video", gif, 48).toSeq == clip.toSeq)
    assert(jdk.decode("video", Array[Byte](1, 2, 3), 8).length == 8)
  }

  test("syntheticMedia assigns a kind to negative ids too (pmod, not %)") {
    import sqlImplicits._
    val df = Seq((-1L, "a"), (-2L, "b"), (-3L, "c")).toDF("doc_id", "text")
    val kinds = Multimodal.syntheticMedia(spark, df, "doc_id", "text")
      .collect().map(r => r.media_id -> r.kind).toMap
    // % would index 0 (runtime error) for -3 and wrap for -1/-2
    assert(kinds == Map(-1L -> "video", -2L -> "audio", -3L -> "image"))
  }

  test("sampleFrames rejects a non-positive stride up front") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(media.toDF(), everyN = 0)
    }
    assert(e.getMessage.contains("everyN"))
  }

  test("frame sampling explodes every-Nth frame index for videos only") {
    val frames = Multimodal.sampleFrames(media.toDF(), everyN = 5)
    val kinds = media.toDF().filter(col("kind") === "video").count()
    assert(frames.select("media_id").distinct().count() == kinds)
    val one = frames.filter(col("media_id") === frames.select("media_id").head().getLong(0))
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(one.zipWithIndex.forall { case (f, i) => f == i * 5 })
  }

  test("decoded-pixel features flow end-to-end into the IVF ANN path (no stub)") {
    // The real-decoder seam in one run: genuine PNG payloads ->
    // ImageIoDecoder pixel embeddings (luminance grid pool — the
    // low-luminance cluster's components are all negative, the
    // high-luminance cluster's all positive, so cross-cluster cosine
    // is ~-1) -> Ivf.train/index/knnJoin. A dark query must retrieve
    // only dark corpus images and a bright query only bright ones —
    // which can only happen if the embeddings reaching the ANN index
    // are real functions of the decoded pixels, not FakeDecoder hash
    // noise.
    def png(fill: (Int, Int) => Int, w: Int = 32, h: Int = 32): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, fill(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def shade(base: Int, id: Int)(x: Int, y: Int): Int = {
      val v = base + ((x * 7 + y * 13 + id * 29) % 32)
      (v << 16) | (v << 8) | v
    }
    import sqlImplicits._
    val decoder = new Multimodal.ImageIoDecoder()
    def embed(rows: Seq[Multimodal.MediaRow], idOut: String) =
      Multimodal.extractFeatures(spark.createDataset(rows), dim = 16, decoder = decoder)
        .toDF().select(col("media_id").as(idOut), col("features").as("embedding"))
    val corpus = (0 until 20).map { i =>
      Multimodal.MediaRow(i.toLong, "image", png(shade(if (i < 10) 32 else 192, i)), Map.empty)
    }
    val feats = embed(corpus, "vec_id")
    val model = graft.similarity.Ivf.train(feats, "embedding", k = 2, iters = 5)
    val idx = graft.similarity.Ivf.index(feats, "embedding", "vec_id", model)
    val queries = embed(Seq(
      Multimodal.MediaRow(100L, "image", png(shade(32, 100)), Map.empty),
      Multimodal.MediaRow(101L, "image", png(shade(192, 101)), Map.empty)), "q_id")
    val nn = graft.similarity.Ivf
      .knnJoin(idx, "embedding", "vec_id", queries, "embedding", "q_id", k = 3, model, nprobe = 1)
      .collect()
    val byQ = nn.groupBy(_.getAs[Long]("q_id"))
    assert(byQ(100L).length == 3 && byQ(101L).length == 3)
    assert(byQ(100L).forall(_.getAs[Long]("vec_id") < 10L),
      s"dark query must retrieve dark images: ${byQ(100L).mkString(";")}")
    assert(byQ(101L).forall(_.getAs[Long]("vec_id") >= 10L),
      s"bright query must retrieve bright images: ${byQ(101L).mkString(";")}")
    // and the retrieved cosines are near 1 — same-cluster pixel embeddings
    assert(nn.forall(_.getAs[Double]("cosine") > 0.9))
  }
}
