package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import graft.SparkSpec

/** Pins the pure-JVM AVI container path: a spec-conformant RIFF/AVI is
  * BUILT here byte-by-byte (hdrl with avih + strl, movi with frame
  * chunks) and read back through [[Avi]] / [[Multimodal.VideoDecoder]].
  */
class AviSpec extends SparkSpec {

  // ----------------------------------------------------------- writer
  private def le32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  private def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
  }

  private def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
    val inner = listType.getBytes("US-ASCII") ++ bodies.flatten
    "LIST".getBytes("US-ASCII") ++ le32(inner.length) ++ inner
  }

  private def bitmapInfoHeader(w: Int, h: Int, bitCount: Int, compression: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40).putInt(w).putInt(h)
    bb.putShort(1).putShort(bitCount.toShort)
    bb.putInt(compression).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
    bb.array()
  }

  /** A well-formed single-video-stream AVI holding the given frame
    * payloads as `00dc` (or `00db`) chunks.
    */
  private def buildAvi(
      framePayloads: Seq[Array[Byte]], w: Int, h: Int,
      handler: String = "MJPG", compression: Int = 0x47504A4D /* 'MJPG' */,
      bitCount: Int = 24, frameId: String = "00dc"): Array[Byte] = {
    val avih = chunk("avih", Array.fill[Byte](56)(0))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ handler.getBytes("US-ASCII") ++ Array.fill[Byte](48)(0))
    val strf = chunk("strf", bitmapInfoHeader(w, h, bitCount, compression))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", framePayloads.map(chunk(frameId, _)): _*)
    val inner = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(inner.length) ++ inner
  }

  private def solidImage(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  private def jpegBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Bottom-up BI_RGB 24-bit pixel rows, each padded to 4 bytes — the
    * raw DIB frame layout.
    */
  private def dibPayload(w: Int, h: Int, rowColors: Seq[Int]): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = rowColors(y)
      val off = (h - 1 - y) * stride + x * 3 // bottom-up
      out(off) = (rgb & 0xff).toByte             // B
      out(off + 1) = ((rgb >> 8) & 0xff).toByte  // G
      out(off + 2) = ((rgb >> 16) & 0xff).toByte // R
    }
    out
  }

  // ------------------------------------------------------------ tests
  test("MJPEG AVI: every frame decodes, in container order") {
    val frames = Seq(0xff0000, 0x00ff00, 0x0000ff).map(c => jpegBytes(solidImage(16, 16, c)))
    val avi = buildAvi(frames, 16, 16)
    assert(Avi.isAvi(avi))
    val got = Avi.frames(avi)
    assert(got.length == 3)
    assert(got.forall(f => f.getWidth == 16 && f.getHeight == 16))
    // JPEG is lossy; assert the dominant channel survived, per frame
    def channels(img: java.awt.image.BufferedImage) = {
      val rgb = img.getRGB(8, 8)
      ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
    }
    val (r0, g0, b0) = channels(got(0)); assert(r0 > 180 && g0 < 120 && b0 < 120, (r0, g0, b0))
    val (r1, g1, b1) = channels(got(1)); assert(g1 > 180 && r1 < 120 && b1 < 120, (r1, g1, b1))
    val (r2, g2, b2) = channels(got(2)); assert(b2 > 180 && r2 < 120 && g2 < 120, (r2, g2, b2))
  }

  test("raw DIB AVI: bottom-up BI_RGB frames decode pixel-exact via the BMP rebuild") {
    val payloads = Seq(
      dibPayload(4, 2, Seq(0x102030, 0x405060)),
      dibPayload(4, 2, Seq(0xffffff, 0x000000)))
    val avi = buildAvi(payloads, 4, 2, handler = "DIB ", compression = 0, frameId = "00db")
    val got = Avi.frames(avi)
    assert(got.length == 2)
    assert((got(0).getRGB(0, 0) & 0xffffff) == 0x102030) // top row y=0
    assert((got(0).getRGB(3, 1) & 0xffffff) == 0x405060)
    assert((got(1).getRGB(0, 0) & 0xffffff) == 0xffffff)
    assert((got(1).getRGB(0, 1) & 0xffffff) == 0x000000)
  }

  test("VideoDecoder embeds AVI clips; frame order changes the embedding") {
    val fwd = buildAvi(
      Seq(0x000000, 0x404040, 0x808080, 0xc0c0c0).map(c => jpegBytes(solidImage(16, 16, c))),
      16, 16)
    val rev = buildAvi(
      Seq(0xc0c0c0, 0x808080, 0x404040, 0x000000).map(c => jpegBytes(solidImage(16, 16, c))),
      16, 16)
    val dec = new Multimodal.VideoDecoder()
    val fFwd = dec.decode("video", fwd, 64)
    val fRev = dec.decode("video", rev, 64)
    assert(fFwd.length == 64 && fRev.length == 64)
    assert(!fFwd.sameElements(fRev), "a reversed clip must embed differently")
    // brightness ramps up in fwd -> later temporal slices brighter
    assert(fFwd.take(16).sum < fFwd.takeRight(16).sum)
    assert(fRev.take(16).sum > fRev.takeRight(16).sum)
  }

  test("undecodable or malformed payloads yield no frames and hit the honest fallback") {
    assert(!Avi.isAvi("RIFFxxxxWAVE".getBytes("US-ASCII"))) // RIFF but not AVI
    assert(Avi.frames(Array[Byte](1, 2, 3)).isEmpty)
    // structurally valid AVI whose frames are an unknown codec: no frames
    val junkFrames = buildAvi(Seq(Array.fill[Byte](64)(7)), 16, 16,
      handler = "h264", compression = 0x34363268)
    assert(Avi.frames(junkFrames).isEmpty)
    // truncated mid-chunk: parser stops cleanly with what it has
    val good = buildAvi(Seq(jpegBytes(solidImage(16, 16, 0xff0000))), 16, 16)
    assert(Avi.frames(good.take(good.length - 10)).isEmpty ||
      Avi.frames(good.take(good.length - 10)).length <= 1)
    val dec = new Multimodal.VideoDecoder()
    val stub = Multimodal.FakeDecoder.decode("video", junkFrames, 16)
    assert(dec.decode("video", junkFrames, 16).sameElements(stub))
  }

  test("a crafted near-Int.MaxValue chunk size stops the walk WITH the frames already recovered") {
    // body + size would overflow Int and slip past a naive truncation
    // guard; the walk must stop and keep the first frame, not throw
    // and discard it
    val goodFrame = chunk("00dc", jpegBytes(solidImage(16, 16, 0xff0000)))
    val evil = "00dc".getBytes("US-ASCII") ++ le32(0x7ffffff0) ++ Array.fill[Byte](8)(1)
    val avih = chunk("avih", Array.fill[Byte](56)(0))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++ Array.fill[Byte](48)(0))
    val strf = chunk("strf", bitmapInfoHeader(16, 16, 24, 0x47504A4D))
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", goodFrame, evil)
    val inner = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(inner.length) ++ inner
    assert(Avi.frames(avi).length == 1)
  }

  test("framesAt decodes exactly the picked container frames; out-of-range picks are ignored") {
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff)
    val avi = buildAvi(colors.map(c => jpegBytes(solidImage(16, 16, c))), 16, 16)
    val got = Avi.framesAt(avi, n => Seq(2, 0, n + 5, -1))
    assert(got.map(_._1) == Seq(0, 2))
    def dominant(img: java.awt.image.BufferedImage) = {
      val rgb = img.getRGB(8, 8)
      Seq(("r", (rgb >> 16) & 0xff), ("g", (rgb >> 8) & 0xff), ("b", rgb & 0xff)).maxBy(_._2)._1
    }
    assert(dominant(got(0)._2) == "r")
    assert(dominant(got(1)._2) == "b")
    // decodeFirstFrame sees the same frame 0 without touching the rest
    val first = Multimodal.decodeFirstFrame(avi)
    assert(first.isDefined && dominant(first.get) == "r")
  }

  test("sampleFrameFeatures strides real AVI frames through the batched Spark path") {
    val frames = (0 until 5).map(i => jpegBytes(solidImage(16, 16, i * 0x303030)))
    val avi = buildAvi(frames, 16, 16)
    val rows = Seq(
      Multimodal.MediaRow(7L, "video", avi, Map.empty),
      Multimodal.MediaRow(8L, "video", Array[Byte](9, 9, 9), Map.empty)) // undecodable: no rows
    val ds = spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
    val got = Multimodal.sampleFrameFeatures(ds, everyN = 2, dim = 16).collect()
      .sortBy(_.frame_idx)
    assert(got.map(_.media_id).toSeq == Seq(7L, 7L, 7L))
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2, 4))
    // darker early frame embeds darker than the last sampled frame
    assert(got.head.features.sum < got.last.features.sum)
  }
}
