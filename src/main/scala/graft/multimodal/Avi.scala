package graft.multimodal

import java.awt.image.BufferedImage
import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM AVI (RIFF) container reader for the two frame encodings a
  * JDK can decode without native codecs: Motion-JPEG (`00dc` chunks
  * holding JPEG payloads — the classic interchange format for
  * clip-level training data) and uncompressed BI_RGB DIB frames
  * (`00db`/`00dc` with `biCompression = 0`, rebuilt into a BMP the
  * `javax.imageio` BMP reader understands). Anything else (MPEG-4,
  * VP9, ...) yields no frames and the caller's honest-stub fallback
  * applies — same boundary contract as the rest of [[Multimodal]].
  *
  * Container walk per the public AVI RIFF spec: `RIFF('AVI ' ...)`
  * holding `LIST('hdrl')` (stream headers — `strh`/`strf` pairs, the
  * video stream's `strf` being a BITMAPINFOHEADER) and `LIST('movi')`
  * (frame chunks `NNdc`/`NNdb` for stream NN, possibly nested inside
  * `LIST('rec ')`). All sizes little-endian, chunks padded to even
  * offsets. The parser is defensive: any structural violation ends
  * the walk with whatever frames were already recovered.
  */
object Avi {

  /** The video stream's decode-relevant header state: its stream index
    * (frame chunks are tagged `%02d` + dc/db) and the
    * BITMAPINFOHEADER fields needed to rebuild a BMP for raw frames.
    * (The strh fourcc is deliberately NOT kept: [[decodeFrame]] picks
    * the format from payload magic bytes + `biCompression`, the only
    * signals hostile or sloppy encoders can't lie about usefully.)
    */
  private final case class VideoStream(
      index: Int,
      infoHeader: Array[Byte])

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      fourcc(bytes, 0) == "RIFF" && fourcc(bytes, 8) == "AVI "

  /** Minimal writer — a well-formed single-video-stream AVI holding
    * the given images as uncompressed bottom-up BI_RGB `00db` frames,
    * the layout [[frames]] decodes PIXEL-EXACT (no JPEG loss), so a
    * fixture built here round-trips deterministically. Fixture/test
    * scaffolding, not a production encoder: no index chunk, zeroed
    * rate fields — exactly the subset the reader contract needs.
    */
  def buildDib(imgs: Seq[BufferedImage]): Array[Byte] = {
    require(imgs.nonEmpty, "buildDib needs at least one frame")
    val w = imgs.head.getWidth
    val h = imgs.head.getHeight
    require(imgs.forall(i => i.getWidth == w && i.getHeight == h),
      "all frames must share one geometry")
    def le32(v: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++ pad
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
      val inner = listType.getBytes("US-ASCII") ++ bodies.flatten
      "LIST".getBytes("US-ASCII") ++ le32(inner.length) ++ inner
    }
    val stride = (w * 3 + 3) / 4 * 4
    def dib(img: BufferedImage): Array[Byte] = {
      val out = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val off = (h - 1 - y) * stride + x * 3 // bottom-up rows
          out(off) = (rgb & 0xff).toByte
          out(off + 1) = ((rgb >> 8) & 0xff).toByte
          out(off + 2) = ((rgb >> 16) & 0xff).toByte
          x += 1
        }
        y += 1
      }
      out
    }
    val bih = {
      val bb = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h)
      bb.putShort(1).putShort(24)
      bb.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // BI_RGB
      bb.array()
    }
    val avih = chunk("avih", Array.fill[Byte](56)(0))
    val strh = chunk("strh",
      "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++ Array.fill[Byte](48)(0))
    val strf = chunk("strf", bih)
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", imgs.map(i => chunk("00db", dib(i))): _*)
    val inner = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(inner.length) ++ inner
  }

  /** All decodable frames in container order; empty if `bytes` is not
    * an AVI or holds no decodable video frames.
    */
  def frames(bytes: Array[Byte]): IndexedSeq[BufferedImage] =
    framesAt(bytes, n => 0 until n).map(_._2)

  /** SELECTED decodable frames: `pick(frameCount)` names the container
    * frame indices to decode (out-of-range entries ignored), and the
    * result is `(container index, frame)` for each picked payload that
    * decodes. The container walk touches only chunk HEADERS — payload
    * bytes are copied and decoded solely for picked frames — so
    * first-frame hashing or sparse sampling of a long clip pays for
    * the frames it uses, not the whole tape.
    */
  def framesAt(bytes: Array[Byte], pick: Int => Seq[Int]): IndexedSeq[(Int, BufferedImage)] = {
    if (!isAvi(bytes)) return IndexedSeq.empty
    try {
      var video: Option[VideoStream] = None
      var streamCount = 0
      // (body offset, size) of each video frame chunk — headers only,
      // no payload copies during the walk
      val ranges = IndexedSeq.newBuilder[(Int, Int)]

      def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
        var off = start
        while (off + 8 <= end) {
          val id = fourcc(bytes, off)
          val size = u32(bytes, off + 4)
          val body = off + 8
          // `size > end - body`, NOT `body + size > end`: a crafted
          // size near Int.MaxValue would overflow the addition, slip
          // past the guard and throw below — discarding the frames
          // already recovered instead of stopping with them
          if (size < 0 || size > end - body) return // truncated: stop
          if (id == "LIST" && size >= 4) {
            val listType = fourcc(bytes, body)
            walk(body + 4, body + size, inMovi || listType == "movi" || listType == "rec ")
          } else if (!inMovi && id == "strh" && size >= 8) {
            // one strh per stream, in stream order; remember which
            // stream is the (first) video stream
            if (fourcc(bytes, body) == "vids" && video.isEmpty)
              video = Some(VideoStream(streamCount, Array.emptyByteArray))
            streamCount += 1
          } else if (!inMovi && id == "strf" && size >= 40) {
            // the strf immediately follows its stream's strh; attach
            // the BITMAPINFOHEADER to the just-seen video stream
            video = video.map { v =>
              if (v.infoHeader.isEmpty && v.index == streamCount - 1)
                v.copy(infoHeader = java.util.Arrays.copyOfRange(bytes, body, body + size))
              else v
            }
          } else if (inMovi && id.length == 4 &&
              id(0).isDigit && id(1).isDigit && (id.endsWith("dc") || id.endsWith("db"))) {
            val streamNo = (id(0) - '0') * 10 + (id(1) - '0')
            if (video.exists(_.index == streamNo) && size > 0)
              ranges += ((body, size))
          }
          off = body + size + (size & 1) // chunks are word-aligned
        }
      }

      walk(12, bytes.length, inMovi = false)
      val v = video.getOrElse(return IndexedSeq.empty)
      val rs = ranges.result()
      pick(rs.length).distinct.sorted
        .filter(i => i >= 0 && i < rs.length)
        .flatMap { i =>
          val (body, size) = rs(i)
          decodeFrame(v, java.util.Arrays.copyOfRange(bytes, body, body + size)).map(i -> _)
        }.toIndexedSeq
    } catch { case scala.util.control.NonFatal(_) => IndexedSeq.empty }
  }

  /** One frame payload -> image: JPEG/PNG payloads go straight to
    * `ImageIO` (covers MJPG and the odd PNG-in-AVI); BI_RGB raw DIB
    * payloads are wrapped in a 14-byte BITMAPFILEHEADER plus the
    * stream's BITMAPINFOHEADER so the JDK's BMP reader decodes them.
    */
  private def decodeFrame(v: VideoStream, payload: Array[Byte]): Option[BufferedImage] = {
    val jpeg = payload.length >= 2 && (payload(0) & 0xff) == 0xff && (payload(1) & 0xff) == 0xd8
    val png = payload.length >= 8 && (payload(0) & 0xff) == 0x89 && payload(1) == 'P'
    val img =
      if (jpeg || png) readImage(payload)
      else if (v.infoHeader.length >= 40 && u32(v.infoHeader, 16) == 0) // biCompression == BI_RGB
        readImage(asBmp(v.infoHeader, payload))
      else None
    img
  }

  private def readImage(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** BITMAPFILEHEADER("BM", fileSize, 0, 0, pixelOffset) + info header
    * + pixels — a complete .bmp byte stream.
    */
  private def asBmp(infoHeader: Array[Byte], pixels: Array[Byte]): Array[Byte] = {
    val headerSize = 14 + infoHeader.length
    val bb = ByteBuffer.allocate(headerSize + pixels.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(headerSize + pixels.length)
    bb.putInt(0)
    bb.putInt(headerSize)
    bb.put(infoHeader)
    bb.put(pixels)
    bb.array()
  }

  private def fourcc(bytes: Array[Byte], off: Int): String =
    if (off + 4 > bytes.length) ""
    else new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def u32(bytes: Array[Byte], off: Int): Int =
    ByteBuffer.wrap(bytes, off, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
}
