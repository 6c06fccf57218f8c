package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) plumbing for a training-data
  * pipeline — north-star extension. Media travel as opaque `binary`
  * columns with typed metadata; decode/feature-extraction runs
  * per-partition in batches so a real decoder (JNI codec, ONNX
  * runtime) amortizes model/codec init across a partition instead of
  * paying it per row — the JVM analogue of a Pandas-UDF batch.
  *
  * Image decode is REAL ([[Multimodal.ImageIoDecoder]], JDK
  * `javax.imageio`: PNG/JPEG/GIF/BMP -> grid-pooled luminance
  * features), audio decode is REAL ([[Multimodal.AudioDecoder]],
  * WAV/AIFF linear PCM), and video decode is REAL for the one
  * multi-frame container the JDK ships a codec for — animated GIF
  * ([[Multimodal.VideoDecoder]], per-frame pixels pooled over
  * temporal slices) — animated GIF plus AVI holding Motion-JPEG or
  * raw DIB frames ([[Avi]]). Codecs the JDK lacks (MP4/WebM,
  * compressed audio) fall back to [[FakeDecoder]] (deterministic
  * features from the bytes) — an honest stub behind the same
  * `Decoder` seam. (Re-checked through round 19: an H.264 decoder in
  * pure JVM exists in the ecosystem but this build's dependency set
  * is fixed to the Spark runtime + test libs, and writing one from
  * scratch is out of scope — the `Decoder` seam is where one plugs
  * in.) The
  * Spark-side contract — schema, batch iteration, partition sizing,
  * output shape — is real and tested for all kinds.
  */
object Multimodal {

  /** ImageIO's default stream cache is a TEMP FILE per encode/decode
    * (`ImageIO.setUseCache(true)` is the JDK default): every payload
    * pays a file create+write+delete, and 32 concurrent decode tasks
    * serialize on the filesystem (measured r19: q90's decode stage at
    * ~13 ms/image of executor time, thread dumps parked in
    * UnixFileSystem.delete0). All payloads here are in-memory byte
    * arrays — heap-buffered streams are strictly better. JVM-global,
    * idempotent; called lazily from every decode/encode entry point so
    * executor JVMs get it too.
    */
  private lazy val imageIoHeapStreams: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Canonical media-table schema: id, kind (image|audio|video), raw
    * bytes, width/height/duration metadata as a map.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte], meta: Map[String, String])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int, features: Array[Float])

  /** Pluggable decoder: bytes -> fixed-dim feature vector. A real
    * implementation would decode + resize + embed; init happens once
    * per partition via `open()`.
    */
  trait Decoder extends Serializable {
    def open(): Unit = ()
    def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
    def close(): Unit = ()
  }

  /** STUB decoder — deterministic fake features from a rolling hash of
    * the payload (`???`-equivalent stand-in; see class doc). Keeps
    * every downstream op (partitioning, joins, ANN) testable.
    */
  object FakeDecoder extends Decoder {
    def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      var h = 0xcbf29ce484222325L ^ kind.hashCode.toLong
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(d) = ((h >>> 40).toInt.toFloat / (1 << 23).toFloat) - 1.0f
        d += 1
      }
      out
    }
  }

  /** Grid-pooled mean luminance of one decoded image into `cells`
    * values scaled to [-1, 1] — the shared resize-and-embed stand-in
    * whose output is a genuine function of the pixels (images pool the
    * whole frame; video pools each sampled frame).
    */
  private[multimodal] def gridPool(img: java.awt.image.BufferedImage, cells: Int): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val gw = math.max(1, math.ceil(math.sqrt(cells.toDouble)).toInt)
    val gh = math.max(1, math.ceil(cells.toDouble / gw).toInt)
    val out = new Array[Float](cells)
    var d = 0
    while (d < cells) {
      val cx = d % gw
      val cy = d / gw
      val x0 = w * cx / gw
      val x1 = math.max(x0 + 1, w * (cx + 1) / gw)
      val y0 = h * cy / gh
      val y1 = math.max(y0 + 1, h * (cy + 1) / gh)
      var sum = 0.0
      var n = 0
      var y = y0
      while (y < math.min(y1, h)) {
        var x = x0
        while (x < math.min(x1, w)) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sum += (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
          n += 1
          x += 1
        }
        y += 1
      }
      out(d) = if (n == 0) 0.0f else (2.0 * sum / n - 1.0).toFloat
      d += 1
    }
    out
  }

  /** All frames the JDK can decode from an encoded payload — one for
    * still formats, EVERY frame for a multi-frame container: animated
    * GIF via the JDK's GIF `ImageReader` (frames are the reader's raw
    * per-frame images, not composited against prior frames) and AVI
    * via the pure-JVM RIFF walk in [[Avi]] (Motion-JPEG and raw
    * BI_RGB DIB frames). Empty on undecodable input. Callers that use
    * a SUBSET of the frames must go through [[decodeFramesAt]] — this
    * form materializes every frame's pixels at once.
    */
  private[graft] def decodeFrames(bytes: Array[Byte]): IndexedSeq[java.awt.image.BufferedImage] =
    decodeFramesAt(bytes, n => 0 until n).map(_._2)

  /** SELECTED frames of an encoded payload: `pick(frameCount)` names
    * the container frame indices to decode; the result pairs each
    * picked index with its decoded frame (undecodable picks are
    * skipped). Only the PICKED frames' pixels are ever decoded or held
    * — frame counting reads container/stream headers — so hashing the
    * first frame of a 1000-frame clip, or sampling every Nth, costs
    * the frames used rather than the whole tape (the per-row analogue
    * of column pruning).
    */
  private[graft] def decodeFramesAt(
      bytes: Array[Byte],
      pick: Int => Seq[Int]): IndexedSeq[(Int, java.awt.image.BufferedImage)] =
    if (Avi.isAvi(bytes)) Avi.framesAt(bytes, pick)
    else try {
      imageIoHeapStreams
      val iis = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(bytes))
      if (iis == null) return IndexedSeq.empty
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) IndexedSeq.empty
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val n = reader.getNumImages(true) // header scan, no pixel decode
            pick(n).distinct.sorted.filter(i => i >= 0 && i < n).flatMap { i =>
              try Option(reader.read(i)).map(i -> _)
              catch { case scala.util.control.NonFatal(_) => None }
            }.toIndexedSeq
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => IndexedSeq.empty }

  /** The first decodable frame — the one-frame fast path every
    * still-image hash wants: on the common path no other frame's
    * pixels are decoded. Only when frame 0 itself fails to decode does
    * it fall back to scanning the remaining frames, preserving the
    * "first DECODABLE frame" contract on partially-corrupt media.
    */
  private[graft] def decodeFirstFrame(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    decodeFramesAt(bytes, _ => Seq(0)).headOption.map(_._2)
      .orElse(decodeFramesAt(bytes, n => 1 until n).headOption.map(_._2))

  /** REAL image decoder over `javax.imageio` (JDK-native — PNG, JPEG,
    * GIF, BMP): decode to a BufferedImage, grid-pool mean luminance
    * into `dim` cells ([[gridPool]]). Non-image kinds and undecodable
    * payloads fall back to the supplied decoder.
    */
  final class ImageIoDecoder(fallback: Decoder = FakeDecoder) extends Decoder {
    def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      if (kind != "image" || bytes.isEmpty) return fallback.decode(kind, bytes, dim)
      imageIoHeapStreams
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0)
        return fallback.decode(kind, bytes, dim)
      gridPool(img, dim)
    }
  }

  /** REAL video decoder for the multi-frame containers this build can
    * open without native codecs — animated GIF via `javax.imageio`'s
    * GIF reader, AVI/MJPEG and AVI/DIB via the [[Avi]] RIFF walk.
    * Features are (temporal slice) x (spatial cell): `dim` is
    * split across up to `dim / 16` temporal slices (at least one, at
    * most one per frame), each slice represented by its middle frame
    * grid-pooled spatially — frame ORDER is preserved in the layout,
    * so a reversed clip embeds differently. Single-frame payloads
    * degrade to plain spatial pooling; payloads no JDK reader decodes
    * (MP4/WebM/...) fall back to the supplied decoder — that residue
    * is the honest stub boundary.
    */
  final class VideoDecoder(fallback: Decoder = FakeDecoder) extends Decoder {
    // the middle frame of temporal slice t when n frames split into gt
    // slices — shared by the pick (which frames to decode) and the
    // layout loop so they can never disagree
    private def middle(n: Int, gt: Int, t: Int): Int = {
      val f0 = n * t / gt
      val f1 = math.max(f0 + 1, n * (t + 1) / gt)
      (f0 + f1 - 1) / 2
    }
    private def slices(n: Int, dim: Int): Int =
      math.max(1, math.min(n, math.max(1, dim / 16)))
    def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      if (kind != "video" || bytes.isEmpty) return fallback.decode(kind, bytes, dim)
      // decode ONLY each slice's middle frame (<= dim/16 of them): a
      // 500-frame clip pays for the handful of frames the embedding
      // actually pools, not the whole tape
      var n = 0
      val picked = decodeFramesAt(bytes, { c =>
        n = c
        (0 until slices(c, dim)).map(t => middle(c, slices(c, dim), t))
      }).toMap
      if (picked.isEmpty) return fallback.decode(kind, bytes, dim)
      // layout over the CONTAINER frame count: an undecodable middle
      // frame contributes zeroed cells rather than shifting its
      // neighbors' slices
      val gt = slices(n, dim)
      val out = new Array[Float](dim)
      var offset = 0
      var t = 0
      while (t < gt) {
        val cells = dim * (t + 1) / gt - dim * t / gt
        picked.get(middle(n, gt, t)).foreach { f =>
          System.arraycopy(gridPool(f, cells), 0, out, offset, cells)
        }
        offset += cells
        t += 1
      }
      out
    }
  }


  /** REAL audio decoder over `javax.sound.sampled` (JDK-native — WAV/
    * AIFF/AU containers, PCM 8/16-bit): decode frames, mono-mix, pool
    * per-window RMS amplitude into `dim` cells scaled to [-1, 1] (an
    * energy-envelope embedding that is a genuine function of the
    * samples). Non-PCM payloads and other kinds fall back.
    */
  final class AudioDecoder(fallback: Decoder = FakeDecoder) extends Decoder {
    def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
      if (kind != "audio" || bytes.isEmpty) return fallback.decode(kind, bytes, dim)
      val samples = decodeAudioSamples(bytes)
      if (samples == null || samples.isEmpty) return fallback.decode(kind, bytes, dim)
      val out = new Array[Float](dim)
      var d = 0
      while (d < dim) {
        val s0 = samples.length.toLong * d / dim
        val s1 = math.max(s0 + 1, samples.length.toLong * (d + 1) / dim)
        var sum = 0.0
        var i = s0
        while (i < math.min(s1, samples.length)) { sum += samples(i.toInt) * samples(i.toInt); i += 1 }
        val rms = math.sqrt(sum / (s1 - s0))
        out(d) = (2.0 * rms - 1.0).toFloat
        d += 1
      }
      out
    }

  }

  /** Decoded mono PCM samples of an encoded audio payload (WAV/AIFF),
    * or null when no JDK reader decodes it — the audio-side analogue
    * of [[decodeFrames]], shared by [[AudioDecoder]] and the
    * perceptual [[AudioFingerprint]].
    */
  private[multimodal] def decodeAudioSamples(bytes: Array[Byte]): Array[Double] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try pcmSamples(ais) finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Mono-mixed samples in [-1, 1] from an 8/16-bit linear-PCM
    * stream. Encoding is checked, not just the bit width: ULAW/ALAW
    * report 8 sample bits but are companded, and 8-bit PCM comes in
    * both signed (AIFF) and unsigned (WAV) flavors — anything
    * outside plain linear PCM returns null.
    */
  private def pcmSamples(ais: javax.sound.sampled.AudioInputStream): Array[Double] = {
      import javax.sound.sampled.AudioFormat.Encoding
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val channels = fmt.getChannels
      val enc = fmt.getEncoding
      val signed = enc == Encoding.PCM_SIGNED
      if (enc != Encoding.PCM_SIGNED && enc != Encoding.PCM_UNSIGNED) return null
      if (bits != 8 && bits != 16) return null
      if (bits == 16 && !signed) return null // unsigned 16-bit PCM is nonstandard
      val raw = ais.readAllBytes()
      val bytesPerSample = bits / 8
      val frameBytes = bytesPerSample * channels
      val frames = raw.length / frameBytes
      if (frames == 0) return null
      val out = new Array[Double](frames)
      var f = 0
      while (f < frames) {
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val off = f * frameBytes + c * bytesPerSample
          val v =
            if (bits == 8 && signed) raw(off) / 128.0
            else if (bits == 8) ((raw(off) & 0xff) - 128) / 128.0
            else {
              val lo = if (fmt.isBigEndian) raw(off + 1) else raw(off)
              val hi = if (fmt.isBigEndian) raw(off) else raw(off + 1)
              ((hi << 8) | (lo & 0xff)) / 32768.0
            }
          acc += v
          c += 1
        }
        out(f) = acc / channels
        f += 1
      }
      out
    }

  /** JDK-native decoder for everything the JDK can decode: images via
    * [[ImageIoDecoder]], audio via [[AudioDecoder]], video via
    * [[VideoDecoder]] (animated GIF — real decoded frames); only
    * codecs the JDK lacks (MP4/WebM audio-video, compressed audio)
    * fall back to the deterministic stub.
    */
  final class JdkMediaDecoder(fallback: Decoder = FakeDecoder) extends Decoder {
    private val images = new ImageIoDecoder(fallback)
    private val audio = new AudioDecoder(fallback)
    private val video = new VideoDecoder(fallback)
    def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = kind match {
      case "image" => images.decode(kind, bytes, dim)
      case "audio" => audio.decode(kind, bytes, dim)
      case "video" => video.decode(kind, bytes, dim)
      case _ => fallback.decode(kind, bytes, dim)
    }
  }

  /** Batched per-partition feature extraction. `mapPartitions` (not
    * per-row UDF) so `decoder.open()` runs once per partition; at
    * scale, media tables are repartitioned by size so each task holds
    * roughly `targetPartitionBytes` of payload.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      dim: Int = 64,
      decoder: Decoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      decoder.open()
      val out = rows.map { r =>
        val bytes = if (r.bytes == null) Array.emptyByteArray else r.bytes
        MediaFeatures(r.media_id, r.kind, bytes.length, decoder.decode(r.kind, bytes, dim))
      }
      out // close() omitted: iterator is lazy; a real impl hooks TaskContext.addTaskCompletionListener
    }
  }

  /** Frame-sampling plumbing for video rows: emit (media_id, frame_idx)
    * every `everyN` frames based on metadata frame counts — a pure
    * column-level explode that never touches payload bytes (the scale
    * path when frame counts are catalogued); [[sampleFrameFeatures]]
    * is the decoded counterpart.
    */
  def sampleFrames(media: DataFrame, everyN: Int): DataFrame = {
    require(everyN >= 1, s"everyN=$everyN must be >= 1")
    val frames = coalesce(element_at(col("meta"), "n_frames").cast("int"), lit(0))
    media
      .filter(col("kind") === "video" && frames > 0)
      .select(
        col("media_id"),
        explode(sequence(lit(0), frames - 1, lit(everyN))).as("frame_idx"))
  }

  final case class FrameFeatures(media_id: Long, frame_idx: Int, features: Array[Float])

  /** REAL frame sampling: decode each video payload's frames
    * ([[decodeFrames]] — animated GIF in this container-free build)
    * and emit every `everyN`-th ACTUAL frame with its grid-pooled
    * pixel features. Per-partition batching like [[extractFeatures]];
    * rows whose payload no JDK reader decodes produce no frames
    * (callers route those through the stubbed [[Decoder]] path).
    */
  def sampleFrameFeatures(
      media: Dataset[MediaRow],
      everyN: Int,
      dim: Int = 64): Dataset[FrameFeatures] = {
    import media.sparkSession.implicits._
    require(everyN >= 1, s"everyN=$everyN must be >= 1")
    media.mapPartitions { rows =>
      rows.filter(r => r.kind == "video" && r.bytes != null && r.bytes.nonEmpty).flatMap { r =>
        // decode only the sampled frames (decodeFramesAt) — everyN=10
        // must not pay for the 9 frames per stride it skips
        decodeFramesAt(r.bytes, n => 0 until n by everyN).map {
          case (i, f) => FrameFeatures(r.media_id, i, gridPool(f, dim))
        }
      }
    }
  }

  /** Spread a small (id, text) projection across the cluster's cores
    * before the CPU-heavy encode `mapPartitions` below. The synthetic
    * generators' input is typically ONE parquet split (a few MB of
    * text), so without this every downstream PNG/WAV/AVI encode AND
    * the first decode pass run inside a single task — measured r19:
    * q90's decode stage was 1 task x 2-4 s wall on local[32] (guide
    * §2.5, input parallelism). Scale-adaptive: identity when the input
    * already carries >= cores partitions (no extra exchange at real
    * scale), and what shuffles is the raw text, never encoded media.
    */
  private def spread(ds: Dataset[(Long, String)]): Dataset[(Long, String)] =
    graft.core.Parallelism.spreadIfNarrow(ds)

  /** Build a synthetic media table of REAL encoded PNGs from any
    * (id, text) frame — test scaffolding one notch more honest than
    * [[syntheticMedia]]: the payload actually decodes, and the pixels
    * are a pure function of the text (gray value = text byte at the
    * pixel's scan position), so duplicate texts yield bit-identical
    * images and near-duplicate texts yield images differing in a few
    * pixels — exactly the fixture a perceptual-hash dedup needs.
    * PNG encode runs per-partition (one `ImageIO` call per row, no
    * driver loop).
    */
  def syntheticImages(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 32,
      h: Int = 32): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    spread(df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .as[(Long, String)])
      .mapPartitions { rows =>
        imageIoHeapStreams
        rows.map { case (id, text) =>
          val bytes =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = if (bytes.isEmpty) 0 else bytes((y * w + x) % bytes.length) & 0xff
              img.setRGB(x, y, (v << 16) | (v << 8) | v)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          MediaRow(id, "image", out.toByteArray,
            Map("width" -> w.toString, "height" -> h.toString))
        }
      }
  }

  /** Build a synthetic media table of REAL encoded WAVs from any
    * (id, text) frame — the audio analogue of [[syntheticImages]]:
    * 16-bit mono linear PCM at 8 kHz whose samples are a pure
    * function of the text (each text byte drives a short constant-
    * amplitude segment), so duplicate texts yield bit-identical
    * recordings and near-duplicate texts differ in a few envelope
    * windows — the fixture an audio-fingerprint dedup needs.
    */
  def syntheticWavs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      samplesPerByte: Int = 16): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    spread(df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .as[(Long, String)])
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val n = math.max(1, bytes.length) * samplesPerByte
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val b = if (bytes.isEmpty) 0 else bytes(i / samplesPerByte) & 0xff
            // amplitude from the byte, alternating sign so each
            // segment has genuine AC energy rather than DC offset
            val v = (if (i % 2 == 0) 1 else -1) * (b * 96) // ≤ 24480 < 32767
            pcm(2 * i) = (v & 0xff).toByte
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(
            ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          MediaRow(id, "audio", out.toByteArray, Map("sample_rate" -> "8000"))
        }
      }
  }

  /** Build a synthetic media table of REAL multi-frame AVIs from any
    * (id, text) frame — the video analogue of [[syntheticImages]]:
    * `nFrames` uncompressed DIB frames ([[Avi.buildDib]], pixel-exact
    * round trip) whose pixels are a pure function of the text with a
    * per-frame scan offset, so duplicate texts yield bit-identical
    * videos and near-duplicate texts yield videos whose frames differ
    * in a few pixels each.
    */
  def syntheticVideos(
      df: DataFrame,
      idCol: String,
      textCol: String,
      w: Int = 16,
      h: Int = 16,
      nFrames: Int = 4): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    spread(df.select(col(idCol).cast("long").as("media_id"), col(textCol).as("text"))
      .as[(Long, String)])
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val bytes =
            if (text == null) Array.emptyByteArray
            else text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val frames = (0 until nFrames).map { f =>
            val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val pos = f * w * h + y * w + x
                val v = if (bytes.isEmpty) 0 else bytes(pos % bytes.length) & 0xff
                img.setRGB(x, y, (v << 16) | (v << 8) | v)
                x += 1
              }
              y += 1
            }
            img
          }
          MediaRow(id, "video", Avi.buildDib(frames),
            Map("n_frames" -> nFrames.toString, "width" -> w.toString, "height" -> h.toString))
        }
      }
  }

  /** Build a synthetic media table from any (id, text) frame — test
    * scaffolding: text bytes stand in for an encoded payload.
    */
  def syntheticMedia(spark: SparkSession, df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("media_id"),
      // pmod, not %: Spark's % keeps the dividend's sign, so a negative
      // id would index 0 (runtime error) or wrap from the array's end
      element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(textCol).cast("binary").as("bytes"),
      map(
        lit("n_frames"), (col(idCol) % 30 + 1).cast("string"),
        lit("width"), lit("640"),
        lit("height"), lit("480")).as("meta"))
      .as[MediaRow]
  }
}
