package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image hashing for multimodal dedup — the image-side
  * counterpart of text SimHash ([[graft.dedup.SimHash64]]): re-encoded,
  * resized, or lightly retouched copies of one image land within a
  * small Hamming distance of each other, so near-duplicate mining is
  * a banded Hamming self-join over 64-bit fingerprints
  * ([[graft.dedup.Dedup.hammingPairs]]) — never a pixel-level
  * all-pairs pass.
  *
  * Two classic public-literature hashes over the decoded first frame
  * (PNG/JPEG/BMP/GIF stills, animated GIF and MJPEG/DIB AVI via
  * [[Multimodal.decodeFrames]]):
  *
  *  - aHash: pool to an 8×8 luminance grid; bit i = cell i brighter
  *    than the grid mean. Robust to re-encoding and scaling.
  *  - dHash: pool to a 9×8 grid; bit (r,c) = cell (r,c+1) brighter
  *    than cell (r,c) — horizontal gradient signs, more tolerant of
  *    global brightness shifts than aHash.
  *
  * Decode + hash runs `mapPartitions`-batched like
  * [[Multimodal.extractFeatures]] (codec init amortized per
  * partition, payload bytes never shuffle — only 8-byte hashes do).
  * Undecodable payloads yield no row: a payload no reader can decode
  * has no pixels to be a near-duplicate OF; callers wanting byte-level
  * exact dedup on those route them through the exact-hash pass.
  */
object PerceptualHash {

  final case class PHashRow(media_id: Long, ahash: Long, dhash: Long)

  /** `(media_id, ahash, dhash)` for every decodable payload. */
  def perceptualHashes(media: Dataset[Multimodal.MediaRow]): Dataset[PHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.bytes == null || r.bytes.isEmpty) Iterator.empty
        else {
          val frames = Multimodal.decodeFrames(r.bytes)
          if (frames.isEmpty) Iterator.empty
          else Iterator.single(PHashRow(r.media_id, aHash64(frames.head), dHash64(frames.head)))
        }
      }
    }
  }

  /** Near-duplicate pairs by perceptual hash: `(id_a, id_b, hamming)`
    * with `id_a < id_b`, Hamming distance over `which` ("ahash" |
    * "dhash") at most `maxHamming`. With the default 4-way banding the
    * result is EXACT for `maxHamming <= 3` (pigeonhole — see
    * [[graft.dedup.Dedup.hammingPairs]]).
    */
  def phashDupPairs(
      media: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3,
      which: String = "ahash"): DataFrame = {
    require(which == "ahash" || which == "dhash", s"which=$which must be ahash|dhash")
    val hashed = perceptualHashes(media).toDF()
      .select(col("media_id").as("id"), col(which).as("sig"))
    graft.dedup.Dedup.hammingPairs(hashed, "id", "sig", maxHamming)
  }

  /** 8×8 average hash of one decoded frame. */
  private[multimodal] def aHash64(img: java.awt.image.BufferedImage): Long = {
    val cells = Multimodal.gridPool(img, 64)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += cells(i); i += 1 }
    mean /= 64.0
    var out = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) out |= (1L << i)
      i += 1
    }
    out
  }

  /** 9×8 horizontal-gradient hash of one decoded frame. gridPool lays
    * cells out row-major at width ceil(sqrt(72)) = 9, so cell (r,c)
    * is index r*9+c and the 8 gradients per row compare adjacent
    * indices.
    */
  private[multimodal] def dHash64(img: java.awt.image.BufferedImage): Long = {
    val cells = Multimodal.gridPool(img, 72)
    var out = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (cells(r * 9 + c + 1) > cells(r * 9 + c)) out |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    out
  }
}
