package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerceptualHashSpec extends SparkSpec {

  private def png(fill: (Int, Int) => Int, w: Int = 32, h: Int = 32): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = fill(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def media(rows: (Long, Array[Byte])*) = {
    import sqlImplicits._
    rows.map { case (id, b) => Multimodal.MediaRow(id, "image", b, Map.empty[String, String]) }
      .toDS()
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("identical pixels hash identically; re-encode of the same pixels too") {
    val fill = (x: Int, y: Int) => (x * 7 + y * 13) % 256
    val ds = media((1L, png(fill)), (2L, png(fill)))
    val rows = PerceptualHash.perceptualHashes(ds).collect().sortBy(_.media_id)
    assert(rows.length == 2)
    assert(rows(0).ahash == rows(1).ahash && rows(0).dhash == rows(1).dhash)
  }

  test("a light retouch stays Hamming-near; a different image is Hamming-far") {
    val fill = (x: Int, y: Int) => (x * 7 + y * 13) % 256
    val retouch = (x: Int, y: Int) => if (x < 2 && y < 2) 255 else fill(x, y)
    val other = (x: Int, y: Int) => ((x / 8) * 97 + (y / 8) * 31) % 256
    val rows = PerceptualHash
      .perceptualHashes(media((1L, png(fill)), (2L, png(retouch)), (3L, png(other))))
      .collect().sortBy(_.media_id)
    assert(hamming(rows(0).ahash, rows(1).ahash) <= 3,
      s"retouch drifted ${hamming(rows(0).ahash, rows(1).ahash)} aHash bits")
    assert(hamming(rows(0).ahash, rows(2).ahash) > 10,
      s"unrelated images only ${hamming(rows(0).ahash, rows(2).ahash)} aHash bits apart")
    assert(hamming(rows(0).dhash, rows(2).dhash) > 10)
  }

  test("dHash ignores a global brightness shift that moves every aHash-free gradient") {
    val fill = (x: Int, y: Int) => 40 + (x * 5) % 160
    val brighter = (x: Int, y: Int) => math.min(255, fill(x, y) + 40)
    val rows = PerceptualHash
      .perceptualHashes(media((1L, png(fill)), (2L, png(brighter))))
      .collect().sortBy(_.media_id)
    assert(rows(0).dhash == rows(1).dhash, "uniform brightness shift must not change gradient signs")
  }

  test("undecodable and empty payloads yield no hash row") {
    val ds = media((1L, Array[Byte](1, 2, 3)), (2L, Array.emptyByteArray)).union {
      import sqlImplicits._
      Seq(Multimodal.MediaRow(3L, "image", null, Map.empty[String, String])).toDS()
    }
    assert(PerceptualHash.perceptualHashes(ds).count() == 0)
  }

  test("phashDupPairs equals brute-force Hamming over the recomputed hashes") {
    val fills: Seq[(Long, (Int, Int) => Int)] = (0 until 12).map { i =>
      (i.toLong, (x: Int, y: Int) => ((x * (3 + i % 4) + y * (5 + i / 4)) * 17) % 256)
    } ++ Seq(
      (100L, (x: Int, y: Int) => (x * 3 + y * 5) % 256),
      (101L, (x: Int, y: Int) => (x * 3 + y * 5) % 256)) // planted exact dup
    val ds = media(fills.map { case (id, f) => (id, png(f)) }: _*)
    val hashed = PerceptualHash.perceptualHashes(ds).collect()
    val brute = (for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && hamming(a.ahash, b.ahash) <= 3
    } yield (a.media_id, b.media_id, hamming(a.ahash, b.ahash))).toSet
    val joined = PerceptualHash.phashDupPairs(ds, maxHamming = 3, which = "ahash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").intValue)).toSet
    assert(brute.contains((100L, 101L, 0)), "fixture drifted: planted dup not Hamming-0")
    assert(joined == brute, s"banded join diverged\nbrute=$brute\njoined=$joined")
  }

  test("hammingPairs is exact below the band count and validates band geometry") {
    import sqlImplicits._
    // signatures two bit-flips apart must pair at bands=4 (pigeonhole)
    val sigs = Seq((1L, 0x0123456789abcdefL), (2L, 0x0123456789abcdefL ^ 0x3L),
      (3L, 0xfedcba9876543210L)).toDF("id", "sig")
    val got = graft.dedup.Dedup.hammingPairs(sigs, "id", "sig", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").intValue)).toSet
    assert(got == Set((1L, 2L, 2)))
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.hammingPairs(sigs, "id", "sig", maxHamming = 3, bands = 5)
    }
  }
}
