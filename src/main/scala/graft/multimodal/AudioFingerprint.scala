package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}

/** Perceptual audio fingerprinting — the audio-side counterpart of
  * [[PerceptualHash]]: re-encoded or lightly edited copies of one
  * recording land within a small Hamming distance, so audio near-dup
  * mining is the same banded Hamming self-join
  * ([[graft.dedup.Dedup.hammingPairs]]) the image and SimHash paths
  * use — only 8-byte fingerprints ever shuffle.
  *
  * Two energy-envelope hashes over the decoded mono PCM
  * ([[Multimodal.decodeAudioSamples]] — WAV/AIFF linear PCM, the
  * codecs the JDK ships):
  *
  *  - eHash: 64 equal time windows; bit i = window i's RMS energy
  *    above the mean window energy. Gain-invariant (scaling every
  *    sample scales every window and the mean together).
  *  - dHash: 65 windows; bit i = window i+1 louder than window i —
  *    envelope gradient signs, additionally tolerant of slow level
  *    drift across the recording.
  *
  * This is the classic coarse energy-envelope family (the spectral
  * refinement — per-band energies under an FFT — shares the exact
  * same Spark plumbing; the envelope form keeps the kernel
  * dependency-free and deterministic). Decode + hash runs
  * `mapPartitions`-batched; undecodable payloads yield no row, same
  * contract as [[PerceptualHash.perceptualHashes]].
  */
object AudioFingerprint {

  final case class AudioHashRow(media_id: Long, ehash: Long, dhash: Long)

  /** `(media_id, ehash, dhash)` for every decodable audio payload. */
  def audioHashes(media: Dataset[Multimodal.MediaRow]): Dataset[AudioHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.bytes == null || r.bytes.isEmpty) Iterator.empty
        else {
          val samples = Multimodal.decodeAudioSamples(r.bytes)
          if (samples == null || samples.isEmpty) Iterator.empty
          else Iterator.single(AudioHashRow(r.media_id, eHash64(samples), dHash64(samples)))
        }
      }
    }
  }

  /** Near-duplicate audio pairs: `(id_a, id_b, hamming)` with
    * `id_a < id_b` over `which` ("ehash" | "dhash") at most
    * `maxHamming` apart — exact for `maxHamming < bands` (pigeonhole,
    * see [[graft.dedup.Dedup.hammingPairs]]).
    */
  def audioDupPairs(
      media: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3,
      which: String = "ehash"): DataFrame = {
    require(which == "ehash" || which == "dhash", s"which=$which must be ehash|dhash")
    val hashed = audioHashes(media).toDF()
      .select(org.apache.spark.sql.functions.col("media_id").as("id"),
        org.apache.spark.sql.functions.col(which).as("sig"))
    graft.dedup.Dedup.hammingPairs(hashed, "id", "sig", maxHamming)
  }

  /** Audio near-duplicate CLUSTERS: `(media_id, cluster)` for every
    * decodable payload — the linear-output production form of
    * [[audioDupPairs]] (see [[graft.dedup.Dedup.hammingClusters]]:
    * pair output is quadratic in duplicate-class size; the partition
    * is linear and is all dedup needs).
    */
  def audioDupClusters(
      media: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3,
      which: String = "ehash"): DataFrame = {
    require(which == "ehash" || which == "dhash", s"which=$which must be ehash|dhash")
    val hashed = audioHashes(media).toDF()
      .select(org.apache.spark.sql.functions.col("media_id").as("id"),
        org.apache.spark.sql.functions.col(which).as("sig"))
    graft.dedup.Dedup.hammingClusters(hashed, "id", "sig", maxHamming)
      .withColumnRenamed("id", "media_id")
  }

  /** Per-window RMS over `n` equal time slices; slices that round to
    * zero samples (inputs shorter than `n`) contribute 0 energy.
    */
  private def windowRms(samples: Array[Double], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    var w = 0
    while (w < n) {
      val s0 = samples.length.toLong * w / n
      val s1 = samples.length.toLong * (w + 1) / n
      var sum = 0.0
      var i = s0
      while (i < math.min(s1, samples.length)) { sum += samples(i.toInt) * samples(i.toInt); i += 1 }
      out(w) = if (s1 > s0) math.sqrt(sum / (s1 - s0)) else 0.0
      w += 1
    }
    out
  }

  private[multimodal] def eHash64(samples: Array[Double]): Long = {
    val rms = windowRms(samples, 64)
    var mean = 0.0
    var i = 0
    while (i < 64) { mean += rms(i); i += 1 }
    mean /= 64.0
    var out = 0L
    i = 0
    while (i < 64) {
      if (rms(i) > mean) out |= (1L << i)
      i += 1
    }
    out
  }

  private[multimodal] def dHash64(samples: Array[Double]): Long = {
    val rms = windowRms(samples, 65)
    var out = 0L
    var i = 0
    while (i < 64) {
      if (rms(i + 1) > rms(i)) out |= (1L << i)
      i += 1
    }
    out
  }
}
