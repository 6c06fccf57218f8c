package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

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
  * Plus the spectral refinement of the same family:
  *
  *  - sHash: Welch-averaged power spectrum (Hann-windowed 1024-point
  *    frames, radix-2 FFT, per-bin power averaged across frames),
  *    65 geometrically spaced frequency bands; bit i = band i+1's
  *    mean power above band i's — spectral gradient signs, the
  *    single-signature form of the Haitsma–Kalker band-energy-delta
  *    fingerprint. Gain-invariant (comparisons survive any positive
  *    scaling) and, unlike the envelope hashes, insensitive to
  *    time-domain edits that preserve spectral content (small
  *    shifts, re-windowing), because frame averaging discards phase.
  *
  * All three share the exact same Spark plumbing and the same banded
  * Hamming join downstream. Decode + hash runs
  * `mapPartitions`-batched; undecodable payloads yield no row, same
  * contract as [[PerceptualHash.perceptualHashes]].
  */
object AudioFingerprint {

  final case class AudioHashRow(media_id: Long, ehash: Long, dhash: Long, shash: Long)

  /** `(media_id, ehash, dhash, shash)` for every decodable audio
    * payload.
    */
  def audioHashes(media: Dataset[Multimodal.MediaRow]): Dataset[AudioHashRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.bytes == null || r.bytes.isEmpty) Iterator.empty
        else {
          val samples = Multimodal.decodeAudioSamples(r.bytes)
          if (samples == null || samples.isEmpty) Iterator.empty
          else Iterator.single(
            AudioHashRow(r.media_id, eHash64(samples), dHash64(samples), sHash64(samples)))
        }
      }
    }
  }

  /** The `(id, sig)` projection every pair/gate/cluster entry point
    * feeds the banded Hamming machinery — one definition of the
    * `which` validation and the decode-and-project, so adding a
    * fourth hash kind is one edit, not four.
    */
  private def sigView(
      media: Dataset[Multimodal.MediaRow],
      which: String,
      idName: String,
      sigName: String): DataFrame = {
    require(which == "ehash" || which == "dhash" || which == "shash",
      s"which=$which must be ehash|dhash|shash")
    // Compute ONLY the requested hash: the decode runs inside
    // mapPartitions, so Spark's column pruning cannot see that an
    // ehash consumer never reads shash — routing through
    // [[audioHashes]] paid the Welch FFT (64 Hann-windowed 1024-point
    // transforms per payload, the most expensive kernel in the module)
    // for every envelope-hash query (guide §2.3: don't compute what
    // you throw away). Decode rules and hash functions are the shared
    // ones, so the emitted (id, sig) rows are identical to projecting
    // [[audioHashes]].
    import media.sparkSession.implicits._
    val hashFn: Array[Double] => Long = which match {
      case "ehash" => eHash64
      case "dhash" => dHash64
      case _ => sHash64
    }
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        if (r.bytes == null || r.bytes.isEmpty) Iterator.empty
        else {
          val samples = Multimodal.decodeAudioSamples(r.bytes)
          if (samples == null || samples.isEmpty) Iterator.empty
          else Iterator.single((r.media_id, hashFn(samples)))
        }
      }
    }.toDF(idName, sigName)
  }

  /** Near-duplicate audio pairs: `(id_a, id_b, hamming)` with
    * `id_a < id_b` over `which` ("ehash" | "dhash" | "shash") at most
    * `maxHamming` apart — exact for `maxHamming < bands` (pigeonhole,
    * see [[graft.dedup.Dedup.hammingPairs]]).
    */
  def audioDupPairs(
      media: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3,
      which: String = "ehash"): DataFrame =
    graft.dedup.Dedup.hammingPairs(sigView(media, which, "id", "sig"), "id", "sig", maxHamming)

  /** [[audioDupPairs]] ACROSS two audio corpora — incremental audio
    * dedup, the twin of [[PerceptualHash.phashDupPairsAgainst]]:
    * `(id_a from batch, id_b from reference, hamming)` for every
    * cross pair within `maxHamming` (id spaces independent, equal
    * fingerprints match at 0; decode map-side on both legs).
    */
  def audioDupPairsAgainst(
      batch: Dataset[Multimodal.MediaRow],
      reference: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3,
      which: String = "ehash"): DataFrame =
    graft.dedup.Dedup.hammingPairsAgainst(
      sigView(batch, which, "id", "sig"), sigView(reference, which, "id", "sig"),
      "id", "sig", maxHamming)

  /** Keep only the batch payloads whose fingerprint is NOT within
    * `maxHamming` of any reference payload — the audio ingest gate,
    * twin of [[PerceptualHash.dropSeenImages]] (and like it, only
    * DECODABLE batch rows can pass: an undecodable payload has no
    * fingerprint and is excluded — quarantine it upstream). Output:
    * `(media_id, <which>)` of the admitted rows.
    */
  def dropSeenAudio(
      batch: Dataset[Multimodal.MediaRow],
      reference: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3,
      which: String = "ehash"): DataFrame =
    graft.dedup.Dedup.dropSeenHamming(
      sigView(batch, which, "media_id", which), sigView(reference, which, "media_id", which),
      which, maxHamming)

  /** Audio near-duplicate CLUSTERS: `(media_id, cluster)` for every
    * decodable payload — the linear-output production form of
    * [[audioDupPairs]] (see [[graft.dedup.Dedup.hammingClusters]]:
    * pair output is quadratic in duplicate-class size; the partition
    * is linear and is all dedup needs).
    */
  def audioDupClusters(
      media: Dataset[Multimodal.MediaRow],
      maxHamming: Int = 3,
      which: String = "ehash"): DataFrame =
    graft.dedup.Dedup.hammingClusters(sigView(media, which, "id", "sig"), "id", "sig", maxHamming)
      .withColumnRenamed("id", "media_id")

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

  /** Frame length for the Welch spectrum (power of two for the
    * radix-2 FFT); 512 positive-frequency bins.
    */
  private val FftN = 1024
  /** Cap on averaged frames: bounds the kernel at 64 FFTs per
    * payload regardless of recording length.
    */
  private val MaxFrames = 64

  /** Spectral hash: 65 geometric frequency bands over the
    * Welch-averaged power spectrum; bit i = mean power of band i+1
    * above band i. See the object doc for the invariances.
    */
  private[multimodal] def sHash64(samples: Array[Double]): Long = {
    val spec = welchPowerSpectrum(samples)
    // 66 geometric band edges over bins [1, FftN/2) — bin 0 (DC)
    // carries level offset, not timbre, and is excluded. Geometric
    // spacing mirrors pitch perception: equal band count per octave.
    val half = FftN / 2
    val edges = new Array[Int](66)
    var j = 0
    while (j < 66) {
      val e = math.round(math.pow(half.toDouble, j / 65.0)).toInt
      // enforce strictly increasing edges (the low octaves round to
      // the same bin otherwise)
      edges(j) = if (j == 0) 1 else math.max(e, edges(j - 1) + 1)
      j += 1
    }
    val bandMean = new Array[Double](65)
    var b = 0
    while (b < 65) {
      val lo = math.min(edges(b), half)
      val hi = math.min(edges(b + 1), half)
      var sum = 0.0
      var i = lo
      while (i < hi) { sum += spec(i); i += 1 }
      bandMean(b) = if (hi > lo) sum / (hi - lo) else 0.0
      b += 1
    }
    // Noise gate, RELATIVE so gain invariance survives: bands below
    // -60 dB of the loudest band are clamped to zero. Without it,
    // signal-free bands compare codec/quantization noise against
    // codec/quantization noise and those bits flip on any re-encode
    // (observed: 5 drifted bits from one 16-bit requantization).
    var maxBand = 0.0
    b = 0
    while (b < 65) { if (bandMean(b) > maxBand) maxBand = bandMean(b); b += 1 }
    val floor = maxBand * 1e-6
    b = 0
    while (b < 65) { if (bandMean(b) < floor) bandMean(b) = 0.0; b += 1 }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (bandMean(i + 1) > bandMean(i)) out |= (1L << i)
      i += 1
    }
    out
  }

  /** Welch power-spectrum estimate: Hann-windowed non-overlapping
    * [[FftN]]-sample frames (at most [[MaxFrames]], evenly spread
    * across the recording so a long file's tail still contributes),
    * per-bin power averaged across frames. Inputs shorter than one
    * frame are zero-padded.
    */
  private def welchPowerSpectrum(samples: Array[Double]): Array[Double] = {
    val half = FftN / 2
    val nFrames = math.max(1, math.min(MaxFrames, samples.length / FftN))
    val hann = new Array[Double](FftN)
    var i = 0
    while (i < FftN) {
      hann(i) = 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (FftN - 1)))
      i += 1
    }
    val acc = new Array[Double](half)
    val re = new Array[Double](FftN)
    val im = new Array[Double](FftN)
    var f = 0
    while (f < nFrames) {
      // Evenly spread frame starts (integer arithmetic, no overlap
      // when the file is long enough for nFrames disjoint frames).
      val start =
        if (nFrames == 1) 0L
        else math.max(0L, (samples.length.toLong - FftN) * f / (nFrames - 1))
      i = 0
      while (i < FftN) {
        val s = start + i
        re(i) = if (s < samples.length) samples(s.toInt) * hann(i) else 0.0
        im(i) = 0.0
        i += 1
      }
      fftInPlace(re, im)
      i = 0
      while (i < half) { acc(i) += re(i) * re(i) + im(i) * im(i); i += 1 }
      f += 1
    }
    i = 0
    while (i < half) { acc(i) /= nFrames; i += 1 }
    acc
  }

  /** Iterative radix-2 Cooley–Tukey FFT, in place over parallel
    * re/im arrays whose length must be a power of two.
    */
  private[multimodal] def fftInPlace(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length $n must be a power of two")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(base + k) = ar + tr
          im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr
          im(base + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }
}
