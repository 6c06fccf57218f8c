package graft.multimodal

import graft.SparkSpec

class AudioFingerprintSpec extends SparkSpec {

  private def wav(pcm: Array[Short], rate: Float = 8000f): Array[Byte] = {
    val raw = new Array[Byte](pcm.length * 2)
    var i = 0
    while (i < pcm.length) {
      raw(2 * i) = (pcm(i) & 0xff).toByte
      raw(2 * i + 1) = ((pcm(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, pcm.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  // a deterministic envelope: alternating-sign amplitude pattern with
  // distinct loud/quiet regions so both hashes carry real structure
  private def tone(f: Int => Int, n: Int = 6400): Array[Short] =
    Array.tabulate(n)(i => ((if (i % 2 == 0) 1 else -1) * f(i)).toShort)

  private def media(rows: (Long, Array[Byte])*) = {
    import sqlImplicits._
    rows.map { case (id, b) => Multimodal.MediaRow(id, "audio", b, Map.empty[String, String]) }.toDS()
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("identical PCM hashes identically; a gain change leaves both hashes untouched") {
    val base = tone(i => 2000 + (i / 100 % 8) * 1500)
    val louder = base.map(s => (s * 1.5).toShort)
    val rows = AudioFingerprint.audioHashes(media((1L, wav(base)), (2L, wav(base)), (3L, wav(louder))))
      .collect().sortBy(_.media_id)
    assert(rows(0).ehash == rows(1).ehash && rows(0).dhash == rows(1).dhash)
    assert(rows(0).ehash == rows(2).ehash, "eHash must be gain-invariant")
    assert(rows(0).dhash == rows(2).dhash, "dHash must be gain-invariant")
  }

  test("a local edit stays Hamming-near; a different envelope is Hamming-far") {
    val base = tone(i => 2000 + (i / 100 % 8) * 1500)
    // silence one short region (~1 of 64 windows)
    val edited = base.zipWithIndex.map { case (s, i) => if (i >= 300 && i < 400) 0.toShort else s }
    val other = tone(i => 2000 + (i / 37 % 13) * 1100)
    val rows = AudioFingerprint
      .audioHashes(media((1L, wav(base)), (2L, wav(edited)), (3L, wav(other))))
      .collect().sortBy(_.media_id)
    assert(hamming(rows(0).ehash, rows(1).ehash) <= 3,
      s"local edit drifted ${hamming(rows(0).ehash, rows(1).ehash)} eHash bits")
    assert(hamming(rows(0).ehash, rows(2).ehash) > 10,
      s"unrelated envelopes only ${hamming(rows(0).ehash, rows(2).ehash)} bits apart")
  }

  test("incremental wrappers: cross pairs surface the re-ingested clip; the gate admits only the novel one") {
    val base = tone(i => 2000 + (i / 100 % 8) * 1500)
    val louder = base.map(s => (s * 1.5).toShort) // gain change: same fingerprint
    val other = tone(i => 2000 + (i / 37 % 13) * 1100)
    val batch = media((100L, wav(base)), (101L, wav(louder)), (102L, wav(other)))
    val ref = media((1L, wav(base)))
    val pairs = AudioFingerprint.audioDupPairsAgainst(batch, ref, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue))
    assert(pairs.exists(p => p._1 == 100L && p._2 == 1L && p._3 == 0), s"pairs=${pairs.toSeq}")
    assert(pairs.exists(p => p._1 == 101L && p._2 == 1L && p._3 == 0),
      s"gain-changed copy must cross-pair at 0: ${pairs.toSeq}")
    assert(!pairs.exists(_._1 == 102L), s"novel clip cross-paired: ${pairs.toSeq}")
    val kept = AudioFingerprint.dropSeenAudio(batch, ref, maxHamming = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(102L), s"kept=$kept")
  }

  test("undecodable, empty, and null payloads yield no hash row") {
    import sqlImplicits._
    val ds = media((1L, Array[Byte](9, 9, 9)), (2L, Array.emptyByteArray))
      .union(Seq(Multimodal.MediaRow(3L, "audio", null, Map.empty[String, String])).toDS())
    assert(AudioFingerprint.audioHashes(ds).count() == 0)
  }

  // real sinusoids at 8 kHz for the spectral tests (the alternating-
  // sign `tone` fixture is an envelope fixture; sHash needs genuine
  // frequency content)
  private def sines(freqs: Seq[(Double, Double)], n: Int = 20480): Array[Short] =
    Array.tabulate(n) { i =>
      freqs.map { case (f, a) => a * math.sin(2 * math.Pi * f * i / 8000.0) }.sum.toShort
    }

  test("FFT: an impulse is spectrally flat; a pure tone peaks at its bin") {
    val n = 64
    val re = new Array[Double](n); val im = new Array[Double](n)
    re(0) = 1.0
    AudioFingerprint.fftInPlace(re, im)
    (0 until n).foreach { i =>
      val mag = math.hypot(re(i), im(i))
      assert(math.abs(mag - 1.0) < 1e-9, s"impulse bin $i magnitude $mag != 1")
    }
    val re2 = Array.tabulate(n)(i => math.cos(2 * math.Pi * 5 * i / n))
    val im2 = new Array[Double](n)
    AudioFingerprint.fftInPlace(re2, im2)
    val mags = (0 until n).map(i => math.hypot(re2(i), im2(i)))
    assert(math.abs(mags(5) - n / 2.0) < 1e-9, s"tone bin magnitude ${mags(5)} != ${n / 2}")
    (0 until n).filterNot(i => i == 5 || i == n - 5).foreach { i =>
      assert(mags(i) < 1e-9, s"leakage at bin $i: ${mags(i)}")
    }
  }

  test("sHash is gain-invariant and survives a time shift; different spectra are far") {
    val base = sines(Seq((440.0, 6000.0), (880.0, 3000.0), (1320.0, 1500.0)))
    val louder = base.map(s => (s * 1.4).toShort)
    val shifted = base.drop(163) // ~20 ms cut: phase scrambled, spectrum intact
    val other = sines(Seq((300.0, 6000.0), (700.0, 3000.0), (2500.0, 1500.0)))
    // exact invariance on the real-valued signal (band comparisons
    // scale uniformly under any positive gain) ...
    val dbl = base.map(_.toDouble)
    assert(AudioFingerprint.sHash64(dbl) == AudioFingerprint.sHash64(dbl.map(_ * 1.4)),
      "sHash must be exactly gain-invariant on the real-valued signal")
    val rows = AudioFingerprint.audioHashes(media(
      (1L, wav(base)), (2L, wav(louder)), (3L, wav(shifted)), (4L, wav(other))))
      .collect().sortBy(_.media_id)
    // ... and Hamming-near through 16-bit re-quantization, whose
    // truncation noise can flip bits in the signal-free high bands
    assert(hamming(rows(0).shash, rows(1).shash) <= 3,
      s"quantized gain change drifted ${hamming(rows(0).shash, rows(1).shash)} sHash bits")
    assert(hamming(rows(0).shash, rows(2).shash) <= 3,
      s"time shift drifted ${hamming(rows(0).shash, rows(2).shash)} sHash bits")
    assert(hamming(rows(0).shash, rows(3).shash) > 10,
      s"unrelated spectra only ${hamming(rows(0).shash, rows(3).shash)} bits apart")
  }

  test("audioDupPairs which=shash equals brute force over recomputed spectral hashes") {
    val fills: Seq[(Long, Array[Short])] = (0 until 8).map { k =>
      (k.toLong, sines(Seq((200.0 + 150.0 * k, 6000.0), (900.0 + 70.0 * k, 2500.0))))
    } ++ Seq(
      (100L, sines(Seq((440.0, 5000.0), (1100.0, 2000.0)))),
      (101L, sines(Seq((440.0, 5000.0), (1100.0, 2000.0)))))
    val ds = media(fills.map { case (id, pcm) => (id, wav(pcm)) }: _*)
    val hashed = AudioFingerprint.audioHashes(ds).collect()
    val brute = (for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && hamming(a.shash, b.shash) <= 3
    } yield (a.media_id, b.media_id)).toSet
    val joined = AudioFingerprint.audioDupPairs(ds, maxHamming = 3, which = "shash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.contains((100L, 101L)), "fixture drifted: planted dup not within Hamming 3")
    assert(joined == brute, s"banded join diverged\nbrute=$brute\njoined=$joined")
  }

  test("audioDupPairs equals brute-force Hamming over recomputed hashes; planted dup at 0") {
    val fills: Seq[(Long, Int => Int)] = (0 until 10).map { k =>
      (k.toLong, (i: Int) => 1500 + (i / (50 + 13 * k) % (5 + k)) * 1200)
    } ++ Seq(
      (100L, (i: Int) => 2000 + (i / 80 % 7) * 1400),
      (101L, (i: Int) => 2000 + (i / 80 % 7) * 1400))
    val ds = media(fills.map { case (id, f) => (id, wav(tone(f))) }: _*)
    val hashed = AudioFingerprint.audioHashes(ds).collect()
    val brute = (for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && hamming(a.ehash, b.ehash) <= 3
    } yield (a.media_id, b.media_id)).toSet
    val joined = AudioFingerprint.audioDupPairs(ds, maxHamming = 3, which = "ehash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.contains((100L, 101L)), "fixture drifted: planted dup not within Hamming 3")
    assert(joined == brute, s"banded join diverged\nbrute=$brute\njoined=$joined")
  }
}
