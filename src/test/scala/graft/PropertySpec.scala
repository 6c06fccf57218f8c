package graft

import graft.ops.{Gmm, Variance}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins (SURVEY.md §5.3) for the pure-Scala algorithmic
  * layer, via ScalaCheck generators sampled under a fixed seed (the
  * scalatest<->scalacheck bridge artifact is not in the offline cache,
  * so sampling is driven manually — still generator-randomized, still
  * reproducible).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int = 60): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  private val values: Gen[Array[Double]] =
    Gen.nonEmptyListOf(Gen.choose(1.0, 10000.0)).map(_.toArray)

  test("median bounded by min/max and order-insensitive") {
    samples(values).foreach { xs =>
      val m = Variance.medianOf(xs)
      assert(m >= xs.min && m <= xs.max)
      assert(Variance.medianOf(xs.reverse) == m)
      assert(Variance.medianOf(xs.sorted.reverse) == m)
    }
  }

  test("rCV is scale-invariant: rcv(kx) == rcv(x) for k > 0") {
    def rcv(xs: Array[Double]): Double = {
      val m = Variance.medianOf(xs)
      Variance.medianOf(xs.map(x => math.abs(x - m))) / m
    }
    val ks = samples(Gen.choose(0.5, 100.0), 10)
    samples(values, 20).filter(_.length > 1).foreach { xs =>
      ks.foreach(k => assert(math.abs(rcv(xs) - rcv(xs.map(_ * k))) < 1e-9, s"k=$k"))
    }
  }

  test("variance classification is a total deterministic function") {
    samples(values).foreach { xs =>
      val a = Variance.classify("s", xs)
      val b = Variance.classify("s", xs)
      assert(a == b)
      assert(a.variance == "High" || a.variance == "Low")
    }
  }

  test("GMM fit: weights sum to ~1, variances positive, BIC finite") {
    samples(Gen.listOfN(80, Gen.choose(1.0, 10000.0)).map(_.toArray), 20).foreach { xs =>
      (1 to 3).foreach { k =>
        val f = Gmm.fit(xs, k)
        assert(math.abs(f.components.map(_.weight).sum - 1.0) < 1e-6)
        assert(f.components.forall(_.variance > 0))
        assert(!f.bic.isNaN && !f.bic.isInfinite)
      }
    }
  }

  test("Sunday snap-back lands on Sunday within 6 days (pure mirror of F5)") {
    samples(Gen.choose(0L, 20000L), 200).foreach { epochDay =>
      val d = java.time.LocalDate.ofEpochDay(epochDay)
      val dow = d.getDayOfWeek.getValue % 7 // Sun -> 0, mirrors dayofweek()-1
      val ws = d.minusDays(dow.toLong)
      assert(ws.getDayOfWeek == java.time.DayOfWeek.SUNDAY)
      assert(java.time.temporal.ChronoUnit.DAYS.between(ws, d) <= 6)
    }
  }

  test("BPE grain is the code point: surrogate pairs stay whole through train and segment") {
    import graft.text.BpeStats
    // supplementary-plane characters are two UTF-16 code units; the
    // trainer and segmenter must never split one (a lone surrogate
    // symbol can never match fit's code-point base alphabet)
    val cps = Seq("a", "b", "😀", "😂")
    val word: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(cps)).map(_.take(8).mkString)
    val corpusGen: Gen[List[String]] = Gen.nonEmptyListOf(word).map(_.take(15))
    samples(corpusGen, 25).foreach { ws =>
      val vocab = ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toArray
      val merges = BpeStats.trainMerges(vocab, 6)
      val ranks = merges.map(_._1).zipWithIndex.toMap
      ws.foreach { w =>
        val syms = BpeStats.segmentWord(w, ranks)
        assert(syms.mkString == w + BpeStats.EndOfWord, w)
        syms.foreach { s =>
          assert(!Character.isLowSurrogate(s.head), s"symbol starts mid-pair: $s")
          assert(!Character.isHighSurrogate(s.last), s"symbol ends mid-pair: $s")
        }
      }
    }
  }

  test("BPE segmentation is lossless and closed over the trained vocabulary (no UNK ever)") {
    import graft.text.BpeStats
    val word: Gen[String] =
      Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c')).map(_.take(12).mkString)
    val corpusGen: Gen[List[String]] = Gen.nonEmptyListOf(word).map(_.take(25))
    samples(corpusGen, 40).foreach { ws =>
      val vocab = ws.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }.toArray
      samples(Gen.choose(0, 12), 3).foreach { nm =>
        val merges = BpeStats.trainMerges(vocab, nm)
        val ranks = merges.map(_._1).zipWithIndex.toMap
        val products = merges.map { case ((l, r), _) => l + r }.toSet
        ws.foreach { w =>
          val syms = BpeStats.segmentWord(w, ranks)
          // lossless: symbols concatenate back to the word + end marker
          assert(syms.mkString == w + BpeStats.EndOfWord, s"$w under $nm merges")
          // closed: every symbol is a base char, the marker, or a merge
          // product — the invariant that makes encode() UNK-free
          syms.foreach { s =>
            assert(s.length == 1 || s == BpeStats.EndOfWord || products.contains(s),
              s"symbol '$s' outside the trained vocabulary")
          }
        }
      }
    }
  }
}
