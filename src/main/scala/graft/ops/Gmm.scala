package graft.ops

/** A9 — 1-D Gaussian-mixture multimodality test (pure Scala EM + BIC).
  *
  * Reference spec (Requirements/ExampleAiCode.md:308-372; tunables at
  * Requirements/ExamplePipelineCode.md:232-237): fit k = 1..maxK
  * mixtures, pick k by BIC, drop components with weight < minWeight,
  * verdict "High" iff >= 2 surviving components whose means differ by
  * >= separationThreshold x overall median.
  *
  * This is per-group *algorithmic* work on a bounded sample (the
  * pipeline caps input at the 5000 most recent points per stage,
  * ExamplePipelineCode.md:232), so it lives at the
  * `Dataset.groupByKey(...).mapGroups` level — executor-local math, no
  * Catalyst extension needed (SURVEY.md §2.9).
  *
  * Determinism (SURVEY.md §7.4#4): no random init — means start at
  * evenly spaced quantiles of the sorted sample, variances at the
  * overall variance, weights uniform. Same input => same verdict.
  */
object Gmm {

  final case class Component(weight: Double, mean: Double, variance: Double)
  final case class Fit(k: Int, logLikelihood: Double, bic: Double, components: Array[Component])

  private val MinVariance = 1e-6
  private val MaxIters = 200
  private val Tol = 1e-7

  /** Deterministic EM fit of a k-component 1-D mixture. */
  def fit(xs: Array[Double], k: Int): Fit = {
    val n = xs.length
    require(n >= k && k >= 1, s"need >= $k points, got $n")
    val sorted = xs.sorted
    val mean0 = xs.sum / n
    val var0 = math.max(xs.map(x => (x - mean0) * (x - mean0)).sum / n, MinVariance)

    // Quantile-spaced initial means: q = (i+1)/(k+1).
    var comps = Array.tabulate(k) { i =>
      val q = (i + 1).toDouble / (k + 1)
      val idx = math.min((q * (n - 1)).round.toInt, n - 1)
      Component(1.0 / k, sorted(idx), var0)
    }

    def logPdf(x: Double, c: Component): Double = {
      val d = x - c.mean
      -0.5 * (math.log(2 * math.Pi * c.variance) + d * d / c.variance)
    }

    def logLik(cs: Array[Component]): Double = {
      var ll = 0.0
      var i = 0
      while (i < n) {
        val x = xs(i)
        // log-sum-exp over components
        var mx = Double.NegativeInfinity
        val lp = new Array[Double](k)
        var j = 0
        while (j < k) {
          lp(j) = math.log(cs(j).weight) + logPdf(x, cs(j))
          if (lp(j) > mx) mx = lp(j)
          j += 1
        }
        var s = 0.0
        j = 0
        while (j < k) { s += math.exp(lp(j) - mx); j += 1 }
        ll += mx + math.log(s)
        i += 1
      }
      ll
    }

    var prevLL = Double.NegativeInfinity
    var iter = 0
    var converged = false
    while (iter < MaxIters && !converged) {
      // E-step: responsibilities
      val resp = Array.ofDim[Double](n, k)
      var i = 0
      while (i < n) {
        val x = xs(i)
        var mx = Double.NegativeInfinity
        var j = 0
        while (j < k) {
          resp(i)(j) = math.log(comps(j).weight) + logPdf(x, comps(j))
          if (resp(i)(j) > mx) mx = resp(i)(j)
          j += 1
        }
        var s = 0.0
        j = 0
        while (j < k) { resp(i)(j) = math.exp(resp(i)(j) - mx); s += resp(i)(j); j += 1 }
        j = 0
        while (j < k) { resp(i)(j) /= s; j += 1 }
        i += 1
      }
      // M-step
      comps = Array.tabulate(k) { j =>
        var nk = 0.0
        var sx = 0.0
        var i2 = 0
        while (i2 < n) { nk += resp(i2)(j); sx += resp(i2)(j) * xs(i2); i2 += 1 }
        val m = if (nk > 0) sx / nk else comps(j).mean
        var sv = 0.0
        i2 = 0
        while (i2 < n) { val d = xs(i2) - m; sv += resp(i2)(j) * d * d; i2 += 1 }
        val v = math.max(if (nk > 0) sv / nk else var0, MinVariance)
        Component(math.max(nk / n, 1e-12), m, v)
      }
      val ll = logLik(comps)
      if (math.abs(ll - prevLL) < Tol * (1 + math.abs(ll))) converged = true
      prevLL = ll
      iter += 1
    }
    val params = k * 2 + (k - 1) // means + variances + free weights
    val bic = -2 * prevLL + params * math.log(n.toDouble)
    Fit(k, prevLL, bic, comps)
  }

  /** Best fit over k = 1..maxK by BIC (lowest wins; ties -> smaller k). */
  def bestByBic(xs: Array[Double], maxK: Int): Fit =
    (1 to math.min(maxK, xs.length)).map(k => fit(xs, k)).minBy(f => (f.bic, f.k))
}
