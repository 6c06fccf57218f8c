package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def ids(n: Int) = {
    import sqlImplicits._
    spark.range(n.toLong).select(col("id"),
      (col("id") % 4).cast("string").as("grp"))
  }

  test("a non-integral id column is rejected loudly, never silently sampled to nothing") {
    import sqlImplicits._
    // string ids: ANSI cast would throw a bare error mid-job (ANSI
    // off: null scores -> zero rows at any rate); the guard names the
    // fix instead
    val df = Seq(("a3f9", "en"), ("b2c1", "fr")).toDF("doc_id", "lang")
    Seq(
      () => Sampling.uniform(df, "doc_id", 0.5),
      () => Sampling.stratified(df, "doc_id", "lang", Map("en" -> 0.5)),
      () => graft.ops.Curriculum.interleave(df, "doc_id", "lang")).foreach { f =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("xxhash64"), e.getMessage)
    }
  }

  test("uniform sampling hits the rate within binomial tolerance and is deterministic") {
    val df = ids(20000)
    val kept = Sampling.uniform(df, "id", 0.3, seed = 7L)
    val n = kept.count()
    // 3-sigma binomial band around 6000
    assert(math.abs(n - 6000.0) < 3 * math.sqrt(20000 * 0.3 * 0.7), n)
    // deterministic: the same call yields the same ROWS, not just the same count
    val again = Sampling.uniform(df, "id", 0.3, seed = 7L)
    assert(kept.select("id").collect().map(_.getLong(0)).sorted.sameElements(
      again.select("id").collect().map(_.getLong(0)).sorted))
    // a different seed yields a genuinely different membership
    val other = Sampling.uniform(df, "id", 0.3, seed = 8L)
    assert(other.select("id").collect().map(_.getLong(0)).toSet !=
      kept.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("samples are nested across rates: rate r1 < r2 implies sample(r1) subset of sample(r2)") {
    val df = ids(5000)
    val small = Sampling.uniform(df, "id", 0.1, seed = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    val big = Sampling.uniform(df, "id", 0.4, seed = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(big))
    assert(small.nonEmpty && big.size > small.size)
  }

  test("sampling is partition-layout invariant: repartitioned input keeps the same rows") {
    val df = ids(5000)
    val a = Sampling.uniform(df, "id", 0.25, seed = 11L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.uniform(df.repartition(17, col("grp")), "id", 0.25, seed = 11L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("stratified rates apply per stratum; absent strata take the default") {
    val df = ids(40000)
    val kept = Sampling.stratified(df, "id", "grp",
      rates = Map("0" -> 0.1, "1" -> 0.9), defaultRate = 0.5, seed = 5L)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // each stratum has 10000 rows; 3-sigma bands per rate
    def band(rate: Double) = 3 * math.sqrt(10000 * rate * (1 - rate))
    assert(math.abs(byGrp("0") - 1000.0) < band(0.1), byGrp)
    assert(math.abs(byGrp("1") - 9000.0) < band(0.9), byGrp)
    assert(math.abs(byGrp("2") - 5000.0) < band(0.5), byGrp)
    assert(math.abs(byGrp("3") - 5000.0) < band(0.5), byGrp)
  }

  test("rate 0 keeps nothing, rate 1 keeps everything") {
    val df = ids(1000)
    assert(Sampling.uniform(df, "id", 0.0).count() == 0)
    assert(Sampling.uniform(df, "id", 1.0).count() == 1000)
  }

  test("the plan is a pure filter: no shuffle anywhere") {
    val plan = Sampling.uniform(ids(100), "id", 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("temperatureMix drops NULL-stratum rows (documented inner-join semantics)") {
    import sqlImplicits._
    val df = (1L to 200L).map(i => (i, if (i % 5 == 0) null else s"s${i % 2}"))
      .toDF("id", "grp")
    // k large enough that every real stratum is kept whole
    val kept = Sampling.temperatureMix(df, "id", "grp", k = 100.0, seed = 1L)
    assert(kept.filter($"grp".isNull).count() == 0)
    assert(kept.count() == 160) // the 40 NULL-stratum rows are gone, rest kept
  }

  /** Skewed domains: one hot domain (600 rows), one exactly-at-cap,
    * one under-cap.
    */
  private def domains = {
    import sqlImplicits._
    ((1L to 600L).map(i => (i, "hot")) ++
      (601L to 650L).map(i => (i, "atcap")) ++
      (651L to 660L).map(i => (i, "tail")))
      .toDF("id", "dom")
  }

  test("domainCap bounds every domain at the cap and keeps under-cap domains whole") {
    val kept = Sampling.domainCap(domains, "id", "dom", cap = 50, seed = 9L)
    val byDom = kept.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom == Map("hot" -> 50L, "atcap" -> 50L, "tail" -> 10L), byDom)
    // under/at-cap domains keep their EXACT rows (anti-join passthrough)
    val tailIds = kept.filter(col("dom") === "tail").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(tailIds == (651L to 660L).toSet)
  }

  test("domainCap selection equals the plain global rank window (same rows, any layout)") {
    import org.apache.spark.sql.expressions.Window
    val reference = domains
      .withColumn("__rk", row_number().over(Window.partitionBy(col("dom"))
        .orderBy(Sampling.sampleScore(col("id"), 9L).asc, col("id").asc)))
      .filter(col("__rk") <= 50).select("id")
      .collect().map(_.getLong(0)).toSet
    val got = Sampling.domainCap(domains, "id", "dom", cap = 50, seed = 9L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == reference)
    val repart = Sampling.domainCap(domains.repartition(13), "id", "dom", cap = 50, seed = 9L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(repart == reference)
  }

  test("domainCap ranks ONLY over-cap domains: under-cap rows never enter the window") {
    val plan = Sampling.domainCap(domains, "id", "dom", cap = 50, seed = 9L)
      .queryExecution.executedPlan.toString
    // the pass-through side is a broadcast ANTI join (no exchange), the
    // ranked side carries a partial WindowGroupLimit below the window's
    // exchange so a hot domain forwards at most cap rows per map task
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("domainCap with a cap above every domain count is the identity") {
    val kept = Sampling.domainCap(domains, "id", "dom", cap = 1000, seed = 9L)
    assert(kept.count() == 660)
  }

  /** Two strata with different score distributions; scores descend
    * with id so the expected keep set is the smallest ids per stratum.
    */
  private def scored = {
    import sqlImplicits._
    ((1L to 100L).map(i => (i, "a", 1000.0 - i)) ++
      (101L to 110L).map(i => (i, "b", 10.0 - (i - 100))))
      .toDF("id", "grp", "score")
  }

  test("topFractionByScore keeps exactly ceil(p*n) best rows per stratum") {
    val kept = Sampling.topFractionByScore(scored, "id", "grp", "score", p = 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    // stratum a: ceil(0.3*100)=30 best = ids 1..30; b: ceil(0.3*10)=3 = ids 101..103
    assert(kept == ((1L to 30L).map(_ -> "a") ++ (101L to 103L).map(_ -> "b")).toSet, kept)
  }

  test("topFractionByScore: ties break to the smallest id; p=1 keeps everything") {
    import sqlImplicits._
    val flat = (1L to 10L).map(i => (i, "s", 7.0)).toDF("id", "grp", "score")
    val kept = Sampling.topFractionByScore(flat, "id", "grp", "score", p = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(kept == (1L to 5L).toSet, kept) // all scores equal -> 5 smallest ids
    assert(Sampling.topFractionByScore(flat, "id", "grp", "score", p = 1.0).count() == 10)
    assert(Sampling.topFractionByScore(flat.limit(0), "id", "grp", "score", p = 0.5).count() == 0)
  }

  test("topFractionByScore plans the literal WindowGroupLimit prefilter") {
    val plan = Sampling.topFractionByScore(scored, "id", "grp", "score", p = 0.3)
      .queryExecution.executedPlan.toString
    // the rank <= maxK literal conjunct must give each map task a
    // bounded per-stratum forward before the window's exchange
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  // --- epochMix ------------------------------------------------------

  private def tokenDocs = {
    import sqlImplicits._
    // srcA: 4 docs x 10 tokens = 40; srcB: 2 docs x 10 = 20; srcC unweighted
    (Seq.tabulate(4)(i => (i.toLong, "srcA", 10)) ++
      Seq.tabulate(2)(i => ((10 + i).toLong, "srcB", 10)) ++
      Seq((20L, "srcC", 10))).toDF("id", "src", "nt")
  }

  test("epochFactors: whole epochs and fractional thresholds from exact arithmetic") {
    // budget 120, weights A=2/3, B=1/3 -> targets 80 and 40 tokens
    // -> factors 80/40 = 2.0 epochs (no fraction) and 40/20 = 2.0
    val f = Sampling.epochFactors(tokenDocs, "src", "nt",
      Map("srcA" -> 2.0, "srcB" -> 1.0), tokenBudget = 120L)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(f("srcA") == ((2, 0L)) && f("srcB") == ((2, 0L)))
    assert(!f.contains("srcC"), "unweighted sources get no factor")
    // budget 90 -> A target 60 / 40 tokens = 1.5 epochs: threshold = floor(0.5 * m)
    val g = Sampling.epochFactors(tokenDocs, "src", "nt",
      Map("srcA" -> 1.0), tokenBudget = 60L)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(g("srcA") == ((1, (0.5 * 2147483647L.toDouble).toLong)))
  }

  test("epochMix: every doc repeats floor(f) or floor(f)+1 times; manifest is deterministic") {
    val m = Sampling.epochMix(tokenDocs, "id", "src", "nt",
      Map("srcA" -> 1.0), tokenBudget = 60L, seed = 3L) // f = 1.5
    val reps = m.collect().groupBy(_.getLong(0)).map { case (id, rs) =>
      id -> rs.map(_.getInt(2)).sorted.toSeq
    }
    assert(reps.keySet == Set(0L, 1L, 2L, 3L), "only weighted-source docs appear")
    reps.values.foreach(cs => assert(cs == (1 to cs.length) && (cs.length == 1 || cs.length == 2),
      s"copies must be 1..reps with reps in {1,2}: $cs"))
    // deterministic across invocations
    assert(m.collect().toSeq.toSet ==
      Sampling.epochMix(tokenDocs, "id", "src", "nt",
        Map("srcA" -> 1.0), tokenBudget = 60L, seed = 3L).collect().toSeq.toSet)
  }

  test("epochMix: realized tokens land within one source pass of the target") {
    import sqlImplicits._
    val big = spark.range(500L).select(col("id"),
      lit("w").as("src"), (col("id") % 20 + 1).cast("int").as("nt"))
    val total = big.agg(sum("nt")).head().getLong(0) // ~5250
    val budget = 3L * total / 2L                      // 1.5 epochs
    val manifest = Sampling.epochMix(big, "id", "src", "nt",
      Map("w" -> 1.0), tokenBudget = budget, seed = 11L)
    val realized = manifest.join(big, Seq("id", "src")).agg(sum("nt")).head().getLong(0)
    // whole epoch (total) + Bernoulli(0.5) half epoch: 4-sigma band
    val sigma = math.sqrt(500 * 0.25) * 10.5 // mean token count per doc
    assert(math.abs(realized - budget.toDouble) < 4 * sigma,
      s"realized $realized vs budget $budget")
  }

  test("full-range Long ids (xxhash64 surrogates) sample without ANSI overflow") {
    import sqlImplicits._
    // requireIntegralId's error message tells callers to hash string
    // ids through xxhash64, whose range covers all of Long — the raw
    // `id * 48271` first round overflowed exactly there under ANSI
    // (review r19). The mod-reduced form must agree with the old one
    // on small ids (same scores, bit-for-bit) and work on the edges.
    val small = (0L until 1000L).toDF("doc_id")
    val kept = Sampling.uniform(small, "doc_id", rate = 0.25, seed = 42L)
      .collect().map(_.getLong(0)).toSet
    assert(kept.size > 180 && kept.size < 320, kept.size.toString)
    val edges = Seq(Long.MaxValue, Long.MinValue, Long.MaxValue - 1, -1L, 0L).toDF("doc_id")
    // no ARITHMETIC_OVERFLOW; scores land in [0, m)
    val scored = edges.select(Sampling.sampleScore(org.apache.spark.sql.functions.col("doc_id"), 7L))
      .collect().map(_.getLong(0))
    assert(scored.forall(v => v >= 0L && v < 2147483647L), scored.mkString(","))
    // xxhash64 end-to-end: deterministic, layout-invariant
    val hashed = (1 to 500).map(i => s"url-$i").toDF("u")
      .select(org.apache.spark.sql.functions.xxhash64(org.apache.spark.sql.functions.col("u")).as("doc_id"))
    val a = Sampling.uniform(hashed, "doc_id", 0.5, 1L).collect().map(_.getLong(0)).toSet
    val b = Sampling.uniform(hashed.repartition(7), "doc_id", 0.5, 1L).collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("domainCap and topFractionByScore refuse reserved working columns") {
    import sqlImplicits._
    val df = Seq((1L, "d", 1)).toDF("doc_id", "domain", "__rk")
    intercept[IllegalArgumentException] {
      Sampling.domainCap(df, "doc_id", "domain", cap = 5)
    }
    intercept[IllegalArgumentException] {
      Sampling.topFractionByScore(
        Seq((1L, "s", 0.5, 9)).toDF("doc_id", "lang", "score", "__k"),
        "doc_id", "lang", "score", p = 0.5)
    }
  }
}
