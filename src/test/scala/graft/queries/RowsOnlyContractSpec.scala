package graft.queries

import graft.{SparkEntry, SparkSpec}
import graft.sources.Sources
import org.apache.spark.sql.functions._

/** Quantified contracts for the rows-only queries
  * (q25/q27/q29/q30/q35/q37/q76/q83/q84/q87/q88/q90/q91/q92/q93/
  * q94/q95/q96/q97/q98/q99/q100/q103/q104/q105):
  * these cannot
  * hash-match a DuckDB oracle
  * (hash-valued or approximate by design), so each one's CLAIM is
  * pinned here numerically against an exact in-Spark anchor computed
  * on the same fixture — accuracy floors, recall floors, error bounds,
  * and exactness of the verified parts.
  */
class RowsOnlyContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("q25 contract: langid accuracy floor, fingerprint discrimination, token-count sanity") {
    val df = SparkEntry.queries("q25_langid_fingerprint")(spark, dir).cache()
    val n = df.count()
    // langid is a stopword-vote heuristic; its CLAIM is conditional:
    // where the declared language's function words actually appear
    // (>= 2 hits), the vote picks that language. The fixture's
    // non-English docs are synthetic word soup without their
    // languages' stopwords (zero detectable signal — measured 0/282),
    // so an unconditional accuracy floor would test the fixture, not
    // the detector. Measured on signal-bearing docs: 171/171.
    val withSignal = df.join(Sources.documents(spark, dir), "doc_id")
      .withColumn("own_hits", expr(
        """size(filter(split(lower(text), '\\s+'), t -> array_contains(
          | map('en', array('the','a','of','and','to','in','is','it','that','for'),
          |     'es', array('el','la','de','que','y','en','un','una','los','por'),
          |     'de', array('der','die','das','und','ist','von','ein','eine','zu','mit'),
          |     'fr', array('le','la','les','de','et','un','une','est','que','pour'),
          |     'zh', array('的','是','了','在','和','有','我','不','这','人'))[declared_lang], t)))""".stripMargin))
      .filter(col("own_hits") >= 2)
    val sigN = withSignal.count()
    val sigOk = withSignal.filter(col("detected_lang") === col("declared_lang")).count()
    assert(sigN > 100, s"fixture drifted: only $sigN signal-bearing docs")
    assert(sigOk.toDouble / sigN >= 0.95,
      s"langid agreement on signal-bearing docs $sigOk/$sigN below the 0.95 contract floor")
    // the detector must abstain ('und'), never guess, on zero-hit docs
    val zeroHitGuess = df.join(Sources.documents(spark, dir), "doc_id")
      .withColumn("any_hits", expr(
        """size(filter(split(lower(text), '\\s+'), t -> array_contains(
          | array('the','a','of','and','to','in','is','it','that','for',
          |       'el','la','de','que','y','en','un','una','los','por',
          |       'der','die','das','und','ist','von','ein','eine','zu','mit',
          |       'le','les','et','une','est','pour',
          |       '的','是','了','在','和','有','我','不','这','人'), t)))""".stripMargin))
      .filter(col("any_hits") === 0 && col("detected_lang") =!= "und").count()
    assert(zeroHitGuess == 0, s"$zeroHitGuess zero-signal docs got a language guess")
    // fp64 discriminates exactly like the normalized text it hashes
    val distinctFp = df.select("fp64").distinct().count()
    val distinctText = Sources.documents(spark, dir)
      .select(lower(regexp_replace(col("text"), "\\s+", " "))).distinct().count()
    assert(distinctFp == distinctText, s"fp64 classes $distinctFp != normalized text classes $distinctText")
    // BPE-ish token count is a refinement of whitespace tokens: never fewer
    val coarser = df.join(Sources.documents(spark, dir), "doc_id")
      .filter(length(trim(col("text"))) > 0)
      .filter(col("n_bpeish") < size(split(trim(col("text")), "\\s+"))).count()
    assert(coarser == 0L)
    df.unpersist()
    ()
  }

  test("q27 contract: reported Hamming is exact, bounded, and catches every exact-dup pair") {
    val pairs = SparkEntry.queries("q27_simhash_pairs")(spark, dir).cache()
    assert(pairs.filter(col("hamming") > 8 || col("hamming") < 0).count() == 0)
    // recompute each pair's Hamming from scratch signatures: must match
    val sigs = Sources.documents(spark, dir).select(
      col("doc_id"),
      graft.dedup.SimHash64.simhash64(graft.text.TextAnalysis.tokens(col("text"))).as("sig"))
    val recomputed = pairs
      .join(sigs.toDF("id_a", "sig_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b"), "id_b")
      .withColumn("h2", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
    assert(recomputed.filter(col("hamming") =!= col("h2")).count() == 0)
    // every exact duplicate (same content fingerprint) must surface at Hamming 0
    val fps = Sources.documents(spark, dir).select(
      col("doc_id"), graft.text.TextAnalysis.contentFingerprint(col("text")).as("fp"))
    val exactDupPairs = fps.toDF("id_a", "fp")
      .join(fps.toDF("id_b", "fp"), "fp")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val missed = exactDupPairs.join(
      pairs.filter(col("hamming") === 0).select("id_a", "id_b"),
      Seq("id_a", "id_b"), "left_anti").count()
    assert(missed == 0, s"$missed exact-dup pairs missing from the Hamming-0 set")
    pairs.unpersist()
    ()
  }

  test("q29 contract: ANN recall@10 >= 0.6 vs the exact q28 top-10, cosines bit-exact") {
    val ann = SparkEntry.queries("q29_knn_ann")(spark, dir).collect()
    val brute = SparkEntry.queries("q28_knn_brute")(spark, dir).collect()
    val bruteIds = brute.map(_.getAs[Long]("vec_id")).toSet
    val recall = ann.map(_.getAs[Long]("vec_id")).count(bruteIds) / 10.0
    assert(recall >= 0.6, s"ANN recall@10 $recall below 0.6 contract floor")
    // where ANN returns a true neighbor, its cosine is the EXACT value
    val bruteCos = brute.map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    ann.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      bruteCos.get(id).foreach(c => assert(r.getAs[Double]("cosine") == c))
    }
  }

  test("q30 contract: perfect precision (verified subset) and recall >= 0.8 vs exact pairs") {
    import sqlImplicits._
    val mined = SparkEntry.queries("q30_embedding_near_dup")(spark, dir)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // exact all-pairs anchor at this sf: normalized double cosine >= 0.4
    val e = Sources.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val withNorm = e.select(col("vec_id"),
      transform(col("v"), x => x / sqrt(aggregate(col("v"), lit(0.0), (a, y) => a + y * y))).as("u"))
    val exact = withNorm.toDF("id_a", "ua").crossJoin(withNorm.toDF("id_b", "ub"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", aggregate(zip_with(col("ua"), col("ub"), (x, y) => x * y), lit(0.0), (a, y) => a + y))
      .filter(col("cos") >= 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mined.subsetOf(exact), s"false positives: ${mined.diff(exact)}") // precision 1.0
    val recall = if (exact.isEmpty) 1.0 else mined.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"q30 recall $recall below 0.8 contract floor (|exact|=${exact.size})")
  }

  test("q35 contract: sketch error bounds vs the exact anchors in the same row") {
    val rows = SparkEntry.queries("q35_approx_sketches")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exactParts = r.getAs[Long]("exact_parts").toDouble
      val approxParts = r.getAs[Long]("approx_parts").toDouble
      // HLL++ default rsd = 5%; 3 sigma contract bound
      assert(math.abs(approxParts - exactParts) / exactParts <= 0.15,
        s"HLL error ${math.abs(approxParts - exactParts) / exactParts} beyond 3x rsd")
      val exactMed = r.getAs[Double]("exact_median")
      val approxMed = r.getAs[Double]("approx_median")
      // accuracy-10000 KLL on a 1..50 integer column: within 2% relative
      assert(math.abs(approxMed - exactMed) / exactMed <= 0.02,
        s"approx median $approxMed vs exact $exactMed")
    }
  }

  test("q37 contract: IVF recall@10 floor vs exact q28, cosines float-exact for true neighbors") {
    val ivf = SparkEntry.queries("q37_knn_ivf")(spark, dir).collect()
    val brute = SparkEntry.queries("q28_knn_brute")(spark, dir).collect()
    val bruteIds = brute.map(_.getAs[Long]("vec_id")).toSet
    val recall = ivf.map(_.getAs[Long]("vec_id")).count(bruteIds) / 10.0
    // the fixture's embeddings are near-orthogonal random vectors —
    // IVF's worst case (no cluster structure for cells to exploit);
    // measured recall at nprobe=3 of 8 cells is 0.5 there, while
    // clustered data reaches 1.0 (IvfSpec). Floor set below the
    // measured unclustered value; the plan-shape claim (equi-join on
    // cells, never a cross join) is IvfSpec's to pin.
    assert(recall >= 0.4, s"IVF recall@10 $recall below 0.4 contract floor")
    val bruteCos = brute.map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("cosine")).toMap
    // the IVF index stores vectors NORMALIZED IN FLOAT (4-byte
    // payload by design) while brute normalizes in double, so cosines
    // agree to float precision (~1e-7), not bitwise (measured diff
    // 4.7e-9 on the fixture)
    ivf.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      bruteCos.get(id).foreach(c => assert(math.abs(r.getAs[Double]("cosine") - c) <= 1e-6))
    }
  }

  test("q76 contract: fingerprints match an independent re-encode; decode round-trips every doc") {
    import graft.text.BpeTokenizer
    val out = SparkEntry.queries("q76_bpe_encode")(spark, dir).cache()
    try {
      val docs = Sources.documents(spark, dir)
      // independent re-encode with the query's published parameters
      val model = BpeTokenizer.fit(docs, "text", numMerges = 200, maxVocab = 10000)
      val enc = BpeTokenizer.encode(docs, "text", "doc_id", model).cache()
      try {
        val refp = enc.select(
          col("doc_id"),
          col("n_bpe_tokens").as("ref_n"),
          md5(concat_ws(",", transform(col("token_ids"), _.cast("string"))).cast("binary")).as("ref_fp"))
        val mismatch = out.join(refp, "doc_id")
          .filter(col("ids_fp") =!= col("ref_fp") || col("n_bpe_tokens") =!= col("ref_n")).count()
        assert(mismatch == 0, s"$mismatch docs diverge from the independent re-encode")
        // BPE is lossless: decoding must reproduce the single-spaced text exactly
        val bad = BpeTokenizer.decode(enc, "token_ids", model)
          .join(docs, "doc_id")
          .withColumn("expected",
            concat_ws(" ", filter(split(col("text"), " "), w => length(w) > 0)))
          .filter(col("decoded_text") =!= col("expected")).count()
        assert(bad == 0, s"$bad docs fail the decode round trip")
        // 200 merges must genuinely compress vs whitespace+char baseline:
        // mean tokens-per-word strictly below the zero-merge chars+1 form
        val stats = enc.join(docs, "doc_id")
          .withColumn("nw", size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long"))
          .filter(col("nw") > 0)
          .agg(sum("n_bpe_tokens").as("nb"), sum("nw").as("nw"),
            sum(length(regexp_replace(col("text"), " ", "")) + size(
              filter(split(col("text"), " "), w => length(w) > 0))).as("chars_form"))
          .head()
        assert(stats.getAs[Long]("nb") >= stats.getAs[Long]("nw"), "every word is >= 1 token")
        assert(stats.getAs[Long]("nb") < stats.getAs[Long]("chars_form"),
          "trained merges must beat the zero-merge char segmentation")
      } finally { enc.unpersist(); () }
    } finally { out.unpersist(); () }
  }

  test("q83 contract: pair set equals brute-force Hamming over independently recomputed hashes") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    val docs = Sources.documents(spark, dir)
    val out = SparkEntry.queries("q83_phash_dups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent recomputation: hash rows straight off the generator,
    // brute-force all pairs driver-side (500 docs -> 125k comparisons)
    val hashed = PerceptualHash.perceptualHashes(
      Multimodal.syntheticImages(docs, "doc_id", "text")).collect()
    val brute = (for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && java.lang.Long.bitCount(a.ahash ^ b.ahash) <= 3
    } yield (a.media_id, b.media_id)).toSet
    assert(out == brute, s"${(out diff brute).size} extra, ${(brute diff out).size} missing pairs")
    assert(out.nonEmpty, "fixture drifted: no organic Hamming<=3 pairs at sf0.01")
    // identical text ⇒ identical pixels ⇒ paired at Hamming 0: the
    // sf0.01 corpus has no byte-identical texts, so plant one
    val first = docs.select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
    val planted = first.union(first.select(col("doc_id") + lit(1000000L), col("text")))
    val plantedPairs = PerceptualHash.phashDupPairs(
      Multimodal.syntheticImages(planted, "doc_id", "text"), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").intValue))
    assert(plantedPairs.length == 1 && plantedPairs.head._3 == 0,
      s"planted exact duplicate not paired at Hamming 0: ${plantedPairs.toSeq}")
  }

  test("q90 contract: cluster labels equal union-find over the brute-force pair set; singletons self-labeled") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    val docs = Sources.documents(spark, dir)
    val got = SparkEntry.queries("q90_phash_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recomputation: hash rows off the generator, brute
    // force pairs, driver-side union-find to component minima
    val hashed = PerceptualHash.perceptualHashes(
      Multimodal.syntheticImages(docs, "doc_id", "text")).collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && java.lang.Long.bitCount(a.ahash ^ b.ahash) <= 3
    } {
      val (ra, rb) = (find(a.media_id), find(b.media_id))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = hashed.map(h => h.media_id -> find(h.media_id)).toMap
    assert(got == want,
      s"${(got.toSet diff want.toSet).size} wrong labels, ${(want.keySet diff got.keySet).size} missing ids")
    assert(got.size == hashed.length, "every decodable payload labeled exactly once")
    assert(want.values.toSet.subsetOf(want.keySet), "labels are member ids")
  }

  test("q91 contract: audio cluster labels equal union-find over the brute-force pair set; singletons self-labeled") {
    import graft.multimodal.{AudioFingerprint, Multimodal}
    val docs = Sources.documents(spark, dir)
    val got = SparkEntry.queries("q91_audio_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recomputation: fingerprint rows off the generator,
    // brute force pairs, driver-side union-find to component minima
    val hashed = AudioFingerprint.audioHashes(
      Multimodal.syntheticWavs(docs, "doc_id", "text")).collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && java.lang.Long.bitCount(a.ehash ^ b.ehash) <= 3
    } {
      val (ra, rb) = (find(a.media_id), find(b.media_id))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = hashed.map(h => h.media_id -> find(h.media_id)).toMap
    assert(got == want,
      s"${(got.toSet diff want.toSet).size} wrong labels, ${(want.keySet diff got.keySet).size} missing ids")
    assert(got.size == hashed.length, "every decodable payload labeled exactly once")
    // the organic corpus has no Hamming-near audio fingerprints at
    // sf0.01 (every sig its own singleton), so the multi-member case
    // is exercised by PLANTING a byte-identical duplicate, as the
    // q87 pair contract does
    val first = docs.select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
    val planted = first.union(first.select(col("doc_id") + lit(1000000L), col("text")))
    val plantedClusters = AudioFingerprint.audioDupClusters(
      Multimodal.syntheticWavs(planted, "doc_id", "text"), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plantedClusters.length == 2 && plantedClusters.map(_._2).distinct.length == 1,
      s"planted exact audio duplicate not clustered: ${plantedClusters.toSeq}")
  }

  test("q92 contract: one best-scoring representative per cluster; clusters partition the decodable corpus") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    val docs = Sources.documents(spark, dir)
    val got = SparkEntry.queries("q92_image_dedup_resolution")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // independent recomputation: q90's union-find clusters + payload
    // byte sizes, then per-cluster argmax(size, ties to smallest id)
    val media = Multimodal.syntheticImages(docs, "doc_id", "text").collect()
    val sizes = media.map(m => m.media_id -> m.bytes.length.toLong).toMap
    val hashed = PerceptualHash.perceptualHashes(
      Multimodal.syntheticImages(docs, "doc_id", "text")).collect()
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && java.lang.Long.bitCount(a.ahash ^ b.ahash) <= 3
    } {
      val (ra, rb) = (find(a.media_id), find(b.media_id))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = hashed.map(_.media_id).groupBy(find).map { case (c, members) =>
      val keeper = members.minBy(id => (-sizes(id), id))
      c -> (members.length.toLong, keeper, sizes(keeper).toDouble)
    }
    assert(got == want,
      s"${(got.toSet diff want.toSet).size} wrong, ${(want.toSet diff got.toSet).size} missing representatives")
    assert(got.values.map(_._1).sum == hashed.length,
      "cluster sizes must partition the decodable corpus exactly")
    assert(got.exists(_._2._1 > 1), "fixture drifted: no multi-member image cluster at sf0.01")
  }

  test("q93 contract: video cluster labels equal the driver-side ordered-component recomputation") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    val docs = Sources.documents(spark, dir)
    val got = SparkEntry.queries("q93_video_clusters")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent recomputation of the documented semantics: decode
    // every AVI driver-side, union-find the DISTINCT frame hashes at
    // Hamming <= 2 into components, key each video by its ordered
    // component sequence, label by the key group's minimum media_id
    val media = Multimodal.syntheticVideos(docs, "doc_id", "text").collect()
    val frames: Map[Long, Seq[Long]] = media.map { r =>
      r.media_id -> Multimodal.decodeFrames(r.bytes).map(PerceptualHash.aHash64).toSeq
    }.toMap
    val sigs = frames.values.flatten.toSeq.distinct
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    for {
      a <- sigs; b <- sigs
      if a < b && java.lang.Long.bitCount(a ^ b) <= 2
    } {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val want = frames.toSeq.map { case (id, fs) => id -> fs.map(find) }
      .groupBy(_._2).flatMap { case (_, vs) =>
        val label = vs.map(_._1).min
        vs.map { case (id, _) => id -> label }
      }
    assert(got == want,
      s"${(got.toSet diff want.toSet).size} wrong labels, ${(want.keySet diff got.keySet).size} missing ids")
    assert(got.size == frames.size, "every decodable video labeled exactly once")
    // fixture-level agreement with the q88 pair path: videos the pair
    // miner reports FULLY matched (match_frac 1.0 on both sides, same
    // frame count) must share a q93 cluster — full unordered agreement
    // on this fixture is always order-preserving, so the strict
    // sequence key cannot split it
    val fullPairs = PerceptualHash.videoDupPairs(
      Multimodal.syntheticVideos(docs, "doc_id", "text"), maxHamming = 2, minMatchFrac = 1.0)
      .filter(col("matched_a") === col("n_a") && col("matched_b") === col("n_b")
        && col("n_a") === col("n_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the organic corpus has no fully-matched pair at sf0.01 (q88's
    // organic pairs sit at 0.75-1.0 one-sided), so this is vacuous
    // there and the property is exercised by the PLANTED duplicate
    // below
    fullPairs.foreach { case (a, b) =>
      assert(got(a) == got(b), s"fully-matched pair ($a,$b) split across clusters")
    }
    // planted byte-identical video lands in the planted copy's cluster
    val first = docs.select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
    val planted = first.union(first.select(col("doc_id") + lit(1000000L), col("text")))
    val plantedClusters = PerceptualHash.videoDupClusters(
      Multimodal.syntheticVideos(planted, "doc_id", "text"), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(plantedClusters.length == 2 && plantedClusters.map(_._2).distinct.length == 1,
      s"planted exact video duplicate not clustered: ${plantedClusters.toSeq}")
  }

  test("q87 contract: audio pair set equals brute-force Hamming over recomputed fingerprints") {
    import graft.multimodal.{AudioFingerprint, Multimodal}
    val docs = Sources.documents(spark, dir)
    val out = SparkEntry.queries("q87_audio_dups")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashed = AudioFingerprint.audioHashes(
      Multimodal.syntheticWavs(docs, "doc_id", "text")).collect()
    val brute = (for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && java.lang.Long.bitCount(a.ehash ^ b.ehash) <= 3
    } yield (a.media_id, b.media_id)).toSet
    assert(out == brute, s"${(out diff brute).size} extra, ${(brute diff out).size} missing pairs")
    // identical text ⇒ identical PCM ⇒ paired at Hamming 0 (planted,
    // since the sf0.01 corpus has no byte-identical texts)
    val first = docs.select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
    val planted = first.union(first.select(col("doc_id") + lit(1000000L), col("text")))
    val plantedPairs = AudioFingerprint.audioDupPairs(
      Multimodal.syntheticWavs(planted, "doc_id", "text"), maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").intValue))
    assert(plantedPairs.length == 1 && plantedPairs.head._3 == 0,
      s"planted exact duplicate not paired at Hamming 0: ${plantedPairs.toSeq}")
  }

  test("q88 contract: video pair set equals brute-force frame-hash agreement") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    val docs = Sources.documents(spark, dir)
    val out = SparkEntry.queries("q88_video_dups")(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("match_frac"))).toMap
    // independent recomputation: decode every synthetic AVI's frames,
    // hash driver-side, brute-force the agreement measure
    val media = Multimodal.syntheticVideos(docs, "doc_id", "text").collect()
    val hashes: Map[Long, Seq[Long]] = media.map { r =>
      r.media_id -> Multimodal.decodeFrames(r.bytes).map(PerceptualHash.aHash64).toSeq
    }.toMap
    def near(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b) <= 2
    val ids = hashes.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      (va, vb) = (ids(i), ids(j))
      ha = hashes(va); hb = hashes(vb)
      ma = ha.count(x => hb.exists(near(x, _))).toDouble / ha.size
      mb = hb.count(x => ha.exists(near(x, _))).toDouble / hb.size
      if math.max(ma, mb) >= 0.75
    } yield (va, vb) -> math.max(ma, mb)).toMap
    assert(out.keySet == brute.keySet,
      s"${(out.keySet diff brute.keySet).size} extra, ${(brute.keySet diff out.keySet).size} missing pairs")
    // matched-frame COUNTS can differ from per-frame agreement only if
    // distinct frames collide; the fraction itself must agree
    out.foreach { case (k, f) => assert(math.abs(f - brute(k)) < 1e-12, s"$k: $f vs ${brute(k)}") }
    // identical text ⇒ identical AVI ⇒ every frame matches at 1.0
    // (planted: the organic corpus has no byte-identical texts)
    val first = docs.select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
    val planted = first.union(first.select(col("doc_id") + lit(1000000L), col("text")))
    val plantedPairs = PerceptualHash.videoDupPairs(
      Multimodal.syntheticVideos(planted, "doc_id", "text"), maxHamming = 0, minMatchFrac = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Double]("match_frac")))
    assert(plantedPairs.length == 1 && plantedPairs.head._3 == 1.0,
      s"planted exact video duplicate not fully matched: ${plantedPairs.toSeq}")
  }

  test("q84 contract: cells partition the non-degenerate corpus; every cell coheres") {
    val out = SparkEntry.queries("q84_kmeans_cells")(spark, dir).collect()
    assert(out.length <= 8 && out.nonEmpty)
    // the index drops degenerate vectors (null/NaN/zero-norm) by
    // contract, so the partition target is the indexable corpus
    import graft.similarity.Similarity
    val indexable = Sources.embeddings(spark, dir)
      .withColumn("__n", Similarity.norm(col("embedding")))
      .filter(col("__n") > 0 && !isnan(col("__n"))).count()
    assert(out.map(_.getAs[Long]("n_vectors")).sum == indexable,
      "cell membership must partition the indexable corpus exactly")
    // members must sit measurably above orthogonal of their OWN
    // centroid on average — the defining property Lloyd's optimizes
    out.foreach { r =>
      val mc = r.getAs[Double]("mean_cosine")
      assert(mc > 0.1 && mc <= 1.0 + 1e-9, s"cell ${r.getAs[Int]("cell")} mean cosine $mc")
    }
  }

  test("q94 contract: per-cell cap semantics, census totals, determinism across reruns") {
    val out = SparkEntry.queries("q94_cluster_balanced_sample")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty && out.length <= 8)
    // the cap binds exactly: n_kept = min(n_total, 10) per cell
    out.foreach { case (cell, total, kept) =>
      assert(kept == math.min(total, 10L), s"cell $cell: total=$total kept=$kept cap=10")
    }
    // totals partition the finite-norm corpus (the same indexable set
    // as q84 — degenerate vectors belong to no cell)
    import graft.similarity.Similarity
    val indexable = Sources.embeddings(spark, dir)
      .withColumn("__n", Similarity.norm(col("embedding")))
      .filter(col("__n") > 0 && !isnan(col("__n"))).count()
    assert(out.map(_._2).sum == indexable,
      "census totals must partition the indexable corpus exactly")
    // bit-for-bit deterministic: the census is a pure function of
    // (corpus, model, cap, seed)
    val again = SparkEntry.queries("q94_cluster_balanced_sample")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq, "census must be identical across reruns")
  }

  test("q95 contract: spectral pair set equals brute-force Hamming over recomputed sHashes") {
    import graft.multimodal.{AudioFingerprint, Multimodal}
    val docs = Sources.documents(spark, dir)
    val out = SparkEntry.queries("q95_audio_dups_spectral")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashed = AudioFingerprint.audioHashes(
      Multimodal.syntheticWavs(docs, "doc_id", "text")).collect()
    val brute = (for {
      a <- hashed; b <- hashed
      if a.media_id < b.media_id && java.lang.Long.bitCount(a.shash ^ b.shash) <= 3
    } yield (a.media_id, b.media_id)).toSet
    assert(out == brute, s"${(out diff brute).size} extra, ${(brute diff out).size} missing pairs")
    // identical text ⇒ identical PCM ⇒ identical spectrum: planted
    // exact duplicate pairs at Hamming 0 (the sf0.01 corpus has no
    // byte-identical texts of its own)
    val first = docs.select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
    val planted = first.union(first.select(col("doc_id") + lit(1000000L), col("text")))
    val plantedPairs = AudioFingerprint.audioDupPairs(
      Multimodal.syntheticWavs(planted, "doc_id", "text"), maxHamming = 0, which = "shash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number]("hamming").intValue))
    assert(plantedPairs.length == 1 && plantedPairs.head._3 == 0,
      s"planted exact duplicate not paired at sHash Hamming 0: ${plantedPairs.toSeq}")
  }

  test("q96 contract: PQ-rerank recall@10 floor vs exact brute force; scores are true cosines") {
    val out = SparkEntry.queries("q96_knn_pq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(out.length == 10 && out.map(_._3).toSeq == (1 to 10))
    // exact anchor: brute-force cosine top-10 on the same corpus
    val emb = Sources.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0).toArray.map(_.toDouble)
    val exactRows = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("embedding")).collect().flatMap { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        val nv = math.sqrt(v.map(x => x * x).sum)
        val nq = math.sqrt(q.map(x => x * x).sum)
        if (nv > 0 && !nv.isNaN) {
          val c = v.zip(q).map { case (a, b) => a * b }.sum / (nv * nq)
          if (c.isNaN) None else Some(r.getLong(0) -> c)
        } else None
      }
    val exactTop = exactRows.sortBy { case (id, c) => (-c, id) }.take(10)
    val recall = out.map(_._1).count(exactTop.map(_._1).toSet.contains) / 10.0
    // the 100-candidate ADC shortlist recovers most of the true head
    // even in PQ's hardest regime (near-orthogonal 64-dim noise at 16
    // centroids per subspace): pure ADC@10 measures 0.3 here, rerank
    // lifts it to the shortlist's ceiling — measured 0.9 on this
    // fixture, floored at 0.7 for slack against fixture regeneration
    assert(recall >= 0.7, s"PQ-rerank recall@10 $recall below floor 0.7 (got=${out.map(_._1).toSeq})")
    // the reported scores must be TRUE cosines of the returned rows
    // (quantization may only affect WHICH rows survive, not scores)
    val byId = exactRows.toMap
    out.foreach { case (id, score, _) =>
      assert(math.abs(score - byId(id)) < 1e-6, s"id=$id score $score != exact cosine ${byId(id)}")
    }
  }

  test("q98 contract: incremental phash pairs equal the brute cross-recomputation; planted dup pairs at 0") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    val out = SparkEntry.queries("q98_phash_incremental")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).intValue))
    // exact anchor: recompute both sides' hashes with the SAME kernel
    // and cross-filter driver-side (maxHamming 3 < bands 4 makes the
    // banded join pigeonhole-exact, so equality must be perfect)
    val docs = Sources.documents(spark, dir)
    def hashes(cond: org.apache.spark.sql.Column) = PerceptualHash.perceptualHashes(
      Multimodal.syntheticImages(docs.filter(cond), "doc_id", "text"))
      .collect().map(r => (r.media_id, r.ahash))
    val b = hashes(col("doc_id") % 3 === 0)
    val r = hashes(col("doc_id") % 3 =!= 0)
    val brute = (for {
      (ia, sa) <- b; (ib, sb) <- r
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb))).sorted
    assert(out.toSeq.sorted == brute.toSeq, s"got=${out.length} rows, want=${brute.length}")
    info(s"organic cross pairs at sf0.01 = ${brute.length}")
    // planted positive: copy one reference doc into the batch id
    // space (doc_id % 3 == 0 guaranteed by construction) — the exact
    // duplicate must cross-pair at Hamming 0
    val refDoc = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
    val plantedId = 3000000L
    val plantedBatch = Multimodal.syntheticImages(
      refDoc.select(lit(plantedId).as("doc_id"), col("text")), "doc_id", "text")
    val refMedia = Multimodal.syntheticImages(
      docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text")
    val planted = PerceptualHash.phashDupPairsAgainst(plantedBatch, refMedia, maxHamming = 0)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getAs[Number](2).intValue))
    val refId = refDoc.head().getLong(0)
    assert(planted.exists(p => p._1 == plantedId && p._2 == refId && p._3 == 0),
      s"planted duplicate not cross-paired at Hamming 0: ${planted.toSeq}")
  }

  test("q99 contract: kept docs equal the brute cross-Hamming recomputation; planted duplicate gated out") {
    import graft.dedup.{Dedup, SimHash64}
    import graft.text.TextAnalysis
    val kept = SparkEntry.queries("q99_novel_docs_gate")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // exact anchor: recompute both sides' SimHashes with the SAME
    // expression and cross-filter driver-side (maxHamming 3 < bands 4
    // = pigeonhole-exact, so set equality must be perfect)
    val docs = Sources.documents(spark, dir)
    def sigs(cond: org.apache.spark.sql.Column) = docs.filter(cond)
      .select(col("doc_id"),
        SimHash64.simhash64(TextAnalysis.tokens(col("text"))).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = sigs(col("doc_id") % 3 === 0)
    val r = sigs(col("doc_id") % 3 =!= 0)
    val refSigs = r.map(_._2)
    val brute = b.collect {
      case (id, s) if !refSigs.exists(rs => java.lang.Long.bitCount(rs ^ s) <= 3) => id
    }.toSet
    assert(kept == brute, s"kept=${kept.size} brute=${brute.size} diff=${kept.diff(brute).take(5)}/${brute.diff(kept).take(5)}")
    info(s"batch=${b.length}, kept=${kept.size} (${b.length - kept.size} gated as seen at sf0.01)")
    // planted positive: a byte-identical copy of a reference doc in
    // the batch id space MUST be gated out (Hamming 0)
    val refDoc = docs.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), col("text")).orderBy("doc_id").limit(1)
    val plantedId = 3000003L // % 3 == 0 by construction
    val plantedKept = Dedup.dropSeenSimhash(
      refDoc.select(lit(plantedId).as("doc_id"), col("text")),
      docs.filter(col("doc_id") % 3 =!= 0),
      "text", maxHamming = 3)
      .collect()
    assert(plantedKept.isEmpty,
      s"planted exact duplicate passed the gate: ${plantedKept.toSeq}")
  }

  test("q97 contract: IVF-PQ rerank recall@10 floor vs exact brute force; scores are true cosines") {
    val out = SparkEntry.queries("q97_knn_ivfpq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(out.length == 10 && out.map(_._3).toSeq == (1 to 10))
    val emb = Sources.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0).toArray.map(_.toDouble)
    val exactRows = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("embedding")).collect().flatMap { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        val nv = math.sqrt(v.map(x => x * x).sum)
        val nq = math.sqrt(q.map(x => x * x).sum)
        if (nv > 0 && !nv.isNaN) {
          val c = v.zip(q).map { case (a, b) => a * b }.sum / (nv * nq)
          if (c.isNaN) None else Some(r.getLong(0) -> c)
        } else None
      }
    val exactTop = exactRows.sortBy { case (id, c) => (-c, id) }.take(10)
    val recall = out.map(_._1).count(exactTop.map(_._1).toSet.contains) / 10.0
    // two approximations stack: nprobe=4 of 8 cells can hide a true
    // neighbor in an unprobed list, and the residual-ADC shortlist of
    // 100 can miss within a probed one. On this fixture (near-
    // orthogonal noise — PQ's hardest regime) the info line below
    // records the measurement; floored with slack against fixture
    // regeneration.
    // Measured 0.6 on this fixture — almost exactly the nprobe/k=0.5
    // scan coverage, which is the THEORETICAL expectation when
    // neighbors scatter uniformly over cells (orthogonal noise gives
    // IVF nothing to adapt to; on clustered corpora the probed cells
    // concentrate the true neighbors and recall rises toward the
    // shortlist ceiling). Floor 0.5 = the coverage bound.
    info(s"measured IVF-PQ rerank recall@10 = $recall")
    assert(recall >= 0.5, s"IVF-PQ rerank recall@10 $recall below floor 0.5 (got=${out.map(_._1).toSeq})")
    // reported scores must be TRUE cosines (quantization affects
    // WHICH rows survive, never the reported score)
    val byId = exactRows.toMap
    out.foreach { case (id, score, _) =>
      assert(math.abs(score - byId(id)) < 1e-6, s"id=$id score $score != exact cosine ${byId(id)}")
    }
  }

  test("q109 contract: append-maintained index matches one-shot encode; recall floor and parity with retrained-from-scratch; drift ~1 in-distribution") {
    val out = SparkEntry.queries("q109_pq_index_append")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getDouble(3)))
    assert(out.length == 10 && out.map(_._3).toSeq == (1 to 10))
    // drift ratio on a SAME-DISTRIBUTION batch must sit near 1 (the
    // retrain signal must not fire on normal ingest) — wide slack:
    // the batch is a quarter of the corpus, baseline the other 3/4
    val ratio = out.head._4
    assert(ratio > 0.5 && ratio < 1.5, s"in-distribution drift ratio $ratio outside (0.5, 1.5)")
    // exact anchor on the GROWN corpus (the appended rows are live
    // search targets, not second-class citizens)
    val emb = Sources.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === 0L).select("embedding")
      .head().getSeq[Float](0).toArray.map(_.toDouble)
    val exactRows = emb.filter(col("vec_id") =!= 0L)
      .select(col("vec_id"), col("embedding")).collect().flatMap { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        val nv = math.sqrt(v.map(x => x * x).sum)
        val nq = math.sqrt(q.map(x => x * x).sum)
        if (nv > 0 && !nv.isNaN) {
          val c = v.zip(q).map { case (a, b) => a * b }.sum / (nv * nq)
          if (c.isNaN) None else Some(r.getLong(0) -> c)
        } else None
      }
    val exactTop = exactRows.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val recallAppended = out.map(_._1).count(exactTop.contains) / 10.0
    info(s"measured appended-index recall@10 = $recallAppended")
    assert(recallAppended >= 0.5,
      s"appended-index recall@10 $recallAppended below the q97 coverage floor 0.5")
    // parity with a RETRAINED-from-scratch index on the grown corpus:
    // the frozen base-trained models may not lose more than one
    // neighbor of ten to staleness on a same-distribution batch
    val all = emb.filter(col("vec_id") =!= 0L)
    val ivfR = graft.similarity.Ivf.train(all, "embedding", k = 8, iters = 5)
    val pqR = graft.similarity.Pq.trainResidual(all, "embedding", ivfR, m = 8, ksub = 16)
    val encR = graft.similarity.Pq.encodeIvf(all, "embedding", "vec_id", ivfR, pqR)
    val retrained = graft.similarity.Pq.topKIvfRerank(
      encR, pqR, ivfR, all, "embedding", "vec_id", q, k = 10, nprobe = 4, expand = 10)
      .collect().map(_.getLong(0))
    val recallRetrained = retrained.count(exactTop.contains) / 10.0
    info(s"measured retrained-from-scratch recall@10 = $recallRetrained")
    assert(recallAppended >= recallRetrained - 0.1,
      s"appended recall $recallAppended trails retrained $recallRetrained by more than one neighbor")
    // reported scores are TRUE cosines (rerank contract)
    val byId = exactRows.toMap
    out.foreach { case (id, score, _, _) =>
      assert(math.abs(score - byId(id)) < 1e-6, s"id=$id score $score != exact cosine ${byId(id)}")
    }
  }

  test("q103 contract: the durable two-epoch ingest admits exactly q99's kept set") {
    val viaIndex = SparkEntry.queries("q103_ingest_epochs")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val stateless = SparkEntry.queries("q99_novel_docs_gate")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // same SimHash gate, same pigeonhole bound — the index round-trip
    // through parquet must not change a single admission
    assert(viaIndex == stateless,
      s"index path diverged: onlyIndex=${viaIndex.diff(stateless).take(5)} onlyStateless=${stateless.diff(viaIndex).take(5)}")
    info(s"epoch-2 admitted ${viaIndex.size} docs (== stateless gate)")
  }

  test("q104 contract: the durable two-epoch embedding ingest admits exactly q100's kept set") {
    val viaIndex = SparkEntry.queries("q104_embedding_epochs")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val stateless = SparkEntry.queries("q100_embedding_gate")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // same LSH geometry, same exact-cosine verify — the vector-index
    // round-trip through parquet must not change a single admission
    assert(viaIndex == stateless,
      s"index path diverged: onlyIndex=${viaIndex.diff(stateless).take(5)} onlyStateless=${stateless.diff(viaIndex).take(5)}")
    info(s"epoch-2 admitted ${viaIndex.size} vectors (== stateless gate)")
  }

  test("q108 contract: the SIGNED embedding ingest admits exactly q104's set (cached == recomputed signatures)") {
    val signed = SparkEntry.queries("q108_signed_embedding_epochs")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val unsigned = SparkEntry.queries("q104_embedding_epochs")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // the cache stores the same withSignatures projection the live
    // path computes (one normalization from raw, fixed refine
    // geometries) — a single differing admission means the cached and
    // recomputed signatures drifted
    assert(signed == unsigned,
      s"signed path diverged: onlySigned=${signed.diff(unsigned).take(5)} onlyUnsigned=${unsigned.diff(signed).take(5)}")
    info(s"signed epoch-2 admitted ${signed.size} vectors (== unsigned lifecycle)")
  }

  test("q105 contract: the durable two-epoch image ingest admits exactly the stateless dropSeenImages kept set") {
    val docs = graft.sources.Sources.documents(spark, dir)
    val viaIndex = SparkEntry.queries("q105_image_ingest_epochs")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val stateless = graft.multimodal.PerceptualHash.dropSeenImages(
      graft.multimodal.Multimodal.syntheticImages(docs.filter(col("doc_id") % 3 === 0), "doc_id", "text"),
      graft.multimodal.Multimodal.syntheticImages(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", "text"))
      .collect().map(_.getLong(0)).toSet
    // same aHash gate, same pigeonhole bound — the index round-trip
    // through parquet must not change a single admission
    assert(viaIndex == stateless,
      s"index path diverged: onlyIndex=${viaIndex.diff(stateless).take(5)} onlyStateless=${stateless.diff(viaIndex).take(5)}")
    // the batch side is 1/3 of the corpus and not everything dupes:
    // the gate must be admitting a real, nonempty subset
    val nBatch = docs.filter(col("doc_id") % 3 === 0).count()
    assert(viaIndex.nonEmpty && viaIndex.size <= nBatch)
    info(s"epoch-2 admitted ${viaIndex.size}/$nBatch images (== stateless gate)")
  }

  test("q100 contract: gated rows truly seen (perfect precision), recall floor vs brute cross filter, planted dup gated") {
    import graft.similarity.Similarity
    val kept = SparkEntry.queries("q100_embedding_gate")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    // exact anchor: brute cross cosine over unit vectors, driver-side
    val emb = Sources.embeddings(spark, dir)
    def unitVecs(cond: org.apache.spark.sql.Column): Array[(Long, Array[Double])] =
      emb.filter(cond).select("vec_id", "embedding").collect().flatMap { r =>
        val v = r.getSeq[Float](1).toArray.map(_.toDouble)
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 0 && !n.isNaN) Some(r.getLong(0) -> v.map(_ / n)) else None
      }
    val b = unitVecs(col("vec_id") % 3 === 0)
    val r = unitVecs(col("vec_id") % 3 =!= 0)
    val bruteSeen = b.collect {
      case (id, u) if r.exists { case (_, ru) =>
        u.zip(ru).map { case (x, y) => x * y }.sum >= 0.4 } => id
    }.toSet
    val batchIds = emb.filter(col("vec_id") % 3 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val gated = batchIds.diff(kept)
    // PERFECT PRECISION: the verify stage recomputes the exact cosine,
    // so a gated row is ALWAYS truly seen — set inclusion, no slack
    assert(gated.subsetOf(bruteSeen),
      s"gated rows not in brute seen set: ${gated.diff(bruteSeen).take(5)}")
    // recall: an LSH band-join miss passes the gate by design; the
    // geometry targets 0.95 at threshold 0.4 — floored with slack
    // against fixture regeneration
    val recall = if (bruteSeen.isEmpty) 1.0 else gated.size.toDouble / bruteSeen.size
    info(s"batch=${batchIds.size}, brute-seen=${bruteSeen.size}, gated=${gated.size}, recall=$recall")
    assert(bruteSeen.nonEmpty, "fixture has no cross-split pair at 0.4 — gate untested")
    assert(recall >= 0.8, s"q100 gate recall $recall below 0.8 floor (|bruteSeen|=${bruteSeen.size})")
    // planted positive: a byte-identical copy of a reference vector in
    // the batch id space MUST be gated out (cosine 1.0, same signature)
    val refVec = emb.filter(col("vec_id") % 3 =!= 0)
      .select(col("vec_id"), col("embedding")).orderBy("vec_id").limit(1)
    val g = Similarity.lshGeometry(threshold = 0.4, targetRecall = 0.95, numPlanes = 64)
    val plantedKept = Similarity.dropSeenEmbedding(
      refVec.select(lit(3000000L).as("vec_id"), col("embedding")),
      emb.filter(col("vec_id") % 3 =!= 0),
      "embedding", "vec_id", threshold = 0.4,
      planes = Similarity.hyperplanes(dim = 64, numPlanes = 64),
      bands = g.bands, probeHamming = g.probeHamming, broadcastVerify = true)
      .collect()
    assert(plantedKept.isEmpty,
      s"planted exact duplicate passed the semantic gate: ${plantedKept.toSeq}")
  }
}
