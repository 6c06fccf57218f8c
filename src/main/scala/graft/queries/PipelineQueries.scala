package graft.queries

import graft.ops.Sampling
import graft.sources.Sources
import graft.text.{CorpusStats, Decontamination, ImportanceResampling, NgramLm, PiiScrub, QualityClassifier, QualityFilters, SequencePacking, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-pipeline curation pack (engine additions beyond the
  * reference surface): deterministic stratified sampling, token-aware
  * sequence packing, and PII scrubbing — each oracle-exact against
  * DuckDB running the identical integer/regex arithmetic.
  */
object PipelineQueries {

  /** q39: stratified corpus rebalancing — downsample the dominant
    * language (en at 25%), halve the mid-frequency ones, keep zh
    * whole. Hash-deterministic membership (see [[Sampling]]): the
    * oracle reproduces the exact row set, not just the rates.
    */
  def q39StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    Sampling.stratified(
      Sources.documents(spark, dir), "doc_id", "lang",
      rates = Map("en" -> 0.25, "zh" -> 1.0), defaultRate = 0.5, seed = 42L)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")

  // thresholds inlined as literals computed by the SAME (rate * m).toLong
  // truncation the Spark side uses — a DuckDB CAST would round-to-nearest
  private val M = 2147483647L
  val q39Sql: String = {
    val en = (0.25 * M).toLong; val zh = (1.0 * M).toLong; val other = (0.5 * M).toLong
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE ((((doc_id * 48271 + 42) % $M) * 48271 % $M) * 48271 % $M) <
       |  (CASE WHEN lang = 'en' THEN $en WHEN lang = 'zh' THEN $zh ELSE $other END)
       |ORDER BY doc_id""".stripMargin
  }

  /** q62: per-domain document cap ([[Sampling.domainCap]]) — the
    * Gopher-style rebalancing step bounding any single source's share:
    * at most 20 docs per source, selected by ascending MINSTD score
    * (deterministic uniform cap). The oracle reproduces the exact kept
    * set from the same integer arithmetic via a rank window; the Spark
    * side shuffles only over-cap domains' rows (broadcast anti/semi
    * split + partial WindowGroupLimit — see the operator scaladoc).
    */
  def q62SourceCap(spark: SparkSession, dir: String): DataFrame =
    Sampling.domainCap(
      Sources.documents(spark, dir).select(col("doc_id"), col("source")),
      "doc_id", "source", cap = 20, seed = 42L)
      .orderBy("source", "doc_id")

  val q62Sql: String =
    s"""WITH r AS (
       |  SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY ((((doc_id * 48271 + 42) % $M) * 48271 % $M) * 48271 % $M), doc_id) AS rn
       |  FROM documents)
       |SELECT doc_id, source FROM r
       |WHERE rn <= 20
       |ORDER BY source, doc_id""".stripMargin

  /** q64: per-stratum top-fraction quality selection
    * ([[Sampling.topFractionByScore]]) — keep the best 30% of each
    * language by quality score, as a RANK (exact integer ceil(p·n_s)
    * cutoff; see the operator scaladoc for why not an interpolated
    * percentile threshold). The oracle reproduces the exact kept set
    * via the same rank window over the q22-parity quality doubles.
    */
  def q64QualityTopP(spark: SparkSession, dir: String): DataFrame = {
    val scored = Sources.documents(spark, dir)
      .withColumn("__toks", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"), col("lang"),
        TextAnalysis.qualityScoreOfTokens(col("__toks"), col("text")).as("quality"))
    Sampling.topFractionByScore(scored, "doc_id", "lang", "quality", p = 0.3)
      .orderBy("doc_id")
  }

  val q64Sql: String = {
    val stops = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""WITH q AS (
       |  SELECT doc_id, lang,
       |    least(n_tokens / 50.0, 1.0) * (1.0 - n_stop / n_tokens) *
       |      (CASE WHEN (CAST(length(text) AS DOUBLE) - (n_tokens - 1)) / n_tokens BETWEEN 3.0 AND 10.0
       |            THEN 1.0 ELSE 0.5 END) AS quality
       |  FROM (
       |    SELECT doc_id, lang, text,
       |      CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tokens,
       |      CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stops))) AS DOUBLE) AS n_stop
       |    FROM documents
       |  ) t0
       |), r AS (
       |  SELECT doc_id, lang, quality,
       |    row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rn,
       |    count(*) OVER (PARTITION BY lang) AS n
       |  FROM q
       |)
       |SELECT doc_id, lang, quality FROM r
       |WHERE rn <= CAST(ceil(0.3 * CAST(n AS DOUBLE)) AS BIGINT)
       |ORDER BY doc_id""".stripMargin
  }

  /** q40: sequence packing manifest — documents laid on a per-source
    * token tape, binned at capacity 2048 by start offset
    * ([[SequencePacking]]), one manifest row per bin.
    */
  def q40SequencePacking(spark: SparkSession, dir: String): DataFrame =
    SequencePacking.packedBins(
      Sources.documents(spark, dir), "text", "source", "doc_id", capacity = 2048)
      .orderBy("source", "bin")

  val q40Sql: String =
    """WITH t AS (
      |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), o AS (
      |  SELECT doc_id, source, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset
      |  FROM t
      |)
      |SELECT source, CAST(floor(start_offset / 2048.0) AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  min(doc_id) AS first_id, max(doc_id) AS last_id
      |FROM o
      |GROUP BY source, bin
      |ORDER BY source, bin""".stripMargin

  /** q41: PII scrub over text carrying synthetic identifiers. The
    * fixture corpus is digit-free word soup, so the query first welds
    * on DETERMINISTIC pseudo-PII derived from doc_id (email, NANP
    * phone, private IP) — both engines build the identical augmented
    * text, then scrub with the identical portable regexes
    * ([[PiiScrub.Patterns]]); the md5 of the scrubbed text pins every
    * replacement byte-for-byte.
    */
  def q41PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val aug = Sources.documents(spark, dir).withColumn("aug", concat(
      col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@mail"), pmod(col("doc_id"), lit(10L)).cast("string"), lit(".org tel 555-"),
      lpad(pmod(col("doc_id") * 7919L, lit(1000L)).cast("string"), 3, "0"), lit("-"),
      lpad(pmod(col("doc_id") * 104729L, lit(10000L)).cast("string"), 4, "0"),
      lit(" ip 10."), pmod(col("doc_id"), lit(256L)).cast("string"),
      lit(".0."), pmod(col("doc_id") * 7L, lit(256L)).cast("string"), lit(" ssn "),
      lpad(pmod(col("doc_id") * 31L, lit(1000L)).cast("string"), 3, "0"), lit("-"),
      lpad(pmod(col("doc_id"), lit(100L)).cast("string"), 2, "0"), lit("-"),
      lpad(pmod(col("doc_id") * 17L, lit(10000L)).cast("string"), 4, "0")))
    PiiScrub.scrubbed(aug, "aug")
      .select(
        col("doc_id"),
        col("n_email"), col("n_phone"), col("n_ssn"), col("n_ipv4"),
        length(col("scrubbed")).as("len_scrubbed"),
        md5(col("scrubbed").cast("binary")).as("scrub_md5"))
      .orderBy("doc_id")
  }

  val q41Sql: String = {
    val Seq(email, phone, ssn, ipv4) = PiiScrub.Patterns.map(_._2)
    def c(pat: String) = s"CAST(len(regexp_extract_all(aug, '$pat')) AS INT)"
    s"""WITH a AS (
       |  SELECT doc_id,
       |    text || ' contact user' || doc_id || '@mail' || (doc_id % 10) ||
       |      '.org tel 555-' || lpad(CAST(doc_id * 7919 % 1000 AS VARCHAR), 3, '0') || '-' ||
       |      lpad(CAST(doc_id * 104729 % 10000 AS VARCHAR), 4, '0') ||
       |      ' ip 10.' || (doc_id % 256) || '.0.' || (doc_id * 7 % 256) || ' ssn ' ||
       |      lpad(CAST(doc_id * 31 % 1000 AS VARCHAR), 3, '0') || '-' ||
       |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
       |      lpad(CAST(doc_id * 17 % 10000 AS VARCHAR), 4, '0') AS aug
       |  FROM documents
       |), s AS (
       |  SELECT doc_id,
       |    ${c(email)} AS n_email, ${c(phone)} AS n_phone,
       |    ${c(ssn)} AS n_ssn, ${c(ipv4)} AS n_ipv4,
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(aug,
       |      '$email', '<EMAIL>', 'g'),
       |      '$phone', '<PHONE>', 'g'),
       |      '$ssn', '<SSN>', 'g'),
       |      '$ipv4', '<IP>', 'g') AS scrubbed
       |  FROM a
       |)
       |SELECT doc_id, n_email, n_phone, n_ssn, n_ipv4,
       |  CAST(length(scrubbed) AS INT) AS len_scrubbed, md5(scrubbed) AS scrub_md5
       |FROM s
       |ORDER BY doc_id""".stripMargin
  }

  /** q42: Gopher/C4-style repetition & quality gate — per-document
    * signals (duplicate-token fraction, top-token / top-bigram
    * dominance, mean token length, stopword presence) plus the 0/1
    * keep verdict, identical double arithmetic on both engines.
    */
  def q42QualityFilters(spark: SparkSession, dir: String): DataFrame =
    QualityFilters.withSignals(Sources.documents(spark, dir), "text")
      .select(
        col("doc_id"), col("n_tokens"), col("dup_token_frac"),
        col("top_token_frac"), col("top_bigram_frac"), col("mean_tok_len"),
        col("n_stop_distinct"), col("keep"))
      .orderBy("doc_id")

  val q42Sql: String = {
    val stops = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    val bigrams = "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
    s"""WITH t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id, text,
       |    CAST(len(toks) AS INT) AS n_tokens,
       |    CAST(len(toks) AS DOUBLE) AS nt,
       |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS dup_token_frac,
       |    CAST(list_max(list_transform(list_distinct(toks),
       |        t2 -> len(list_filter(toks, x -> x = t2)))) AS DOUBLE)
       |      / CAST(len(toks) AS DOUBLE) AS top_token_frac,
       |    CASE WHEN len(toks) >= 2 THEN
       |      CAST(list_max(list_transform(list_distinct($bigrams),
       |          g -> len(list_filter($bigrams, x -> x = g)))) AS DOUBLE)
       |        / CAST(len(toks) - 1 AS DOUBLE)
       |      ELSE 0.0 END AS top_bigram_frac,
       |    CAST(len(list_intersect(list_distinct(toks), [$stops])) AS INT) AS n_stop_distinct
       |  FROM t
       |)
       |SELECT doc_id, n_tokens, dup_token_frac, top_token_frac, top_bigram_frac,
       |  (CAST(length(text) AS DOUBLE) - (nt - 1.0)) / nt AS mean_tok_len,
       |  n_stop_distinct,
       |  CAST(n_tokens BETWEEN ${QualityFilters.MinTokens} AND ${QualityFilters.MaxTokens}
       |    AND dup_token_frac <= ${QualityFilters.MaxDupTokenFrac}
       |    AND top_token_frac <= ${QualityFilters.MaxTopTokenFrac}
       |    AND top_bigram_frac <= ${QualityFilters.MaxTopBigramFrac}
       |    AND (CAST(length(text) AS DOUBLE) - (nt - 1.0)) / nt
       |      BETWEEN ${QualityFilters.MinMeanTokLen} AND ${QualityFilters.MaxMeanTokLen}
       |    AND n_stop_distinct >= ${QualityFilters.MinDistinctStopwords} AS INT) AS keep
       |FROM s
       |ORDER BY doc_id""".stripMargin
  }

  /** q43: benchmark decontamination — the corpus (doc_id % 97 != 0)
    * checked for trigram overlap against a deterministic "evaluation
    * set" slice (doc_id % 97 = 0); one row per contaminated document
    * with its overlap fraction. The benchmark n-gram set broadcasts;
    * the corpus never shuffles its text.
    */
  def q43Decontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    Decontamination.report(
      docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L),
      docs.filter(pmod(col("doc_id"), lit(97L)) === 0L),
      "text", "doc_id")
      .orderBy("doc_id")
  }

  val q43Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), ng AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
      |  FROM docs WHERE len(toks) >= 3
      |), bench AS (
      |  SELECT DISTINCT unnest(gs) AS g FROM ng WHERE doc_id % 97 = 0
      |), corpus AS (
      |  SELECT doc_id, len(gs) AS n_ngrams, unnest(gs) AS g FROM ng WHERE doc_id % 97 <> 0
      |), ov AS (
      |  SELECT doc_id, CAST(max(n_ngrams) AS INT) AS n_ngrams, count(*) AS n_overlap
      |  FROM corpus WHERE g IN (SELECT g FROM bench) GROUP BY doc_id
      |)
      |SELECT doc_id, n_ngrams, n_overlap,
      |  CAST(n_overlap AS DOUBLE) / CAST(n_ngrams AS DOUBLE) AS contam_frac,
      |  CAST(CAST(n_overlap AS DOUBLE) / CAST(n_ngrams AS DOUBLE) >= 0.05 AS INT) AS flagged
      |FROM ov
      |ORDER BY doc_id""".stripMargin

  /** q44: temperature-style source mixing — per-language acceptance
    * rates derived from the corpus itself so kept counts flatten
    * toward sqrt(n_lang) ([[Sampling.temperatureMix]], T = 2). The
    * oracle recomputes the identical sqrt-derived integer thresholds
    * and MINSTD membership, pinning the exact row set, not just the
    * rates.
    */
  def q44SourceMixing(spark: SparkSession, dir: String): DataFrame =
    Sampling.temperatureMix(
      Sources.documents(spark, dir), "doc_id", "lang", k = 12.0, seed = 7L)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  val q44Sql: String =
    s"""WITH c AS (
       |  SELECT lang, count(*) AS n FROM documents GROUP BY lang
       |), t AS (
       |  SELECT lang,
       |    CAST(floor(least(1.0, 12.0 / sqrt(CAST(n AS DOUBLE))) * 2147483647.0) AS BIGINT) AS thr
       |  FROM c
       |)
       |SELECT d.doc_id, d.lang, d.source
       |FROM documents d JOIN t USING (lang)
       |WHERE ((((d.doc_id * 48271 + 7) % $M) * 48271 % $M) * 48271 % $M) < t.thr
       |ORDER BY d.doc_id""".stripMargin

  /** q45: corpus-novelty scoring — every document scored against the
    * whole corpus's bigram document-frequency table
    * ([[CorpusStats.noveltyReport]]): the two-pass CCNet-style filter
    * signal, all-integer arithmetic so the oracle is hash-exact.
    */
  def q45CorpusNovelty(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.noveltyReport(
      Sources.documents(spark, dir), "text", "doc_id", n = 2, rareMaxDf = 2)
      .select(
        col("doc_id"), col("n_ngrams"), col("n_rare").cast("int").as("n_rare"),
        col("max_df"), col("rare_frac"), col("mean_df"))
      .orderBy("doc_id")

  val q45Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), ng AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks)),
      |    i -> toks[i] || ' ' || toks[i+1])) AS gs
      |  FROM t WHERE len(toks) >= 2
      |), g AS (
      |  SELECT doc_id, len(gs) AS n_ngrams, unnest(gs) AS g FROM ng
      |), f AS (
      |  SELECT g, count(*) AS df FROM g GROUP BY g
      |), j AS (
      |  SELECT g.doc_id, g.n_ngrams, f.df FROM g JOIN f USING (g)
      |)
      |SELECT doc_id,
      |  CAST(max(n_ngrams) AS INT) AS n_ngrams,
      |  CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS INT) AS n_rare,
      |  CAST(max(df) AS BIGINT) AS max_df,
      |  CAST(sum(CASE WHEN df <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(max(n_ngrams) AS DOUBLE) AS rare_frac,
      |  CAST(sum(df) AS DOUBLE) / CAST(max(n_ngrams) AS DOUBLE) AS mean_df
      |FROM j
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** q46: the decontamination REMOVAL applied ([[Decontamination
    * .decontaminated]]) — the corpus minus documents at or above the
    * flag threshold, i.e. what actually ships to training. Projected
    * to (doc_id, lang, n_chars): every kept row, metadata intact.
    */
  def q46Decontaminated(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    Decontamination.decontaminated(
      docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L),
      docs.filter(pmod(col("doc_id"), lit(97L)) === 0L),
      "text", "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy("doc_id")
  }

  val q46Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), ng AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
      |  FROM docs WHERE len(toks) >= 3
      |), bench AS (
      |  SELECT DISTINCT unnest(gs) AS g FROM ng WHERE doc_id % 97 = 0
      |), corpus AS (
      |  SELECT doc_id, len(gs) AS n_ngrams, unnest(gs) AS g FROM ng WHERE doc_id % 97 <> 0
      |), flagged AS (
      |  SELECT doc_id
      |  FROM corpus WHERE g IN (SELECT g FROM bench)
      |  GROUP BY doc_id, n_ngrams
      |  HAVING CAST(count(*) AS DOUBLE) / CAST(n_ngrams AS DOUBLE) >= 0.05
      |)
      |SELECT d.doc_id, d.lang, d.n_chars
      |FROM documents d
      |WHERE d.doc_id % 97 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
      |ORDER BY d.doc_id""".stripMargin

  /** q50: the SAME decontamination report as q43, computed through
    * the Bloom-prefilter regime ([[Decontamination.reportWithBloom]])
    * — the middle-size benchmark shape where the gram set broadcasts
    * only as ~10 bits/gram and survivors verify exactly. Shares
    * q43's oracle verbatim: the regimes are physically different,
    * bit-identical by contract, and the driver checks that claim
    * hash-exact.
    */
  def q50DecontaminationBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val bench = docs.filter(pmod(col("doc_id"), lit(97L)) === 0L)
    Decontamination.reportWithBloom(
      docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L),
      bench.select(explode(Decontamination.distinctNgrams(col("text"), 3)).as("g")).distinct(),
      "text", "doc_id")
      .orderBy("doc_id")
  }

  /** q52: FUZZY decontamination ([[Decontamination.fuzzyReport]]) —
    * corpus documents (doc_id % 5 != 0) near-duplicate (trigram
    * Jaccard >= 0.8) to an evaluation document (doc_id % 5 = 0),
    * via cross-corpus banded MinHash + exact verification. The
    * oracle recomputes the full cross Jaccard from first
    * principles; at 16x2 banding the candidate-miss odds at the
    * fixture's J >= 0.89 pairs are < 1e-10, so the LSH path equals
    * the exhaustive join hash-exact.
    */
  def q52FuzzyDecontamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    Decontamination.fuzzyReport(
      docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0L),
      docs.filter(pmod(col("doc_id"), lit(5L)) === 0L),
      "text", "doc_id")
      .orderBy("doc_id", "bench_id")
  }

  val q52Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents
      |), ng AS (
      |  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |              JOIN toks c ON a.doc_id = c.doc_id AND c.i = a.i + 2
      |), sizes AS (SELECT doc_id, count(*) n FROM ng GROUP BY doc_id),
      |shared AS (
      |  SELECT a.doc_id AS id_c, b.doc_id AS id_b, count(*) AS c
      |  FROM ng a JOIN ng b ON a.g = b.g
      |  WHERE a.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
      |  GROUP BY 1, 2
      |)
      |SELECT id_c AS doc_id, id_b AS bench_id, c * 1.0 / (sa.n + sb.n - c) AS jaccard
      |FROM shared
      |JOIN sizes sa ON sa.doc_id = id_c
      |JOIN sizes sb ON sb.doc_id = id_b
      |WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
      |ORDER BY doc_id, bench_id""".stripMargin

  /** q54: DSIR importance weights ([[ImportanceResampling]]) — every
    * document scored by its hashed unigram+bigram log importance
    * ratio toward the English subcorpus as the target distribution.
    * Weights are exact integer sums of per-bucket fixed-point
    * log-ratios, so the oracle compares hash-exact (see the operator
    * Scaladoc for the determinism discipline).
    */
  def q54ImportanceWeights(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    ImportanceResampling.weightsReport(
      docs, col("lang") === "en", "text", "doc_id", carry = Seq("lang"))
      .orderBy("doc_id")
  }

  val q54Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, w AS g FROM toks
      |  UNION ALL
      |  SELECT a.doc_id, a.w || ' ' || b.w AS g
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |), bg AS (
      |  SELECT g.doc_id, substr(md5(g.g), 1, 2) AS b, d.lang
      |  FROM grams g JOIN documents d USING (doc_id)
      |), stats AS (
      |  SELECT b, count(*) AS rc,
      |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
      |  FROM bg GROUP BY b
      |), tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM stats),
      |lr AS (
      |  SELECT b, CAST(round((ln((tc + 1.0) / (tt + 256.0)) -
      |                        ln((rc + 1.0) / (rt + 256.0))) * 1e9, 0) AS BIGINT) AS lr_nano
      |  FROM stats CROSS JOIN tot
      |)
      |SELECT bg.doc_id, min(bg.lang) AS lang, count(*) AS n_grams,
      |       CAST(sum(lr.lr_nano) AS BIGINT) AS weight_nano
      |FROM bg JOIN lr USING (b)
      |GROUP BY bg.doc_id
      |ORDER BY bg.doc_id""".stripMargin

  /** q55: bigram-LM perplexity scoring ([[NgramLm]]) — every document
    * scored by the mean negative log-probability an add-one-smoothed
    * bigram model trained on the English subcorpus assigns its
    * bigrams (the CCNet quality signal). Integer microunit sums, so
    * the oracle compares hash-exact; `log_ppl` is one exact integer
    * division on top.
    */
  def q55PerplexityLm(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    NgramLm.perplexityReport(
      docs, col("lang") === "en", "text", "doc_id", carry = Seq("lang"))
      .orderBy("doc_id")
  }

  val q55Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents
      |), ttoks AS (
      |  SELECT t.* FROM toks t JOIN documents d USING (doc_id) WHERE d.lang = 'en'
      |), vc AS (SELECT count(DISTINCT w) AS v FROM ttoks),
      |den AS (
      |  SELECT w AS w1,
      |         CAST(round(ln((count(*) + vc.v) * 1.0) * 1e6, 0) AS BIGINT) AS d_micro
      |  FROM ttoks CROSS JOIN vc GROUP BY w, vc.v
      |), num AS (
      |  SELECT a.w || ' ' || b.w AS g,
      |         CAST(round(ln(count(*) + 1.0) * 1e6, 0) AS BIGINT) AS a_micro
      |  FROM ttoks a JOIN ttoks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |  GROUP BY 1
      |), stream AS (
      |  SELECT a.doc_id, a.w AS w1, a.w || ' ' || b.w AS g
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |), scored AS (
      |  SELECT s.doc_id,
      |         coalesce(num.a_micro, 0) - coalesce(den.d_micro,
      |           (SELECT CAST(round(ln(v * 1.0) * 1e6, 0) AS BIGINT) FROM vc)) AS lp
      |  FROM stream s LEFT JOIN num USING (g) LEFT JOIN den USING (w1)
      |)
      |SELECT sc.doc_id, min(d.lang) AS lang, count(*) AS n_bigrams,
      |       CAST(sum(sc.lp) AS BIGINT) AS lp_micro_sum,
      |       CAST(-sum(sc.lp) AS DOUBLE) / CAST(count(*) * 1000000 AS DOUBLE) AS log_ppl
      |FROM scored sc JOIN documents d USING (doc_id)
      |GROUP BY sc.doc_id
      |ORDER BY sc.doc_id""".stripMargin

  /** q57: seed-trained quality-classifier gate ([[QualityClassifier]])
    * — fit a hashed-gram Naive Bayes on the labeled fifth of the
    * corpus (doc_id % 5 = 1: positive iff English), score EVERY
    * document, and keep via the GPT-3 Pareto-thresholded rule. All
    * logs are rounded once to integer nanounits and the keep decision
    * compares integers, so the oracle reproduces the exact keep set.
    */
  def q57QualityGate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    QualityClassifier.gateReport(
      docs, when(pmod(col("doc_id"), lit(5L)) === 1L, col("lang") === "en"),
      "text", "doc_id", carry = Seq("lang"))
      .orderBy("doc_id")
  }

  val q57Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, w AS g FROM toks
      |  UNION ALL
      |  SELECT a.doc_id, a.w || ' ' || b.w AS g
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |), bg AS (
      |  SELECT doc_id, substr(md5(g), 1, 2) AS b FROM grams
      |), seeds AS (
      |  SELECT doc_id, (lang = 'en') AS pos FROM documents WHERE doc_id % 5 = 1
      |), sstats AS (
      |  SELECT b,
      |         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pc,
      |         sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nc
      |  FROM bg JOIN seeds USING (doc_id) GROUP BY b
      |), tot AS (SELECT sum(pc) AS pt, sum(nc) AS nt FROM sstats),
      |llr AS (
      |  SELECT b, CAST(round((ln((pc + 1.0) / (pt + 256.0)) -
      |                        ln((nc + 1.0) / (nt + 256.0))) * 1e9, 0) AS BIGINT) AS llr_nano
      |  FROM sstats CROSS JOIN tot
      |), consts AS (
      |  SELECT CAST(round((ln((np + 1.0) / (np + nn + 2.0)) -
      |                     ln((nn + 1.0) / (np + nn + 2.0))) * 1e9, 0) AS BIGINT) AS prior_nano,
      |         (SELECT CAST(round((ln(1.0 / (pt + 256.0)) -
      |                             ln(1.0 / (nt + 256.0))) * 1e9, 0) AS BIGINT)
      |          FROM tot) AS unseen_nano
      |  FROM (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
      |               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
      |        FROM seeds)
      |), scored AS (
      |  SELECT bg.doc_id, count(*) AS n_grams,
      |         CAST(sum(coalesce(llr.llr_nano, (SELECT unseen_nano FROM consts))) +
      |              (SELECT prior_nano FROM consts) AS BIGINT) AS score_nano
      |  FROM bg LEFT JOIN llr USING (b)
      |  GROUP BY bg.doc_id
      |), gated AS (
      |  SELECT s.doc_id, d.lang, s.n_grams, s.score_nano,
      |         CAST(round(1e9 / (1.0 + exp(-(s.score_nano / 1e9))), 0) AS BIGINT) AS prob_nano,
      |         CAST(round((pow(1.0 - ((((s.doc_id * 48271 + 41) % 2147483647)
      |                                  * 48271 % 2147483647) * 48271 % 2147483647 + 0.5)
      |                               / 2147483647.0, -1.0 / 9.0) - 1.0) * 1e9, 0) AS BIGINT)
      |           AS pareto_nano
      |  FROM scored s JOIN documents d USING (doc_id)
      |)
      |SELECT doc_id, lang, n_grams, score_nano, prob_nano,
      |       pareto_nano > 1000000000 - prob_nano AS keep
      |FROM gated
      |ORDER BY doc_id""".stripMargin

  /** q58: gate-then-pack — the NB quality gate ([[QualityClassifier]],
    * q57's configuration) feeding sequence packing of the SURVIVORS
    * into 1024-token training bins per language, in ONE corpus scan:
    * the gate's report already carries the exact token count
    * (`n_tokens = (n_grams + 1) div 2` — the gram stream is unigrams
    * + bigrams = 2n - 1), so packing never re-reads text and never
    * joins back to the corpus. The 100 TB shape of a curation tail:
    * corpus text is touched exactly once, every later stage is
    * doc-grain arithmetic. Packing runs the window form here —
    * language strata are few and balanced, and it is the DuckDB
    * oracle's exact algebra; a dominant-stratum corpus passes
    * `distributed = true` for the bit-identical chunked prefix sum
    * (ScaleBench's `gate_pack` measures that form).
    */
  def q58GatePack(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val gated = QualityClassifier.gateReport(
      docs, when(pmod(col("doc_id"), lit(5L)) === 1L, col("lang") === "en"),
      "text", "doc_id", carry = Seq("lang"))
    val survivors = gated
      .filter(col("keep"))
      .withColumn("n_tokens", expr("(n_grams + 1) div 2"))
    SequencePacking.packedBinsFromCounts(
        survivors, "n_tokens", "lang", "doc_id", capacity = 1024)
      .orderBy("lang", "bin")
  }

  /** q57's CTE chain through `gated`, then the q40 packing algebra
    * over the keep set, partitioned by language.
    */
  val q58Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, w AS g FROM toks
      |  UNION ALL
      |  SELECT a.doc_id, a.w || ' ' || b.w AS g
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |), bg AS (
      |  SELECT doc_id, substr(md5(g), 1, 2) AS b FROM grams
      |), seeds AS (
      |  SELECT doc_id, (lang = 'en') AS pos FROM documents WHERE doc_id % 5 = 1
      |), sstats AS (
      |  SELECT b,
      |         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pc,
      |         sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nc
      |  FROM bg JOIN seeds USING (doc_id) GROUP BY b
      |), tot AS (SELECT sum(pc) AS pt, sum(nc) AS nt FROM sstats),
      |llr AS (
      |  SELECT b, CAST(round((ln((pc + 1.0) / (pt + 256.0)) -
      |                        ln((nc + 1.0) / (nt + 256.0))) * 1e9, 0) AS BIGINT) AS llr_nano
      |  FROM sstats CROSS JOIN tot
      |), consts AS (
      |  SELECT CAST(round((ln((np + 1.0) / (np + nn + 2.0)) -
      |                     ln((nn + 1.0) / (np + nn + 2.0))) * 1e9, 0) AS BIGINT) AS prior_nano,
      |         (SELECT CAST(round((ln(1.0 / (pt + 256.0)) -
      |                             ln(1.0 / (nt + 256.0))) * 1e9, 0) AS BIGINT)
      |          FROM tot) AS unseen_nano
      |  FROM (SELECT sum(CASE WHEN pos THEN 1 ELSE 0 END) AS np,
      |               sum(CASE WHEN pos THEN 0 ELSE 1 END) AS nn
      |        FROM seeds)
      |), scored AS (
      |  SELECT bg.doc_id, count(*) AS n_grams,
      |         CAST(sum(coalesce(llr.llr_nano, (SELECT unseen_nano FROM consts))) +
      |              (SELECT prior_nano FROM consts) AS BIGINT) AS score_nano
      |  FROM bg LEFT JOIN llr USING (b)
      |  GROUP BY bg.doc_id
      |), gated AS (
      |  SELECT s.doc_id, d.lang, s.n_grams,
      |         CAST(round(1e9 / (1.0 + exp(-(s.score_nano / 1e9))), 0) AS BIGINT) AS prob_nano,
      |         CAST(round((pow(1.0 - ((((s.doc_id * 48271 + 41) % 2147483647)
      |                                  * 48271 % 2147483647) * 48271 % 2147483647 + 0.5)
      |                               / 2147483647.0, -1.0 / 9.0) - 1.0) * 1e9, 0) AS BIGINT)
      |           AS pareto_nano
      |  FROM scored s JOIN documents d USING (doc_id)
      |), kept AS (
      |  SELECT doc_id, lang, (n_grams + 1) // 2 AS n_tokens
      |  FROM gated WHERE pareto_nano > 1000000000 - prob_nano
      |), o AS (
      |  SELECT doc_id, lang, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset
      |  FROM kept
      |)
      |SELECT lang, CAST(floor(start_offset / 1024.0) AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  min(doc_id) AS first_id, max(doc_id) AS last_id
      |FROM o
      |GROUP BY lang, bin
      |ORDER BY lang, bin""".stripMargin

  /** q59: DSIR selection end-to-end — importance weights (q54's
    * configuration) + deterministic Gumbel top-k resampling
    * ([[ImportanceResampling.gumbelTopK]]): keep the 100 documents
    * with the largest `weight + Gumbel(md5-derived u)` keys. The
    * Gumbel u is 52 exact mantissa bits from the md5 of
    * `seed:doc_id` (13 hex chars), so both engines compute the
    * identical double key and the selected SET matches bit-for-bit —
    * the sampling step itself is oracle-checked, not just the
    * weights.
    */
  def q59Resample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val w = ImportanceResampling.weightsReport(
      docs, col("lang") === "en", "text", "doc_id", carry = Seq("lang"))
    ImportanceResampling.gumbelTopK(w, "doc_id", k = 100, seed = 42L)
      .orderBy("doc_id")
  }

  val q59Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         generate_subscripts(string_split(text, ' '), 1) AS i
      |  FROM documents
      |), grams AS (
      |  SELECT doc_id, w AS g FROM toks
      |  UNION ALL
      |  SELECT a.doc_id, a.w || ' ' || b.w AS g
      |  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.i = a.i + 1
      |), bg AS (
      |  SELECT g.doc_id, substr(md5(g.g), 1, 2) AS b, d.lang
      |  FROM grams g JOIN documents d USING (doc_id)
      |), stats AS (
      |  SELECT b, count(*) AS rc,
      |         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS tc
      |  FROM bg GROUP BY b
      |), tot AS (SELECT sum(rc) AS rt, sum(tc) AS tt FROM stats),
      |lr AS (
      |  SELECT b, CAST(round((ln((tc + 1.0) / (tt + 256.0)) -
      |                        ln((rc + 1.0) / (rt + 256.0))) * 1e9, 0) AS BIGINT) AS lr_nano
      |  FROM stats CROSS JOIN tot
      |), wts AS (
      |  SELECT bg.doc_id, min(bg.lang) AS lang, count(*) AS n_grams,
      |         CAST(sum(lr.lr_nano) AS BIGINT) AS weight_nano
      |  FROM bg JOIN lr USING (b)
      |  GROUP BY bg.doc_id
      |), keyed AS (
      |  SELECT doc_id, lang, n_grams, weight_nano,
      |         CAST(weight_nano AS DOUBLE) +
      |         round(-ln(-ln((CAST('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 13)
      |                             AS BIGINT) + 0.5) / 4503599627370496.0)) * 1e9, 0) AS gk
      |  FROM wts
      |)
      |SELECT doc_id, lang, n_grams, weight_nano FROM (
      |  SELECT doc_id, lang, n_grams, weight_nano
      |  FROM keyed ORDER BY gk DESC, doc_id LIMIT 100
      |)
      |ORDER BY doc_id""".stripMargin

  /** q68: corpus data card ([[graft.text.DataCard.report]]) — the
    * per-(source, lang) release summary: doc counts, corpus-wide
    * exact-dup share, exact token distribution, nano-exact quality
    * sums. Every double in the output is either a division of exact
    * BIGINTs or the exact interpolated percentile both engines
    * compute identically (q10 discipline).
    */
  def q68DataCard(spark: SparkSession, dir: String): DataFrame =
    graft.text.DataCard.report(
      Sources.documents(spark, dir), "text", "doc_id", Seq("source", "lang"))
      .orderBy("source", "lang")

  val q68Sql: String = {
    val stops = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    s"""WITH perdoc AS (
       |  SELECT doc_id, source, lang, text,
       |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stops))) AS DOUBLE) AS ns,
       |    md5(text) AS fp
       |  FROM documents
       |), q AS (
       |  SELECT doc_id, source, lang, CAST(nt AS INT) AS nti, fp,
       |    CAST(round((least(nt / 50.0, 1.0) * (1.0 - ns / nt) *
       |      (CASE WHEN (CAST(length(text) AS DOUBLE) - (nt - 1)) / nt BETWEEN 3.0 AND 10.0
       |            THEN 1.0 ELSE 0.5 END)) * 1000000000.0) AS BIGINT) AS qn
       |  FROM perdoc
       |), copies AS (SELECT fp, count(*) AS c FROM q GROUP BY 1)
       |SELECT source, lang,
       |  count(*) AS n_docs,
       |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       |  CAST(sum(nti) AS BIGINT) AS sum_tokens,
       |  CAST(sum(nti) AS DOUBLE) / count(*) AS mean_tokens,
       |  quantile_cont(nti, 0.5) AS p50_tokens,
       |  CAST(max(nti) AS INT) AS max_tokens,
       |  CAST(sum(qn) AS BIGINT) AS sum_quality_nano
       |FROM q JOIN copies USING (fp)
       |GROUP BY source, lang
       |ORDER BY source, lang""".stripMargin
  }

  /** q69: deterministic curriculum interleave
    * ([[graft.ops.Curriculum.interleave]]) — the proportional
    * round-robin training order from per-source MINSTD ranks and
    * fractional positions; the whole manifest is reproduced in DuckDB
    * from the same integer arithmetic.
    */
  def q69Curriculum(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Curriculum.interleave(
      Sources.documents(spark, dir), "doc_id", "source", seed = 12345L)

  val q69Sql: String =
    """WITH s AS (
      |  SELECT doc_id, source,
      |    ((((doc_id * 48271 + 12345) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647) AS score
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY score, doc_id) AS INT) AS src_rank,
      |    count(*) OVER (PARTITION BY source) AS n_s
      |  FROM s
      |)
      |SELECT doc_id, source, src_rank,
      |  (CAST(src_rank AS DOUBLE) - 0.5) / CAST(n_s AS DOUBLE) AS pos_key
      |FROM r
      |ORDER BY pos_key, doc_id""".stripMargin

  /** q70: corpus release diff ([[graft.ops.SnapshotDiff.diff]]) — the
    * incremental-curation primitive. The "next" release is derived
    * deterministically from the fixture: docs `% 7 = 0` removed,
    * `% 5 = 0` edited (token appended), `% 11 = 0` re-published under
    * a shifted id as additions — every status is exercised.
    */
  def q70SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir).select("doc_id", "text")
    val kept = docs.filter(col("doc_id") % 7 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 5 === 0, concat(col("text"), lit(" updated")))
          .otherwise(col("text")))
    val added = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" new")).as("text"))
    graft.ops.SnapshotDiff.diff(docs, kept.unionByName(added), "text", "doc_id")
      .orderBy("doc_id")
  }

  val q70Sql: String =
    """WITH prev AS (SELECT doc_id, md5(text) AS fa FROM documents),
      |nxt AS (
      |  SELECT doc_id,
      |    md5(CASE WHEN doc_id % 5 = 0 THEN text || ' updated' ELSE text END) AS fb
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, md5(text || ' new') FROM documents WHERE doc_id % 11 = 0
      |)
      |SELECT coalesce(p.doc_id, n.doc_id) AS doc_id,
      |  CASE WHEN p.doc_id IS NULL THEN 'added'
      |       WHEN n.doc_id IS NULL THEN 'removed'
      |       WHEN fa IS NOT DISTINCT FROM fb THEN 'unchanged' ELSE 'changed' END AS status
      |FROM prev p FULL OUTER JOIN nxt n ON p.doc_id = n.doc_id
      |ORDER BY doc_id""".stripMargin

  /** q71: epoch-based source upsampling
    * ([[graft.ops.Sampling.epochMix]]) — the "epochs per source"
    * mixing table realized as a repeat manifest. Four sources carry
    * all the weight (the rest drop); the budget is sized so factors
    * straddle 1.0 both ways, exercising whole-epoch repeats AND the
    * fractional MINSTD pass. DuckDB reproduces the exact manifest
    * from the same IEEE-754/integer arithmetic.
    */
  private val EpochWeights =
    Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1)

  def q71EpochMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochMix(
      Sources.documents(spark, dir)
        .withColumn("n_tokens", size(split(col("text"), " "))),
      "doc_id", "source", "n_tokens",
      weights = EpochWeights, tokenBudget = 200000L, seed = 5L)
      .orderBy("doc_id", "copy_idx")

  val q71Sql: String = {
    // The engine NORMALIZES weights by their (floating) sum — which
    // for these literals is 1.0000000000000002, not 1.0 — so the
    // oracle must use the SAME normalized doubles bit-for-bit:
    // Scala's shortest-round-trip Double.toString parses back to the
    // identical IEEE-754 value under DuckDB's correctly-rounded
    // decimal conversion.
    val wSum = EpochWeights.values.sum
    val cases = EpochWeights.toSeq.sorted
      .map { case (s, w) => s"WHEN '$s' THEN ${w / wSum}" }.mkString(" ")
    s"""WITH t AS (
      |  SELECT source,
      |    CAST(sum(len(string_split(text, ' '))) AS DOUBLE) AS ts,
      |    CASE source $cases ELSE 0.0 END AS w
      |  FROM documents GROUP BY source
      |), r AS (""".stripMargin + "\n" +
    """  SELECT source,
      |    CAST(floor(w * 200000.0 / ts) AS INT) AS ne,
      |    CAST(floor((w * 200000.0 / ts - floor(w * 200000.0 / ts)) * 2147483647.0) AS BIGINT) AS thr
      |  FROM t WHERE w > 0 AND ts > 0
      |), d AS (
      |  SELECT doc_id, source,
      |    ne + CASE WHEN (((doc_id * 48271 + 5) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647 < thr
      |              THEN 1 ELSE 0 END AS reps
      |  FROM documents JOIN r USING (source)
      |)
      |SELECT doc_id, source, CAST(unnest(generate_series(1, reps)) AS INT) AS copy_idx
      |FROM d WHERE reps >= 1
      |ORDER BY doc_id, copy_idx""".stripMargin
  }

  private val SplitFractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** q72: leakage-safe train/val/test split
    * ([[graft.ops.Splits.assign]]) — split assignment as a pure
    * function of the exact-dup CLUSTER canonical, so duplicate
    * content can never straddle train and eval. The corpus's real
    * duplicate groups exercise the cohesion; DuckDB reproduces the
    * canonical table, the MINSTD scores, and the integer thresholds
    * exactly.
    */
  def q72LeakSafeSplit(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Splits.assign(
      Sources.documents(spark, dir), "text", "doc_id", SplitFractions, seed = 21L)
      .orderBy("doc_id")

  val q72Sql: String = {
    // thresholds from the SAME normalized floating arithmetic the
    // engine uses, embedded as exact integer literals
    val th = graft.ops.Splits.thresholdTable(SplitFractions)
    val cases = th.init.map { case (n, t) => s"WHEN sc < $t THEN '$n'" }.mkString(" ")
    s"""WITH fp AS (SELECT doc_id, md5(text) AS f FROM documents),
       |can AS (SELECT f, min(doc_id) AS canonical_id FROM fp GROUP BY 1),
       |j AS (SELECT fp.doc_id, can.canonical_id FROM fp JOIN can USING (f)),
       |s AS (
       |  SELECT doc_id, canonical_id,
       |    (((canonical_id * 48271 + 21) % 2147483647) * 48271 % 2147483647) * 48271 % 2147483647 AS sc
       |  FROM j
       |)
       |SELECT doc_id, canonical_id, CASE $cases ELSE '${th.last._1}' END AS split
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** q74: deterministic seeded corpus shuffle
    * ([[graft.ops.CorpusShuffle]]) — the replayable global training
    * order. The oracle recomputes the identical md5 permutation key
    * and checks BOTH the per-shard rank and the decomposed global
    * position (`shard_base + shard_pos`) against a plain global
    * `row_number() OVER (ORDER BY key)` — proving the sharded
    * (scale) form equals the one-task form it replaces.
    */
  def q74CorpusShuffle(spark: SparkSession, dir: String): DataFrame =
    graft.ops.CorpusShuffle.shuffled(
      Sources.documents(spark, dir).select("doc_id"), "doc_id", seed = "graft", shardChars = 2)
      .orderBy("doc_id")

  val q74Sql: String =
    """WITH k AS (
      |  SELECT doc_id, md5('graft:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |  FROM documents
      |)
      |SELECT doc_id, shuffle_key, substr(shuffle_key, 1, 2) AS shard,
      |  CAST(row_number() OVER (PARTITION BY substr(shuffle_key, 1, 2)
      |                          ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS shard_pos,
      |  CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS BIGINT) AS global_pos
      |FROM k
      |ORDER BY doc_id""".stripMargin

  /** q75: length-bucketed batch manifest
    * ([[graft.text.LengthBatching.batchSummary]]) — similar-length
    * documents batched together so padding cost is per-batch max, not
    * corpus max. Integer bucketing + rank arithmetic and an exact
    * IEEE ratio, all reproduced by DuckDB.
    */
  def q75LengthBatching(spark: SparkSession, dir: String): DataFrame =
    graft.text.LengthBatching.batchSummary(
      Sources.documents(spark, dir), "text", "doc_id", bucketWidth = 32, batchSize = 16)
      .orderBy("bucket", "batch_id")

  val q75Sql: String =
    """WITH t AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), b AS (
      |  SELECT doc_id, n_tokens, n_tokens // 32 AS bucket,
      |    (row_number() OVER (PARTITION BY n_tokens // 32 ORDER BY doc_id) - 1) // 16 AS batch_id
      |  FROM t
      |)
      |SELECT bucket, batch_id,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  max(n_tokens) AS max_tokens,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  CAST(count(*) * max(n_tokens) AS BIGINT) AS padded_tokens,
      |  CAST(sum(n_tokens) AS DOUBLE) / CAST(count(*) * max(n_tokens) AS DOUBLE) AS pad_efficiency
      |FROM b
      |GROUP BY bucket, batch_id
      |ORDER BY bucket, batch_id""".stripMargin

  /** q77: the CORPUS RELEASE composition — the whole curation tail as
    * one declarative plan, each stage an operator this engine already
    * oracles in isolation: exact-dedup canonical keep (q21/q72's md5
    * grouping), the Gopher quality gate (q42, via the production
    * [[QualityFilters.gophered]] fenced form), benchmark
    * decontamination removal (q46's slice convention), then the
    * seeded shard-decomposed training-order shuffle (q74) over the
    * survivors. Every per-doc stage commutes with restriction, so
    * DuckDB reproduces the exact released row set AND its permutation
    * ranks by chaining the four stages' oracle CTEs.
    */
  def q77CorpusRelease(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Sources.documents(spark, dir)
    // stage 1: exact dedup — keep the smallest doc_id per md5(text)
    // group, computed over the FULL corpus (a bench-slice canonical
    // suppresses its corpus-side copies; deliberate and mirrored in
    // the oracle)
    val w = Window.partitionBy(md5(col("text").cast("binary"))).orderBy(col("doc_id"))
    val canonical = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // stage 2: quality gate on the corpus side of the bench split
    val gated = QualityFilters
      .gophered(canonical.filter(pmod(col("doc_id"), lit(97L)) =!= 0L), "text")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    // stage 3: decontamination removal vs the RAW bench slice (the
    // eval set is what it is — dup or low-quality bench docs still
    // contaminate)
    val released = Decontamination.decontaminated(
      gated, docs.filter(pmod(col("doc_id"), lit(97L)) === 0L), "text", "doc_id")
    // stage 4: replayable training order over the survivors
    graft.ops.CorpusShuffle
      .shuffled(released.select("doc_id", "lang", "source"), "doc_id", seed = "release")
      .select(col("doc_id"), col("lang"), col("source"), col("shard"), col("global_pos"))
      .orderBy("doc_id")
  }

  val q77Sql: String = {
    val stops = TextAnalysis.stopwords("en").map(w => s"'$w'").mkString(", ")
    val bigrams = "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
    s"""WITH fp AS (
       |  SELECT doc_id, md5(text) AS f FROM documents
       |), can AS (
       |  SELECT f, min(doc_id) AS canonical FROM fp GROUP BY f
       |), dedup AS (
       |  SELECT fp.doc_id FROM fp JOIN can USING (f) WHERE fp.doc_id = can.canonical
       |), t AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
       |), s AS (
       |  SELECT doc_id,
       |    CAST(len(toks) AS INT) AS n_tokens,
       |    CAST(len(toks) AS DOUBLE) AS nt,
       |    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS dup_token_frac,
       |    CAST(list_max(list_transform(list_distinct(toks),
       |        t2 -> len(list_filter(toks, x -> x = t2)))) AS DOUBLE)
       |      / CAST(len(toks) AS DOUBLE) AS top_token_frac,
       |    CASE WHEN len(toks) >= 2 THEN
       |      CAST(list_max(list_transform(list_distinct($bigrams),
       |          g -> len(list_filter($bigrams, x -> x = g)))) AS DOUBLE)
       |        / CAST(len(toks) - 1 AS DOUBLE)
       |      ELSE 0.0 END AS top_bigram_frac,
       |    (CAST(length(text) AS DOUBLE) - (CAST(len(toks) AS DOUBLE) - 1.0))
       |      / CAST(len(toks) AS DOUBLE) AS mean_tok_len,
       |    CAST(len(list_distinct(list_filter(toks, x -> x IN ($stops)))) AS INT) AS n_stop_distinct
       |  FROM t
       |), qkeep AS (
       |  SELECT doc_id FROM s
       |  WHERE n_tokens BETWEEN ${QualityFilters.MinTokens} AND ${QualityFilters.MaxTokens}
       |    AND dup_token_frac <= ${QualityFilters.MaxDupTokenFrac}
       |    AND top_token_frac <= ${QualityFilters.MaxTopTokenFrac}
       |    AND top_bigram_frac <= ${QualityFilters.MaxTopBigramFrac}
       |    AND mean_tok_len BETWEEN ${QualityFilters.MinMeanTokLen} AND ${QualityFilters.MaxMeanTokLen}
       |    AND n_stop_distinct >= ${QualityFilters.MinDistinctStopwords}
       |), ng AS (
       |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
       |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
       |  FROM t WHERE len(toks) >= 3
       |), bench AS (
       |  SELECT DISTINCT unnest(gs) AS g FROM ng WHERE doc_id % 97 = 0
       |), corpus AS (
       |  SELECT doc_id, len(gs) AS n_ngrams, unnest(gs) AS g FROM ng WHERE doc_id % 97 <> 0
       |), flagged AS (
       |  SELECT doc_id
       |  FROM corpus WHERE g IN (SELECT g FROM bench)
       |  GROUP BY doc_id, n_ngrams
       |  HAVING CAST(count(*) AS DOUBLE) / CAST(n_ngrams AS DOUBLE) >= 0.05
       |), released AS (
       |  SELECT d.doc_id, d.lang, d.source FROM documents d
       |  WHERE d.doc_id % 97 <> 0
       |    AND d.doc_id IN (SELECT doc_id FROM dedup)
       |    AND d.doc_id IN (SELECT doc_id FROM qkeep)
       |    AND d.doc_id NOT IN (SELECT doc_id FROM flagged)
       |), k AS (
       |  SELECT doc_id, lang, source,
       |    md5('release:' || CAST(doc_id AS VARCHAR)) AS skey
       |  FROM released
       |)
       |SELECT doc_id, lang, source, substr(skey, 1, 2) AS shard,
       |  CAST(row_number() OVER (ORDER BY skey, doc_id) - 1 AS BIGINT) AS global_pos
       |FROM k
       |ORDER BY doc_id""".stripMargin
  }

  /** q78: per-suite decontamination attribution
    * ([[Decontamination.reportBySuite]]) — q43's bench slice, but each
    * bench document's `source` is its benchmark suite: one row per
    * (contaminated doc, suite) saying WHICH benchmark it leaks from
    * and how much. Pure integer counts + one IEEE ratio, hash-exact.
    */
  def q78DecontaminationSuites(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    Decontamination.reportBySuite(
      docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L),
      docs.filter(pmod(col("doc_id"), lit(97L)) === 0L),
      "text", "doc_id", suiteCol = "source")
      .orderBy("doc_id", "suite")
  }

  val q78Sql: String =
    """WITH docs AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), ng AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
      |  FROM docs WHERE len(toks) >= 3
      |), bench AS (
      |  SELECT DISTINCT d2.source AS suite, b.g
      |  FROM (SELECT doc_id, unnest(gs) AS g FROM ng WHERE doc_id % 97 = 0) b
      |  JOIN documents d2 USING (doc_id)
      |), corpus AS (
      |  SELECT doc_id, len(gs) AS n_ngrams, unnest(gs) AS g FROM ng WHERE doc_id % 97 <> 0
      |)
      |SELECT c.doc_id, b.suite,
      |  CAST(max(c.n_ngrams) AS INT) AS n_ngrams,
      |  CAST(count(*) AS BIGINT) AS n_hits,
      |  CAST(count(*) AS DOUBLE) / CAST(max(c.n_ngrams) AS DOUBLE) AS overlap_frac,
      |  CAST(CAST(count(*) AS DOUBLE) / CAST(max(c.n_ngrams) AS DOUBLE) >= 0.05 AS INT) AS flagged
      |FROM corpus c JOIN bench b USING (g)
      |GROUP BY c.doc_id, b.suite
      |ORDER BY doc_id, suite""".stripMargin

  /** q79: packed-bin MATERIALIZATION ([[SequencePacking
    * .materializedBins]]) — q40's manifest plus the md5 of each bin's
    * concatenated document tape in layout order: the trainer-facing
    * artifact, whole-layout oracle-checked (DuckDB rebuilds the tape
    * with `string_agg(text ORDER BY doc_id)` inside the same bins).
    */
  def q79BinTape(spark: SparkSession, dir: String): DataFrame =
    SequencePacking.materializedBins(
      Sources.documents(spark, dir), "text", "source", "doc_id", capacity = 2048)
      .orderBy("source", "bin")

  val q79Sql: String =
    """WITH t AS (
      |  SELECT doc_id, source, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), o AS (
      |  SELECT doc_id, source, text, n_tokens,
      |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset
      |  FROM t
      |)
      |SELECT source, CAST(floor(start_offset / 2048.0) AS BIGINT) AS bin,
      |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
      |  min(doc_id) AS first_id, max(doc_id) AS last_id,
      |  md5(string_agg(text, ' ' ORDER BY doc_id)) AS tape_fp
      |FROM o
      |GROUP BY source, bin
      |ORDER BY source, bin""".stripMargin

  // ------------------------------------------------------ BPE counts
  // q80/q81 pack and batch by TRAINED-TOKENIZER token count — the unit
  // an accelerator actually pays — with the model fit on the corpus
  // itself (numMerges = 8, maxVocab far above this fixture's distinct
  // word count so the cap never binds and the oracle can replicate the
  // fit uncapped). The DuckDB oracle re-derives the ENTIRE tokenizer:
  // 8 unrolled merge rounds, each = overlap-counted adjacent-pair
  // frequencies (weighted by word freq), argmax by (count DESC, lhs,
  // rhs) requiring count >= 2 (the published stopping rule), then a
  // greedy left-to-right non-overlapping fuse via the run-parity
  // window trick (consecutive matches only arise when lhs = rhs, and
  // greedy keeps even offsets within each run). Per the classic BPE
  // identity — a newly fused symbol can only appear in LATER merges —
  // the fit's final per-word segmentation equals the encode path's
  // lowest-rank-first segmentation ([[graft.text.BpeStats
  // .segmentWord]]), so `len(syms)` after round 8 IS `n_bpe_tokens`
  // per word (BpeCountPackingSpec pins the fit==encode equality in
  // Scala; the oracle run pins Scala==SQL). MATERIALIZED keeps DuckDB
  // from exponentially inlining the round chain.
  private val bpeNumMerges = 8

  private def bpeMergeRoundSql(k: Int): String = {
    val p = s"seg${k - 1}"
    s"""p$k AS MATERIALIZED (
       |  SELECT syms[i] AS l, syms[i+1] AS r, SUM(freq) AS c
       |  FROM $p, unnest(range(1, len(syms))) AS t(i) GROUP BY 1, 2
       |),
       |b$k AS MATERIALIZED (SELECT l, r FROM p$k WHERE c >= 2 ORDER BY c DESC, l, r LIMIT 1),
       |pos$k AS MATERIALIZED (
       |  SELECT w, freq, t.i, syms[t.i] AS s, syms[t.i+1] AS nxt,
       |    COALESCE(syms[t.i] = (SELECT l FROM b$k) AND syms[t.i+1] = (SELECT r FROM b$k), FALSE) AS m
       |  FROM $p, unnest(range(1, len(syms)+1)) AS t(i)
       |),
       |run$k AS MATERIALIZED (
       |  SELECT *, CASE WHEN m THEN i - ROW_NUMBER() OVER (PARTITION BY w, m ORDER BY i) END AS rid FROM pos$k
       |),
       |sel$k AS MATERIALIZED (
       |  SELECT *, m AND ((i - MIN(i) OVER (PARTITION BY w, rid)) % 2 = 0) AS sel FROM run$k
       |),
       |seg$k AS MATERIALIZED (
       |  SELECT w, freq, list(CASE WHEN sel THEN s || nxt ELSE s END ORDER BY i) AS syms
       |  FROM (SELECT *, COALESCE(LAG(sel) OVER (PARTITION BY w ORDER BY i), FALSE) AS absorbed FROM sel$k)
       |  WHERE NOT absorbed GROUP BY w, freq
       |)""".stripMargin
  }

  /** CTE chain ending in `bpe_doc(doc_id, source, n_tokens)` — the
    * per-document BPE token count, wordless documents counting 0.
    */
  private def bpeDocCountsSql: String = {
    val rounds = (1 to bpeNumMerges).map(bpeMergeRoundSql).mkString(",\n")
    s"""WITH wf AS MATERIALIZED (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE len(w) > 0 GROUP BY w
       |),
       |seg0 AS MATERIALIZED (
       |  SELECT w, freq, list_append(string_split(w, ''), '</w>') AS syms FROM wf
       |),
       |$rounds,
       |nsub AS MATERIALIZED (SELECT w, CAST(len(syms) AS BIGINT) AS n_sub FROM seg$bpeNumMerges),
       |docw AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |),
       |bpe_doc AS (
       |  SELECT d.doc_id, d.source, COALESCE(s.n, 0) AS n_tokens
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS n
       |    FROM docw JOIN nsub USING (w) WHERE len(w) > 0 GROUP BY doc_id
       |  ) s USING (doc_id)
       |)""".stripMargin
  }

  /** q80: sequence packing by BPE token count
    * ([[SequencePacking.packedBinsByBpe]]) — q40's manifest with the
    * counts a trained tokenizer produces instead of whitespace words.
    */
  def q80BpePacking(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val model = graft.text.BpeTokenizer.fit(docs, "text", numMerges = bpeNumMerges, maxVocab = 100000)
    SequencePacking.packedBinsByBpe(docs, "text", "source", "doc_id", capacity = 2048, model)
      .orderBy("source", "bin")
  }

  val q80Sql: String =
    s"""$bpeDocCountsSql,
       |o AS (
       |  SELECT doc_id, source, n_tokens,
       |    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_offset
       |  FROM bpe_doc
       |)
       |SELECT source, CAST(floor(start_offset / 2048.0) AS BIGINT) AS bin,
       |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       |  min(doc_id) AS first_id, max(doc_id) AS last_id
       |FROM o
       |GROUP BY source, bin
       |ORDER BY source, bin""".stripMargin

  /** q81: length-bucketed batching by BPE token count
    * ([[LengthBatching.batchSummaryByBpe]]) — q75's manifest with
    * buckets, padded cost, and efficiency measured in trained
    * tokenizer tokens.
    */
  def q81BpeLengthBatching(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val model = graft.text.BpeTokenizer.fit(docs, "text", numMerges = bpeNumMerges, maxVocab = 100000)
    graft.text.LengthBatching.batchSummaryByBpe(
      docs, "text", "doc_id", model, bucketWidth = 64, batchSize = 16)
      .orderBy("bucket", "batch_id")
  }

  val q81Sql: String =
    s"""$bpeDocCountsSql,
       |b AS (
       |  SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
       |    (row_number() OVER (PARTITION BY n_tokens // 64 ORDER BY doc_id) - 1) // 16 AS batch_id
       |  FROM bpe_doc
       |)
       |SELECT bucket, batch_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  max(n_tokens) AS max_tokens,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(count(*) * max(n_tokens) AS BIGINT) AS padded_tokens,
       |  CAST(sum(n_tokens) AS DOUBLE) / CAST(count(*) * max(n_tokens) AS DOUBLE) AS pad_efficiency
       |FROM b
       |GROUP BY bucket, batch_id
       |ORDER BY bucket, batch_id""".stripMargin

  /** q85: tokenizer fertility analytics — per (lang, source) corpus
    * slice, BPE tokens per whitespace word (fertility) and characters
    * per BPE token (compression), the two numbers that decide whether
    * a tokenizer is fit for a corpus slice (fertility spikes on
    * scripts/domains the merges never saw — exactly the gap q80/q81
    * exist to price). Counts come from [[graft.text.BpeTokenizer
    * .countsFromModel]] (vocab-grain merge loop, broadcast join); the
    * DuckDB oracle re-derives the whole fit (the q80 CTE chain), so
    * the match is hash-exact.
    */
  def q85BpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val model = graft.text.BpeTokenizer.fit(docs, "text", numMerges = bpeNumMerges, maxVocab = 100000)
    graft.text.BpeTokenizer.countsFromModel(docs, "text", "doc_id", model)
      .withColumn("__nw", size(filter(split(col("text"), " "), w => length(w) > 0)).cast("long"))
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("sum_words"),
        sum(col("n_bpe_tokens")).as("sum_tokens"),
        // try_divide: an all-wordless (or all-empty) slice must yield
        // NULL like DuckDB's `/`, not an ANSI DIVIDE_BY_ZERO crash
        try_divide(sum(col("n_bpe_tokens")).cast("double"), sum(col("__nw")).cast("double")).as("fertility"),
        try_divide(sum(col("n_chars")).cast("double"), sum(col("n_bpe_tokens")).cast("double")).as("chars_per_token"))
      .orderBy("lang", "source")
  }

  val q85Sql: String =
    s"""$bpeDocCountsSql,
       |d AS (
       |  SELECT b.doc_id, d.lang, b.source, d.n_chars, b.n_tokens,
       |    CAST(len(list_filter(string_split(d.text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_words
       |  FROM bpe_doc b JOIN documents d USING (doc_id)
       |)
       |SELECT lang, source,
       |  count(*) AS n_docs,
       |  CAST(sum(n_words) AS BIGINT) AS sum_words,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  CAST(sum(n_tokens) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE) AS fertility,
       |  CAST(sum(n_chars) AS DOUBLE) / CAST(sum(n_tokens) AS DOUBLE) AS chars_per_token
       |FROM d
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin

  /** q89: chunking by trained-tokenizer budget
    * ([[graft.text.Chunking.chunksByBpe]]) — context-window fills
    * priced in BPE tokens, words never split, crossing-allowed
    * prefix-sum chunk assignment (the packing-manifest convention).
    * The oracle re-derives the tokenizer (q80's CTE chain) and replays
    * the same prefix-sum grouping, including the ordered chunk-text
    * reassembly — hash-exact.
    */
  def q89BpeChunking(spark: SparkSession, dir: String): DataFrame = {
    val docs = Sources.documents(spark, dir)
    val model = graft.text.BpeTokenizer.fit(docs, "text", numMerges = bpeNumMerges, maxVocab = 100000)
    graft.text.Chunking.chunksByBpe(docs, "text", "doc_id", model, budget = 256)
      .orderBy("doc_id", "chunk_idx")
  }

  val q89Sql: String =
    s"""$bpeDocCountsSql,
       |wpos AS (
       |  SELECT doc_id, w, i FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w,
       |           generate_subscripts(string_split(text, ' '), 1) AS i
       |    FROM documents)
       |  WHERE len(w) > 0
       |),
       |wc AS (
       |  SELECT doc_id, i, w, n_sub,
       |    sum(n_sub) OVER (PARTITION BY doc_id ORDER BY i) AS cum
       |  FROM wpos JOIN nsub USING (w)
       |)
       |SELECT doc_id, CAST((cum - n_sub) // 256 AS BIGINT) AS chunk_idx,
       |  count(*) AS n_words,
       |  CAST(sum(n_sub) AS BIGINT) AS n_tokens,
       |  string_agg(w, ' ' ORDER BY i) AS chunk_text
       |FROM wc
       |GROUP BY doc_id, chunk_idx
       |ORDER BY doc_id, chunk_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q89_bpe_chunking" -> (q89BpeChunking _),
    "q85_bpe_fertility" -> (q85BpeFertility _),
    "q80_bpe_packing" -> (q80BpePacking _),
    "q81_bpe_length_batching" -> (q81BpeLengthBatching _),
    "q79_bin_tape" -> (q79BinTape _),
    "q78_decontamination_suites" -> (q78DecontaminationSuites _),
    "q77_corpus_release" -> (q77CorpusRelease _),
    "q74_corpus_shuffle" -> (q74CorpusShuffle _),
    "q75_length_batching" -> (q75LengthBatching _),
    "q72_leak_safe_split" -> (q72LeakSafeSplit _),
    "q71_epoch_mix" -> (q71EpochMix _),
    "q68_data_card" -> (q68DataCard _),
    "q69_curriculum" -> (q69Curriculum _),
    "q70_snapshot_diff" -> (q70SnapshotDiff _),
    "q59_resample" -> (q59Resample _),
    "q58_gate_pack" -> (q58GatePack _),
    "q57_quality_gate" -> (q57QualityGate _),
    "q55_perplexity_lm" -> (q55PerplexityLm _),
    "q54_importance_weights" -> (q54ImportanceWeights _),
    "q52_fuzzy_decontamination" -> (q52FuzzyDecontamination _),
    "q50_decontamination_bloom" -> (q50DecontaminationBloom _),
    "q39_stratified_sample" -> (q39StratifiedSample _),
    "q62_source_cap" -> (q62SourceCap _),
    "q64_quality_topp" -> (q64QualityTopP _),
    "q40_sequence_packing" -> (q40SequencePacking _),
    "q41_pii_scrub" -> (q41PiiScrub _),
    "q42_quality_filters" -> (q42QualityFilters _),
    "q43_decontamination" -> (q43Decontamination _),
    "q44_source_mixing" -> (q44SourceMixing _),
    "q45_corpus_novelty" -> (q45CorpusNovelty _),
    "q46_decontaminated" -> (q46Decontaminated _))

  val oracle: Map[String, String] = Map(
    "q89_bpe_chunking" -> q89Sql,
    "q85_bpe_fertility" -> q85Sql,
    "q80_bpe_packing" -> q80Sql,
    "q81_bpe_length_batching" -> q81Sql,
    "q79_bin_tape" -> q79Sql,
    "q78_decontamination_suites" -> q78Sql,
    "q77_corpus_release" -> q77Sql,
    "q74_corpus_shuffle" -> q74Sql,
    "q75_length_batching" -> q75Sql,
    "q72_leak_safe_split" -> q72Sql,
    "q71_epoch_mix" -> q71Sql,
    "q68_data_card" -> q68Sql,
    "q69_curriculum" -> q69Sql,
    "q70_snapshot_diff" -> q70Sql,
    "q59_resample" -> q59Sql,
    "q58_gate_pack" -> q58Sql,
    "q57_quality_gate" -> q57Sql,
    "q55_perplexity_lm" -> q55Sql,
    "q54_importance_weights" -> q54Sql,
    "q52_fuzzy_decontamination" -> q52Sql,
    "q50_decontamination_bloom" -> q43Sql,
    "q39_stratified_sample" -> q39Sql,
    "q62_source_cap" -> q62Sql,
    "q64_quality_topp" -> q64Sql,
    "q40_sequence_packing" -> q40Sql,
    "q41_pii_scrub" -> q41Sql,
    "q42_quality_filters" -> q42Sql,
    "q43_decontamination" -> q43Sql,
    "q44_source_mixing" -> q44Sql,
    "q45_corpus_novelty" -> q45Sql,
    "q46_decontaminated" -> q46Sql)
}
