package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** DSIR-style importance weighting over hashed n-gram features
  * (Data Selection via Importance Resampling, Xie et al. 2023,
  * public paper): estimate unigram+bigram bucket distributions for a
  * TARGET (high-quality) corpus and the RAW corpus, then score every
  * raw document by its log importance ratio
  * `sum over gram occurrences of log p_target(bucket) - log p_raw(bucket)`
  * and resample toward the target distribution with deterministic
  * Gumbel top-k. The reference pipeline has no counterpart; this is
  * part of the training-data curation pack (SURVEY §5).
  *
  * Feature hashing: bucket = first `hexChars` hex chars of
  * `md5(gram)` — 16^hexChars buckets keyed by the PREFIX STRING
  * itself, so the DuckDB oracle reproduces the bucketing with
  * `substr(md5(g), 1, hexChars)` and no engine-specific integer
  * hashing enters the contract (same md5-pinning idiom as the exact
  * dedup fingerprint, q21).
  *
  * Determinism discipline: log-ratios are computed ONCE PER BUCKET
  * (16^hexChars rows), rounded to integer nanounits
  * (`round(lr * 1e9) :: long`), and per-document weights are then
  * exact INTEGER sums of those fixed-point ratios — no
  * order-dependent floating-point summation anywhere, so the q54
  * oracle compares hash-exact. (ulp-level `ln` disagreement between
  * engines could only surface if a bucket's ratio landed within one
  * ulp of a 0.5-nano rounding boundary — per bucket odds ~1e-7,
  * checked empirically at both test SFs.)
  *
  * Scale shape (the 100 TB story):
  *  - the gram stream is [[GramOccurrences]] — one expression, one
  *    text scan per pass, grams as byte-span views; document text
  *    never crosses an exchange.
  *  - [[fitLogRatios]] is one corpus pass collapsing straight to the
  *    FIXED-SIZE bucket grain (16^hexChars rows) with map-side
  *    combine: one exchange whose width is the bucket count, not the
  *    corpus. Totals ride a single-partition window over that
  *    fixed-size table (256 rows at the default — constant at any
  *    corpus scale).
  *  - [[weights]] is a second corpus pass: grams broadcast-join the
  *    bucket table (<= 16^hexChars rows, always broadcastable) and
  *    collapse to the document grain in the pass's only exchange.
  *    Fit/score as separate passes mirrors [[CorpusStats]]: a
  *    production pipeline snapshots the bucket table per corpus
  *    release and scores many shards/streams against it.
  *  - [[gumbelTopK]] plans `TakeOrderedAndProject` (per-partition
  *    top-k, no global sort) — the resampling step is
  *    selection-sized, never corpus-sorted.
  */
object ImportanceResampling {

  /** Unigram+bigram occurrences as the single-pass
    * [[GramOccurrences]] expression (null text -> null array; fine
    * under `explode`).
    */
  def gramOccurrences(text: Column, maxN: Int = 2): Column =
    ColumnBridge.column(GramOccurrences(ColumnBridge.expression(text), maxN))

  /** Hashed feature bucket of a gram: the first `hexChars` hex chars
    * of its md5 — a string key reproducible verbatim in ANSI SQL.
    */
  def bucketOf(g: Column, hexChars: Int): Column =
    substring(md5(g.cast("binary")), 1, hexChars)

  /** One row per gram occurrence: (`idCol`, bucket `b`). */
  private def bucketStream(
      df: DataFrame, textCol: String, idCol: String, hexChars: Int): DataFrame =
    df.select(col(idCol), explode(gramOccurrences(col(textCol))).as("__g"))
      .select(col(idCol), bucketOf(col("__g"), hexChars).as("b"))

  /** Fit the per-bucket log importance ratios in ONE corpus pass:
    * documents satisfying `isTarget` are the target sample, the whole
    * frame is the raw sample (DSIR's within-corpus selection setup —
    * for a separate target corpus, union it in with the predicate as
    * the membership flag). Add-one smoothing over the 16^hexChars
    * bucket space keeps every ratio finite, including buckets the
    * target never hits.
    *
    * Output: (`b`, `lr_nano`) — one row per OBSERVED bucket,
    * log-ratio in integer nanounits. Buckets absent here were seen by
    * neither sample; when scoring a frame outside the fitted corpus,
    * pass their smoothed constant ratio explicitly
    * ([[unseenBucketNano]]) — self-scoring never needs it.
    */
  def fitLogRatios(
      df: DataFrame,
      isTarget: Column,
      textCol: String,
      hexChars: Int = 2): DataFrame = {
    val buckets = numBuckets(hexChars)
    val stats = df
      .select(isTarget.as("__t"), col(textCol))
      .select(col("__t"), explode(gramOccurrences(col(textCol))).as("__g"))
      .select(col("__t"), bucketOf(col("__g"), hexChars).as("b"))
      .groupBy(col("b"))
      .agg(
        count(lit(1)).as("__rc"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("__tc"))
    // Global totals over the FIXED-SIZE bucket table: a
    // single-partition window over <= 16^hexChars rows is constant
    // work at any corpus scale (and avoids a 1-row nested-loop join,
    // which the suite-wide plan contract forbids).
    val w = Window.partitionBy()
    stats
      .withColumn("__rt", sum(col("__rc")).over(w))
      .withColumn("__tt", sum(col("__tc")).over(w))
      .select(col("b"), lrNano(col("__tc"), col("__tt"), col("__rc"), col("__rt"), buckets))
  }

  private def numBuckets(hexChars: Int): Int = {
    require(hexChars >= 1 && hexChars <= 7, s"hexChars=$hexChars must be in [1, 7]")
    var b = 1
    (0 until hexChars).foreach(_ => b *= 16)
    b
  }

  private def lrNano(tc: Column, tt: Column, rc: Column, rt: Column, buckets: Int): Column =
    round(
      (log((tc + lit(1)).cast("double") / (tt + lit(buckets)).cast("double")) -
        log((rc + lit(1)).cast("double") / (rt + lit(buckets)).cast("double"))) * lit(1e9))
      .cast("long").as("lr_nano")

  /** The smoothed log-ratio of a bucket unseen by BOTH samples, for
    * scoring frames outside the fitted corpus:
    * `ln(1/(targetTotal+B)) - ln(1/(rawTotal+B))`.
    */
  def unseenBucketNano(targetTotal: Long, rawTotal: Long, hexChars: Int = 2): Long = {
    val b = numBuckets(hexChars).toDouble
    math.round((math.log(1.0 / (targetTotal + b)) - math.log(1.0 / (rawTotal + b))) * 1e9)
  }

  /** Per-document importance weights against a fitted (or snapshot)
    * bucket table: one corpus pass, grams broadcast-join `lrTable`
    * on the bucket key and collapse to the document grain.
    *
    * Output: (`idCol`, `n_grams`, `weight_nano`) — occurrence count
    * and the exact integer sum of the document's bucket ratios.
    * `carry` columns (constant per document, e.g. `lang`) ride the
    * aggregate as `min(...)` so they survive without a second join
    * against the corpus.
    *
    * `defaultNano`: ratio for grams whose bucket is missing from
    * `lrTable` (see [[unseenBucketNano]]). Self-scoring — scoring the
    * same frame the table was fitted on — never hits it: every gram's
    * bucket was counted by the fit.
    */
  def weights(
      df: DataFrame,
      lrTable: DataFrame,
      textCol: String,
      idCol: String,
      carry: Seq[String] = Nil,
      hexChars: Int = 2,
      defaultNano: Long = 0L): DataFrame = {
    val carried = carry.map(c => min(col(c)).as(c))
    val aggs = Seq(
      count(lit(1)).as("n_grams"),
      sum(coalesce(col("lr_nano"), lit(defaultNano))).as("weight_nano")) ++ carried
    df.select(col(idCol) +: col(textCol) +: carry.map(col): _*)
      .select(col(idCol) +: explode(gramOccurrences(col(textCol))).as("__g") +: carry.map(col): _*)
      .select(col(idCol) +: bucketOf(col("__g"), hexChars).as("b") +: carry.map(col): _*)
      .join(broadcast(lrTable), Seq("b"), "left")
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** [[fitLogRatios]] + [[weights]] end-to-end — two corpus passes by
    * design (the fit collapses to the fixed bucket grain before the
    * score pass reuses it; see the object Scaladoc for why the passes
    * stay separate at 100 TB).
    */
  def weightsReport(
      df: DataFrame,
      isTarget: Column,
      textCol: String,
      idCol: String,
      carry: Seq[String] = Nil,
      hexChars: Int = 2): DataFrame =
    weights(df, fitLogRatios(df, isTarget, textCol, hexChars),
      textCol, idCol, carry, hexChars)

  /** Deterministic Gumbel top-k resampling over importance weights —
    * sampling k documents WITHOUT replacement with probability
    * proportional to `exp(weight)` (softmax of the log-ratio), per
    * the Gumbel-max trick: `argtop-k(weight + Gumbel noise)`. The
    * noise is derived from `md5(seed || id)` (uniform in (0,1), then
    * `-ln(-ln u)`), so the sample is a pure function of (frame, seed)
    * — reproducible across runs, retries, and cluster layouts.
    *
    * Plans as `TakeOrderedAndProject` (per-partition top-k + driver
    * merge of k-row heads) — no global sort at any corpus size.
    * Ties (impossible in practice: the noise is continuous) break by
    * id for full determinism.
    */
  def gumbelTopK(
      weights: DataFrame,
      idCol: String,
      k: Int,
      seed: Long = 42L): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    // 13 hex chars = 52 bits: exactly representable in a double, and
    // (v + 0.5) / 2^52 keeps u strictly inside (0,1).
    val u = (conv(substring(md5(concat(lit(seed.toString), lit(":"),
      col(idCol).cast("string")).cast("binary")), 1, 13), 16, 10).cast("double") + lit(0.5)) /
      lit(4503599627370496.0)
    val key = col("weight_nano").cast("double") + round(-log(-log(u)) * lit(1e9))
    weights
      .withColumn("__gumbel_key", key)
      .orderBy(col("__gumbel_key").desc, col(idCol))
      .limit(k)
      .drop("__gumbel_key")
  }
}
