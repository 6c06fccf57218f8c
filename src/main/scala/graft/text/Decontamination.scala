package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast => bcast, _}

/** Benchmark decontamination: flag training documents whose n-grams
  * overlap an evaluation set (the published GPT-3/PaLM-style n-gram
  * contamination check — Brown et al. 2020 §C, public paper).
  *
  * Scale shape: the benchmark is control-plane sized next to a 100 TB
  * corpus, so its distinct n-gram set is BROADCAST and the corpus side
  * never shuffles its text — each document explodes its distinct
  * n-grams (a narrow generate), a broadcast left join marks the ones
  * the benchmark contains, and ONE groupBy(doc) exchange counts both
  * totals from the marked rows; map-side partial aggregation collapses
  * each document to a single count row before the exchange (a
  * document's grams are partition-local), so clean documents cost a
  * scan plus one tiny aggregate row and their text never moves.
  *
  * Evaluation discipline: HOF lambdas get no common-subexpression
  * elimination, so any non-attribute tree referenced inside one is
  * re-evaluated per ELEMENT. Every entry point here therefore
  * tokenizes into a materialized column first ([[tokenized]]) and
  * builds n-grams off the bound attribute ([[ngramsOfTokens]]) with a
  * single `slice` per element — never `split` inside the lambda — and
  * the n-gram array itself is evaluated exactly once per pass
  * (projection isolation; Catalyst does not collapse projects that
  * would duplicate a non-cheap expression, SPARK-36718).
  */
object Decontamination {

  /** `df` plus a whitespace-token array of `textCol`, materialized
    * once per row under `tokCol` so downstream n-gram construction
    * references a bound attribute instead of re-running `split`.
    */
  def tokenized(df: DataFrame, textCol: String, tokCol: String): DataFrame =
    df.withColumn(tokCol, split(col(textCol), " "))

  /** Distinct space-joined n-grams of an ALREADY-TOKENIZED document;
    * empty array when it has fewer than `n` tokens. `toks` must be a
    * bound attribute (see [[tokenized]]) — passing a computed tree
    * here re-evaluates it per n-gram.
    */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"n=$n must be positive")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(typedlit(Seq.empty[String]))
  }

  /** The n-gram array as the single-pass [[DistinctNgrams]]
    * expression — one scan over the text bytes, each gram a span view
    * (no per-gram slice/join allocation). Null text yields a null
    * array (fine under `explode`, which emits no rows either way).
    */
  def distinctNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      DistinctNgrams(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text), n))

  /** Distinct space-joined n-grams of a whitespace-tokenized text;
    * empty array when the document has fewer than `n` tokens (or is
    * null — the historical contract of the column-algebra form this
    * delegates for).
    */
  def ngrams(text: Column, n: Int): Column =
    coalesce(distinctNgrams(text, n), typedlit(Seq.empty[String]))

  /** One row per (document, distinct n-gram). The n-gram construction
    * is the GENERATOR expression itself — handing `explode` a bound
    * array attribute instead invites `InferFiltersFromGenerate` +
    * predicate pushdown to inline the whole construction twice into a
    * scan-level filter; with [[distinctNgrams]] as the generator the
    * single-pass expression is planned exactly once (documents with
    * fewer than `n` tokens vanish — they have no n-grams).
    */
  private[text] def explodedGrams(
      df: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    df.select(col(idCol), explode(distinctNgrams(col(textCol), n)).as("g"))

  /** One row per CONTAMINATED corpus document: its distinct n-gram
    * count, how many of those n-grams appear anywhere in `bench`, the
    * contamination fraction, and a 0/1 flag at `flagThreshold`.
    * Documents with zero overlap are absent (they are the ~entire
    * corpus; a report listing them would itself be corpus-sized).
    */
  def report(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      flagThreshold: Double = 0.05): DataFrame =
    reportWith(corpus,
      bench.select(explode(distinctNgrams(col(textCol), n)).as("g")).distinct(),
      textCol, idCol, n, flagThreshold)

  /** [[report]] against a PRECOMPUTED distinct gram table (column
    * `g`) — the production form when the benchmark release is
    * materialized once and reused across corpus snapshots, and the
    * regime switch for benchmark sets too large to broadcast:
    * `broadcastBench = true` (default) keeps the broadcast
    * join-with-marker shape; `false` drops the hint so the planner
    * shuffles BOTH sides on the gram key instead — corpus grams cross
    * an exchange (never text), which is the right trade only when the
    * gram table itself is beyond broadcast size. Mirrors the
    * streaming twins ([[graft.streaming.StreamingOps
    * .decontaminationStream]] literal / `decontaminationStreamJoin`
    * shuffle) so both engines offer both regimes.
    *
    * `benchGrams` must be DISTINCT on `g` — duplicates multiply the
    * left-joined rows and corrupt BOTH counts.
    */
  def reportWith(
      corpus: DataFrame,
      benchGrams: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      flagThreshold: Double = 0.05,
      broadcastBench: Boolean = true): DataFrame = {
    // Join-with-marker: a LEFT join tags each corpus n-gram that the
    // benchmark contains, and ONE groupBy(doc) derives both totals —
    // `count(1)` is n_ngrams (the left join preserves exactly one row
    // per distinct gram; the bench side is distinct) and
    // `count(__hit)` is n_overlap. No `size()` over the gram array
    // anywhere, so the array is evaluated exactly once, by the
    // generate. Clean documents reach the final exchange only as one
    // map-side partially-aggregated count row each (a document's
    // grams are partition-local — they explode from one input row),
    // never as text.
    val tagged = benchGrams.select(col("g")).withColumn("__dc_hit", lit(1))
    explodedGrams(corpus, textCol, idCol, n)
      .join(if (broadcastBench) bcast(tagged) else tagged, Seq("g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_ngrams"),
        count(col("__dc_hit")).as("n_overlap"))
      .filter(col("n_overlap") > 0)
      .withColumn("contam_frac",
        col("n_overlap").cast("double") / col("n_ngrams").cast("double"))
      .withColumn("flagged", (col("contam_frac") >= flagThreshold).cast("int"))
  }

  /** The removal applied: corpus minus documents at or above the flag
    * threshold — anti-join on the flagged id list.
    *
    * `broadcastFlagged = true` (default) hints the flagged ids into a
    * broadcast anti-join, so the corpus never shuffles — the right
    * shape while the flagged set is executor-memory-sized (the normal
    * case: contamination is a small corpus fraction). Against a
    * benchmark release so large that flagged ids themselves are
    * beyond broadcast, pass `false`: the planner shuffle-anti-joins
    * on the id instead, which DOES move corpus rows (text included)
    * through one exchange — intrinsic to removing a non-broadcastable
    * id set; there is no third shape without pre-bucketing the corpus
    * by id.
    */
  def decontaminated(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      flagThreshold: Double = 0.05,
      broadcastFlagged: Boolean = true): DataFrame = {
    val flagged = report(corpus, bench, textCol, idCol, n, flagThreshold)
      .filter(col("flagged") === 1)
      .select(col(idCol))
    corpus.join(if (broadcastFlagged) bcast(flagged) else flagged, Seq(idCol), "left_anti")
  }
}
