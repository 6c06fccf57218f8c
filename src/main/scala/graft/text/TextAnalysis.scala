package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline — north-star
  * extension over the `documents` fixture: tokenization/counting,
  * quality scoring, language ID, document fingerprinting. Everything
  * is codegen'd column functions (higher-order array functions, no
  * UDFs), so each op is a single scan at any scale.
  *
  * Evaluation discipline (see [[Decontamination]]): Catalyst never
  * de-duplicates a structural reference to a non-cheap tree, so every
  * multi-signal operator here has an `OfTokens`/`OfNorm` variant
  * taking a BOUND attribute; the text-based forms re-derive the
  * token array (or normalized text) at each reference and exist for
  * single-signal ad-hoc use. Multi-signal call sites (the q22/q25
  * queries, [[CurationPipeline]]'s annotate stage) materialize the
  * shared input once per row and pass the attribute.
  */
object TextAnalysis {

  /** Whitespace tokens (bag-of-words texts are single-space joined). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: word-piece regex count (runs of word
    * chars or a single non-space symbol) — the standard cheap
    * stand-in for a real subword tokenizer count. `regexp_count`
    * counts matches without materializing the per-row match array a
    * `size(regexp_extract_all(...))` form would allocate.
    */
  def bpeishTokenCount(text: Column): Column =
    // explicit whitespace class — see [[normalized]] for why \s is not
    // portable between Java and the oracle's RE2
    regexp_count(text, lit("\\w+|[^\\w \\t\\n\\x0B\\f\\r]"))

  /** Small public stopword lists per language (top function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"))

  def stopwordCountOfTokens(toks: Column, lang: String = "en"): Column =
    size(filter(toks, t => t.isInCollection(stopwords(lang))))

  def stopwordCount(text: Column, lang: String = "en"): Column =
    stopwordCountOfTokens(tokens(text), lang)

  /** Quality score in [0, 1] from a bound token attribute: coverage
    * of a target length band, low stopword saturation, healthy mean
    * token length. Deterministic double arithmetic (same formula is
    * mirrored in the oracle SQL).
    */
  def qualityScoreOfTokens(toks: Column, text: Column): Column = {
    val nTok = size(toks).cast("double")
    val stopRatio = stopwordCountOfTokens(toks).cast("double") / nTok
    val meanTokLen = (length(text) - (nTok - 1)).cast("double") / nTok
    val lengthScore = least(nTok / lit(50.0), lit(1.0))
    val tokLenScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    lengthScore * (lit(1.0) - stopRatio) * tokLenScore
  }

  /** Single-signal convenience form — re-tokenizes at each structural
    * reference (~6x per row); multi-signal paths bind the token array
    * first and use [[qualityScoreOfTokens]].
    */
  def qualityScore(text: Column): Column =
    qualityScoreOfTokens(tokens(text), text)

  /** Language ID by stopword-hit voting over a bound token attribute:
    * count hits per language's stopword set, pick the max; ties break
    * to the lexicographically smallest code; zero hits -> "und". Pure
    * column algebra: the argmax is `array_min` over (negated hits,
    * lang) structs.
    */
  def langIdOfTokens(toks: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct((-size(filter(toks, t => t.isInCollection(words)))).as("neg"), lit(lang).as("lang"))
    }
    val best = array_min(array(scored: _*))
    when(best.getField("neg") < 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Single-signal convenience form — re-tokenizes once per language
    * vote; multi-signal paths use [[langIdOfTokens]].
    */
  def langId(text: Column): Column = langIdOfTokens(tokens(text))

  /** Exact content fingerprint: 64-bit xxhash of the normalized text
    * (casefold + whitespace squeeze). Two docs share it iff their
    * normalized bytes match — the exact-dedup key.
    */
  def contentFingerprint(text: Column): Column = xxhash64(normalized(text))

  /** The normalization shared by both fingerprints: casefold +
    * whitespace squeeze. Multi-fingerprint call sites project it once
    * and feed the attribute to [[winnowFingerprintOfNorm]] /
    * `xxhash64` directly.
    */
  def normalized(text: Column): Column =
    // explicit class, not \s: Java's \s is [ \t\n\x0B\f\r] but RE2's
    // (the oracle engine's) excludes \x0B — the class is the portable
    // spelling of the SAME set, mirrored verbatim in the oracle SQL
    trim(regexp_replace(lower(text), "[ \\t\\n\\x0B\\f\\r]+", " "))

  /** Rolling-hash (winnow-style) fingerprint over a BOUND normalized
    * attribute: min xxhash over k-char shingles — stable under local
    * edits, the cheap near-dup key. `transform(sequence(...))` keeps
    * it columnar. `norm` must be an attribute: the lambda takes one
    * substring per shingle, and a computed tree here would re-run the
    * normalization regex once per shingle (O(len^2) per row).
    */
  def winnowFingerprintOfNorm(norm: Column, k: Int = 8): Column = {
    val n = length(norm)
    val starts = sequence(lit(1), greatest(n - lit(k - 1), lit(1)))
    array_min(transform(starts, i => xxhash64(norm.substr(i, lit(k)))))
  }

  /** Single-signal convenience form — re-normalizes PER SHINGLE
    * (quadratic in document length); hot paths project
    * [[normalized]] first and use [[winnowFingerprintOfNorm]].
    */
  def winnowFingerprint(text: Column, k: Int = 8): Column =
    winnowFingerprintOfNorm(normalized(text), k)
}
