package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline — north-star
  * extension over the `documents` fixture: tokenization/counting,
  * quality scoring, language ID, document fingerprinting. Everything
  * is codegen'd column functions (higher-order array functions, no
  * UDFs), so each op is a single scan at any scale.
  */
object TextAnalysis {

  /** Whitespace tokens (bag-of-words texts are single-space joined). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: word-piece regex (runs of word chars or a
    * single non-space symbol) — the standard cheap stand-in for a real
    * subword tokenizer count.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Small public stopword lists per language (top function words). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "ein", "eine", "zu", "mit"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"))

  def stopwordCount(text: Column, lang: String = "en"): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords(lang))))

  /** Quality score in [0, 1]: coverage of a target length band, low
    * stopword saturation, healthy mean token length. Deterministic
    * double arithmetic (same formula is mirrored in the oracle SQL).
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = stopwordCount(text).cast("double") / nTok
    val meanTokLen = (length(text) - (nTok - 1)).cast("double") / nTok
    val lengthScore = least(nTok / lit(50.0), lit(1.0))
    val tokLenScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    lengthScore * (lit(1.0) - stopRatio) * tokLenScore
  }

  /** Language ID by stopword-hit voting: count hits per language's
    * stopword set, pick the max; ties break to the lexicographically
    * smallest code; zero hits -> "und". Pure column algebra: the
    * argmax is `array_min` over (negated hits, lang) structs.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct((-size(filter(toks, t => t.isInCollection(words)))).as("neg"), lit(lang).as("lang"))
    }
    val best = array_min(array(scored: _*))
    when(best.getField("neg") < 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Exact content fingerprint: 64-bit xxhash of the normalized text
    * (casefold + whitespace squeeze). Two docs share it iff their
    * normalized bytes match — the exact-dedup key.
    */
  def contentFingerprint(text: Column): Column =
    xxhash64(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Rolling-hash (winnow-style) fingerprint: min xxhash over k-char
    * shingles of the normalized text — stable under local edits, the
    * cheap near-dup key. `transform(sequence(...))` keeps it columnar.
    */
  def winnowFingerprint(text: Column, k: Int = 8): Column = {
    val norm = trim(regexp_replace(lower(text), "\\s+", " "))
    val n = length(norm)
    val starts = sequence(lit(1), greatest(n - lit(k - 1), lit(1)))
    array_min(transform(starts, i => xxhash64(norm.substr(i, lit(k)))))
  }
}
