package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing (engine addition): redact structured personal
  * identifiers from a text column before the corpus feeds training —
  * a standard compliance gate in LLM data pipelines.
  *
  * Pattern discipline: every regex below is written in the portable
  * intersection of Java regex (Spark) and RE2 (DuckDB, used by the
  * correctness oracle) — no backreferences, no lookaround, no \d
  * shorthand — so the scrub is reproducible bit-for-bit across
  * engines. Detection-only patterns (no validation): a scrubber must
  * over-redact, not under-redact.
  *
  * Scale shape: pure per-row projection — codegen'd `regexp_replace`
  * / `regexp_count`, zero shuffle, zero state.
  */
object PiiScrub {

  /** (name, pattern, replacement) in application order. Order matters
    * only where patterns could overlap: email is first so its local
    * part's digits are gone before number patterns run; phone (3-3-4)
    * and SSN (3-2-4) shapes are disjoint.
    */
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}", "<PHONE>"),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    ("ipv4", "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}", "<IP>"))

  /** The scrubbed text: all patterns replaced, in [[Patterns]] order. */
  def scrub(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (_, pat, rep)) =>
      regexp_replace(acc, pat, rep)
    }

  /** Per-pattern match count on the RAW text (counts are taken before
    * any replacement so one pattern's placeholder can't shadow
    * another's count).
    */
  def counts(text: Column): Seq[(String, Column)] =
    Patterns.map { case (name, pat, _) => name -> regexp_count(text, lit(pat)) }

  /** df + one `n_<pattern>` count column per pattern + `<out>` holding
    * the scrubbed text.
    */
  def scrubbed(df: DataFrame, textCol: String, out: String = "scrubbed"): DataFrame = {
    val withCounts = counts(col(textCol)).foldLeft(df) {
      case (acc, (name, c)) => acc.withColumn(s"n_$name", c)
    }
    withCounts.withColumn(out, scrub(col(textCol)))
  }
}
