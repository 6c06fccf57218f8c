package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as ONE codegen'd Catalyst expression.
  *
  * Web text arrives in mixed normalization forms — the same visible
  * string as composed codepoints from one site and base + combining
  * marks from another — which silently splits exact-dedup groups,
  * n-gram keys, and tokenizer vocabulary entries for byte-identical-
  * looking content. Canonicalizing to NFC before fingerprinting /
  * shingling / BPE is the standard fix (CCNet and the C4 pipeline
  * normalize before dedup for exactly this reason).
  *
  * Execution: `java.text.Normalizer` (the JDK's Unicode NFC, the same
  * canonical composition tables every conformant engine implements —
  * DuckDB's `nfc_normalize` agrees byte-for-byte, which is what lets
  * the q63 oracle pin the output by md5). The common case — text
  * already in NFC, all-ASCII included — is detected with
  * `Normalizer.isNormalized` and returns the INPUT UTF8String
  * untouched: no new allocation on the hot path, one String
  * round-trip only for rows that genuinely need recomposition. Pure
  * per-row projection: zero shuffle, zero state, inside whole-stage
  * codegen (real `doGenCode`, not a fallback).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def prettyName: String = "nfc_normalize"

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs string, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("nfcStr")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Text cleaning for corpus curation (engine addition): the
  * normalization pass a pipeline runs BEFORE dedup/shingling/BPE so
  * that byte-level noise doesn't split content-identical documents.
  * Three steps, in order:
  *
  *   1. control characters (C0 + DEL, tab/newline included) -> space;
  *   2. space runs collapse to one space, leading/trailing trimmed;
  *   3. Unicode NFC ([[NfcNormalize]]).
  *
  * Pattern discipline as in [[PiiScrub]]: the regexes are in the
  * portable Java-regex ∩ RE2 intersection (hex classes only — no
  * shorthand, no lookaround), so the DuckDB oracle reproduces the
  * cleaned text byte-for-byte (q63 pins it by md5). Scale shape: pure
  * codegen'd per-row projection — zero shuffle, zero state, safe to
  * fuse into any scan.
  */
object Normalize {

  /** C0 control characters + DEL. Newlines/tabs are normalized to
    * spaces too: the engine's tokenizers split on single spaces, so
    * surviving layout whitespace would leak into tokens.
    */
  val ControlPattern = "[\\x00-\\x1f\\x7f]"

  val SpaceRunPattern = " +"

  def nfc(text: Column): Column = ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  /** The full cleaning chain on a column. */
  def clean(text: Column): Column =
    nfc(trim(regexp_replace(regexp_replace(text, ControlPattern, " "), SpaceRunPattern, " ")))

  /** df + `<out>` holding the cleaned text + `changed` (1 iff cleaning
    * altered the value — the corpus-health metric a pipeline tracks
    * per source).
    */
  def cleaned(df: DataFrame, textCol: String, out: String = "clean_text"): DataFrame =
    df.withColumn(out, clean(col(textCol)))
      // null-safe: a null text row cleans to null — NOTHING changed,
      // so the flag is 0, not SQL NULL. A null flag silently left the
      // row out of every avg/sum health rollup's denominator (the
      // same-population pitfall DataCard coalesces against,
      // review r19).
      .withColumn("changed", (!(col(out) <=> col(textCol))).cast("int"))
}
