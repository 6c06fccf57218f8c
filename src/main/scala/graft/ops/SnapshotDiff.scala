package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus release diffing — what changed between two snapshots of the
  * same corpus (the versioning primitive behind incremental curation:
  * re-run expensive passes — dedup, decontamination, scoring — only
  * on `added`/`changed` documents, carry `unchanged` results forward,
  * retire `removed` ones).
  *
  * Scale shape: both sides collapse to `(id, md5(text))` in their scan
  * projection — text never crosses an exchange — then ONE full-outer
  * id-keyed join classifies every document. No content-level diff is
  * attempted (that is [[graft.text.RepeatedSpans]]' territory); the
  * fingerprint answers "same bytes or not", which is what incremental
  * scheduling needs.
  */
object SnapshotDiff {

  /** `(idCol, status)` with status in
    * {added, removed, changed, unchanged}: `added` = in `next` only,
    * `removed` = in `prev` only, `changed` = both but different text
    * fingerprint, `unchanged` = both and identical.
    */
  def diff(
      prev: DataFrame,
      next: DataFrame,
      textCol: String,
      idCol: String): DataFrame = {
    // presence markers, NOT fingerprint nullity: md5(null text) is
    // null, so classifying by the fingerprint would report a null-text
    // document present in both snapshots as "added"; the null-safe
    // fingerprint compare then calls two null texts "unchanged"
    val a = prev.select(col(idCol), md5(col(textCol).cast("binary")).as("__fp_a"),
      lit(true).as("__in_a"))
    val b = next.select(col(idCol), md5(col(textCol).cast("binary")).as("__fp_b"),
      lit(true).as("__in_b"))
    a.join(b, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("__in_a").isNull, lit("added"))
          .when(col("__in_b").isNull, lit("removed"))
          .when(col("__fp_a") <=> col("__fp_b"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The diff rolled up to release-note numbers: one row per status
    * with its document count — the summary a release pipeline gates
    * on (e.g. fail the publish if `changed + added` exceeds a bound).
    */
  def summary(
      prev: DataFrame,
      next: DataFrame,
      textCol: String,
      idCol: String): DataFrame =
    diff(prev, next, textCol, idCol)
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"))
}
