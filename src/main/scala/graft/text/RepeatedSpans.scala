package graft.text

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Cross-document repeated-span statistics — the seed-detection stage
  * of substring-level dedup (find K-token spans that occur in more
  * than one document, score each document by how much of it is
  * duplicated content; public lineage: the "train-set substring
  * duplication" analyses around GPT-2/GPT-3 era corpora and the
  * suffix-array dedup line of work, re-expressed as relational
  * algebra). Whole-document dedup ([[graft.dedup.Dedup]]) misses
  * boilerplate shared between otherwise-distinct pages; this operator
  * measures exactly that.
  *
  * Scale shape: the position stream is one row per token (bounded by
  * corpus token count, linear); it aggregates to the DISTINCT
  * `(span, doc)` grain immediately — with map-side partial
  * aggregation — before anything joins, and the span-level document
  * count joins back on the SAME key the aggregate just shuffled on,
  * so AQE plans the whole middle co-partitioned. Nothing here is
  * quadratic: a span shared by D documents costs D rows, not D^2
  * pairs (contrast pairwise near-dup mining).
  *
  * Span keys are the raw span TEXT so the result is engine-neutral
  * (the DuckDB oracle groups on the same strings). A 100 TB run
  * would key the two shuffles on `xxhash64(span)` instead (8-byte
  * keys vs ~50-byte strings; a 64-bit collision merges two spans'
  * stats, harmless for a filter signal) — same plan shape, so the
  * oracle-checked form here is the scale form.
  */
object RepeatedSpans {

  /** Per-document duplicated-span stats: `(doc_id, n_spans,
    * dup_spans, dup_ratio)` where `n_spans = max(n_tokens - k + 1,
    * 0)` is the document's span positions, `dup_spans` counts
    * positions whose K-token span occurs in >= `minDocs` DISTINCT
    * documents, and `dup_ratio = dup_spans / n_spans` (0 for
    * documents shorter than one span). Unsorted (production form).
    */
  def docDupStats(
      df: DataFrame,
      textCol: String,
      idCol: String,
      k: Int,
      minDocs: Int = 2): DataFrame = {
    require(k > 0, s"k=$k must be positive")
    require(minDocs >= 2, s"minDocs=$minDocs: a span is 'repeated' across >= 2 documents")
    val toksDf = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__n"))
    // Bind the span array once per row, then explode: one Generate,
    // no shuffle until the aggregate below. Documents shorter than one
    // span contribute no positions (the `when` guard — Spark's
    // `sequence(1, 0)` would count DOWN, not produce empty).
    val spans = toksDf
      .select(
        col(idCol),
        explode(
          when(col("__n") >= k,
            transform(
              sequence(lit(1), col("__n") - lit(k - 1)),
              i => array_join(slice(col("__toks"), i, lit(k)), " ")))
            .otherwise(array().cast("array<string>"))).as("span"))
    // (span, doc) grain with occurrence counts — the ONLY pass over
    // the full position stream; everything after runs on the distinct
    // grain, co-partitioned on span.
    val spanDoc = spans.groupBy(col("span"), col(idCol)).agg(count(lit(1)).as("occ"))
    val spanDocs = spanDoc.groupBy(col("span")).agg(count(lit(1)).as("n_docs"))
    val perDocDup = spanDoc
      .join(spanDocs.filter(col("n_docs") >= minDocs), "span")
      .groupBy(col(idCol))
      .agg(sum(col("occ")).as("__dup"))
    toksDf
      .join(perDocDup, Seq(idCol), "left")
      .select(
        col(idCol),
        greatest(col("__n") - lit(k - 1), lit(0)).as("n_spans"),
        coalesce(col("__dup"), lit(0L)).cast("int").as("dup_spans"),
        when(col("__n") >= k,
          coalesce(col("__dup"), lit(0L)).cast("double") / (col("__n") - lit(k - 1)))
          .otherwise(lit(0.0)).as("dup_ratio"))
  }
}
