package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — fixed token windows with a stride — the prep
  * step every training/RAG pipeline runs between curation and
  * tokenization (context-length packing wants whole documents, chunked
  * retrieval and span-level filtering want windows; reference scope:
  * the reference stops at whole-document curation, so this is
  * north-star extension like the rest of the text pack).
  *
  * Chunk geometry: starts are `0, stride, 2*stride, ...` up to the
  * LAST start that still begins new content, `stride *
  * ceil((n_tokens - window) / stride)` (a document shorter than one
  * window yields exactly one chunk). The final chunk may be short;
  * every token lands in >= 1 chunk and consecutive chunks overlap by
  * `window - stride` tokens.
  *
  * Scale shape: one scan, one `posexplode` Generate per document, no
  * shuffle — the operator is embarrassingly parallel and the output is
  * `~n_tokens / stride` rows per document regardless of corpus size.
  * The token array and its size are bound ONCE per row before the
  * Generate (Catalyst re-evaluates structural references; see
  * [[TextAnalysis]]'s evaluation discipline).
  */
object Chunking {

  /** `(doc_id, chunk_idx, start_tok, n_chunk_tokens, chunk_text)` —
    * one row per chunk. Unsorted (production form); oracle queries
    * add their own total ORDER BY.
    */
  def chunks(
      df: DataFrame,
      textCol: String,
      idCol: String,
      window: Int,
      stride: Int): DataFrame = {
    require(window > 0, s"window=$window must be positive")
    require(stride > 0 && stride <= window,
      s"stride=$stride must be in [1, window=$window] (stride > window would drop tokens)")
    val toksDf = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"), size(col("__toks")).as("__n"))
    val lastStart: Column =
      floor((greatest(col("__n") - window, lit(0)) + lit(stride - 1)) / lit(stride))
        .cast("int") * stride
    toksDf
      .select(
        col(idCol),
        col("__toks"),
        col("__n"),
        posexplode(sequence(lit(0), lastStart, lit(stride))).as(Seq("chunk_idx", "start_tok")))
      .select(
        col(idCol),
        col("chunk_idx"),
        col("start_tok"),
        least(lit(window), col("__n") - col("start_tok")).as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("start_tok") + 1, lit(window)), " ").as("chunk_text"))
  }
}
