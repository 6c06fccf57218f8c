package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{broadcast => bcast}
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Token-aware sequence packing (engine addition): assign documents to
  * fixed-capacity context windows ("bins") without splitting a
  * document — the batch-construction step of an LLM training pipeline.
  *
  * Strict first-fit packing is inherently sequential (each decision
  * depends on every earlier bin's fill), so it cannot be expressed as
  * a distributed plan without a per-stratum serial pass. This
  * implements the standard streaming relaxation, START-OFFSET packing:
  * within each stratum, documents are laid on one contiguous token
  * tape in a deterministic order and
  *
  *   `bin = floor(start_offset / capacity)`
  *
  * where `start_offset` is the running token count BEFORE the
  * document. Every document lands in exactly one bin, bins are dense
  * (0..k) per stratum, and a bin's total tokens is < capacity +
  * max_doc_tokens (a document whose start sits near the boundary
  * spills its tail past it — the caller either truncates the tail or
  * sizes capacity >> max doc, both standard).
  *
  * Scale shape: [[assignBins]] is one hash exchange on the stratum
  * column plus a per-stratum window running sum — parallelism is the
  * stratum count, which serializes a skewed corpus (one dominant
  * source) into a single task. [[assignBinsDistributed]] is the
  * 100 TB form: a chunked distributed prefix sum whose parallelism
  * is strata x chunks and whose output is bit-identical
  * (SequencePackingSpec pins the equality on skewed multi-chunk
  * data). The window form remains as the small-scale oracle (the
  * DuckDB oracle reproduces it bit-for-bit with the same window sum).
  */
object SequencePacking {

  /** Per-document bin assignment: adds `n_tokens`, `start_offset`,
    * `bin` to `df`. `orderCol` must be unique per stratum for the
    * layout to be deterministic (doc ids are).
    */
  def assignBins(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int): DataFrame = {
    require(!df.columns.contains("n_tokens"),
      "input must not contain reserved column n_tokens")
    assignBinsFromCounts(
      df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long")),
      "n_tokens", strataCol, orderCol, capacity)
  }

  /** [[assignBins]] over a PRE-COMPUTED token-count column — for
    * composed pipelines whose upstream pass already collapsed text to
    * the document grain (the NB quality gate's report carries
    * `n_tokens = (n_grams + 1) div 2` exactly, since the gram stream
    * is unigrams + bigrams = 2n - 1), so packing the survivors needs
    * neither a second corpus scan nor a join back to the text.
    */
  def assignBinsFromCounts(
      df: DataFrame,
      tokensCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity=$capacity must be positive")
    // output-column guard (both forms): a pre-existing start_offset/bin
    // would be silently replaced here and duplicated by the distributed
    // form's final select — ambiguous far from the cause
    Seq("start_offset", "bin").foreach(c =>
      require(!df.columns.contains(c), s"input must not contain reserved column $c"))
    val w = Window.partitionBy(strataCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("start_offset", sum(col(tokensCol)).over(w) - col(tokensCol))
      .withColumn("bin", floor(col("start_offset") / lit(capacity.toLong)))
  }

  /** Skew-safe twin of [[assignBins]]: identical (stratum, bin)
    * assignment computed as a chunked distributed prefix sum (three
    * narrow passes) instead of one window per stratum.
    *
    * The window form serializes each stratum into a single task — fine
    * when strata are many and balanced, a scale-killer when one source
    * (e.g. a web crawl) dominates a 100 TB corpus. Here each stratum is
    * split into `numChunks` CONTIGUOUS ranges of `orderCol`, so the
    * serial running sum happens per (stratum, chunk) — parallelism is
    * strata x chunks — and the cross-chunk carry is reconstructed from
    * a control-plane-sized table of per-chunk token totals:
    *
    *   pass 1: per-stratum (min, max) of the order column — a partial
    *           aggregate whose shuffle is one row per stratum;
    *   pass 2: per-(stratum, chunk) token sums (same tiny-shuffle
    *           shape), cumulative-summed over the chunk axis — a window
    *           over ≤ numChunks rows per stratum, negligible — and
    *           broadcast-joined back as each chunk's base offset;
    *   pass 3: a local running sum within (stratum, chunk), offset by
    *           the chunk base.
    *
    * Because chunks are contiguous in `orderCol`, ordering by
    * (chunk, orderCol) equals ordering by orderCol, so `start_offset`
    * (and therefore `bin`) is BIT-IDENTICAL to the window form — the
    * window form is this function's oracle and SequencePackingSpec
    * pins the equality on skewed multi-chunk data.
    *
    * `orderCol` MUST be an integral type (byte/short/int/long): chunk
    * boundaries are computed on the numeric value, and for a
    * non-numeric column (e.g. digit strings, where "10" < "2"
    * lexicographically) numeric chunking would disagree with the
    * oracle's raw sort order — so anything else fails fast instead of
    * silently diverging. NULL order values sort first under Spark's
    * ascending order, so they are routed to a chunk before all real
    * ones; note a null order key already breaks the per-stratum
    * uniqueness/determinism contract shared with [[assignBins]].
    */
  def assignBinsDistributed(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int,
      numChunks: Int = 64): DataFrame = {
    require(!df.columns.contains("n_tokens"),
      "input must not contain reserved column n_tokens")
    assignBinsDistributedFromCounts(
      df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long")),
      "n_tokens", strataCol, orderCol, capacity, numChunks)
  }

  /** [[assignBinsDistributed]] over a pre-computed token-count column
    * (see [[assignBinsFromCounts]] for when that arises). */
  def assignBinsDistributedFromCounts(
      df: DataFrame,
      tokensCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int,
      numChunks: Int = 64): DataFrame = {
    require(capacity > 0, s"capacity=$capacity must be positive")
    require(numChunks > 0, s"numChunks=$numChunks must be positive")
    val orderType = df.schema(orderCol).dataType
    require(
      Set[org.apache.spark.sql.types.DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(orderType),
      s"orderCol '$orderCol' must be an integral type so chunk order matches " +
        s"the oracle's sort order; got $orderType")
    val reserved = Seq("__sp_ord_min", "__sp_span", "__sp_chunk", "__sp_chunk_tokens",
      "__sp_chunk_base", "__sp_bstrat", "__sp_bchunk", "start_offset", "bin")
    reserved.foreach(c => require(!df.columns.contains(c), s"input must not contain reserved column $c"))
    // decimal(38,0) span math: (max - min) on a long column can
    // overflow for adversarial id ranges (hash-derived ids spanning
    // Long.Min..Long.Max); unbounded-precision decimals cannot.
    val dec = DecimalType(38, 0)
    val ord = col(orderCol).cast(dec)
    val withTok = df
    // pass 1: chunk boundaries. span >= 1 guarantees <= numChunks chunks.
    val bounds = withTok.groupBy(col(strataCol))
      .agg(min(ord).as("__sp_ord_min"), max(ord).as("__sp_ord_max"))
      .withColumn("__sp_span",
        greatest(lit(1L).cast(dec),
          floor((col("__sp_ord_max") - col("__sp_ord_min")) / lit(numChunks.toLong)) + 1))
      .select(col(strataCol), col("__sp_ord_min"), col("__sp_span"))
    // NULL order values cast to null -> null chunk; coalesce to -1 so
    // they survive the equi-join (chunk -1 precedes every real chunk,
    // matching the oracle's nulls-first order) instead of being
    // silently dropped.
    // NULL-SAFE stratum join (the joinBackNullSafe discipline): the
    // window form keeps a null stratum as its own partition, but a
    // plain using-columns equi-join never matches null keys — the
    // distributed twin silently DROPPED every null-stratum document,
    // a row-loss divergence between two paths documented as
    // bit-identical (review r19).
    val chunked = withTok
      .join(bcast(bounds.withColumnRenamed(strataCol, "__sp_bstrat")),
        col(strataCol) <=> col("__sp_bstrat"))
      .drop("__sp_bstrat")
      .withColumn("__sp_chunk",
        coalesce(floor((ord - col("__sp_ord_min")) / col("__sp_span")), lit(-1L)))
    // pass 2: per-chunk totals -> exclusive cumulative base per chunk.
    // The window here runs over <= numChunks rows per stratum (the
    // control plane), not the documents.
    val carry = Window.partitionBy(col(strataCol)).orderBy(col("__sp_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val chunkBases = chunked.groupBy(col(strataCol), col("__sp_chunk"))
      .agg(sum(col(tokensCol)).as("__sp_chunk_tokens"))
      .withColumn("__sp_chunk_base",
        coalesce(sum(col("__sp_chunk_tokens")).over(carry), lit(0L)))
      .select(col(strataCol), col("__sp_chunk"), col("__sp_chunk_base"))
    // pass 3: local running sum, offset by the broadcast chunk base.
    // Ordering by the raw column inside a chunk equals ordering by the
    // numeric value because orderCol is integral (enforced above).
    val local = Window.partitionBy(col(strataCol), col("__sp_chunk")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chunked
      .join(bcast(chunkBases
          .withColumnRenamed(strataCol, "__sp_bstrat")
          .withColumnRenamed("__sp_chunk", "__sp_bchunk")),
        col(strataCol) <=> col("__sp_bstrat") && col("__sp_chunk") === col("__sp_bchunk"))
      .drop("__sp_bstrat", "__sp_bchunk")
      .withColumn("start_offset",
        col("__sp_chunk_base") + sum(col(tokensCol)).over(local) - col(tokensCol))
      .withColumn("bin", floor(col("start_offset") / lit(capacity.toLong)))
      .select((df.columns.toIndexedSeq.map(col) ++ Seq(col("start_offset"), col("bin"))): _*)
  }

  /** Size-routed facade over [[assignBins]] / [[assignBinsDistributed]]
    * — the call shape that is safe to copy at scale, mirroring
    * [[graft.dedup.Dedup.dupClusters]]' collect-vs-distributed
    * routing: the window form serializes each stratum into ONE task,
    * which is fine for many balanced strata and a scale-killer when
    * one source dominates, so the facade routes on the LARGEST
    * stratum's row count. Both forms are bit-identical
    * (SequencePackingSpec), so routing never changes the answer —
    * only the parallelism.
    *
    * The routing statistic costs one aggregate job that scans ONLY
    * the stratum column (column pruning reaches the parquet scan;
    * the text column — the expensive bytes — is untouched), with a
    * one-row-per-stratum shuffle. Callers whose input is an expensive
    * computed plan rather than a source scan should either cache it
    * first or pick a form directly; callers that already know their
    * stratum sizes should also call a form directly and skip the
    * probe job.
    *
    * `windowThreshold` defaults to 1 M rows: a single running-sum
    * task over ~1 M docs is comfortably sub-second, while at 100 TB
    * (billions of docs in a dominant stratum) the facade lands on the
    * chunked-prefix-sum form whose parallelism is strata x chunks.
    */
  def packBins(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int,
      windowThreshold: Long = 1000000L,
      numChunks: Int = 64): DataFrame = {
    require(windowThreshold >= 0, s"windowThreshold=$windowThreshold must be >= 0")
    if (maxStratumRows(df, strataCol) <= windowThreshold)
      assignBins(df, textCol, strataCol, orderCol, capacity)
    else
      assignBinsDistributed(df, textCol, strataCol, orderCol, capacity, numChunks)
  }

  /** Largest per-stratum row count — [[packBins]]' routing statistic
    * (0 for an empty frame). One aggregate job over the stratum
    * column only.
    */
  def maxStratumRows(df: DataFrame, strataCol: String): Long = {
    val row = df.groupBy(col(strataCol)).count()
      .agg(max(col("count")).as("m")).head()
    if (row.isNullAt(0)) 0L else row.getLong(0)
  }

  /** Packed-bin summary: one row per (stratum, bin) with document and
    * token counts plus the id span — the manifest a downstream batch
    * loader reads. The window exchange on `strataCol` also satisfies
    * the groupBy's clustering, so the summary adds no second shuffle.
    */
  def packedBins(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int): DataFrame =
    binSummary(assignBins(df, textCol, strataCol, orderCol, capacity),
      "n_tokens", strataCol, orderCol)

  /** [[packedBins]] over a pre-computed token-count column (see
    * [[assignBinsFromCounts]]). No probe-based routing here: counts
    * arrive from an upstream computed plan (the gate's score pass),
    * and a routing probe would execute that plan a second time — the
    * caller picks the form instead. `distributed = true` is the
    * dominant-stratum scale path (chunked prefix sum, parallelism
    * strata x chunks, bit-identical output); the default window form
    * is right for bounded balanced strata (languages, sources).
    */
  def packedBinsFromCounts(
      df: DataFrame,
      tokensCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int,
      distributed: Boolean = false,
      numChunks: Int = 64): DataFrame =
    binSummary(
      if (distributed)
        assignBinsDistributedFromCounts(df, tokensCol, strataCol, orderCol, capacity, numChunks)
      else assignBinsFromCounts(df, tokensCol, strataCol, orderCol, capacity),
      tokensCol, strataCol, orderCol)

  /** [[packedBinsFromCounts]] with the counts taken from a trained BPE
    * tokenizer ([[BpeTokenizer.countsFromModel]]) — packing by what the
    * accelerator actually pays. [[assignBins]]' whitespace
    * `TextAnalysis.tokenCount` misestimates bin occupancy by the
    * corpus' tokens-per-word fertility (any non-English or code
    * corpus); with a fitted model in hand the real count is one facade
    * call. `orderCol` doubles as the globally-unique id that keys the
    * count join (doc ids are). Scale shape = countsFromModel's
    * vocab-grain segmentation + one id equi-join, then the packing
    * exchange; `distributed = true` is the dominant-stratum path
    * (chunked prefix sum, bit-identical output).
    */
  def packedBinsByBpe(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int,
      model: BpeTokenizer.BpeModel,
      distributed: Boolean = false,
      numChunks: Int = 64): DataFrame =
    binSummary(
      assignBinsByBpe(df, textCol, strataCol, orderCol, capacity, model, distributed, numChunks),
      "n_bpe_tokens", strataCol, orderCol)

  /** Per-document bin assignment by BPE token count — [[assignBins]]
    * with [[BpeTokenizer.countsFromModel]] counts (see
    * [[packedBinsByBpe]]); adds `n_bpe_tokens`, `start_offset`, `bin`.
    */
  def assignBinsByBpe(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int,
      model: BpeTokenizer.BpeModel,
      distributed: Boolean = false,
      numChunks: Int = 64): DataFrame = {
    val counted = BpeTokenizer.countsFromModel(df, textCol, orderCol, model)
    if (distributed)
      assignBinsDistributedFromCounts(counted, "n_bpe_tokens", strataCol, orderCol, capacity, numChunks)
    else
      assignBinsFromCounts(counted, "n_bpe_tokens", strataCol, orderCol, capacity)
  }

  /** Bin MATERIALIZATION: the [[packedBins]] manifest plus `tape_fp`
    * — the md5 of each bin's concatenated document tape in layout
    * order. This is the artifact a trainer actually consumes (the
    * contiguous token tape per context window); fingerprinting it
    * makes the whole layout — not just the counts — oracle-checkable
    * and diffable across corpus snapshots. Same single exchange as
    * the summary (the ordered concat is an in-partition
    * `array_sort(collect_list)` over rows the window already
    * co-located); the tape itself stays inside the aggregate — only
    * the 32-char fingerprint leaves the executor.
    */
  def materializedBins(
      df: DataFrame,
      textCol: String,
      strataCol: String,
      orderCol: String,
      capacity: Int): DataFrame =
    assignBins(df, textCol, strataCol, orderCol, capacity)
      .groupBy(col(strataCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col(orderCol)).as("first_id"),
        max(col(orderCol)).as("last_id"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col(orderCol), col(textCol)))),
            s => s.getField(textCol))).cast("binary")).as("tape_fp"))

  private def binSummary(
      assigned: DataFrame,
      tokensCol: String,
      strataCol: String,
      orderCol: String): DataFrame =
    assigned
      .groupBy(col(strataCol), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokensCol)).as("total_tokens"),
        min(col(orderCol)).as("first_id"),
        max(col(orderCol)).as("last_id"))
}
