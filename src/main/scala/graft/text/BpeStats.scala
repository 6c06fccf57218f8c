package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast => bcast, _}

/** Byte-pair-encoding tokenizer-training statistics over a document
  * corpus (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — the public BPE algorithm; reference
  * analogue: the survey's token-counting family, which this extends
  * from counting under a FIXED tokenizer to TRAINING one).
  *
  * Scale shape: every operator here funnels the corpus through ONE
  * word-frequency aggregation — corpus-grain rows collapse map-side
  * into vocabulary-grain `(word, freq)` rows before the only
  * corpus-wide exchange (word explode is a narrow generate; partial
  * aggregation combines within each scan partition). Everything
  * downstream — pair counts, merge training, vocabulary segmentation
  * — is vocabulary-grain: its cost is bounded by the number of
  * DISTINCT words, which grows ~logarithmically with corpus size
  * (Heaps' law), not with the 100 TB. BPE training itself is a pure
  * function of the word-frequency table, so [[trainMerges]] runs on
  * the driver over a deterministically CAPPED top-`maxVocab` slice —
  * the same bounded-control-plane pattern as IVF centroid training
  * ([[graft.similarity.Ivf]]) — never over corpus rows.
  */
object BpeStats {

  /** End-of-word marker symbol (the published algorithm's `</w>`):
    * lets a merge distinguish word-final from word-internal pairs.
    */
  val EndOfWord = "</w>"

  /** One string per Unicode CODE POINT of `word` — the character grain
    * every BPE step shares. The Spark-side passes are code-point
    * grained already (`split(w, "")` and `substr` never split a
    * surrogate pair), so the JVM-side merge loop and segmenter must be
    * too: splitting on UTF-16 code units (`w.map(_.toString)`) would
    * train base symbols the segmenter can never produce — any
    * supplementary-plane character (emoji, rare CJK) then throws a
    * spurious "corpus drifted since fit" on the very corpus fit ran on.
    */
  private[text] def codePointStrings(word: String): scala.collection.mutable.ArrayBuffer[String] = {
    val buf = new scala.collection.mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      buf += word.substring(i, i + n)
      i += n
    }
    buf
  }

  /** `(w, freq)` — corpus word frequencies. The single corpus-grain
    * pass everything in this object hangs off; empty tokens (from
    * repeated separators) are dropped. One exchange, vocab-grain
    * after map-side combine.
    */
  def wordFrequencies(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** `(lhs, rhs, pair_count)` — adjacent character-pair occurrence
    * counts over the corpus, each word's last character pairing with
    * [[EndOfWord]]; `pair_count` weights every occurrence by the
    * word's corpus frequency. This is exactly the statistic the first
    * BPE merge maximizes. Pure integer arithmetic — hash-exact
    * against the DuckDB oracle (q51).
    *
    * The character fan-out happens on the VOCAB-grain side of the
    * word aggregation (a per-distinct-word generate), so its row
    * count is `sum over vocab of |w|+1` regardless of corpus size.
    */
  def pairCounts(df: DataFrame, textCol: String): DataFrame = {
    val w = col("w")
    val sym = transform(sequence(lit(1), length(w)),
      i => struct(
        w.substr(i, lit(1)).as("l"),
        when(i === length(w), lit(EndOfWord)).otherwise(w.substr(i + 1, lit(1))).as("r")))
    wordFrequencies(df, textCol)
      .select(col("freq"), explode(sym).as("p"))
      .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
      .agg(sum(col("freq")).as("pair_count"))
  }

  /** The capped vocabulary [[trainMerges]] trains on: top-`maxVocab`
    * words by `(freq DESC, w ASC)` — the deterministic truncation
    * that makes driver-side training fixed-size at ANY corpus scale
    * (training BPE on a frequency-truncated vocabulary is standard
    * practice; the tail it drops are hapax-grade types whose pair
    * mass is negligible by construction).
    */
  def cappedVocab(df: DataFrame, textCol: String, maxVocab: Int): Array[(String, Long)] = {
    require(maxVocab > 0, s"maxVocab=$maxVocab must be positive")
    wordFrequencies(df, textCol)
      .orderBy(col("freq").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
  }

  /** BPE merge training over a word-frequency table: `numMerges`
    * rounds, each picking the most frequent adjacent symbol pair
    * (ties broken lexicographically on (lhs, rhs) — deterministic)
    * and fusing it everywhere. Returns the merge rules IN ORDER with
    * the pair count each saw. Stops early when no pair occurs twice
    * (merging a count-1 pair learns noise — the published algorithm's
    * stopping criterion).
    *
    * Pure driver-side function of the vocab-grain input (see object
    * doc for why that is the correct 100 TB shape).
    */
  def trainMerges(
      vocab: Array[(String, Long)],
      numMerges: Int): Seq[((String, String), Long)] = {
    require(numMerges >= 0, s"numMerges=$numMerges must be >= 0")
    // mutable symbol sequences, one per word type (code-point grain —
    // see codePointStrings)
    val words = vocab.map { case (w, f) =>
      (codePointStrings(w) += EndOfWord, f)
    }
    val merges = scala.collection.mutable.ListBuffer.empty[((String, String), Long)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2L)
      if (best.isEmpty) exhausted = true
      else {
        val ((l, r), c) = best.minBy { case ((l, r), c) => (-c, l, r) }
        merges += (((l, r), c))
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) {
              syms(i) = l + r
              syms.remove(i + 1)
              // fused symbol may pair with its LEFT neighbor — recheck
              if (i > 0) i -= 1
            } else i += 1
          }
        }
        round += 1
      }
    }
    merges.toList
  }

  /** Segment one word under an ordered merge list: start from
    * characters + [[EndOfWord]], repeatedly fuse the adjacent pair
    * with the LOWEST merge rank until none applies — the published
    * encoding procedure (greedy by training order, not by position).
    */
  def segmentWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val syms = codePointStrings(word) += EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bestAt = i }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        syms(bestAt) = syms(bestAt) + syms(bestAt + 1)
        syms.remove(bestAt + 1)
      }
    }
    syms.toSeq
  }

  /** `df` plus an `n_subtokens` column: per-document token count
    * under the trained merges. The segmenter (an imperative merge
    * loop — genuinely not expressible as codegen'd column algebra)
    * runs ONCE PER DISTINCT WORD on a vocab-grain table, and the
    * corpus-grain work is a broadcast join of exploded words against
    * that `(word, n_sub)` table plus one per-doc sum — so the UDF
    * cost is vocabulary-bounded while the corpus only pays join+agg.
    * Words outside the broadcast table cannot occur (the table is
    * derived from this corpus' own distinct words). EVERY input row
    * appears in the output (wordless documents count 0, null ids are
    * keys like any other — the same null-safe join-back discipline as
    * [[BpeTokenizer.countsFromModel]]; review r19: the old form
    * returned a bare (id, count) aggregate that silently OMITTED
    * wordless documents and contradicted this doc line).
    */
  def subtokenCounts(
      df: DataFrame,
      textCol: String,
      idCol: String,
      merges: Seq[((String, String), Long)]): DataFrame = {
    require(!df.columns.contains("n_subtokens"),
      "input must not contain reserved column n_subtokens")
    val ranks = merges.map(_._1).zipWithIndex.toMap
    val bcRanks = df.sparkSession.sparkContext.broadcast(ranks)
    val segLen = udf((w: String) => segmentWord(w, bcRanks.value).length)
    val vocabSeg = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .distinct()
      .withColumn("n_sub", segLen(col("w")))
    val counts = df.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(bcast(vocabSeg), Seq("w"))
      .groupBy(col(idCol))
      .agg(sum(col("n_sub")).cast("long").as("n_subtokens"))
    graft.text.BpeTokenizer.joinBackNullSafe(df, counts, idCol)
      .withColumn("n_subtokens", coalesce(col("n_subtokens"), lit(0L)))
  }
}
