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
  * n-grams (a narrow generate), drops everything that misses the
  * broadcast hash set (left-semi), and only the MATCHED rows — output-
  * bound, contamination is rare by construction — reach the one
  * groupBy(doc) exchange that counts overlaps. Clean documents cost a
  * scan and nothing else.
  */
object Decontamination {

  /** Distinct space-joined n-grams of a whitespace-tokenized text;
    * empty array when the document has fewer than `n` tokens.
    */
  def ngrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n=$n must be positive")
    val ts = split(text, " ")
    when(size(ts) >= n,
      array_distinct(transform(sequence(lit(1), size(ts) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ts, i + j)): _*))))
      .otherwise(typedlit(Seq.empty[String]))
  }

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
      flagThreshold: Double = 0.05): DataFrame = {
    val benchGrams = bench
      .select(explode(ngrams(col(textCol), n)).as("g"))
      .distinct()
    corpus
      .withColumn("__dc_gs", ngrams(col(textCol), n))
      .select(col(idCol), size(col("__dc_gs")).as("n_ngrams"), explode(col("__dc_gs")).as("g"))
      .join(bcast(benchGrams), Seq("g"), "left_semi")
      .groupBy(col(idCol))
      .agg(max(col("n_ngrams")).as("n_ngrams"), count(lit(1)).as("n_overlap"))
      .withColumn("contam_frac",
        col("n_overlap").cast("double") / col("n_ngrams").cast("double"))
      .withColumn("flagged", (col("contam_frac") >= flagThreshold).cast("int"))
  }

  /** The removal applied: corpus minus documents at or above the flag
    * threshold — broadcast anti-join on the (small) flagged id list.
    */
  def decontaminated(
      corpus: DataFrame,
      bench: DataFrame,
      textCol: String,
      idCol: String,
      n: Int = 3,
      flagThreshold: Double = 0.05): DataFrame = {
    val flagged = report(corpus, bench, textCol, idCol, n, flagThreshold)
      .filter(col("flagged") === 1)
      .select(col(idCol))
    corpus.join(bcast(flagged), Seq(idCol), "left_anti")
  }
}
