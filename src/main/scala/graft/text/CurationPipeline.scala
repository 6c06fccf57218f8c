package graft.text

import graft.core.{Pipeline, PipelineContext, Processor}
import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data curation pipeline: the engine's Processor framework
  * driving the text/dedup operator families end-to-end, the way a
  * pretraining-corpus build would at 100 TB:
  *
  *   annotate (langid/quality/fingerprints) -> exact dedup (hash
  *   groupBy on the 64-bit fingerprint) -> near-dedup (MinHash-LSH
  *   candidates, keep the smallest doc per duplicate cluster) ->
  *   quality gate -> curated corpus + survival stats.
  *
  * Every stage except near-dedup is a lazy DataFrame transform; the
  * near-dedup step MATERIALIZES the verified pair list at
  * processor-execution time (one pass of the annotate -> exact-dedup
  * -> shingle -> LSH -> verify upstream) because cluster resolution
  * is a fixpoint over it — [[Dedup.dupClusters]] then resolves the
  * materialized list with driver-side union-find (one collect; the
  * list is control-plane-sized by construction) or distributed label
  * propagation above ~10 M edges. Survival is CLUSTER-canonical: one
  * doc — the smallest id — survives per connected component, so
  * chained near-dups (a~b, b~c) collapse to a single survivor
  * instead of whatever a per-pair drop happens to leave.
  */
object CurationPipeline {

  val annotate: Processor = Processor("Annotate", required = Seq("documents")) { ctx =>
    val docs = ctx.table("documents")
    // one materialized tokenization feeds all three token signals —
    // the text-based forms would re-split at every structural
    // reference (langId votes once per language, qualityScore ~6x)
    val toks = col("__ann_toks")
    ctx.withTable("annotated", docs
      .withColumn("__ann_toks", TextAnalysis.tokens(col("text")))
      .withColumn("detected_lang", TextAnalysis.langIdOfTokens(toks))
      .withColumn("n_tokens", size(toks))
      .withColumn("quality", TextAnalysis.qualityScoreOfTokens(toks, col("text")))
      .withColumn("fp", TextAnalysis.contentFingerprint(col("text")))
      .drop("__ann_toks"))
  }

  val exactDedup: Processor = Processor("ExactDedup", required = Seq("annotated")) { ctx =>
    ctx.withTable("exact_deduped", Dedup.exactDedup(ctx.table("annotated"), "text", "doc_id"))
  }

  /** Keep one doc per transitive duplicate cluster: LSH candidates
    * verified by EXACT n-gram Jaccard ([[Dedup.verifyCandidates]], so
    * the survival decision uses a true threshold, not the minhash
    * estimate), resolved to connected components
    * ([[Dedup.dupClusters]]), smallest doc_id per cluster survives.
    * The cluster pass runs on the verified PAIR LIST — thousands of
    * rows where the corpus has billions — so its iterative joins are
    * control-plane-cheap next to the shingling scan.
    */
  val nearDedup: Processor = Processor("NearDedup", required = Seq("exact_deduped")) { ctx =>
    val docs = ctx.table("exact_deduped")
    val (pairs, release) =
      Dedup.verifyCandidatesReleasable(docs, "text", "doc_id", n = 3, threshold = 0.5)
    // dupClusters materializes `pairs` eagerly at call time, so the
    // shingle-hash cache inside verifyCandidates is consumed exactly
    // once and can be released as soon as the call returns.
    val clusters = Dedup.dupClusters(pairs)
    release()
    val losers = clusters
      .filter(col("id") =!= col("cluster"))
      .select(col("id").as("doc_id"))
    ctx.withTable("near_deduped", docs.join(broadcast(losers), Seq("doc_id"), "left_anti"))
  }

  val qualityGate: Processor = Processor("QualityGate", required = Seq("near_deduped")) { ctx =>
    val minQ = ctx.config.getOrElse("min_quality", "0.3").toDouble
    ctx.withTable("curated", ctx.table("near_deduped").filter(col("quality") >= minQ))
  }

  val stats: Processor = Processor("CurationStats", required = Seq("curated")) { ctx =>
    val n0 = ctx.table("documents").count()
    val n1 = ctx.table("exact_deduped").count()
    val n2 = ctx.table("near_deduped").count()
    val n3 = ctx.table("curated").count()
    ctx.withResult("curation_stats", Map(
      "input" -> n0, "after_exact_dedup" -> n1,
      "after_near_dedup" -> n2, "curated" -> n3))
  }

  val steps: Seq[Processor] = Seq(annotate, exactDedup, nearDedup, qualityGate, stats)

  /** Checkpointing ON: the stats step counts every intermediate table,
    * and without persistence each count would recompute the MinHash
    * candidate stage from scratch (3x the heaviest work).
    */
  def pipeline: Pipeline = new Pipeline(steps, enableCheckpoints = true)

  def run(spark: SparkSession, sfDir: String, minQuality: Double = 0.3): PipelineContext =
    pipeline.run(PipelineContext(
      "corpus-curation",
      config = Map("min_quality" -> minQuality.toString),
      tables = Map("documents" -> graft.sources.Sources.documents(spark, sfDir))))

  /** Queries-map entry: the curated corpus with its annotations.
    * `fp` (the xxhash64 dedup key) stays internal — the projection is
    * chosen so EVERY column is DuckDB-reproducible and the whole
    * 4-stage pipeline oracle-checks hash-exact (see
    * [[graft.queries.TextQueries.q36Sql]]).
    */
  def curatedDf(spark: SparkSession, sfDir: String): DataFrame =
    run(spark, sfDir).table("curated")
      .select("doc_id", "detected_lang", "n_tokens", "quality")
      .orderBy("doc_id")
}
