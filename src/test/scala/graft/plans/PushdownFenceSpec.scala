package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the [[PushdownFence]] mechanism in isolation, independent of
  * the quality gate that uses it: with the fence, a filter stays
  * above the projection it guards; without it, predicate pushdown
  * inlines every referenced alias (tokenizer and all) into the
  * pushed predicate. The with/without pair also proves the hazard
  * still exists in this Spark version — if the unfenced shape stops
  * inlining, the fence may be removable; if the fenced shape starts
  * inlining, the fence broke (see the upgrade canary note in
  * QualityFilters.gophered).
  */
class PushdownFenceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def splitCount(df: DataFrame): Int =
    "split\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString).length

  /** The gate shape in miniature: one tokenization feeding two
    * signals, then a filter over both. Parquet-backed — a
    * LocalRelation would be folded eagerly and show nothing.
    */
  private def signals: DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("a", size(col("__toks")))
      .withColumn("b", size(array_distinct(col("__toks"))))
      .drop("__toks")

  test("without a fence, pushdown inlines the tokenizer per referencing conjunct") {
    val unfenced = signals.filter(col("a") > 3 && col("b") > 2)
    assert(splitCount(unfenced) >= 2,
      s"hazard gone — pushdown no longer inlines the alias; re-evaluate whether " +
        s"the fence is still needed:\n${unfenced.queryExecution.optimizedPlan}")
  }

  test("with the fence, one tokenization survives optimization") {
    val fenced = signals
      .withColumn("__f", PushdownFence.fence)
      .filter(col("a") > 3 && col("b") > 2 && col("__f"))
      .drop("__f")
    assert(splitCount(fenced) == 1,
      s"fence failed to hold the filter above the projection:\n${fenced.queryExecution.optimizedPlan}")
    assert(fenced.queryExecution.optimizedPlan.toString.contains("pushdown_fence()"),
      "fence should be visible in the optimized plan by name")
  }

  test("fence is free of semantics: fenced and unfenced results agree, twice") {
    val unfenced = signals.filter(col("a") > 3 && col("b") > 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    def fencedRun(): Array[Long] = signals
      .withColumn("__f", PushdownFence.fence)
      .filter(col("a") > 3 && col("b") > 2 && col("__f"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(unfenced.nonEmpty, "test premise: filter keeps some rows")
    assert(fencedRun().sameElements(unfenced))
    assert(fencedRun().sameElements(unfenced), "value-deterministic across runs")
  }

  test("expression contract: always true, never null, declared non-deterministic") {
    val f = PushdownFence()
    assert(f.eval(null) == true)
    assert(!f.nullable)
    assert(!f.deterministic, "deterministic=false is the entire mechanism")
    assert(!f.foldable, "foldable would let ConstantFolding erase the fence")
  }
}
