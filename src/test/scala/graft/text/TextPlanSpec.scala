package graft.text

import graft.SparkSpec
import graft.queries.PipelineQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Plan-shape contracts for the text pack: the round-9/10 headline
  * perf bug was Catalyst silently re-evaluating the tokenizer — HOF
  * lambdas get no common-subexpression elimination, and
  * InferFiltersFromGenerate + predicate pushdown can inline a
  * generator-input alias (split and all) into a scan filter. These
  * asserts pin the fixed shapes so a refactor that quietly
  * reintroduces re-tokenization fails the suite, not the benchmark.
  */
class TextPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def splitCount(df: DataFrame): Int =
    "split\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString).length

  private def ngramExprCount(df: DataFrame): Int =
    "distinct_ngrams\\(".r.findAllIn(df.queryExecution.optimizedPlan.toString).length

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def collect(p: SparkPlan): Seq[ShuffleExchangeLike] =
      (p match {
        case s: ShuffleExchangeLike => Seq(s)
        case _ => Seq.empty
      }) ++ p.children.flatMap(collect) ++
        p.subqueries.flatMap(collect)
    collect(root)
  }

  test("q43 decontamination: one n-gram pass per side (corpus + bench), no split, no text in any exchange") {
    val df = PipelineQueries.q43Decontamination(spark, dir)
    assert(ngramExprCount(df) == 2, s"expected 2 distinct_ngrams sites, plan:\n${df.queryExecution.optimizedPlan}")
    assert(splitCount(df) == 0, s"tokenizer leaked back into the plan:\n${df.queryExecution.optimizedPlan}")
    df.collect() // finalize AQE so executedPlan is the real one
    val leaked = shuffles(df).filter(_.output.exists(_.name == "text"))
    assert(leaked.isEmpty, s"document text crossed an exchange: $leaked")
  }

  test("q45 corpus novelty: one n-gram pass per side (df pass + score pass), no split, no text in any exchange") {
    val df = PipelineQueries.q45CorpusNovelty(spark, dir)
    assert(ngramExprCount(df) == 2, s"expected 2 distinct_ngrams sites, plan:\n${df.queryExecution.optimizedPlan}")
    assert(splitCount(df) == 0, s"tokenizer leaked back into the plan:\n${df.queryExecution.optimizedPlan}")
    df.collect()
    val leaked = shuffles(df).filter(_.output.exists(_.name == "text"))
    assert(leaked.isEmpty, s"document text crossed an exchange: $leaked")
  }

  test("q22 quality score: one split site feeds all three signals") {
    val df = graft.queries.TextQueries.q22QualityScore(spark, dir)
    assert(splitCount(df) == 1, s"expected 1 split site, plan:\n${df.queryExecution.optimizedPlan}")
  }

  test("q25 langid+fingerprints: one split site, one normalization regex") {
    val df = graft.queries.TextQueries.q25LangIdFingerprint(spark, dir)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(splitCount(df) == 1, s"expected 1 split site, plan:\n$plan")
    val normCount = "regexp_replace\\(".r.findAllIn(plan).length
    assert(normCount == 1, s"expected 1 shared normalization, got $normCount:\n$plan")
  }

  test("q25a langid+tokens: one split site feeds the vote and both counts") {
    // five language filters + size() all reference the bound __toks
    // attribute — a re-derivation would show as 6+ split sites
    val df = graft.queries.TextQueries.q25aLangIdTokens(spark, dir)
    assert(splitCount(df) == 1,
      s"expected 1 split site, plan:\n${df.queryExecution.optimizedPlan}")
  }

  test("gophered gate: the keep filter does not inline the signals into the scan (one split site)") {
    // the ungated q42 below was always fine — the regression mode is
    // the FILTER: predicate pushdown inlines aliases with no cost
    // guard, so without the barrier the gate re-tokenized 21x per row
    val df = graft.text.QualityFilters.gophered(
      graft.sources.Sources.documents(spark, dir), "text")
    assert(splitCount(df) == 1, s"expected 1 split site, plan:\n${df.queryExecution.optimizedPlan}")
  }

  test("q42 quality filters: one split for all seven signals, zero shuffles") {
    val df = PipelineQueries.q42QualityFilters(spark, dir)
    assert(splitCount(df) == 1, s"expected 1 split site, plan:\n${df.queryExecution.optimizedPlan}")
    df.collect()
    // the gate itself is a pure scan; the only allowed exchange is the
    // final presentation ORDER BY
    val nonSort = shuffles(df).filterNot(
      _.toString.toLowerCase.contains("rangepartitioning"))
    assert(nonSort.isEmpty, s"quality gate should not shuffle: $nonSort")
  }
}
