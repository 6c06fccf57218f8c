package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class LineOpsSpec extends SparkSpec {
  import sqlImplicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def shuffles(df: DataFrame): Seq[ShuffleExchangeLike] = {
    val root = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    def collect(p: SparkPlan): Seq[ShuffleExchangeLike] =
      (p match { case s: ShuffleExchangeLike => Seq(s); case _ => Seq.empty }) ++
        p.children.flatMap(collect) ++ p.subqueries.flatMap(collect)
    collect(root)
  }

  // --- lineFilter -----------------------------------------------------

  test("lineFilter: each C4 gate drops exactly its target line") {
    val d = docs((1L,
      Seq(
        "this line has plenty of words and ends well.", // kept
        "too short.",                                   // < 3 words
        "this line has no terminal punctuation at all", // no terminal
        "please enable javascript to view this page.",  // banned word
        "does a quoted ending count as terminal here?\"" // kept (quote end)
      ).mkString("\n")))
    val out = LineOps.lineFilter(d, "text", "doc_id").collect().head
    assert(out.getAs[Int]("n_lines") == 5)
    assert(out.getAs[Int]("n_kept") == 2)
    val clean = out.getAs[String]("clean").split("\n").toSeq
    assert(clean == Seq(
      "this line has plenty of words and ends well.",
      "does a quoted ending count as terminal here?\""))
  }

  test("lineFilter: requireTerminal=false and custom banned list") {
    val d = docs((1L, "alpha beta gamma\ncookie policy text here\nx y"))
    val out = LineOps.lineFilter(d, "text", "doc_id",
      minWords = 3, requireTerminal = false, banned = Seq("COOKIE")).collect().head
    assert(out.getAs[Int]("n_kept") == 1)
    assert(out.getAs[String]("clean") == "alpha beta gamma")
  }

  test("lineFilter: clean document passes through byte-identical; plan has zero shuffles") {
    val text = "one two three four.\nfive six seven eight!"
    val d = docs((7L, text))
    val df = LineOps.lineFilter(d, "text", "doc_id")
    val out = df.collect().head
    assert(out.getAs[String]("clean") == text)
    df.collect()
    assert(shuffles(df).isEmpty, "lineFilter must be a row-local projection")
  }

  // --- dedupLines -----------------------------------------------------

  private val boiler = "all rights reserved click to accept cookies"

  test("dedupLines: cross-doc repeated line removed everywhere but the keeper") {
    val d = docs(
      (1L, s"unique alpha content\n$boiler"),
      (2L, s"$boiler\nunique beta content"),
      (3L, s"unique gamma content\n$boiler\ntail gamma line"))
    val out = LineOps.dedupLines(d, "text", "doc_id")
      .orderBy("doc_id").collect()
    // doc 1 is min(doc_id) keeper: keeps the boilerplate
    assert(out(0).getAs[String]("clean") == s"unique alpha content\n$boiler")
    assert(out(0).getAs[Int]("n_removed") == 0)
    assert(out(1).getAs[String]("clean") == "unique beta content")
    assert(out(1).getAs[Int]("n_removed") == 1)
    assert(out(2).getAs[String]("clean") == "unique gamma content\ntail gamma line")
    assert(out(2).getAs[Int]("n_removed") == 1)
  }

  test("dedupLines: keepFirst=false scrubs the line from the keeper too") {
    val d = docs((1L, s"a one\n$boiler"), (2L, s"$boiler\nb two"))
    val out = LineOps.dedupLines(d, "text", "doc_id", keepFirst = false)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean") == "a one")
    assert(out(1).getAs[String]("clean") == "b two")
  }

  test("dedupLines: within-doc repetition alone is NOT cross-doc and survives") {
    val d = docs(
      (1L, "same line repeated\nsame line repeated"),
      (2L, "totally different text"))
    val out = LineOps.dedupLines(d, "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean") == "same line repeated\nsame line repeated")
    assert(out(0).getAs[Int]("n_removed") == 0)
  }

  test("dedupLines: a repeated line occurring twice in a non-keeper doc loses both occurrences") {
    val d = docs(
      (1L, boiler),
      (2L, s"$boiler\nmiddle content line\n$boiler"))
    val out = LineOps.dedupLines(d, "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean") == boiler)
    assert(out(1).getAs[String]("clean") == "middle content line")
    assert(out(1).getAs[Int]("n_removed") == 2)
  }

  test("dedupLines: blank lines are minChars-exempt — never counted, never removed") {
    val d = docs(
      (1L, "alpha first\n\nalpha second"),
      (2L, "beta first\n\nbeta second"))
    val out = LineOps.dedupLines(d, "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean") == "alpha first\n\nalpha second")
    assert(out(1).getAs[String]("clean") == "beta first\n\nbeta second")
    assert(out.map(_.getAs[Int]("n_removed")).sum == 0)
  }

  test("dedupLines: an exact duplicate document is fully scrubbed (subsumes exact dedup)") {
    val d = docs(
      (1L, "first line here\nsecond line here"),
      (2L, "first line here\nsecond line here"))
    val out = LineOps.dedupLines(d, "text", "doc_id").orderBy("doc_id").collect()
    assert(out(0).getAs[String]("clean") == "first line here\nsecond line here")
    assert(out(1).getAs[String]("clean") == "")
    assert(out(1).getAs[Int]("n_removed") == 2)
  }

  test("dedupLines: line text never crosses an exchange (md5 keys + ints only)") {
    val d = docs(
      (1L, s"unique alpha content\n$boiler"),
      (2L, s"$boiler\nunique beta content"))
    val df = LineOps.dedupLines(d, "text", "doc_id")
    df.collect()
    val leaked = shuffles(df).filter(_.output.exists(a =>
      a.name == "line" || a.name == "__line"))
    assert(leaked.isEmpty, s"line text crossed an exchange: $leaked")
  }

  test("dedupLinesAgainst: snapshot table drives removal; null keeper removes everywhere") {
    val d = docs(
      (5L, s"five one\n$boiler"),
      (6L, s"$boiler\nsix two"))
    val snap = LineOps.lineFrequency(d, "text", "doc_id")
      .filter($"n_docs" >= 2)
    val kept = LineOps.dedupLinesAgainst(d, "text", "doc_id", snap)
      .orderBy("doc_id").collect()
    assert(kept(0).getAs[String]("clean") == s"five one\n$boiler") // keeper=5 keeps
    assert(kept(1).getAs[String]("clean") == "six two")
    val nokeep = LineOps.dedupLinesAgainst(
      d, "text", "doc_id", snap.drop("keeper"), keepFirst = true)
      .orderBy("doc_id").collect()
    assert(nokeep(0).getAs[String]("clean") == "five one")
    assert(nokeep(1).getAs[String]("clean") == "six two")
  }

  test("dedupLines is idempotent: a second pass removes nothing") {
    val d = docs(
      (1L, s"unique alpha content\n$boiler"),
      (2L, s"$boiler\nunique beta content"),
      (3L, s"unique gamma content\n$boiler"))
    val once = LineOps.dedupLines(d, "text", "doc_id")
      .select($"doc_id", $"clean".as("text"))
    val twice = LineOps.dedupLines(once, "text", "doc_id")
      .orderBy("doc_id").collect()
    // after pass 1 the boilerplate survives only in the keeper, so no
    // line is cross-doc repeated any more
    assert(twice.map(_.getAs[Int]("n_removed")).sum == 0)
    assert(twice.map(_.getAs[String]("clean")).toSeq ==
      once.orderBy("doc_id").collect().map(_.getAs[String]("text")).toSeq)
  }

  test("lineFilter is idempotent: kept lines pass the gate again unchanged") {
    val d = docs((1L,
      "good line with enough words here.\nshort.\nno terminal punctuation line\nanother good long line stays!"))
    val once = LineOps.lineFilter(d, "text", "doc_id").select($"doc_id", $"clean".as("text"))
    val twice = LineOps.lineFilter(once, "text", "doc_id").collect().head
    assert(twice.getAs[Int]("n_kept") == twice.getAs[Int]("n_lines"))
    assert(twice.getAs[String]("clean") ==
      once.collect().head.getAs[String]("text"))
  }

  test("lineFrequency: distinct-doc semantics and min-id keeper") {
    val d = docs(
      (3L, s"$boiler\n$boiler"), // twice in one doc: counts once
      (9L, boiler),
      (4L, "something else entirely"))
    val row = LineOps.lineFrequency(d, "text", "doc_id")
      .filter($"n_docs" >= 2).collect()
    assert(row.length == 1)
    assert(row.head.getAs[Long]("n_docs") == 2)
    assert(row.head.getAs[Long]("keeper") == 3L)
  }

  test("lineFilter counts real words, not the empty tokens repeated spaces produce") {
    import sqlImplicits._
    // 'Buy  now.' splits to ["Buy","","now."] — the bare size() gate
    // counted 3 "words" and let two-word chrome through on raw crawl
    // text (this gate runs BEFORE Normalize squeezes spaces,
    // review r19)
    val df = Seq((1L, "Buy  now.\nA real sentence with words.")).toDF("doc_id", "text")
    val out = LineOps.lineFilter(df, "text", "doc_id", minWords = 3).collect()(0)
    assert(out.getAs[Int]("n_kept") == 1, out.toString)
    assert(out.getAs[String]("clean") == "A real sentence with words.")
  }
}
