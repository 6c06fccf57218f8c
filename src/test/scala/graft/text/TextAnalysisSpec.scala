package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("token counts: whitespace and bpe-ish") {
    import sqlImplicits._
    val df = Seq("the cat sat", "hello, world!").toDF("text")
    val out = df.select(
      TextAnalysis.tokenCount(col("text")).as("n"),
      TextAnalysis.bpeishTokenCount(col("text")).as("b")).collect()
    assert(out(0).getInt(0) == 3 && out(0).getInt(1) == 3)
    assert(out(1).getInt(0) == 2 && out(1).getInt(1) == 4) // hello , world !
  }

  test("quality score: stopword-free long text scores higher") {
    import sqlImplicits._
    val good = (1 to 60).map(i => s"tok$i").mkString(" ")
    val stoppy = Seq.fill(60)("the").mkString(" ")
    val df = Seq(good, stoppy).toDF("text")
    val s = df.select(TextAnalysis.qualityScore(col("text")).as("q")).as[Double].collect()
    assert(s(0) > 0.9, s"good=${s(0)}")
    assert(s(1) < 0.1, s"stoppy=${s(1)}")
  }

  test("langId votes by stopword hits; und for no hits; deterministic tie-break") {
    import sqlImplicits._
    val df = Seq(
      "the cat of the house and a dog",
      "el perro de la casa y el gato",
      "der hund und die katze ist da",
      "xyzzy plugh foobar").toDF("text")
    val out = df.select(TextAnalysis.langId(col("text")).as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "es", "de", "und"))
  }

  test("normalization squeezes VERTICAL TAB like Java's \\s — the portable class the oracle mirrors") {
    import sqlImplicits._
    // \x0B is in Java's \s but NOT RE2's; both engines now spell the
    // explicit class [ \t\n\x0B\f\r]+, so a vertical-tab document
    // fingerprints identically on both
    val got = Seq("a\u000B\u000Bb\tc").toDF("text")
      .select(TextAnalysis.normalized(col("text"))).head().getString(0)
    assert(got == "a b c")
    val bpeish = Seq("x\u000By!").toDF("text")
      .select(TextAnalysis.bpeishTokenCount(col("text"))).head().getInt(0)
    assert(bpeish == 3) // x, y, ! — the vertical tab is whitespace, not a symbol
  }

  test("content fingerprint is case/whitespace-normalized and collision-discriminating") {
    import sqlImplicits._
    val df = Seq("Hello  World", "hello world", "hello worlds").toDF("text")
    val fps = df.select(TextAnalysis.contentFingerprint(col("text")).as("f")).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("winnow fingerprint survives a local edit that exact fp does not") {
    import sqlImplicits._
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val edited = base + " tail"
    val df = Seq(base, edited).toDF("text")
    val rows = df.select(
      TextAnalysis.contentFingerprint(col("text")).as("exact"),
      TextAnalysis.winnowFingerprint(col("text")).as("winnow")).collect()
    assert(rows(0).getLong(0) != rows(1).getLong(0)) // exact differs
    assert(rows(0).getLong(1) == rows(1).getLong(1)) // min-shingle hash survives
  }
}
