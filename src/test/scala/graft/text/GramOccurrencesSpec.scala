package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[GramOccurrences]] is a drop-in for the staged column pipeline
  * `concat(split(text), transform(sequence, concat_ws(slice)))` —
  * pinned bit-exact as a MULTISET per row (consumers aggregate; the
  * expression emits all unigrams then all bigrams, the column form
  * interleaves identically here since both are order-n emission).
  */
class GramOccurrencesSpec extends SparkSpec {
  import sqlImplicits._

  /** The column-algebra form the expression replaces: all n-gram
    * occurrences for n in 1..maxN via split + transform.
    */
  private def columnForm(text: String, maxN: Int): Seq[String] = {
    val toks: Seq[String] = text.split(" ", -1).toSeq
    (1 to maxN).flatMap(n => toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq)
  }

  private def exprForm(text: String, maxN: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(explode(ImportanceResampling.gramOccurrences(col("t"), maxN)).as("g"))
      .as[String].collect().toSeq

  private val cases = Seq(
    "the quick brown fox jumps",
    "one",
    "",
    "a b",
    "a  b", // repeated space -> empty token, same as split(text, " ")
    " lead", "trail ",
    "naïve café über — emoji 🙂 end", // multi-byte UTF-8 spans
    "x x x x") // repeated grams kept (occurrences, not distinct)

  test("bit-exact against the split+transform column form, n=1..2 and n=1..3") {
    for (t <- cases; maxN <- Seq(1, 2, 3)) {
      assert(exprForm(t, maxN) == columnForm(t, maxN), s"text=[$t] maxN=$maxN")
    }
  }

  test("single token emits no bigrams; null text propagates null") {
    assert(exprForm("one", 2) == Seq("one"))
    val rows = Seq((1, Option.empty[String])).toDF("id", "t")
      .select(ImportanceResampling.gramOccurrences(col("t"), 2).as("g"))
      .collect()
    assert(rows.head.isNullAt(0))
  }

  test("occurrence counts weight repeats: 'x x x' has 3 unigrams + 2 bigrams") {
    val g = exprForm("x x x", 2)
    assert(g == Seq("x", "x", "x", "x x", "x x"))
  }
}
