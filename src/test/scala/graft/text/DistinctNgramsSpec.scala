package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistinctNgramsSpec extends SparkSpec {

  // adversarial tokenization shapes: repeated/leading/trailing spaces
  // (empty tokens), short docs, single token, empty string, unicode
  private val texts = Seq(
    "a b c d",
    "a b a b",
    "a  b c",      // double space -> empty token in the middle
    " a b c",      // leading space -> empty first token
    "a b c ",      // trailing space -> empty last token
    "a",
    "",
    "solo pair",
    "日本 語 テスト です",
    "x y x y x y x")

  test("expression grams equal the column-algebra form byte-for-byte, order included") {
    import sqlImplicits._
    for (n <- 1 to 4) {
      val df = texts.toDF("text")
        .withColumn("__toks", split(col("text"), " "))
        .select(
          Decontamination.ngrams(col("text"), n).as("fast"),
          Decontamination.ngramsOfTokens(col("__toks"), n).as("ref"))
      df.collect().zip(texts).foreach { case (r, t) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n text='$t': fast=${r.getSeq[String](0)} ref=${r.getSeq[String](1)}")
      }
    }
  }

  test("null text: ngrams() keeps the empty-array contract; the raw expression is null") {
    import sqlImplicits._
    val df = Seq[Option[String]](None).toDF("text")
      .select(
        Decontamination.ngrams(col("text"), 3).as("api"),
        Decontamination.distinctNgrams(col("text"), 3).as("raw"))
    val r = df.head()
    assert(r.getSeq[String](0) == Seq.empty)
    assert(r.isNullAt(1))
  }

}
