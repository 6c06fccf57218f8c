package graft.text

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NormalizeSpec extends SparkSpec {

  private def one(s: String): String = {
    import sqlImplicits._
    Seq(Tuple1(s)).toDF("t").select(Normalize.clean(col("t"))).head.getString(0)
  }

  test("NFC recomposes decomposed sequences and leaves non-composable marks") {
    import sqlImplicits._
    val rows = Seq(
      "café",   // e + combining acute -> é (composes)
      "café",    // already composed — unchanged
      "b́ar"     // b + acute: no precomposed form — stays decomposed
    ).map(Tuple1(_)).toDF("t")
    val out = rows.select(Normalize.nfc(col("t"))).collect().map(_.getString(0))
    assert(out(0) == "café")
    assert(out(1) == "café")
    assert(out(2) == "b́ar")
    // matches the JDK normalizer it wraps, character for character
    assert(out(0) == java.text.Normalizer.normalize(
      "café", java.text.Normalizer.Form.NFC))
  }

  test("already-normalized input returns the input value without reallocation") {
    val in = UTF8String.fromString("plain ascii")
    val out = NfcNormalize(Literal(in, org.apache.spark.sql.types.StringType))
      .eval(null)
    assert(out.asInstanceOf[AnyRef] eq in.asInstanceOf[AnyRef])
  }

  test("clean: control chars to spaces, runs collapsed, edges trimmed, then NFC") {
    assert(one("a\tb") == "a b")
    assert(one("a\r\nb") == "a b")         // CR LF -> two spaces -> one
    assert(one("  a   b  ") == "a b")
    assert(one("\u0000x\u007f") == "x")    // NUL / DEL stripped to edges, trimmed
    assert(one("wéird  \t text") == "wéird text")
    assert(one("") == "")
  }

  test("null text stays null; clean is a zero-shuffle codegen projection") {
    // range input (not a local relation): ConvertToLocalRelation can't
    // pre-fold the projection, so the plan genuinely exercises
    // NfcNormalize.doGenCode inside a WholeStageCodegen span
    val df = spark.range(4).select(
      when(col("id") === 0, lit(null))
        .otherwise(concat(lit("ca"), lit("fé"), col("id").cast("string"))).as("t"))
      .select(Normalize.clean(col("t")).as("c"))
    val got = df.collect().map(r => Option(r.getString(0))).toSet
    assert(got == Set(None, Some("café1"), Some("café2"), Some("café3")), got)
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("Exchange"), plan)
    // the `*(1) Project` star: the projection sits INSIDE a
    // WholeStageCodegen span (doGenCode compiled, no fallback)
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]), plan)
  }

  test("cleaned() flags changed rows") {
    import sqlImplicits._
    val out = Normalize.cleaned(
      Seq((1L, "fine text"), (2L, "noisy\ttext")).toDF("id", "t"), "t")
      .select("id", "changed").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(1L -> 0, 2L -> 1))
  }

  test("cleaned: the changed flag is 0/1 on every row, never NULL (null text = unchanged)") {
    import sqlImplicits._
    val df = Seq(Some("a  b"), Some("ok"), None).toDF("t")
    val out = Normalize.cleaned(df, "t", out = "c")
      .select("changed").collect().map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(out.toSeq == Seq(Some(1), Some(0), Some(0)), out.mkString(","))
  }
}
