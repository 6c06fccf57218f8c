package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RepeatedSpansSpec extends SparkSpec {

  test("shared boilerplate flags exactly the positions covered by a cross-doc span") {
    import sqlImplicits._
    // docs 1 and 2 share an 8-token boilerplate prefix; doc 3 is
    // disjoint; doc 4 is too short to have any span
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$boiler u1 u2 u3"),
      (2L, s"$boiler v1 v2 v3"),
      (3L, (1 to 12).map(i => s"w$i").mkString(" ")),
      (4L, "short text only")).toDF("doc_id", "text")
    val out = RepeatedSpans.docDupStats(df, "text", "doc_id", k = 8)
      .orderBy("doc_id").collect()
    // docs 1/2: 11 tokens -> 4 span positions; only position 1 (the
    // exact boilerplate) is shared — shifted spans differ (u vs v tail)
    assert(out(0).getInt(1) == 4 && out(0).getInt(2) == 1)
    assert(out(0).getDouble(3) == 0.25)
    assert(out(1).getInt(1) == 4 && out(1).getInt(2) == 1)
    // doc 3: 5 positions, nothing shared
    assert(out(2).getInt(1) == 5 && out(2).getInt(2) == 0 && out(2).getDouble(3) == 0.0)
    // doc 4: shorter than one span
    assert(out(3).getInt(1) == 0 && out(3).getInt(2) == 0 && out(3).getDouble(3) == 0.0)
  }

  test("exact duplicate docs: every span position is duplicated, ratio 1") {
    import sqlImplicits._
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = RepeatedSpans.docDupStats(df, "text", "doc_id", k = 8)
      .orderBy("doc_id").collect()
    out.foreach { r =>
      assert(r.getInt(1) == 13 && r.getInt(2) == 13 && r.getDouble(3) == 1.0)
    }
  }

  test("within-doc repetition alone does not count (minDocs is cross-document)") {
    import sqlImplicits._
    // one doc repeating its own phrase: spans repeat within the doc
    // but occur in only ONE distinct document
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    val df = Seq((1L, s"$phrase $phrase")).toDF("doc_id", "text")
    val out = RepeatedSpans.docDupStats(df, "text", "doc_id", k = 8).collect()
    assert(out.head.getInt(2) == 0 && out.head.getDouble(3) == 0.0)
  }

  test("occurrences count positions, not distinct spans: a shared span hit twice in one doc counts twice") {
    import sqlImplicits._
    val phrase = (1 to 8).map(i => s"p$i").mkString(" ")
    // doc 1 contains the phrase twice, doc 2 once -> doc 1 has TWO
    // duplicated positions (both occurrences are cross-doc-shared)
    val df = Seq((1L, s"$phrase $phrase"), (2L, phrase)).toDF("doc_id", "text")
    val out = RepeatedSpans.docDupStats(df, "text", "doc_id", k = 8)
      .orderBy("doc_id").collect()
    assert(out(0).getInt(2) == 2, s"both occurrences flagged: ${out(0)}")
    assert(out(1).getInt(1) == 1 && out(1).getInt(2) == 1 && out(1).getDouble(3) == 1.0)
  }

  test("pruneSpans: keeper doc keeps the span, others lose exactly the covered tokens") {
    import sqlImplicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val df = Seq(
      (1L, s"$boiler u1 u2 u3"),
      (2L, s"$boiler v1 v2 v3"),
      (3L, (1 to 12).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = RepeatedSpans.pruneSpans(df, "text", "doc_id", k = 8)
      .orderBy("doc_id").collect()
    // doc 1 is the keeper (min doc_id): untouched
    assert(out(0).getInt(1) == 11 && out(0).getInt(2) == 0)
    assert(out(0).getString(3) == s"$boiler u1 u2 u3")
    // doc 2 loses the 8 boilerplate tokens, keeps its unique tail
    assert(out(1).getInt(1) == 11 && out(1).getInt(2) == 8)
    assert(out(1).getString(3) == "v1 v2 v3")
    // doc 3 shares nothing: untouched
    assert(out(2).getInt(2) == 0 && out(2).getString(3).startsWith("w1 "))
  }

  test("pruneSpans: overlapping covered intervals merge; fully-duplicated doc prunes to empty") {
    import sqlImplicits._
    val text = (1 to 20).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val out = RepeatedSpans.pruneSpans(df, "text", "doc_id", k = 8)
      .orderBy("doc_id").collect()
    // keeper (doc 1) intact; doc 2: all 13 span starts flag, their
    // overlapping [i, i+7] intervals merge to cover all 20 tokens
    assert(out(0).getInt(2) == 0 && out(0).getString(3) == text)
    assert(out(1).getInt(2) == 20 && out(1).getString(3) == "")
  }

  test("pruneSpans: interior removal stitches head and tail around a mid-document span") {
    import sqlImplicits._
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val df = Seq(
      (1L, shared),
      (2L, s"h1 h2 $shared t1 t2")).toDF("doc_id", "text")
    val out = RepeatedSpans.pruneSpans(df, "text", "doc_id", k = 8)
      .orderBy("doc_id").collect()
    assert(out(1).getInt(2) == 8)
    assert(out(1).getString(3) == "h1 h2 t1 t2")
  }

  test("pruneSpans: keepFirst=false scrubs the keeper too") {
    import sqlImplicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    val df = Seq((1L, s"$boiler x1"), (2L, s"$boiler y1")).toDF("doc_id", "text")
    val out = RepeatedSpans.pruneSpans(df, "text", "doc_id", k = 8, keepFirst = false)
      .orderBy("doc_id").collect()
    assert(out(0).getString(3) == "x1" && out(1).getString(3) == "y1")
  }

  test("plan shape: position stream aggregates before any join; span key reused co-partitioned") {
    import sqlImplicits._
    val df = Seq((1L, (1 to 30).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = RepeatedSpans.docDupStats(df, "text", "doc_id", k = 8)
    val plan = out.queryExecution.executedPlan.toString
    // no cartesian / broadcast-nested-loop anywhere
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    // partial aggregation on the position stream (map-side combine
    // before the span shuffle)
    assert(plan.contains("HashAggregate"), plan)
  }
}
