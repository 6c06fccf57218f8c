package graft.ops

import graft.SparkSpec

class SnapshotDiffSpec extends SparkSpec {
  import sqlImplicits._

  private val prev = Seq(
    (1L, "alpha text"), (2L, "beta text"), (3L, "gamma text")).toDF("doc_id", "text")
  private val next = Seq(
    (1L, "alpha text"),          // unchanged
    (2L, "beta text edited"),    // changed
    (4L, "delta text")           // added; 3 removed
  ).toDF("doc_id", "text")

  test("diff classifies all four statuses") {
    val got = SnapshotDiff.diff(prev, next, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("summary rolls the diff up to release-note counts") {
    val got = SnapshotDiff.summary(prev, next, "text", "doc_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("unchanged" -> 1L, "changed" -> 1L, "removed" -> 1L, "added" -> 1L))
  }

  test("null-text documents classify by PRESENCE, not fingerprint nullity") {
    // md5(null) is null — fingerprint-nullity classification would
    // call a null-text doc present in both snapshots "added"
    val p = Seq((1L, Option.empty[String]), (2L, Some("x")), (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val n = Seq((1L, Option.empty[String]), (2L, Option.empty[String]), (4L, Option.empty[String]))
      .toDF("doc_id", "text")
    val got = SnapshotDiff.diff(p, n, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", // null -> null: same (absent) content
      2L -> "changed",   // text -> null
      3L -> "removed",
      4L -> "added"))
  }

  test("identical releases are all-unchanged; empty prev is all-added") {
    val same = SnapshotDiff.diff(prev, prev, "text", "doc_id")
      .collect().map(_.getString(1)).toSet
    assert(same == Set("unchanged"))
    val empty = prev.limit(0)
    val adds = SnapshotDiff.diff(empty, next, "text", "doc_id")
      .collect().map(_.getString(1)).toSet
    assert(adds == Set("added"))
  }
}
