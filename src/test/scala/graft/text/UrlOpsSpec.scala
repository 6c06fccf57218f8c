package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[Option[String]] = {
    import sqlImplicits._
    urls.toDF("url")
      .select(UrlOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => Option(r.getString(0))).toSeq
  }

  test("canonicalization: case, www, default ports, fragments, tracking params, param order, trailing slash") {
    // every spelling of the same page collapses to one canonical form
    val spellings = Seq(
      "https://www.Example.COM/docs/3?id=7",
      "HTTPS://EXAMPLE.com:443/docs/3/?id=7#section-2",
      "https://example.com/docs/3?utm_source=feed&id=7&utm_campaign=x",
      "https://example.com/docs/3?id=7&gclid=abc123",
      "  https://example.com/docs/3/?fbclid=z&id=7  ")
    val got = canon(spellings: _*)
    assert(got.forall(_.contains("https://example.com/docs/3?id=7")), got.toString)
  }

  test("rules that must NOT fire: non-default ports, non-tracking params, http vs https, real path slashes") {
    assert(canon("https://example.com:8443/a") == Seq(Some("https://example.com:8443/a")))
    assert(canon("http://example.com:80/a") == Seq(Some("http://example.com/a")))
    assert(canon("http://example.com:443/a") == Seq(Some("http://example.com:443/a")),
      ":443 is only default for httpS")
    // params sort but survive; utm_ prefix is a prefix match
    // 'ref' SURVIVES by default — on real hosts it selects the
    // resource (GitHub's ?ref=<branch>); stripping it is opt-in
    // via dropParams (review r19)
    assert(canon("https://h.io/p?b=2&a=1&ref=tw&refresh=1") ==
      Seq(Some("https://h.io/p?a=1&b=2&ref=tw&refresh=1")))
    locally {
      import sqlImplicits._
      val optIn = Seq("https://h.io/p?b=2&a=1&ref=tw&refresh=1").toDF("url")
        .select(UrlOps.canonicalizeUrl(col("url"), dropParams = Seq("ref")).as("c"))
        .collect().map(_.getString(0)).toSeq
      assert(optIn == Seq("https://h.io/p?a=1&b=2&refresh=1"))
      // distinct pages under ref stay distinct through the dedup
      val pages = Seq(
        (1L, "https://forge.io/org/repo/blob/README.md?ref=main"),
        (2L, "https://forge.io/org/repo/blob/README.md?ref=release-2.0"))
        .toDF("doc_id", "url")
      assert(UrlOps.dropDuplicateUrls(pages, "url", "doc_id").count() == 2)
    }
    // http and https stay distinct schemes (no scheme folding)
    assert(canon("http://example.com/a").head.get != canon("https://example.com/a").head.get)
    // interior slashes are content; only TRAILING ones strip
    assert(canon("https://h.io/a//b///") == Seq(Some("https://h.io/a//b")))
    // empty path becomes /
    assert(canon("https://h.io", "https://h.io/") ==
      Seq(Some("https://h.io/"), Some("https://h.io/")))
    // all params tracking -> no query part at all
    assert(canon("https://h.io/p?utm_source=a&utm_medium=b") == Seq(Some("https://h.io/p")))
  }

  test("malformed URLs canonicalize to null, never throw; dedup keeps them by raw string") {
    import sqlImplicits._
    assert(canon("not a url at all", "http//missing.colon/x", "") == Seq(None, None, None))
    val df = Seq(
      (1L, "https://www.A.com/x?utm_source=s"),
      (2L, "https://a.com/x"), //   same page as 1 -> 1 kept
      (3L, "garbage line"),
      (4L, "garbage line"), //      byte-identical garbage -> 3 kept
      (5L, "other garbage"), //     distinct garbage -> kept
      (6L, "https://b.com/y")) //   unique page -> kept
      .toDF("doc_id", "url")
    val kept = UrlOps.dropDuplicateUrls(df, "url", "doc_id")
    assert(kept.columns.toSeq == Seq("doc_id", "url"), "working columns must not leak")
    assert(kept.collect().map(_.getLong(0)).toSet == Set(1L, 3L, 5L, 6L))
  }

  test("canonicalHost strips www and case; withCanonicalUrl refuses a column collision") {
    import sqlImplicits._
    val hosts = Seq("https://WWW.Sub.Example.COM:8443/p?q=1", "not a url")
      .toDF("url")
      .select(UrlOps.canonicalHost(col("url")).as("h"))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(hosts == Seq(Some("sub.example.com"), None))
    intercept[IllegalArgumentException] {
      UrlOps.withCanonicalUrl(
        Seq(("x", "y")).toDF("url", "canonical_url"), "url")
    }
  }

  test("dedup window ranks map-side: the plan carries a WindowGroupLimit below the full window") {
    import sqlImplicits._
    val df = (1 to 100).map(i => (i.toLong, s"https://h$i.io/p")).toDF("doc_id", "url")
    val plan = UrlOps.dropDuplicateUrls(df, "url", "doc_id").queryExecution.executedPlan
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      // the AQE root exposes no children; pre-execution its
      // executedPlan IS the initial plan
      val inner = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => p.children ++ p.subqueries
      }
      p +: inner.flatMap(nodes)
    }
    assert(nodes(plan).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowGroupLimitExec]),
      plan.toString)
  }

  test("userinfo is preserved verbatim: credentialed URLs never collapse into the bare host") {
    import sqlImplicits._
    // userinfo is RFC 3986 authority that no canonicalization rule
    // touches — rebuilding the URL without it collapsed distinct
    // resources (review r19)
    assert(canon(
      "https://alice@host.io/p", "https://bob@host.io/p", "https://host.io/p") ==
      Seq(Some("https://alice@host.io/p"), Some("https://bob@host.io/p"),
        Some("https://host.io/p")))
    val pages = Seq(
      (1L, "https://alice@host.io/p"), (2L, "https://bob@host.io/p"),
      (3L, "https://host.io/p")).toDF("doc_id", "url")
    assert(UrlOps.dropDuplicateUrls(pages, "url", "doc_id").count() == 3)
    intercept[IllegalArgumentException] {
      UrlOps.dropDuplicateUrls(
        Seq((1L, "https://h.io/", 9)).toDF("doc_id", "url", "__rk"), "url", "doc_id")
    }
  }
}
