package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the step a web-crawl
  * ingest pipeline runs BEFORE any content dedup: the same page is
  * typically crawled under many spellings (scheme/host case, `www.`
  * prefix, default ports, tracking parameters, parameter order,
  * trailing slashes, fragments), and collapsing those spellings by
  * pure string algebra is orders of magnitude cheaper than letting
  * content-level MinHash/SimHash discover the duplicates later.
  *
  * Everything here composes built-in codegen'd expressions
  * (`try_parse_url` + regexp/array functions) — no UDFs, fully
  * pushdown/AQE-friendly, and the canonical form is a deterministic
  * pure function of the input string, so it is oracle-reproducible
  * (q110 mirrors it from first principles in DuckDB).
  *
  * Canonical form (RFC 3986 normalization subset + crawl conventions):
  *   1. scheme and host LOWERCASED (case-insensitive per RFC 3986)
  *   2. a leading `www.` stripped from the host
  *   3. default ports dropped (`:80` for http, `:443` for https);
  *      any other explicit port is KEPT (a different service)
  *   4. the fragment dropped (never sent to the server)
  *   5. tracking parameters dropped: any name starting `utm_`, plus
  *      `gclid`/`fbclid`/`msclkid` (click-attribution ids minted by
  *      the ad networks themselves — globally attribution-only,
  *      never resource-selecting). Names that are MERELY
  *      conventionally tracking (`ref`, `source`, ...) are NOT in
  *      the default: on real sites `ref` selects the resource
  *      (GitHub's `?ref=<branch>`, e-commerce category refs), and
  *      stripping it would collapse distinct pages into one keeper
  *      (review r19). Pass them via `dropParams` where the crawl
  *      knows its hosts.
  *   6. surviving parameters SORTED lexicographically (param order is
  *      almost never semantic; sorting collapses reordered spellings)
  *   7. the path's trailing slashes stripped; an empty path becomes
  *      `/` (so `http://h` and `http://h/` collapse)
  *   8. userinfo (`alice@host`) PRESERVED verbatim, case-sensitive —
  *      it is part of the RFC 3986 authority and selects a distinct
  *      resource on credentialed/mirror hosts (review r19: it was
  *      silently dropped, collapsing distinct URLs)
  *
  * Malformed URLs canonicalize to NULL (`try_parse_url`), never
  * throw — crawl frontiers are full of garbage lines.
  */
object UrlOps {

  /** Non-`utm_` tracking parameter names dropped by rule 5 — only
    * the globally-safe ad-network ids. Host-conventional names like
    * `ref` are deliberately absent; opt in via `dropParams`.
    */
  val TrackingParams: Seq[String] = Seq("gclid", "fbclid", "msclkid")

  /** The canonical spelling of `url` per the object contract, as one
    * composed codegen'd expression; NULL for malformed input.
    * `dropParams` extends rule 5's exact-name drop list for crawls
    * that know their hosts' conventions (e.g. add `"ref"` for a
    * storefront corpus, never for a code-forge one).
    */
  def canonicalizeUrl(url: Column, dropParams: Seq[String] = Nil): Column = {
    val u = trim(url)
    val scheme = lower(try_parse_url(u, lit("PROTOCOL")))
    // userinfo is part of the RFC 3986 authority and NO documented
    // rule touches it — rebuild it verbatim (case-sensitive: user
    // names are not hosts). Dropping it collapsed distinct
    // credentialed/mirror URLs into one keeper (review r19).
    val userinfo = try_parse_url(u, lit("USERINFO"))
    val userinfoPart =
      when(userinfo.isNull || userinfo === "", lit(""))
        .otherwise(concat(userinfo, lit("@")))
    val host = regexp_replace(lower(try_parse_url(u, lit("HOST"))), "^www\\.", "")
    val authority = lower(try_parse_url(u, lit("AUTHORITY")))
    val port = regexp_extract(authority, ":(\\d+)$", 1)
    val portPart = when(
      port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"),
      lit("")).otherwise(concat(lit(":"), port))
    val rawPath = coalesce(try_parse_url(u, lit("PATH")), lit(""))
    val path = when(regexp_replace(rawPath, "/+$", "") === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/+$", ""))
    val rawQuery = try_parse_url(u, lit("QUERY"))
    val dropped = TrackingParams ++ dropParams
    val kept = array_sort(filter(
      split(coalesce(rawQuery, lit("")), "&"),
      p => !(p === "" || p.startsWith("utm_") ||
        element_at(split(p, "="), 1).isin(dropped: _*))))
    val queryPart = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    when(scheme.isNull || host.isNull || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), userinfoPart, host, portPart, path, queryPart))
  }

  /** The canonical host with the `www.` prefix stripped — the crawl
    * pipeline's grouping key for per-domain caps/stats (pair with
    * [[graft.ops.Sampling.domainCap]]-style budgeting).
    */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(try_parse_url(trim(url), lit("HOST"))), "^www\\.", "")

  /** `df` plus a `canonical_url` column (NULL for malformed rows). */
  def withCanonicalUrl(
      df: DataFrame, urlCol: String, dropParams: Seq[String] = Nil): DataFrame = {
    require(!df.columns.contains("canonical_url"),
      "input already has a canonical_url column — rename it first")
    df.withColumn("canonical_url", canonicalizeUrl(col(urlCol), dropParams))
  }

  /** URL-level exact dedup: one row per canonical URL — the row with
    * the smallest `idCol` (deterministic keeper, the same min-id rule
    * as [[graft.dedup.Dedup]]'s exact pass). Malformed URLs (NULL
    * canonical form) fall back to their RAW string as the dedup key —
    * byte-identical garbage lines still collapse, distinct ones all
    * survive, and nulls never pool into one skewed window partition.
    * Scale shape: one window partitioned by the dedup key — shuffles
    * the projection once, ranks map-side (WindowGroupLimit), never
    * wider than the key space.
    */
  def dropDuplicateUrls(
      df: DataFrame, urlCol: String, idCol: String,
      dropParams: Seq[String] = Nil): DataFrame = {
    require(!df.columns.contains("__rk"),
      "dropDuplicateUrls: input already has a '__rk' column — rename it first")
    // the leading space keeps a fallback key from ever colliding with
    // a canonical form (canonical strings start with a scheme letter,
    // never whitespace — canonicalizeUrl trims)
    val key = coalesce(
      col("canonical_url"),
      concat(lit(" raw:"), col(urlCol)),
      concat(lit(" id:"), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key)
      .orderBy(col(idCol).asc)
    withCanonicalUrl(df, urlCol, dropParams)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "canonical_url")
  }
}
