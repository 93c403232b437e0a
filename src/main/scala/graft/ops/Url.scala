package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL CANONICALIZATION + HOST-GRAIN CURATION STATS — the
  * crawl-curation surface the reference's CommonCrawl corpus implies
  * (reference `sift/corpora/commoncrawl.py` keys documents by record
  * URL; its `utils.py` link trims are the document-grain twin the
  * `p3_url_normalize` gate already covers). Every real crawl pipeline
  * needs the page-grain form: fold the URL variants that name the same
  * resource into one canonical key, then aggregate curation features
  * per host.
  *
  * Rules (RFC 3986 §6 syntax-based normalization + the standard crawl
  * conventions; each is a pure codegen-able column expression — no
  * UDFs, so the whole canonicalization rides the scan at 100 TB):
  *  1. scheme and host lowercase (§6.2.2.1)
  *  2. percent-encoding normalized (§6.2.2): hex digits UPPERCASED
  *     (§6.2.2.1) and unreserved octets DECODED (§6.2.2.2 —
  *     ALPHA/DIGIT/-._~); reserved and non-ASCII octets stay encoded,
  *     so no delimiter can appear or vanish and parsing the
  *     normalized string is safe
  *  3. default port dropped (http:80 / https:443, §6.2.3)
  *  4. fragment dropped (never sent to the server)
  *  5. userinfo dropped (crawl convention: `user:pass@` names a
  *     session, not the resource; also keeps host-grain stats from
  *     splitting on credentials)
  *  6. `www.` host prefix dropped (crawl convention: www/apex serve
  *     the same site; host-grain stats must not split them)
  *  7. tracking params dropped (utm_*, fbclid, gclid) — they name the
  *     campaign, not the resource
  *  8. remaining query params SORTED (param order is
  *     semantics-irrelevant for the overwhelming majority of sites;
  *     byte order, ties impossible since full `k=v` strings compare)
  *  9. empty path → `/` (§6.2.3); ONE trailing slash dropped from
  *     non-root paths (crawl convention)
  *
  * Explicitly OUT of scope (documented, not silent): IDN/punycode
  * host folding (needs the full IDNA mapping tables — a non-ASCII
  * host passes through byte-identical, so keys stay consistent if
  * the crawler emits one form) and dot-segment removal (§6.2.2.3 —
  * crawl URLs are absolute; `..` segments are left verbatim).
  *
  * Parsing is regex-based (anchored, same expressions on the engine
  * and oracle sides) rather than `parse_url`, so the DuckDB twin can
  * be written with the identical grammar.
  */
object Url {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://.*"
  // authority = [userinfo@]host[:port] — the optional non-capturing
  // userinfo prefix may contain ':' (user:pass) but never /?#@
  private val HostRe =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+).*"
  private val PortRe =
    "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]+:([0-9]+).*"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*"
  private val TrackingRe = "^(utm_|fbclid=|gclid=)"
  // 2-char UPPERCASE hex codes of the RFC 3986 unreserved set:
  // 41-5A A-Z, 61-7A a-z, 30-39 0-9, 2D '-', 2E '.', 5F '_', 7E '~'
  private val UnreservedHexRe =
    "^(4[1-9A-F]|5[0-9A]|6[1-9A-F]|7[0-9A]|3[0-9]|2[DE]|5F|7E)$"

  /** §6.2.2 percent-encoding normalization as pure column
    * expressions: split on '%', then each following segment's leading
    * two chars are the candidate hex octet — decoded when unreserved,
    * uppercased when reserved/non-ASCII, left verbatim (with the '%'
    * restored) when not valid hex. Decoding only ever produces
    * alphanumerics and -._~, so the URL's delimiter structure is
    * untouched and the normalized string parses identically.
    */
  def pctNormalize(url: Column): Column = {
    val parts = split(url, "%", -1)
    val rest = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val fixed = transform(rest, seg => {
      val hexU = upper(substring(seg, 1, 2))
      val tail = substring(seg, 3, Int.MaxValue)
      val decoded = call_function("char", conv(hexU, 16, 10).cast("int"))
      when(hexU.rlike(UnreservedHexRe), concat(decoded, tail))
        .when(hexU.rlike("^[0-9A-F]{2}$"), concat(lit("%"), hexU, tail))
        .otherwise(concat(lit("%"), seg))
    })
    concat(element_at(parts, 1), array_join(fixed, ""))
  }

  /** Lowercased scheme, or '' when the value isn't an absolute URL. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host (userinfo stripped, any `www.` prefix dropped),
    * from an ALREADY pct-normalized URL. */
  private def hostOf(nu: Column): Column =
    regexp_replace(lower(regexp_extract(nu, HostRe, 1)), "^www\\.", "")

  /** Lowercased host with userinfo and any `www.` prefix dropped. */
  def host(url: Column): Column = hostOf(pctNormalize(url))

  /** The canonical URL (from an already pct-normalized input). */
  private def canonicalizeNormalized(nu: Column): Column = {
    val sch = scheme(nu)
    val h = hostOf(nu)
    val port = regexp_extract(nu, PortRe, 1)
    val keepPort = port =!= "" &&
      !((sch === "http" && port === "80") ||
        (sch === "https" && port === "443"))
    val rawPath = regexp_extract(nu, PathRe, 1)
    val path0 = when(rawPath === "", "/").otherwise(rawPath)
    val path = when(path0 =!= "/" && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    val query = regexp_extract(nu, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val sortedQ = array_join(array_sort(params), "&")
    concat(sch, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** The canonical URL per the object's rule list. */
  def canonicalize(url: Column): Column =
    canonicalizeNormalized(pctNormalize(url))

  /** (urlCol) → df + (canon_url, host) columns. The pct-normalized
    * intermediate is computed once and shared by both derivations. */
  def withCanonical(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("_graft_nu", pctNormalize(col(urlCol)))
      .withColumn("canon_url", canonicalizeNormalized(col("_graft_nu")))
      .withColumn("host", hostOf(col("_graft_nu")))
      .drop("_graft_nu")

  /** Host-grain curation stats over a canonicalized frame: doc and
    * unique-resource counts (their gap = the URL-variant dup mass the
    * canonicalizer folded), language spread, and mean document length
    * — the per-host features a crawl-curation policy joins back onto
    * documents. One hash aggregate keyed by host: partitions cleanly
    * at any scale (hosts are many and the per-host state is O(1) —
    * COUNT DISTINCT over canon_url shuffles (host, canon_url) pairs,
    * still uniform because canon_url embeds the host).
    */
  def hostStats(canonical: DataFrame): DataFrame =
    canonical.groupBy("host").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("canon_url")).as("n_unique_urls"),
      (count(lit(1)) - countDistinct(col("canon_url")))
        .as("n_dup_docs"),
      round(avg(col("n_chars")), 6).as("avg_chars"),
      countDistinct(col("lang")).as("n_langs"))
}
