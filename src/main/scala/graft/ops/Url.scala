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
  *  2. default port dropped (http:80 / https:443, §6.2.3)
  *  3. fragment dropped (never sent to the server)
  *  4. `www.` host prefix dropped (crawl convention: www/apex serve
  *     the same site; host-grain stats must not split them)
  *  5. tracking params dropped (utm_*, fbclid, gclid) — they name the
  *     campaign, not the resource
  *  6. remaining query params SORTED (param order is
  *     semantics-irrelevant for the overwhelming majority of sites;
  *     byte order, ties impossible since full `k=v` strings compare)
  *  7. empty path → `/` (§6.2.3); ONE trailing slash dropped from
  *     non-root paths (crawl convention)
  *
  * Parsing is regex-based (anchored, same expressions on the engine
  * and oracle sides) rather than `parse_url`, so the DuckDB twin can
  * be written with the identical grammar.
  */
object Url {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://.*"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+).*"
  private val PortRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#:]+:([0-9]+).*"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*).*"
  private val TrackingRe = "^(utm_|fbclid=|gclid=)"

  /** Lowercased scheme, or '' when the value isn't an absolute URL. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host with any `www.` prefix dropped. */
  def host(url: Column): Column =
    regexp_replace(lower(regexp_extract(url, HostRe, 1)), "^www\\.", "")

  /** The canonical URL per the object's rule list. */
  def canonicalize(url: Column): Column = {
    val sch = scheme(url)
    val h = host(url)
    val port = regexp_extract(url, PortRe, 1)
    val keepPort = port =!= "" &&
      !((sch === "http" && port === "80") ||
        (sch === "https" && port === "443"))
    val rawPath = regexp_extract(url, PathRe, 1)
    val path0 = when(rawPath === "", "/").otherwise(rawPath)
    val path = when(path0 =!= "/" && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    val query = regexp_extract(url, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    val sortedQ = array_join(array_sort(params), "&")
    concat(sch, lit("://"), h,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(sortedQ =!= "", concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** (urlCol) → df + (canon_url, host) columns. */
  def withCanonical(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("canon_url", canonicalize(col(urlCol)))
      .withColumn("host", host(col(urlCol)))

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
