package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the web-corpus hygiene pass
  * (CCNet / RefinedWeb keep one document per canonical URL before any
  * content-level dedup): a fixed cascade of string rules collapses the
  * variants crawlers see of the same page, then one aggregation keeps
  * the best document per canonical URL.
  *
  * All rules are plain `functions._` string/regex ops (codegen'd,
  * map-only, linear in corpus bytes); the dedup is ONE hash shuffle on
  * the canonical URL with map-side partial agg — no window, no pair
  * space. Patterns are RE2-safe so the cascade is oracle-portable
  * (DuckDB replacement syntax uses \1 where Java uses $1; the oracle
  * SQL carries its own spelling).
  */
object UrlOps {

  private val TrackingParams = "(utm_[a-zA-Z]+|fbclid|gclid|msclkid|ref)"

  /** Canonical form of a URL column. Rule order is part of the contract:
    *  1. drop the fragment;
    *  2. lowercase the scheme://host prefix (never the path — paths are
    *     case-sensitive);
    *  3. drop a `www.` host prefix — anchored to the scheme (a
    *     `://www.` inside a query-param value must not fire) and only
    *     when a dotted host remains (`www.com` is a registrable host,
    *     not a prefix);
    *  4. drop scheme-default ports (http:80, https:443);
    *  5. drop tracking parameters (utm_*, fbclid, gclid, msclkid, ref) —
    *     `&`-prefixed occurrences first (adjacent matches are
    *     consecutive, so one global pass clears runs), then a leading
    *     `?tracking=…&` (promote the next param) or `?tracking=…$`
    *     (drop the empty query);
    *  6. drop trailing slashes from the PATH (split at `?` first — a
    *     slash before the query marker is as spurious as one at the
    *     end);
    *  7. sort surviving query params (binary order — crawlers permute
    *     them; both engines sort ASCII identically). */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val pre = regexp_extract(noFrag, "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    val lowered = concat(lower(pre), noFrag.substr(length(pre) + 1, length(noFrag)))
    val noWww = regexp_replace(lowered,
      "^([a-z][a-z0-9+.-]*://)www\\.([^/?#]*\\.[^/?#]*)", "$1$2")
    val noPort = regexp_replace(
      regexp_replace(noWww, "^(http://[^/:?#]+):80(/|\\?|$)", "$1$2"),
      "^(https://[^/:?#]+):443(/|\\?|$)", "$1$2")
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noPort, "&" + TrackingParams + "=[^&#]*", ""),
        "\\?" + TrackingParams + "=[^&#]*&", "?"),
      "\\?" + TrackingParams + "=[^&#]*$", "")
    val base = regexp_replace(regexp_extract(noTrack, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(noTrack, "\\?(.*)$", 1)
    when(query === "", base)
      .otherwise(concat(base, lit("?"), concat_ws("&", array_sort(split(query, "&")))))
  }

  /** One row per canonical URL: the kept document (highest `quality`,
    * ties to the smallest id — the max-struct trick keeps the agg
    * partial/mergeable, unlike a row_number window) plus the collapse
    * count. */
  def dedupByUrl(docs: DataFrame, url: Column, id: Column,
                 quality: Column): DataFrame =
    docs.select(canonicalizeUrl(url).as("canon_url"),
        id.as("doc_id"), quality.as("quality"))
      .groupBy("canon_url")
      .agg(max(struct(col("quality").as("q"), (-col("doc_id")).as("negid"))).as("m"),
        count(lit(1)).as("n_dups"))
      .select(col("canon_url"), (-col("m.negid")).as("doc_id"),
        col("m.q").as("quality"), col("n_dups"))
}
