package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the crawl-frontier
  * operator every web-scale ingest runs before fetching or keying
  * storage: two raw URLs that differ only in case, default port,
  * fragment, tracking parameters, parameter order, or a trailing slash
  * are the SAME resource and must collapse to one canonical key.
  *
  * Everything is pure column algebra (regexp extraction + higher-order
  * array functions) so canonicalization is a narrow map — no UDF, no
  * shuffle — and the dedup itself reuses [[Dedup.exactDedup]]'s
  * partial-agg keep-first shape on the canonical string.
  *
  * Canonical form (documented contract, replayed verbatim by the SQL
  * oracle):
  *  - scheme and host lowercased; userinfo NOT handled (crawlers drop
  *    credentialed URLs upstream);
  *  - default ports stripped (:80 for http, :443 for https);
  *  - fragment removed;
  *  - query parameters: tracking params dropped (utm_*, gclid, fbclid,
  *    msclkid, ref, plus any caller-supplied prefixes), the REST sorted
  *    bytewise; an emptied query drops its '?';
  *  - path: empty → '/', trailing slashes stripped except the root.
  *
  * Reference semantics: qetch normalizes media URLs per-site (SURVEY.md
  * §2A O7); this is the corpus-level generalization of that rule.
  */
object Urls {

  /** Default tracking-parameter pattern: a param string `k=v` is dropped
    * when the KEY matches. */
  val TrackingPattern = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

  /** Canonicalize a URL column per the contract above. Strings that do
    * not parse as `scheme://...` pass through unchanged (relative refs,
    * data: URIs — the caller's quarantine problem, not silently mangled
    * here). */
  def canonicalize(url: Column, trackingPattern: String = TrackingPattern): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // everything after scheme:// and before any fragment
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^#]*)", 1)
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val rawPath = regexp_extract(rest, "^[^/?]*([^?]*)", 1)
    val path0 = regexp_replace(rawPath, "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingPattern)))
    val qpart = when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
      .otherwise(lit(""))
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, path, qpart))
  }

  /** Keep-first dedup on the canonical URL: one row per canonical form,
    * earliest `idCol` wins, with the canonical key attached as
    * `canonical_url`. The groupBy shape is exactBucket-safe for the hot
    * keys a crawl produces (a viral URL shared 10⁶ times collapses
    * map-side — see [[Dedup.exactDedup]]). */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String,
      trackingPattern: String = TrackingPattern): DataFrame =
    Dedup.exactDedup(
      df.withColumn("canonical_url", canonicalize(col(urlCol), trackingPattern)),
      idCol, "canonical_url")
}
