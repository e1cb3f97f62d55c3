package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization — the FIRST dedup any crawl pipeline runs (before
 * any content hashing): the same page arrives as `HTTP://WWW.Site.com:80/
 * a/?utm_source=x&b=2&a=1#frag` and `http://www.site.com/a?a=1&b=2`, and
 * fetch-level dedup must see one key.
 *
 * [[canonicalizeUrl]] applies the standard safe normalizations
 * (RFC 3986 §6 plus the conventional tracking-param strip):
 * lowercase scheme+host, drop default ports (:80/:443), drop the
 * fragment, collapse trailing path slashes (root stays `/`), drop
 * `utm_*` tracking params and the empty query, sort the surviving query
 * params byte-wise. Composed ENTIRELY from built-in column functions
 * (regexp_extract/filter/sort_array) — codegen'd, no UDF — and each
 * transform has an exact DuckDB twin, so the d60 oracle replays the
 * canonical keys byte-for-byte.
 */
object Urls {

  def canonicalizeUrl(u: Column): Column = {
    val base = regexp_replace(u, "#.*$", "") // fragment is client-side only
    val scheme = lower(regexp_extract(u, "^([A-Za-z]+)://", 1))
    val hostport = lower(regexp_extract(u, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = regexp_replace(hostport, ":(80|443)$", "")
    val rawPath = regexp_extract(base, "^[A-Za-z]+://[^/?#]+([^?]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val query = regexp_extract(base, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => !p.startsWith("utm_") && p =!= "")
    val sortedQ = array_join(sort_array(params), "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** Fetch-level URL dedup: group by canonical key, keep the smallest id
    * as the representative (one map-side-combinable shuffle on the
    * canonical key — the only shuffle; canonicalization itself is a
    * narrow codegen'd projection that runs at scan speed on 100 TB of
    * fetch logs). */
  def dedupByCanonicalUrl(fetches: DataFrame, urlCol: String,
                          idCol: String): DataFrame =
    fetches
      .withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col(idCol)).as("keep_id"))

  /**
   * REGISTRABLE domain (eTLD+1) of a hostname under the public-suffix
   * algorithm (publicsuffix.org: longest matching suffix rule, then one
   * more label) against a FIXED shipped suffix list — the per-domain key
   * every crawl-curation stage groups by (domain quotas, per-site dedup,
   * spam-domain screens). A host that IS a public suffix, or that isn't
   * under any listed suffix, yields null (not registrable).
   *
   * Pure codegen'd column ops (split + a when-chain over the list, most
   * labels first — "co.uk" must beat "uk"), so extraction runs at scan
   * speed; ship the full ~9k-rule list the same way, the chain is a
   * broadcast-size lookup either way. Matching is on lowercase hosts —
   * canonicalize first (see [[canonicalizeUrl]]).
   */
  def registrableDomain(host: Column, suffixes: Seq[String]): Column = {
    require(suffixes.nonEmpty, "registrableDomain: empty suffix list")
    // longest (most labels) suffix wins; coalesce keeps the FIRST match
    val ordered = suffixes.sortBy(s => (-s.count(_ == '.'), s))
    val matched = ordered.foldLeft(lit(null).cast("string")) { (acc, sfx) =>
      coalesce(acc, when(host === sfx || host.endsWith("." + sfx), lit(sfx)))
    }
    val labels = split(host, "\\.")
    val nLab = size(labels)
    val kLab = size(split(matched, "\\."))
    when(matched.isNull || nLab === kLab, lit(null).cast("string"))
      .otherwise(concat_ws(".", slice(labels, nLab - kLab, kLab + 1)))
  }
}
