package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization — the key-maker for crawl-corpus exact dedup and
 * the per-url invariant joins (a Common-Crawl-style corpus carries the
 * same page under many spellings of one URL). Pure column expressions:
 * codegen'd, shuffle-free, and pushdown-friendly.
 *
 * Normalizations applied (the conservative, semantics-preserving set):
 *  - scheme and host lowercased (path/query stay case-sensitive per RFC);
 *  - userinfo and fragment dropped;
 *  - leading `www.` and trailing host dot stripped;
 *  - default ports dropped (http:80, https:443), others kept;
 *  - duplicate path slashes collapsed, trailing slash trimmed
 *    (`/` root kept), empty path → `/`;
 *  - tracking params removed (utm_*, fbclid, gclid, msclkid, mc_cid,
 *    mc_eid, ref), remaining params sorted byte-wise — param ORDER never
 *    distinguishes two URLs.
 *
 * Every regex is RE2-compatible (character classes only — no lookaround,
 * no replacement groups), so the DuckDB oracle (`url_canonicalize`)
 * re-derives the identical chain in its own regex engine.
 */
object UrlFunctions {

  private val trackingParam =
    "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)(=.*)?$"

  def canonicalizeUrl(url: Column): Column = {
    val u = trim(url)
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val sch = when(scheme === "", lit("http")).otherwise(scheme)
    // strip scheme, then userinfo
    val rest = regexp_replace(
      regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", ""),
      "^[^/@?#]*@", "")
    val hostport = regexp_extract(rest, "^([^/?#]*)", 1)
    val host = regexp_replace(regexp_replace(
      lower(regexp_extract(hostport, "^([^:]*)", 1)),
      "^www\\.", ""), "\\.$", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(sch === "http" && port === "80") &&
      !(sch === "https" && port === "443")
    // path + query, fragment dropped
    val pqf = regexp_replace(regexp_replace(rest, "^[^/?#]*", ""), "#.*$", "")
    val rawPath = regexp_extract(pqf, "^([^?]*)", 1)
    val squashed = rtrim(regexp_replace(rawPath, "/+", "/"), "/")
    val path = when(squashed === "", lit("/")).otherwise(squashed)
    val rawQuery = regexp_extract(pqf, "\\?(.*)$", 1)
    val params = array_sort(filter(split(rawQuery, "&"),
      p => p =!= "" && !p.rlike(trackingParam)))
    val query = array_join(params, "&")
    concat(sch, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(query =!= "", concat(lit("?"), query)).otherwise(lit("")))
  }
}
