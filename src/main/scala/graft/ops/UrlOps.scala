package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + domain analytics — the front door of a
  * web-corpus pipeline (CCNet/RefinedWeb shape): before any content
  * dedup runs, pages are deduplicated by CANONICAL URL (scheme/host
  * case-folded, default ports dropped, tracking params stripped,
  * params sorted, fragment removed), and corpus composition is
  * audited per registrable domain. The reference's extension filter
  * (`app.py:121` — keep `.pdf`/`.docx`, drop `~$` locks) plays this
  * gatekeeper role for a directory corpus; URLs are the same role
  * for a crawled one.
  *
  * Everything here is pure Catalyst expression work — regex parse +
  * higher-order array functions, zero UDFs, fully codegen'd and
  * map-only until the final aggregations, which hash-partition on
  * canonical/domain (uniform keys — no skew hazard at 100 TB; a
  * pathological single-domain crawl would surface in
  * [[domainStats]] itself, the diagnostic you'd consult).
  */
object UrlOps {

  /** Deterministic URL per document — pure in (doc_id, lang) so the
    * DuckDB oracle rebuilds the exact string (the synthesizePages
    * pattern): mixed-case scheme/subdomain, redundant and
    * non-default ports, `utm_*` tracking params, param-order
    * variation, and fragments — every hazard [[parseUrls]] must
    * normalize away. */
  def synthesizeUrls(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    val scheme = when(id % 3 === 0, "HTTPS").otherwise("http")
    val sub = when(id % 4 === 0, "www.").when(id % 4 === 1, "m.")
      .when(id % 4 === 2, "").otherwise("CDN.")
    val dom = concat(lit("site"), (id % 13).cast("string"),
      when(id % 2 === 0, ".com").otherwise(".org"))
    val port = when(id % 5 === 0, ":443").when(id % 7 === 0, ":8080").otherwise("")
    val path = concat(lit("/articles/"), (id % 50).cast("string"))
    val q = when(id % 2 === 0,
        concat(lit("?id="), (id % 20).cast("string"),
          lit("&utm_source=feed&lang="), col("lang")))
      .otherwise(concat(lit("?lang="), col("lang"),
        lit("&id="), (id % 20).cast("string")))
    val frag = when(id % 6 === 0, "#section2").otherwise("")
    docs.select(id.as("doc_id"),
      concat(scheme, lit("://"), sub, dom, port, path, q, frag).as("url"))
  }

  private def urlPart(pattern: String): Column =
    regexp_extract(col("url"), pattern, 1)

  /** Parse + canonicalize: (doc_id, url) → (doc_id, url, host,
    * domain, canonical). Canonical form: lowercased scheme + host,
    * default port dropped (443 only under https, 80 only under
    * http — a redundant `:443` on an http URL is load-bearing and
    * kept), path defaulted to `/`, `utm_*` params stripped,
    * remaining params sorted, fragment dropped. `domain` is the
    * registrable domain approximated as the last two labels (a
    * public-suffix list upgrades this without changing the shape).
    * Map-only, whole-stage codegen'd. */
  def parseUrls(urls: DataFrame): DataFrame = {
    val scheme = lower(urlPart("^([A-Za-z][A-Za-z0-9+.-]*)://"))
    val hostPort = urlPart("^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)")
    val host = lower(regexp_extract(hostPort, "^([^:]+)", 1))
    val port = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val path0 = urlPart("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)")
    val query = urlPart("\\?([^#]*)")
    val cq = array_join(
      array_sort(filter(split(query, "&"),
        p => p =!= "" && !p.like("utm_%"))), "&")
    val canonPort = when(port === "" ||
      (scheme === "https" && port === "443") ||
      (scheme === "http" && port === "80"), "")
      .otherwise(concat(lit(":"), port))
    urls.select(col("doc_id"), col("url"), host.as("host"),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1).as("domain"),
      concat(scheme, lit("://"), host, canonPort,
        when(path0 === "", "/").otherwise(path0),
        when(cq === "", "").otherwise(concat(lit("?"), cq))).as("canonical"))
  }

  /** URL-level dedup: group on the canonical form, keep the lowest
    * doc_id as the survivor (the pre-content-dedup pass every web
    * pipeline runs — tracking-param and case variants of one page
    * collapse here before any shingling is paid). */
  def urlDedup(parsed: DataFrame): DataFrame =
    parsed.groupBy(col("canonical"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dup"))

  /** Corpus composition per registrable domain: page count + distinct
    * canonical URLs — the crawl-audit diagnostic (a domain with many
    * pages but few canonicals is a tracking-param mill). */
  def domainStats(parsed: DataFrame): DataFrame =
    parsed.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canonical")).as("n_canonical"))
}
