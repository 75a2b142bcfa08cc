package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TextFunctions => T}

/** URL/host-level curation: common-crawl-style pipelines group quality
  * and duplication stats by registered domain before sampling (a
  * domain's aggregate behavior is the curation signal — one spammy host
  * taints all its pages). Everything here is expression-level (regexp +
  * string ops inside whole-stage codegen) — no UDF.
  */
object UrlOps {

  /** Hostname of a URL: optional scheme and userinfo stripped, cut at
    * the first `/ : ? #`, lowercased. Scheme-less inputs
    * (`example.com/path`) parse too — curation corpora mix both.
    */
  def host(url: Column): Column =
    lower(regexp_extract(url,
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Multi-part public suffixes recognized by [[registeredDomain]] — a
    * deliberately small built-in list (the full public-suffix list is a
    * data file a deployment would broadcast-join instead).
    */
  val MultiTlds: Seq[String] =
    Seq("co.uk", "org.uk", "gov.uk", "ac.uk", "co.jp", "com.au", "com.br", "co.in")

  /** Registered domain of a host: last two labels, or three when the
    * host ends in a known multi-part suffix (`a.b.co.uk` → `b.co.uk`).
    * Hosts with fewer labels pass through whole.
    */
  def registeredDomain(host: Column): Column = {
    val last2 = substring_index(host, ".", -2)
    when(MultiTlds.map(s => last2 === s).reduce(_ || _),
      substring_index(host, ".", -3)).otherwise(last2)
  }

  /** Per-domain curation stats joined back as doc-level features:
    * `(domain, doc_id, n_tok, domain_docs, domain_tokens,
    * domain_tok_mean, domain_share_ppm)` — the shape a sampler consumes
    * (per-doc row, domain aggregates as columns). All integer
    * arithmetic.
    *
    * Scale shape: host→domain extraction is map-side codegen; the stats
    * aggregate shuffles once on the domain key and its output is
    * bounded by the domain count (~10⁸ at web scale, KBs here); the
    * join back re-keys the corpus on the same domain key — AQE
    * broadcasts the stats side whenever it fits, and the corpus-side
    * exchange is the one unavoidable shuffle.
    */
  def domainStats(docs: DataFrame, idCol: String, urlCol: String,
                  textCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
        registeredDomain(host(col(urlCol))).as("domain"),
        T.tokenCount(col(textCol)).as("n_tok"))
      .localCheckpoint(false) // two consumers: stats aggregate + join back
    val tot = base.agg(count(lit(1)).as("n_total"))
    val stats = base.groupBy(col("domain"))
      .agg(count(lit(1)).as("domain_docs"), sum(col("n_tok")).as("domain_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("domain"), col("domain_docs"), col("domain_tokens"),
        expr("domain_tokens div domain_docs").as("domain_tok_mean"),
        expr("domain_docs * 1000000L div n_total").as("domain_share_ppm"))
    base.join(stats, "domain")
  }

  /** Tracking query parameters dropped during canonicalization — the
    * params that vary per click without changing the page.
    */
  val TrackingParamRe = "^(utm_[^=]*|ref|fbclid|gclid)(=.*)?$"

  /** Canonical URL for crawl dedup: scheme and fragment dropped
    * (http/https collapse — same page), host lowercased with a leading
    * `www.` and any port stripped, trailing path slashes trimmed,
    * tracking params ([[TrackingParamRe]]) removed and the REMAINING
    * query params SORTED — so `?b=2&a=1` and `?a=1&utm_x=..&b=2#top`
    * canonicalize identically. This is the re-crawl dedup key: the
    * same page fetched through different campaign links must collapse
    * BEFORE content hashing ever runs. All expression-level
    * (regexp + array HOFs inside codegen), no UDF.
    */
  def canonicalUrl(url: Column): Column = {
    val h = regexp_replace(host(url), "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(url,
        "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?[^/?#]*([^?#]*)", 1),
      "/+$", "")
    val params = filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val q = array_join(array_sort(params), "&")
    concat(h, path, when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Canonical-URL dedup census: `(canonical_url, n_variants, keep_id)`
    * — one groupBy on the canonical key (map-side canonicalization,
    * one shuffle of the key + id, never the payload).
    */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        canonicalUrl(col(urlCol)).as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keep_id"))
}
