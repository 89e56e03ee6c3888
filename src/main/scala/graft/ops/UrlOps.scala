package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL extraction and domain-level filtering — how web-scale corpora
  * are actually curated: quality and licensing decisions attach to the
  * REGISTERED DOMAIN (blocklists, per-domain caps, domain mixing
  * weights), so the engine needs text → urls → host → registered
  * domain as cheap scalar plumbing plus a filter that scales.
  *
  * All extraction is codegen'd `regexp_extract_all` / `regexp_extract`
  * projections (the [[Pii]] dialect rules: explicit ranges, no
  * lookaround, so the DuckDB oracle runs the identical patterns).
  * Blocklist filtering is a broadcast anti-join on the domain — the
  * list side is human-curated (thousands of rows), never a shuffle of
  * the corpus.
  *
  * Registered domain = last two dot-labels of the host. Real pipelines
  * consult the Public Suffix List (`co.uk` has three); the PSL is a
  * data file, not an algorithm — swap [[registeredDomain]]'s pattern
  * for a PSL-driven suffix match without touching any caller.
  */
object UrlOps {

  /** http(s) URL shape: scheme, host, optional path. Host chars before
    * the first `/`; path stops at whitespace or common sentence trail.
    * Deliberately conservative — corpus URL mining wants precision
    * (a false URL pollutes domain stats for a real domain). */
  val urlPattern: String =
    "https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._~/%+=-]*)?"

  /** Group-1 = host of a single URL string. */
  val hostPattern: String = "https?://([A-Za-z0-9.-]+)"

  /** Group-1 = last two labels of a host ("registered domain"). */
  val registeredDomainPattern: String =
    "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$"

  /** All URLs in a text column, in document order. */
  def extractUrls(text: Column): Column =
    regexp_extract_all(text, lit(urlPattern), lit(0))

  /** Host of one URL value ("" when the value isn't URL-shaped —
    * regexp_extract's no-match convention, kept so the column stays
    * non-null for grouping). */
  def host(url: Column): Column =
    regexp_extract(url, hostPattern, 1)

  /** Registered domain of one URL value. */
  def registeredDomain(url: Column): Column =
    regexp_extract(host(url), registeredDomainPattern, 1)

  /** Per-registered-domain corpus stats over a document table: one
    * extract projection, one explode, one partial-agg shuffle.
    * Output: (domain, n_urls, n_docs). */
  def domainStats(docs: DataFrame, textCol: Column): DataFrame = {
    docs
      .select(col("doc_id"), explode(extractUrls(textCol)).as("url"))
      .select(col("doc_id"), registeredDomain(col("url")).as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("doc_id")).as("n_docs"))
  }

  /** Drop documents that link to any blocklisted registered domain.
    * The per-doc domain set is reduced FIRST (explode → distinct within
    * the row via array ops would re-shuffle; a semi-join on the
    * exploded frame then an anti back to docs keeps the corpus scan
    * single-pass and the blocklist broadcast). */
  def dropBlocklistedDocs(docs: DataFrame, textCol: Column,
                          blockedDomains: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val block = broadcast(blockedDomains.toDF("domain"))
    val hits = docs
      .select(col("doc_id"), explode(extractUrls(textCol)).as("url"))
      .select(col("doc_id"), registeredDomain(col("url")).as("domain"))
      .join(block, "domain")
      .select(col("doc_id")).distinct()
    docs.join(hits, Seq("doc_id"), "left_anti")
  }
}
