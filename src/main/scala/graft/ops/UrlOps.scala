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
  * Registered domain = one label + the longest matching PUBLIC SUFFIX,
  * where the suffix set is data: a curated Public Suffix List subset
  * shipped at `resources/graft/public_suffix_list.dat` (swap in the
  * full upstream file to widen coverage — nothing else changes). The
  * matcher compiles the list into one anchored alternation tried
  * longest-suffix-first, with the PSL default rule (any unlisted TLD
  * is a suffix) as the final generic alternative — so `bbc.co.uk`
  * resolves to `bbc.co.uk`, not `co.uk`. The compiled pattern is a
  * plan-time literal (zero executor-side file reads) and runs
  * verbatim in DuckDB (RE2-safe: no lookaround, ordered alternation
  * agrees with leftmost-longest since listed suffixes are strictly
  * longer than the generic fallback at any match start).
  *
  * Known subset limits (documented, deliberate): wildcard (`*.ck`)
  * and exception (`!www.ck`) PSL rule forms are omitted, and a host
  * that IS a bare public suffix (`co.uk` with no third label)
  * resolves as if its last label were the suffix instead of matching
  * nothing — crawl URL mining never meets bare-suffix hosts.
  */
object UrlOps {

  /** Multi-label public suffixes from the PSL data file (single-label
    * TLDs are the default rule, not listed). Loaded once per JVM at
    * plan construction; the executors only ever see the compiled
    * pattern string inside the expression tree. */
  private[ops] lazy val pslSuffixes: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "missing resource graft/public_suffix_list.dat")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//") && l.contains("."))
      .toVector
    finally in.close()
  }

  /** http(s) URL shape: scheme, host, optional path. Host chars before
    * the first `/`; path stops at whitespace or common sentence trail.
    * Deliberately conservative — corpus URL mining wants precision
    * (a false URL pollutes domain stats for a real domain). */
  val urlPattern: String =
    "https?://[A-Za-z0-9.-]+(?:/[A-Za-z0-9._~/%+=-]*)?"

  /** Group-1 = host of a single URL string. */
  val hostPattern: String = "https?://([A-Za-z0-9.-]+)"

  /** Group-1 = registered domain of a host: one label + longest
    * matching public suffix. Alternation order is label-count DESC
    * then alphabetical, so `s3.amazonaws.com` wins over a would-be
    * `amazonaws.com` entry and `co.uk` is tried before the generic
    * single-label fallback that closes the alternation (the PSL
    * default rule). Case-insensitive on the listed suffixes to match
    * the old character-class behavior on uppercase hosts. */
  lazy val registeredDomainPattern: String = {
    val multi = pslSuffixes.distinct
      .sortBy(s => (-s.count(_ == '.'), s))
      .map(_.replace(".", "\\."))
    "([A-Za-z0-9-]+\\.(?:(?i:" + multi.mkString("|") + ")|[A-Za-z0-9-]+))$"
  }

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

  /** At most `cap` documents per registered domain — the crawl-curation
    * step that stops one boilerplate-heavy domain from dominating a
    * corpus (per-domain caps are how real pipelines bound majority
    * sources; the PSL matters here: a last-two-labels cap would lump
    * every `*.co.uk` site into one bucket). Membership is ordered by
    * the portable content hash ([[Sampling.hashBucket]], id tie-break),
    * so the kept set survives reruns, repartitions, and engines.
    *
    * Scale: one window shuffle partitioned by domain; the `rank <= cap`
    * filter triggers Spark's WindowGroupLimit, which top-k-prunes on
    * the MAP side — a mega-domain ships only `cap` candidate rows per
    * input partition, never its full row set, so domain skew (the norm
    * in crawls) cannot produce a straggler reducer. */
  def capPerDomain(docs: DataFrame, urlCol: Column, cap: Int,
                   idCol: String = "doc_id"): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    // Rows whose URL yields NO registered domain ("" — not URL-shaped,
    // exotic host, or a NULL url column: coalesce folds NULL into the
    // same branch, since a NULL domain would otherwise fail BOTH
    // filters below and the row would vanish from the output entirely)
    // pass through UNCAPPED: they are not a domain population, and
    // treating "" as one pseudo-domain would silently discard every
    // unparseable-URL document past the first `cap`. Whether to keep
    // such docs is the downstream quality gate's call.
    val withD = docs.withColumn("__domain",
      coalesce(registeredDomain(urlCol), lit("")))
    val domainless = withD.filter(col("__domain") === "").drop("__domain")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__domain"))
      .orderBy(Sampling.hashBucket(col(idCol), 1 << 30), col(idCol))
    withD.filter(col("__domain") =!= "")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn", "__domain")
      .unionByName(domainless)
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
