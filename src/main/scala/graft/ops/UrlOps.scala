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

  // ---- URL canonicalization (crawl-frontier / recrawl dedup) ----
  // A crawl sees the same page under many spellings: scheme/host case,
  // default ports, `www.`, tracking query params, fragments, trailing
  // slashes. Canonicalizing BEFORE URL-level dedup is how frontier
  // managers and recrawl schedulers avoid fetching one page N times.
  // All patterns live in the java.util.regex/RE2 common subset (the
  // Pii dialect rules) and are public vals so the oracle interpolates
  // them verbatim.

  /** Group-1 = scheme of a URL-shaped string. */
  val schemePattern: String = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Group-1 = host[:port] (everything between :// and path/query/#). */
  val hostPortPattern: String = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"

  /** Group-1 = path+query, fragment excluded (stops at the first #). */
  val restPattern: String = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"

  /** Tracking query parameters stripped by canonicalization (lowercase
    * names — canonicalization does not case-fold the query string, so
    * an upper-case `UTM_SOURCE` survives; crawl URLs emit them lower). */
  val trackingParam: String = "(?:utm_[a-z0-9_]*|fbclid|gclid|ref_src)"

  /** Canonical form of one URL value:
    *  1. scheme and host lowercased (ports/paths untouched);
    *  2. default port stripped (`:80` for http, `:443` for https);
    *  3. leading `www.` stripped;
    *  4. fragment dropped;
    *  5. tracking params ([[trackingParam]]) removed, `?`/`&`
    *     separators repaired;
    *  6. trailing `/` dropped (before end or before the query), so
    *     `/a/` ≡ `/a` and a bare host ≡ host + `/`.
    * A value that isn't scheme://host shaped passes through UNCHANGED
    * (canonicalization must never merge two non-URLs into one "" key).
    * Pure codegen'd regexp projections — zero shuffles, linear scan. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, schemePattern, 1))
    val hostPort = lower(regexp_extract(url, hostPortPattern, 1))
    val noPort = when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val cleanHost = regexp_replace(noPort, "^www\\.", "")
    val rest = regexp_extract(url, restPattern, 1)
    // tracking params: non-leading `&p=v` first (global), then a
    // leading `?p=v&` keeps the `?` for the successor, then a lone
    // `?p=v` tail drops entirely
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(rest, "&" + trackingParam + "=[^&#]*", ""),
        "\\?" + trackingParam + "=[^&#]*&", "?"),
      "\\?" + trackingParam + "=[^&#]*$", "")
    val noSlashQ = regexp_replace(noTrack, "/\\?", "?")
    val cleanRest = regexp_replace(noSlashQ, "/$", "")
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), cleanHost, cleanRest))
  }

  /** URL-level dedup groups over a (id, url) frame: one row per
    * canonical URL with its population and the deterministic keeper
    * (min id — the "first fetch wins" recrawl rule). One projection +
    * one partial-agg shuffle; a hot URL (everyone links the same page)
    * is just a count, combined map-side. NULL urls drop (no fetch key).
    * Output: (canonical_url, n_docs, keeper_id). */
  def canonicalUrlGroups(docs: DataFrame, urlCol: Column,
                         idCol: String = "doc_id"): DataFrame =
    docs.filter(urlCol.isNotNull)
      .select(canonicalizeUrl(urlCol).as("canonical_url"),
        col(idCol).cast("long").as("id"))
      .groupBy(col("canonical_url"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        min(col("id")).as("keeper_id"))

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

  /** Politeness-aware crawl-frontier scheduling. A frontier that
    * fetches in naive priority order hammers whatever domain currently
    * holds the best URLs (the per-host politeness delay then serializes
    * the whole crawler behind one domain — the classic frontier
    * anti-pattern). The standard fix (Mercator-style per-host queues,
    * Heydon & Najork 1999) assigns each URL a SLOT: its position in
    * its own domain's queue. Fetching in (slot, domain) order
    * interleaves domains perfectly — wave 1 takes every domain's best
    * URL, wave 2 the second-best, and a domain with 10⁶ queued URLs
    * occupies exactly one fetch per wave instead of a contiguous
    * block of a million.
    *
    * Within a domain the queue order is (priority DESC, url): highest
    * value first, total order, so the schedule is deterministic.
    *
    * Scale shape: ONE window exchange partitioned by registered
    * domain (the same key the politeness delay is enforced on). A
    * `row_number`-only window is streaming (no buffering of the
    * partition); hot domains are exactly the rows that needed to meet
    * anyway to be sequenced. No global ordering is materialized —
    * emitting in (slot, domain) order is the consumer's `ORDER BY`,
    * which at scale is the shard boundary `slot` ranges define.
    *
    * Output: (id, url, domain, priority, slot). URLs with no
    * registered domain are dropped — no politeness key, no fetch. */
  /** Robots-exclusion evaluation (RFC 9309 / Google longest-match):
    * for each URL, the governing rule is the matching path pattern of
    * GREATEST LENGTH (RFC 9309 §2.2.2 "most octets", measured on the
    * raw pattern); on a length tie, allow beats disallow (the
    * "least restrictive" tie-break); a URL whose domain has no
    * matching rule is allowed. The companion of [[frontierSchedule]]
    * — a crawl frontier filters through this before scheduling.
    *
    * Wildcards (RFC 9309 §2.2.3): `*` matches any character sequence
    * and a TRAILING `$` anchors the pattern to the end of the path;
    * a mid-pattern `$` is literal (the common-crawler reading — the
    * RFC only gives `$` meaning at the end of the pattern). Wildcard
    * rules are compiled — on the tiny rule-set side, with column
    * functions only — to the regex-safe form `^<escaped>` (plus `$`
    * when anchored): every non-[a-zA-Z0-9_/] octet is
    * backslash-escaped, then `\*` rewrites to `.*`. Plain rules keep
    * the codegen'd `startswith` fast path; `regexp_like` runs only on
    * rows whose rule carries a wildcard.
    *
    * `rules` is (domain, prefix, allow) — the rule group ALREADY
    * SELECTED for one user-agent: RFC 9309 group selection (pick the
    * most specific matching `User-agent:` line's group, fall back to
    * `*`) happens when the robots.txt is PARSED, once per fetch
    * identity, not per URL — so it stays upstream of this operator by
    * design. The set is small by nature (robots.txt files, not the
    * crawl), so the join is a BROADCAST
    * match on the domain key: zero shuffle of the URL side.
    * The per-URL winner is then `max(struct(len, allow, prefix))` —
    * a partial aggregate (map-side combine over the handful of
    * matched rules per URL), never a window sort. The struct's field
    * order IS the tie-break order: longest pattern, then allow=true,
    * then lexicographically-last pattern so equal-length distinct
    * patterns (same verdict either way) still pick deterministically.
    * Unmatched left-join rows must surface as a NULL struct — not a
    * struct of nulls, which `max` would happily order — hence the
    * `when(isNotNull)` guard.
    *
    * Output: (idCol, url, domain, allowed, matched_prefix,
    * matched_len) — matched_* NULL for rule-less URLs;
    * matched_prefix/matched_len are the raw winning pattern and its
    * length. */
  def robotsGate(urls: DataFrame, rules: DataFrame, urlCol: Column,
                 idCol: String = "doc_id"): DataFrame = {
    val path = regexp_replace(urlCol, lit("^[a-z]+://[^/]*"), lit(""))
    val u = urls.select(col(idCol).cast("long").as("id"), urlCol.as("url"),
      registeredDomain(urlCol).as("domain"), path.as("__path"))
    val endAnchor = endswith(col("prefix"), lit("$"))
    val body = when(endAnchor,
      col("prefix").substr(lit(1), length(col("prefix")) - 1))
      .otherwise(col("prefix"))
    // escape every octet that could be a regex metacharacter (a
    // backslash before punctuation is always literal in Java regex),
    // then turn the escaped star back into "any sequence"
    val compiled = concat(lit("^"),
      replace(regexp_replace(body, lit("([^a-zA-Z0-9_/])"), lit("\\\\$1")),
        lit("\\*"), lit(".*")),
      when(endAnchor, lit("$")).otherwise(lit("")))
    val r = rules.select(col("domain").as("__rdom"), col("prefix"),
      col("allow").cast("boolean").as("allow"),
      (col("prefix").contains("*") || endAnchor).as("__wild"),
      compiled.as("__re"))
    u.join(broadcast(r),
        col("domain") === col("__rdom") && (
          (!col("__wild") && startswith(col("__path"), col("prefix"))) ||
          (col("__wild") && regexp_like(col("__path"), col("__re")))),
        "left")
      .groupBy(col("id"), col("url"), col("domain"))
      .agg(max(when(col("prefix").isNotNull,
        struct(length(col("prefix")).cast("long").as("len"),
          col("allow").as("allow"), col("prefix").as("prefix")))).as("m"))
      .select(col("id"), col("url"), col("domain"),
        coalesce(col("m.allow"), lit(true)).as("allowed"),
        col("m.prefix").as("matched_prefix"),
        col("m.len").as("matched_len"))
  }

  /** `byHost = true` keys the politeness queues on the full HOST
    * instead of the registered domain — what a production crawler
    * actually enforces delay on (all of `*.blogspot.com` is ONE
    * registered domain but thousands of independently-hosted sites;
    * domain-keyed slots would serialize them behind each other). The
    * registered-domain default is kept because it is the conservative
    * choice when one operator fronts many hosts (CDNs, vanity
    * subdomains of one site) and is what the q87 oracle replays; the
    * output column stays named `domain` either way so consumers don't
    * fork on the flag. Same plan shape: ONE streaming row_number
    * window exchange, keyed on whichever politeness key was chosen. */
  def frontierSchedule(urls: DataFrame, urlCol: Column, priorityCol: Column,
                       idCol: String = "doc_id", byHost: Boolean = false): DataFrame =
    urls
      .withColumn("__domain", if (byHost) host(urlCol) else registeredDomain(urlCol))
      .filter(col("__domain").isNotNull && col("__domain") =!= "")
      .select(col(idCol).cast("long").as("id"), urlCol.as("url"),
        col("__domain").as("domain"), priorityCol.as("priority"))
      .withColumn("slot", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("domain"))
          .orderBy(col("priority").desc, col("url").asc)).cast("long"))
}
