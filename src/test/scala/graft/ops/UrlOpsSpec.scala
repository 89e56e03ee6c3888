package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** URL extraction / registered-domain semantics and the two frame-level
  * operators (domainStats, dropBlocklistedDocs). */
class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def urls(s: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("t")
      .select(UrlOps.extractUrls(col("t")).as("u"))
      .collect()(0).getSeq[String](0)
  }

  private def domainOf(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u")
      .select(UrlOps.registeredDomain(col("u")).as("d"))
      .collect()(0).getString(0)
  }

  test("extracts multiple urls in document order, http and https") {
    assert(urls("see https://a.example.com/x and http://b.net/y?q=1 end") ==
      Seq("https://a.example.com/x", "http://b.net/y"))
  }

  test("path stops at whitespace; bare-host url allowed") {
    assert(urls("go http://example.org now") == Seq("http://example.org"))
    assert(urls("x https://h.io/p/q.r_s~t%20u end") ==
      Seq("https://h.io/p/q.r_s~t%20u"))
  }

  test("non-url text yields no matches (precision over recall)") {
    assert(urls("ftp://old.example.com and www.example.com alone") == Seq())
  }

  test("registered domain: one label + suffix under the PSL default rule") {
    assert(domainOf("https://deep.sub.example.com/p") == "example.com")
    assert(domainOf("http://example.org") == "example.org")
    assert(domainOf("not a url") == "")
  }

  test("registered domain: multi-label public suffixes (PSL data file)") {
    // two-label ccTLD suffixes: the third label is the registrable one
    assert(domainOf("https://www.bbc.co.uk/news") == "bbc.co.uk")
    assert(domainOf("https://example.com.au/") == "example.com.au")
    assert(domainOf("http://a.b.shop.co.jp") == "shop.co.jp")
    // platform suffixes from the private section
    assert(domainOf("https://user.github.io/repo") == "user.github.io")
    assert(domainOf("https://myapp.herokuapp.com/x") == "myapp.herokuapp.com")
    // three-label suffix beats its own tail
    assert(domainOf("https://bucket.s3.amazonaws.com/key") == "bucket.s3.amazonaws.com")
    // unlisted TLD falls back to the default rule (last two labels)
    assert(domainOf("https://x.y.example.dev/") == "example.dev")
    // listed suffixes match case-insensitively, capture keeps input case
    assert(domainOf("https://WWW.BBC.CO.UK/") == "BBC.CO.UK")
  }

  test("property: regex matcher agrees with algorithmic longest-suffix PSL match") {
    // The compiled alternation must behave exactly like the textbook
    // PSL algorithm (longest listed suffix wins, else the default rule:
    // last label is the suffix; registered domain = suffix + one label;
    // a host that IS a suffix degrades to the default rule — the
    // documented subset semantics). 500 seeded hosts built from listed
    // suffixes, plain TLDs, and random label stacks.
    import scala.util.Random
    val suffixes = UrlOps.pslSuffixes.toVector
    def reference(host: String): String = {
      val labels = host.split('.')
      val matched = suffixes
        .filter(s => host == s || host.endsWith("." + s))
        .filter(s => s.split('.').length < labels.length) // need a label left
        .maxByOption(_.split('.').length)
      val sufLen = matched.map(_.split('.').length).getOrElse(1)
      if (labels.length <= sufLen) "" // bare single label: no match
      else labels.takeRight(sufLen + 1).mkString(".")
    }
    val r = new Random(7)
    val labelPool = Vector("a", "bb", "site", "x1", "my-app", "cdn9")
    val tails = suffixes ++ Vector("com", "net", "io", "dev", "example")
    val hosts = (1 to 500).map { _ =>
      val tail = tails(r.nextInt(tails.size))
      val depth = r.nextInt(3) // 0..2 extra labels
      val front = Vector.fill(depth + (if (r.nextBoolean()) 1 else 0))(
        labelPool(r.nextInt(labelPool.size)))
      (front :+ tail).mkString(".")
    }.distinct
    import spark.implicits._
    val got = hosts.toDF("h")
      .select(col("h"), regexp_extract(col("h"),
        UrlOps.registeredDomainPattern, 1).as("d"))
      .collect().map(r2 => r2.getString(0) -> r2.getString(1)).toMap
    hosts.foreach { h =>
      assert(got(h) == reference(h), s"host $h: regex '${got(h)}' vs psl '${reference(h)}'")
    }
  }

  test("PSL pattern is generated from the data file, longest suffix first") {
    val multi = UrlOps.pslSuffixes
    assert(multi.nonEmpty && multi.forall(_.contains(".")))
    // the compiled alternation is exactly the data file's entries,
    // escaped, ordered label-count DESC then alphabetical
    val expected = multi.distinct
      .sortBy(s => (-s.count(_ == '.'), s))
      .map(_.replace(".", "\\."))
      .mkString("|")
    assert(UrlOps.registeredDomainPattern.contains(expected))
  }

  test("domainStats counts urls and distinct docs per domain") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a https://x.one.com/1 b https://y.one.com/2"),
      (2L, "c https://z.one.com/3"),
      (3L, "d http://q.two.net/4")).toDF("doc_id", "text")
    val got = UrlOps.domainStats(docs, col("text"))
      .orderBy("domain").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("one.com", 3L, 2L), ("two.net", 1L, 1L)))
  }

  test("capPerDomain: at most cap docs per registered domain, deterministic set") {
    import spark.implicits._
    // 30 docs on one .co.uk domain (PSL: one bucket per shopN.co.uk,
    // NOT one bucket for all of co.uk), 3 on another, 2 unlisted-TLD
    val docs = ((1L to 30L).map(i => (i, s"https://a.shop1.co.uk/$i")) ++
      (31L to 33L).map(i => (i, s"https://b.shop2.co.uk/$i")) ++
      Seq((34L, "https://x.example.com/1"), (35L, "https://y.example.com/2")))
      .toDF("doc_id", "url")
    val kept = UrlOps.capPerDomain(docs, col("url"), cap = 5)
    val byDomain = kept
      .withColumn("d", UrlOps.registeredDomain(col("url")))
      .groupBy("d").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byDomain == Map("shop1.co.uk" -> 5L, "shop2.co.uk" -> 3L,
      "example.com" -> 2L))
    // deterministic: same kept set after a repartition
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = UrlOps.capPerDomain(docs.repartition(7), col("url"), cap = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // the skew story: the rank<=cap filter must compile to a
    // WindowGroupLimit (map-side top-k per domain), not a full sort
    val plan = UrlOps.capPerDomain(docs, col("url"), cap = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  test("capPerDomain: NULL-URL rows pass through uncapped, not silently dropped") {
    import spark.implicits._
    // a NULL url made the domain NULL, which failed BOTH branch filters
    // — the row vanished from the output entirely (ADVICE r6)
    val docs = (Seq((1L, null), (2L, null)) ++
      (3L to 6L).map(i => (i, s"https://x.example.com/$i"))).toDF("doc_id", "url")
    val kept = UrlOps.capPerDomain(docs, col("url"), cap = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(Set(1L, 2L).subsetOf(kept), s"NULL-url docs must survive: $kept")
    assert(kept.count(_ >= 3L) == 2, "the real domain still caps")
  }

  test("capPerDomain: unparseable-URL docs pass through uncapped, never one '' bucket") {
    import spark.implicits._
    // 8 docs with no extractable domain + 3 on a real domain, cap 2:
    // a ''-as-domain cap would keep only 2 of the 8 domainless docs
    val docs = ((1L to 8L).map(i => (i, s"not a url $i")) ++
      (9L to 11L).map(i => (i, s"https://x.example.com/$i"))).toDF("doc_id", "url")
    val kept = UrlOps.capPerDomain(docs, col("url"), cap = 2)
      .select("doc_id").as[Long].collect().toSet
    assert((1L to 8L).toSet.subsetOf(kept), "domainless docs must all survive")
    assert(kept.count(_ >= 9L) == 2, "the real domain still caps")
  }

  test("dropBlocklistedDocs removes exactly the docs linking a blocked domain") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ok https://good.example.com/a"),
      (2L, "bad https://cdn.spam.net/x plus https://good.example.com/b"),
      (3L, "no urls at all")).toDF("doc_id", "text")
    val kept = UrlOps.dropBlocklistedDocs(docs, col("text"), Seq("spam.net"))
      .select("doc_id").orderBy("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(1L, 3L))
  }

  // ---- canonicalizeUrl ----

  private def canon(u: String): String = {
    import spark.implicits._
    Seq(u).toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .as[String].head()
  }

  test("canonicalize folds scheme/host case but never the path") {
    assert(canon("HTTP://WWW.EXample.COM/Mixed/Case") ==
      "http://example.com/Mixed/Case")
  }

  test("canonicalize strips only the scheme's default port") {
    assert(canon("https://a.com:443/x") == "https://a.com/x")
    assert(canon("http://a.com:80/x") == "http://a.com/x")
    assert(canon("https://a.com:8080/x") == "https://a.com:8080/x")
    assert(canon("http://a.com:443/x") == "http://a.com:443/x",
      ":443 is NOT http's default")
  }

  test("canonicalize removes tracking params and repairs separators") {
    assert(canon("https://a.com/x?utm_source=f&id=2") == "https://a.com/x?id=2")
    assert(canon("https://a.com/x?id=2&utm_campaign=c") == "https://a.com/x?id=2")
    assert(canon("https://a.com/x?utm_a=1&utm_b=2") == "https://a.com/x")
    assert(canon("https://a.com/x?gclid=z&fbclid=y&q=1") == "https://a.com/x?q=1")
  }

  test("canonicalize drops fragments and trailing slashes") {
    assert(canon("https://a.com/x#section") == "https://a.com/x")
    assert(canon("https://a.com/") == "https://a.com")
    assert(canon("https://a.com/a/b/") == "https://a.com/a/b")
    assert(canon("https://a.com/a/?id=1") == "https://a.com/a?id=1")
  }

  test("canonicalize passes non-URLs through unchanged") {
    assert(canon("not a url") == "not a url")
    assert(canon("") == "")
  }

  test("canonicalUrlGroups: first fetch wins, counts exact, NULLs drop") {
    import spark.implicits._
    val docs = Seq(
      (5L, Some("https://WWW.A.com/x/")),
      (2L, Some("https://a.com/x?utm_source=s")),
      (7L, Some("https://a.com/x#top")),
      (9L, Some("https://b.com/y")),
      (4L, None)).toDF("doc_id", "url")
    val got = UrlOps.canonicalUrlGroups(docs, col("url"))
      .orderBy("canonical_url")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("https://a.com/x", 3L, 2L), ("https://b.com/y", 1L, 9L)))
  }
}
