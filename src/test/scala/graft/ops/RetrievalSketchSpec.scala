package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-10 additions: BM25 retrieval, KMV cardinality sketch,
  * crawl-frontier scheduling, BPE pair statistics, k-anonymity. */
class RetrievalSketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- BM25 ----

  test("bm25TopK ranks higher-tf shorter docs first and matches a hand computation") {
    // 3 docs, query = {cat, dog}:
    //   d1: "cat cat dog x"  (dl=4, tf(cat)=2, tf(dog)=1)
    //   d2: "cat y y y y y"  (dl=6, tf(cat)=1)
    //   d3: "z z z z"        (dl=4, no terms — must not appear)
    val docs = Seq(
      (1L, "cat cat dog x"),
      (2L, "cat y y y y y"),
      (3L, "z z z z")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq("dog", "cat"), topK = 10)
      .orderBy(col("score").desc, col("doc_id"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getLong(1) == 2L && out(1).getLong(1) == 1L) // n_terms

    // hand computation, same IEEE op order as the implementation
    val n = 3.0; val avgdl = (4L + 6L + 4L).toDouble / 3.0
    def w(tf: Double, df: Double, dl: Double): Double =
      ((n - df + 0.5) / (df + 0.5)) *
        ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl))))
    val d1 = (0.0 + w(2, 2, 4)) + w(1, 1, 4) // cat sorts before dog
    val d2 = 0.0 + w(1, 2, 6)
    assert(out(0).getDouble(2) == d1)
    assert(out(1).getDouble(2) == d2)
  }

  test("bm25TopK honors topK and breaks score ties by id") {
    // 30 identical docs — identical scores, so the top-5 must be ids 0-4
    val docs = (0L until 30L).map(i => (i, "apple pie")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, Seq("apple"), topK = 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 5L))
  }

  // ---- KMV ----

  test("kmvDistinct is exact below k and within the error bound above it") {
    val small = (1 to 40).map(i => s"v$i").toDF("x")
    val r1 = Sketch.kmvDistinct(small, col("x"), k = 64, withExact = true).head()
    assert(r1.getAs[Long]("est_distinct") == 40L)
    assert(r1.getAs[Long]("n_exact") == 40L)

    // 5000 distinct values, k=256: KMV standard error ~ 1/sqrt(k-2)
    // ≈ 6.3%; assert a generous 4-sigma band (the hash is fixed, so
    // this is a deterministic regression pin, not a flaky bound)
    val big = (1 to 5000).map(i => s"key-$i").toDF("x")
    val r2 = Sketch.kmvDistinct(big, col("x"), k = 256, withExact = true).head()
    val est = r2.getAs[Long]("est_distinct").toDouble
    assert(math.abs(est - 5000.0) / 5000.0 < 0.25, s"estimate $est too far from 5000")
  }

  test("kmvDistinct counts distinct values, not rows") {
    val dup = (1 to 1000).map(i => s"v${i % 10}").toDF("x")
    val r = Sketch.kmvDistinct(dup, col("x"), k = 64, withExact = true).head()
    assert(r.getAs[Long]("est_distinct") == 10L)
    assert(r.getAs[Long]("k_used") == 10L)
  }

  // ---- frontier scheduling ----

  test("frontierSchedule assigns per-domain slots by (priority DESC, url) and drops domainless rows") {
    val urls = Seq(
      (1L, "https://a.example.com/p1", 5L),
      (2L, "https://b.example.com/p2", 9L),
      (3L, "https://other.net/x", 9L),
      (4L, "not a url at all", 99L),
      (5L, "https://c.example.com/p0", 9L)).toDF("doc_id", "url", "priority")
    val out = UrlOps.frontierSchedule(urls, col("url"), col("priority"))
      .orderBy(col("slot"), col("domain"), col("url")).collect()
    // row 4 has no registered domain -> dropped
    assert(out.map(_.getAs[Long]("id")).toSet == Set(1L, 2L, 3L, 5L))
    val slots = out.map(r => (r.getAs[Long]("id"), r.getAs[Long]("slot"))).toMap
    // example.com queue: priority 9 ties broken by url asc -> b(p2) then c(p0)? no:
    // url asc: ".../p0" < ".../p2" lexicographically after host differs —
    // full urls: https://b.example.com/p2 vs https://c.example.com/p0,
    // so b < c by host. b=slot1, c=slot2, a(pri 5)=slot3.
    assert(slots(2L) == 1L && slots(5L) == 2L && slots(1L) == 3L)
    assert(slots(3L) == 1L) // other.net's own queue
    // wave-1 rows (slot=1) cover both domains: perfect interleave
    assert(out.filter(_.getAs[Long]("slot") == 1L).map(_.getAs[String]("domain")).toSet ==
      Set("example.com", "other.net"))
  }

  // ---- BPE pair counts ----

  test("bpePairCounts weights pairs by word frequency and skips 1-char words") {
    // corpus: "ab ab ab cd a" -> words: ab×3, cd×1, a×1(skipped: len<2)
    val docs = Seq((1L, "ab ab ab"), (2L, "cd a ab")).toDF("doc_id", "text")
    val out = TextOps.bpePairCounts(docs, topK = 10).collect()
    val byPair = out.map(r => (r.getAs[String]("pair"),
      (r.getAs[Long]("n_words"), r.getAs[Long]("n_occurrences")))).toMap
    assert(byPair("ab") == ((1L, 4L))) // one distinct word, 4 corpus occurrences
    assert(byPair("cd") == ((1L, 1L)))
    assert(!byPair.contains("a "))
    // rank 1 is the argmax pair = the next BPE merge
    assert(out.find(_.getAs[Long]("rank") == 1L).get.getAs[String]("pair") == "ab")
  }

  test("bpePairCounts counts interior pairs of longer words positionally") {
    // "abab" contributes ab, ba, ab -> pair "ab" occurs 2x per word occurrence
    val docs = Seq((1L, "abab abab")).toDF("doc_id", "text")
    val byPair = TextOps.bpePairCounts(docs, topK = 10).collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n_occurrences"))).toMap
    assert(byPair("ab") == 4L) // 2 positions x 2 occurrences
    assert(byPair("ba") == 2L)
  }

  // ---- k-anonymity ----

  test("kAnonymityGate suppresses QI groups smaller than k and reports group sizes") {
    val rows = Seq(
      (1L, "en", "a"), (2L, "en", "a"), (3L, "en", "a"),
      (4L, "fr", "a"), (5L, "fr", "a"),
      (6L, "de", "b")).toDF("id", "lang", "src")
    val out = Pii.kAnonymityGate(rows, Seq("lang", "src"), k = 3)
    val kept = out.select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
    assert(out.select("group_size").as[Long].collect().forall(_ == 3L))
    val k2 = Pii.kAnonymityGate(rows, Seq("lang", "src"), k = 2)
    assert(k2.count() == 5) // fr group now passes, de still suppressed
    assertThrows[IllegalArgumentException] {
      Pii.kAnonymityGate(rows, Seq("lang"), k = 1)
    }
  }
}
