package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Round-11 additions: BPE merge application (tokenization under a
  * learned merge table) and the bloom-prefiltered anti-join. */
class BpeBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- bpeEncodeWord: the per-word merge loop ----

  private def enc(word: String, merges: (String, String)*): Seq[String] = {
    val pairs = merges.toIndexedSeq
    TextOps.bpeEncodeWord(word, pairs.zipWithIndex.toMap, pairs).toSeq
  }

  test("bpeEncodeWord applies merges lowest-rank-first, hierarchically") {
    // rank 0 (t,h) then rank 1 (th,e): "the" -> [th, e] -> [the]
    assert(enc("the", ("t", "h"), ("th", "e")) == Seq("the"))
    // rank order matters: (h,e) ranked above (t,h) grabs 'h' first
    assert(enc("the", ("h", "e"), ("t", "h")) == Seq("t", "he"))
    // unranked pairs stay characters
    assert(enc("xyz", ("t", "h")) == Seq("x", "y", "z"))
    assert(enc("a") == Seq("a"))
    assert(enc("") == Seq())
  }

  test("bpeEncodeWord merges same-token runs left-to-right non-overlapping") {
    assert(enc("aaa", ("a", "a")) == Seq("aa", "a"))
    assert(enc("aaaa", ("a", "a")) == Seq("aa", "aa"))
    // hierarchical run: (a,a) then (aa,aa)
    assert(enc("aaaa", ("a", "a"), ("aa", "aa")) == Seq("aaaa"))
    assert(enc("aaaaa", ("a", "a"), ("aa", "aa")) == Seq("aaaa", "a"))
  }

  test("bpeEncodeWord: a merge never re-fires on its own output") {
    // (a,b)->ab; the new 'ab' token next to 'b' is (ab,b), not (a,b)
    assert(enc("abb", ("a", "b")) == Seq("ab", "b"))
    assert(enc("abab", ("a", "b")) == Seq("ab", "ab"))
  }

  // ---- bpeTokenCounts: corpus plumbing ----

  test("bpeTokenCounts sums per-word costs and keeps token-less docs") {
    val docs = Seq(
      (1L, "the thin cat"),   // the->1, thin->[th,i,n]=3, cat->3 : 3 words 7 toks
      (2L, "THE the"),        // lowercased: 2 words, 2 toks
      (3L, "!!!"),            // token-less
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val merges = Seq(("t", "h"), ("th", "e"))
    val out = TextOps.bpeTokenCounts(docs, merges)
      .as[(Long, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(out == Map(1L -> ((3L, 7L)), 2L -> ((2L, 2L)),
      3L -> ((0L, 0L)), 4L -> ((0L, 0L))))
  }

  test("bpeTokenCounts encodes each distinct word once (vocab-bounded loop)") {
    // 1000 repetitions of one word: the mapPartitions stage sees ONE row
    val docs = (1L to 1000L).map(i => (i, "hello")).toDF("doc_id", "text")
    val vocabRows = TextOps.bpeEncodeVocab(
      docs.select(explode(TextOps.tokens(col("text"))).as("word")).distinct(),
      Seq(("l", "l"))).count()
    assert(vocabRows == 1L)
    val out = TextOps.bpeTokenCounts(docs, Seq(("l", "l")))
      .agg(sum("n_tokens")).as[Long].head()
    assert(out == 4000L) // hello -> [h,e,ll,o] = 4 per doc
  }

  // ---- bloomAntiJoin ----

  test("bloomAntiJoin equals the plain left-anti join exactly") {
    val corpus = (1L to 500L).map(i => (i, s"key${i % 97}", s"payload$i"))
      .toDF("id", "k", "payload")
    val ref = Seq("key3", "key14", "key59", "absent").toDF("rk")
    val got = BloomJoin.bloomAntiJoin(corpus, ref, col("k"), col("rk"))
      .select(col("id")).as[Long].collect().sorted.toSeq
    val want = corpus.join(ref, col("k") === col("rk"), "left_anti")
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(got == want)
    assert(got.nonEmpty && got.size < 500) // the gate actually bit
  }

  test("bloomAntiJoin keeps NULL-key rows and survives self-derived refs") {
    val corpus = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "b"),
      (4L, "c")).toDF("id", "k")
    // ref derived from the corpus itself (self-join lineage)
    val ref = corpus.filter(col("id") % 2 === 1).select(col("k"))
    val got = BloomJoin.bloomAntiJoin(corpus, ref, col("k"), col("k"))
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(got == Seq(2L, 4L)) // 1,3 are in ref; NULL row survives
  }

  test("bloomAntiJoin probes without shuffling the corpus side") {
    // spark.range leaf (a local Seq fixture gets constant-folded by
    // ConvertToLocalRelation, hiding the filter from the plan)
    val corpus = spark.range(100)
      .select(col("id"), concat(lit("k"), col("id")).as("k"))
    val ref = Seq("k5").toDF("rk")
    val plan = BloomJoin.bloomAntiJoin(corpus, ref, col("k"), col("rk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the clean branch (bloom-negative rows) reaches the union with no
    // exchange: the only exchange in the whole plan is the broadcast
    // of the reference keys for the verify join
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }
}
