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

  test("bpeFertility: per-group integer sums agree with per-doc counts; one division") {
    val docs = Seq(
      (1L, "en", "the other the other"),
      (2L, "en", "the in"),
      (3L, "de", "in on er"),
      (4L, "zz", "")).toDF("doc_id", "lang", "text")
    val merges = Seq(("t", "h"), ("th", "e"), ("i", "n"), ("o", "n"), ("e", "r"))
    val got = TextOps.bpeFertility(docs, merges, groupCol = "lang")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // cross-check against the per-doc op summed per lang
    val perDoc = TextOps.bpeTokenCounts(docs, merges)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy("lang")
      .agg(sum("n_words").as("w"), sum("n_tokens").as("t"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.foreach { case (lang, w, t, f) =>
      assert((w, t) == perDoc(lang), s"$lang sums")
      assert(f == t.toDouble / w.toDouble, s"$lang fertility division")
    }
    // the zero-word group emits no row
    assert(!got.exists(_._1 == "zz"))
  }

  test("contaminationPairs attributes shared distinct grams per (corpus, eval) pair") {
    val evalDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, evalDoc + " extra tail words here now"),  // shares 3 8-gram windows
      (2L, "totally different content with no shared gram at all okay"),
      (3L, evalDoc)) // identical to the eval doc
    val pairs = Dedup.contaminationPairs(
        docs.toDF("doc_id", "text").filter(col("doc_id") =!= 10L),
        Seq((10L, evalDoc)).toDF("doc_id", "text"))
      .orderBy("corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // eval doc has 10 tokens -> 3 distinct 8-grams; doc 1 contains all 3,
    // doc 3 is identical (3), doc 2 shares none (no row)
    assert(pairs == Seq((1L, 10L, 3L), (3L, 10L, 3L)))
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

  // ---- cdcChunks ----

  /** Deterministic pseudo-random text (fixed LCG, no Math.random). */
  private def lcgText(n: Int, seed: Long = 12345L): String = {
    val sb = new StringBuilder
    var s = seed
    (0 until n).foreach { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      sb += ('a' + math.floorMod(s >>> 33, 26L).toInt).toChar
    }
    sb.toString
  }

  test("cdcChunks partitions every doc exactly and deterministically") {
    val txt = lcgText(4000)
    val docs = Seq((1L, txt), (2L, "short"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = TextOps.cdcChunks(docs, k = 8, divisor = 64)
      .orderBy(col("doc_id"), col("chunk_idx"))
      .as[(Long, Long, Long, Long, String)].collect()
    // empty/null docs produce nothing; a doc shorter than k is 1 chunk
    assert(!out.exists(r => r._1 == 3L || r._1 == 4L))
    assert(out.filter(_._1 == 2L).toSeq ==
      Seq((2L, 0L, 1L, 5L, java.security.MessageDigest.getInstance("MD5")
        .digest("short".getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString)))
    // chunks tile the doc: starts are contiguous, lengths sum to |doc|
    val c1 = out.filter(_._1 == 1L)
    assert(c1.length > 10, s"divisor 64 over 4000 chars should cut often: ${c1.length}")
    assert(c1.map(_._4).sum == 4000L)
    c1.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._4) // next start = prev start + prev len
    case _ => ()
    }
  }

  test("cdcChunks realigns after an edit (the content-defined property)") {
    val txt = lcgText(4000)
    val docs = Seq((1L, txt), (2L, "PREFIX-" + txt)).toDF("doc_id", "text")
    val out = TextOps.cdcChunks(docs, k = 8, divisor = 64)
      .as[(Long, Long, Long, Long, String)].collect()
    val h1 = out.filter(_._1 == 1L).map(_._5).toSet
    val h2 = out.filter(_._1 == 2L).map(_._5).toSet
    // everything after the first boundary downstream of the edit
    // re-aligns: the vast majority of chunk hashes are shared
    val shared = (h1 intersect h2).size.toDouble / h1.size
    assert(shared > 0.9, s"only ${(shared * 100).round}% of chunks realigned")
    // a fixed-stride chunker shares (almost) nothing under the same edit
    val fixedShared = {
      val f = TextOps.chunkDocs(docs, chunkChars = 64, strideChars = 64)
        .select(col("doc_id"), col("chunk_md5"))
        .as[(Long, String)].collect()
      val f1 = f.filter(_._1 == 1L).map(_._2).toSet
      val f2 = f.filter(_._1 == 2L).map(_._2).toSet
      (f1 intersect f2).size.toDouble / f1.size
    }
    assert(fixedShared < 0.1,
      s"fixed-stride should lose alignment: ${(fixedShared * 100).round}%")
  }

  test("cdcChunks min/max guards bound every chunk; doc still tiles exactly") {
    val txt = lcgText(5000, seed = 99L)
    val docs = Seq((1L, txt)).toDF("doc_id", "text")
    val out = TextOps.cdcChunks(docs, k = 8, divisor = 32,
        minLen = 40, maxLen = 100)
      .orderBy(col("chunk_idx"))
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.map(_._4).sum == 5000L)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._4)
    case _ => ()
    }
    // every chunk obeys maxLen; all but the final obey minLen
    assert(out.forall(_._4 <= 100L))
    assert(out.dropRight(1).forall(_._4 >= 40L))
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

  test("bloomAntiJoin gates a STREAMING corpus against a static reference") {
    // the bloom probe is a plain predicate and the verify join is
    // stream-static LEFT ANTI — both streaming-legal, so the same
    // operator decontaminates an ingest stream with zero changes
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val ref = Seq("bad1", "bad2").toDF("rk")
    val q = BloomJoin.bloomAntiJoin(in.toDF().toDF("id", "k"), ref, col("k"), col("rk"))
      .writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").start()
    try {
      in.addData((1L, "ok1"), (2L, "bad1"), (3L, "ok2"))
      q.processAllAvailable()
      in.addData((4L, "bad2"), (5L, "ok3"))
      q.processAllAvailable()
      val kept = spark.table("bloom_stream").select(col("id"))
        .as[Long].collect().sorted.toSeq
      assert(kept == Seq(1L, 3L, 5L))
    } finally q.stop()
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
