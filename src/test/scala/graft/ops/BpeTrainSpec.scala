package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** BPE tokenizer training (r15, q158) — the hand-checkable loop rows
  * plus the VERDICT-asked property: encoding the vocabulary through
  * q95's [[TextOps.bpeEncodeVocab]] path with the LEARNED table
  * reproduces the training segmentation exactly (min-rank iteration ≡
  * training-order application, which holds for tables produced by
  * training by construction — [[TextOps.bpeEncodeWord]]'s equivalence
  * scaladoc; BpeCdcPropertySpec checks the general table class). */
class BpeTrainSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def train(texts: Seq[String], n: Int) =
    TextOps.bpeTrain(texts.toDF("text"), n)

  test("hand-checked corpus: selection order, weighted counts, hierarchical merges") {
    // "low lower lowest low low": low×3, lower×1, lowest×1
    // char pairs: (l,o)×5, (o,w)×5, (w,e)×2, (e,r)×1, (e,s)×1, (s,t)×1
    val (merges, seg) = train(Seq("low lower lowest low low"), 3)
    // rank 1: (l,o) n=5 beats (o,w) n=5 on pair ASC
    merges(0)._1 shouldBe "l"
    merges(0)._2 shouldBe "o"
    merges(0)._3 shouldBe 5L
    // rank 2: (lo,w) n=5 — the hierarchical pair the first merge created
    merges(1)._1 shouldBe "lo"
    merges(1)._2 shouldBe "w"
    merges(1)._3 shouldBe 5L
    // rank 3: (w,e)'s occurrences became (low,e) n=2
    merges(2)._1 shouldBe "low"
    merges(2)._2 shouldBe "e"
    merges(2)._3 shouldBe 2L
    // weighted trajectory: 20 chars (low×3 + lower + lowest) → 15 → 10 → 8
    merges.map(_._4) shouldBe Seq(15L, 10L, 8L)
    val segs = seg.as[(String, Seq[String])].collect().toMap
    segs("low") shouldBe Seq("low")
    segs("lower") shouldBe Seq("lowe", "r")
    segs("lowest") shouldBe Seq("lowe", "s", "t")
    seg.unpersist()
  }

  test("greedy overlap rule: runs of an identical pair merge 1st, 3rd, …") {
    // "aaaa": pairs (a,a)×3 weighted 1; merge → [aa, aa] (not [aa, a, a])
    val (merges, seg) = train(Seq("aaaa aaa"), 1)
    merges(0)._1 shouldBe "a"
    merges(0)._2 shouldBe "a"
    merges(0)._3 shouldBe 5L // 3 in aaaa + 2 in aaa (overlaps counted)
    val segs = seg.as[(String, Seq[String])].collect().toMap
    segs("aaaa") shouldBe Seq("aa", "aa")
    segs("aaa") shouldBe Seq("aa", "a")
    seg.unpersist()
  }

  test("property: bpeEncodeVocab over the learned table reproduces the training segmentation") {
    // a corpus with repeated structure so several merges are hierarchical
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "the quicker they come the quicker they go",
      "lower and lower the lowest bidder goes",
      "singing ringing winging their winter wings",
      "aaa aaaa abab ababab banana bandana")
    val (merges, seg) = train(texts, 12)
    merges should have size 12
    TextOps.validateMerges(merges.map(m => (m._1, m._2))) // training tables are well-formed
    val trained = seg.as[(String, Seq[String])].collect().toMap
    val encoded = TextOps
      .bpeEncodeVocab(trained.keys.toSeq.toDF("word"), merges.map(m => (m._1, m._2)))
      .as[(String, Seq[String], Long)].collect()
    encoded.length shouldBe trained.size
    encoded.foreach { case (w, toks, n) =>
      assert(toks == trained(w), s"word '$w': encode ${toks} != training ${trained(w)}")
      n shouldBe toks.length.toLong
    }
    seg.unpersist()
  }

  test("exhaustion: a vocabulary with fewer pairs than requested merges stops early") {
    val (merges, seg) = train(Seq("ab ab ab"), 10)
    merges should have size 1 // after (a,b) the vocab is single tokens
    merges(0)._4 shouldBe 3L
    seg.unpersist()
  }
}
