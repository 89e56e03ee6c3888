package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pairwise exact-substring dedup (q129, the Lee et al. class):
  * stride-1 char-gram islands per diagonal, char-exact verify,
  * char-exact extension across cap holes, maximality vs brute force. */
class DupSubstringSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(docs: Seq[(Long, String)], minLen: Int = 50,
                  maxGramDf: Int = Dedup.DefaultMaxBucketSize) = {
    import spark.implicits._
    Dedup.dupSubstringPairs(docs.toDF("doc_id", "text"),
        minLen = minLen, maxGramDf = maxGramDf)
      .orderBy("a_id", "b_id", "a_start", "b_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
  }

  /** All maximal common substrings >= minLen of (a, b): the O(n·m)
    * reference the distributed operator must reproduce. */
  private def bruteMax(a: String, b: String, minLen: Int): Set[(Long, Long, Long)] = {
    val res = scala.collection.mutable.Set[(Long, Long, Long)]()
    for (i <- a.indices; j <- b.indices
         if a(i) == b(j) && (i == 0 || j == 0 || a(i - 1) != b(j - 1))) {
      var l = 0
      while (i + l < a.length && j + l < b.length && a(i + l) == b(j + l)) l += 1
      if (l >= minLen) res += ((i.toLong, j.toLong, l.toLong))
    }
    res.toSet
  }

  // deterministic filler with no long self-repeats: distinct 8-char
  // blocks keyed by (tag, index) — two different tags never share a
  // 32-char window
  private def filler(tag: Char, blocks: Int): String =
    (0 until blocks).map(i => f"$tag${i % 97}%03d-$tag${(i * 7) % 89}%02d").mkString

  test("planted span: exact offsets, exact length, nothing else") {
    // sentinels pin the boundaries: extension must stop exactly there
    val span = "the quick brown fox jumps over the lazy dog again and again!"
    val a = filler('a', 10) + "<" + span + ">" + filler('c', 10)
    val b = filler('e', 4) + "[" + span + "]" + filler('g', 16)
    val got = run(Seq((1L, a), (2L, b)))
    assert(got == Seq((1L, 2L, 81L, 33L, span.length.toLong)))
    assert(got.map { case (_, _, s, _, l) =>
      a.substring(s.toInt, (s + l).toInt) }.head == span)
  }

  test("matches brute-force maximal common substrings on a two-span pair") {
    val s1 = "first shared span with enough characters to clear the bar 111"
    val s2 = "second COMPLETELY different shared span also over the bar 222"
    val a = filler('a', 8) + s1 + filler('c', 8) + s2 + filler('d', 8)
    val b = filler('e', 6) + s2 + filler('f', 6) + s1 + filler('h', 6)
    val got = run(Seq((1L, a), (2L, b)))
      .map { case (_, _, as, bs, l) => (as, bs, l) }.toSet
    assert(got == bruteMax(a, b, 50), s"got $got want ${bruteMax(a, b, 50)}")
  }

  test("extension heals the hole a capped-out gram punches in a span") {
    // S = P1 + C + P2; C's FULLY-INTERNAL grams pushed over the cap by
    // 30 noise docs that all contain C between per-doc-unique sentinel
    // chars (boundary-spanning grams are then df=1 and C-internal ones
    // df=32 — the noise can never seed an island). The a/b islands
    // split at C's internal region, the char-exact extension walks
    // through it, distinct() re-unifies: ONE maximal span = all of S.
    val p1 = "left wing of the copied span long enough to stand alone! "
    val c = "COMMON BOILERPLATE SENTENCE IN EVERY SINGLE DOCUMENT HERE!!"
    val p2 = " right wing of the copied span also long enough to stand"
    val s = p1 + c + p2
    val a = filler('a', 8) + "<" + s + ">" + filler('d', 8)
    val b = filler('e', 8) + "[" + s + "]" + filler('h', 8)
    val noise = (10L until 40L).map { i =>
      val u = ('A' + (i - 10)).toChar // unique per doc, both boundaries
      (i, filler('n', 4) + u + c + u + filler('q', 4))
    }
    val got = run(Seq((1L, a), (2L, b)) ++ noise, maxGramDf = 10)
    val ab = got.filter(r => r._1 == 1L && r._2 == 2L)
      .map { case (_, _, as, bs, l) => (as, bs, l) }.toSet
    assert(ab == bruteMax(a, b, 50), s"got $got")
    assert(ab == Set((65L, 65L, s.length.toLong)))
    // and the capped boilerplate alone never pairs the noise docs
    // (C-internal grams over-cap, boundary grams unique; C < minLen)
    assert(got.forall(r => r._1 == 1L && r._2 == 2L), s"noise paired: $got")
  }

  test("minLen boundary is exact: 50 kept, 49 dropped") {
    val s50 = "exactly fifty characters long shared span rests here!"
      .substring(0, 50)
    val s49 = s50.substring(0, 49)
    assert(s50.length == 50 && s49.length == 49)
    val kept = run(Seq(
      (1L, filler('a', 8) + "<" + s50 + ">" + filler('c', 8)),
      (2L, filler('e', 8) + "[" + s50 + "]" + filler('g', 8))))
    assert(kept.map(_._5) == Seq(50L))
    val dropped = run(Seq(
      (1L, filler('a', 8) + "<" + s49 + ">" + filler('c', 8)),
      (2L, filler('e', 8) + "[" + s49 + "]" + filler('g', 8))))
    assert(dropped.isEmpty)
  }

  test("plan: gram equi-join only — no cartesian, candidates broadcast-or-shuffle") {
    import spark.implicits._
    val docs = (1L to 30L).map(i =>
      (i, filler(('a' + (i % 5)).toChar, 12) + s"shared tail for group ${i % 3} padded to length!!"))
    val q = Dedup.dupSubstringPairs(docs.toDF("doc_id", "text"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
