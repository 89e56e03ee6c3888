package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Aho–Corasick blocklist matching (r14): brute-force parity over a
  * SMALL alphabet (forced overlaps, shared prefixes, phrases that are
  * suffixes of each other — the cases where the failure/output links
  * earn their keep), plus the DataFrame op's aggregation contract. */
class BlocklistSpec extends AnyFunSuite {

  private def brute(text: String, phrases: Seq[String]): Seq[(Int, Int)] =
    for {
      (p, pid) <- phrases.zipWithIndex if p.nonEmpty
      i <- 0 to text.length - p.length if text.regionMatches(i, p, 0, p.length)
    } yield (pid, i + p.length) // (phraseId, 1-based end), brute order

  test("automaton matches == brute force on 400 seeded random cases") {
    val rnd = new scala.util.Random(20260816)
    (1 to 400).foreach { k =>
      val alpha = "ab" + (if (k % 3 == 0) "c" else "")
      def str(n: Int) = (1 to n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val phrases = (1 to 1 + rnd.nextInt(6)).map(_ => str(1 + rnd.nextInt(5))).distinct
      val text = str(5 + rnd.nextInt(60))
      val ac = AhoCorasick.build(phrases)
      val got = ac.matches(text).toSeq.sorted
      val want = brute(text, phrases).sorted
      assert(got == want,
        s"case $k: text='$text' phrases=$phrases\n got=$got\nwant=$want")
    }
  }

  test("suffix phrases fire via output links; overlaps all counted") {
    // "aba" in "ababa" overlaps itself; "ba" is a suffix of "aba"
    val ac = AhoCorasick.build(Seq("aba", "ba", "ababa"))
    val m = ac.matches("ababa").toSeq
    assert(m.count(_._1 == 0) == 2, s"aba twice (overlapping): $m") // ends 3, 5
    assert(m.count(_._1 == 1) == 2, s"ba twice (as suffix of aba): $m")
    assert(m.count(_._1 == 2) == 1, s"ababa once: $m")
  }

  test("duplicate phrases keep the first id: no doubled output rows") {
    val ac = AhoCorasick.build(Seq("foo", "bar", "foo"))
    val m = ac.matches("a foo b").toSeq
    assert(m == Seq((0, 5)), s"one match under the first id only: $m")
  }

  test("blocklistMatches: per-(doc, phrase) counts and first positions; exact case") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val docs = Seq(
      (1L, "xx bad word yy bad word zz"),
      (2L, "clean text here"),
      (3L, "BAD WORD case sensitive"), // no match: exact-case contract
      (4L, "overlap aaa test")).toDF("doc_id", "text")
    val out = AhoCorasick.blocklistMatches(docs, Seq("bad word", "aa"))
      .orderBy("doc_id", "phrase")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "bad word", 2L, 4L),
      (4L, "aa", 2L, 9L))) // "aaa" = two overlapping "aa" at 9 and 10
  }
}
