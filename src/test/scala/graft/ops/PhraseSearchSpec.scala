package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Positional phrase search: adjacency vs mere co-occurrence, repeated
  * and self-overlapping phrase tokens, normalization parity with the
  * tokenizer, and the scan-stage vocabulary prune. */
class PhraseSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], phrase: String) =
    TextOps.phraseSearch(docs.toDF("doc_id", "text"), phrase)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("finds consecutive tokens only — co-occurrence is not a match") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "brown the quick fox"),     // adjacent "the quick" at 1
      (3L, "quick the brown fox"),     // both tokens, never adjacent
      (4L, "nothing relevant here"))
    assert(run(docs, "the quick") == Seq((1L, 1L, 0L), (2L, 1L, 1L)))
  }

  test("three-token phrase, multiple and overlapping matches count") {
    val docs = Seq(
      (1L, "a b c x a b c"),     // two disjoint matches of "a b c"
      (2L, "a a a a"),           // self-overlapping "a a a": starts 0,1
      (3L, "a b x b c"))
    assert(run(docs, "a b c") == Seq((1L, 2L, 0L)))
    assert(run(docs, "a a a") == Seq((2L, 2L, 0L)))
  }

  test("repeated token in the phrase binds distinct positions") {
    val docs = Seq(
      (1L, "x a b a y"),   // "a b a" at 1
      (2L, "a b b a"))     // not a match
    assert(run(docs, "a b a") == Seq((1L, 1L, 1L)))
  }

  test("phrase is normalized by the shared tokenizer (case, punctuation)") {
    val docs = Seq((1L, "Hello, World! Again"), (2L, "hello world again"))
    assert(run(docs, "Hello—WORLD") == Seq((1L, 1L, 0L), (2L, 1L, 0L)))
  }

  test("single-token phrase degenerates to token occurrence counting") {
    val docs = Seq((1L, "b a b b"), (2L, "c"))
    assert(run(docs, "b") == Seq((1L, 3L, 0L)))
  }

  test("plan: postings prune to the phrase vocabulary in the scan stage") {
    val docs = (1L to 50L).map(i => (i, s"filler tokens number $i the quick end"))
    val q = TextOps.phraseSearch(docs.toDF("doc_id", "text"), "the quick")
    val plan = q.queryExecution.executedPlan.toString
    // the isin literal filter must sit below the first exchange,
    // and the phrase-table join must broadcast
    assert(plan.contains("BroadcastHashJoin"), plan)
    val firstExchange = plan.indexOf("Exchange")
    val filterAt = plan.indexOf("token#", plan.indexOf("Filter"))
    assert(plan.contains("INSET") || plan.contains("IN ("), plan)
    assert(filterAt > firstExchange,
      s"vocabulary filter must be below (printed after) the exchange:\n$plan")
  }

  // ---- proximitySearch ----

  private def prox(docs: Seq[(Long, String)], terms: Seq[String], w: Int) =
    TextOps.proximitySearch(docs.toDF("doc_id", "text"), terms, w)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("proximity: minimal span is exact, any term order") {
    val docs = Seq(
      (1L, "a x x b x c"),          // positions a=0 b=3 c=5 -> span 6
      (2L, "c b a"),                // reversed, tight -> span 3
      (3L, "a x x x x x x x b x c"),// span 11 > 6 -> dropped at w=6
      (4L, "a b only two of them"))
    assert(prox(docs, Seq("a", "b", "c"), 6) ==
      Seq((1L, 6L, 3L), (2L, 3L, 3L)))
  }

  test("proximity: repeats pick the tightest window, n_hits counts occurrences") {
    // best window is the LAST a with the first b after it
    val docs = Seq((1L, "a x x x x a b"))
    assert(prox(docs, Seq("a", "b"), 3) == Seq((1L, 2L, 3L)))
  }

  test("proximity: single-term query degenerates to presence with span 1") {
    val docs = Seq((1L, "x a y"), (2L, "none here"))
    assert(prox(docs, Seq("a"), 1) == Seq((1L, 1L, 1L)))
  }

  test("proximity: window exchange is the only shuffle and sits on the id") {
    val docs = Seq((1L, "a b c"))
    val q = TextOps.proximitySearch(docs.toDF("doc_id", "text"),
      Seq("a", "b"), 4)
    val plan = q.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(plan).length == 1, plan)
  }
}
