package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Inverted-index construction and the reference-LM coverage gate on
  * hand-built fixtures. */
class IndexLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // ---- invertedIndex ----

  private def index(minDf: Long, maxDf: Long, cap: Int,
                    rows: (Long, String)*): Map[String, (Long, Long, String)] = {
    import spark.implicits._
    TextOps.invertedIndex(rows.toDF("doc_id", "text"),
        minDf = minDf, maxDf = maxDf, maxPostings = cap)
      .as[(String, Long, Long, String)].collect()
      .map { case (t, df, n, p) => t -> (df, n, p) }.toMap
  }

  test("df band cuts hapax and stopword tokens before any posting forms") {
    val got = index(2, 2, 10,
      (1L, "alpha shared"), (2L, "beta shared"), (3L, "gamma loner"))
    // shared: df=2 in band; alpha/beta/gamma/loner: df=1 below band
    assert(got.keySet == Set("shared"), s"got ${got.keySet}")
    assert(got("shared") == (2L, 2L, "1,2"))
  }

  test("maxDf cuts a corpus-wide token (the stopword bound)") {
    val rows = (1L to 5L).map(i => (i, s"the word$i"))
    val got = index(2, 4, 10, rows: _*)
    assert(!got.contains("the"), "df=5 > maxDf=4 must be cut")
  }

  test("postings rank by (tf DESC, id ASC) and the cap truncates visibly") {
    val got = index(2, 10, 2,
      (1L, "x x x"),  // tf=3
      (2L, "x"),      // tf=1
      (3L, "x x"),    // tf=2
      (4L, "x"))      // tf=1, loses the id tie-break to doc 2
    // df reports the TRUE frequency 4; the cap keeps top-2 by tf
    assert(got("x") == (4L, 2L, "1,3"), s"got ${got("x")}")
  }

  test("posting order is the window rank, not collect arrival order") {
    val rows = (1L to 20L).map(i => (i, "tok")) // all tf=1 → id order
    val got = index(2, 50, 20, rows: _*)
    assert(got("tok")._3 == (1L to 20L).mkString(","))
  }

  test("posting cap compiles to WindowGroupLimit (token-skew bound)") {
    import spark.implicits._
    val docs = (1L to 5L).map(i => (i, "tok")).toDF("doc_id", "text")
    val plan = TextOps.invertedIndex(docs, minDf = 2, maxDf = 50, maxPostings = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  // ---- lmHitRate ----

  private def gate(docs: Seq[(Long, String)], ref: Seq[(Long, String)],
                   minCount: Long = 2): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    TextOps.lmHitRate(docs.toDF("doc_id", "text"), ref.toDF("doc_id", "text"),
        minCount = minCount, keepNum = 3, keepDen = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, nb, nh, k) => id -> (nb, nh, k) }.toMap
  }

  test("reference-covered text passes, gibberish fails, at the 3/5 line") {
    val ref = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick brown fox jumps over the lazy dog"))
    val docs = Seq(
      (1L, "the quick brown fox"),         // 3/3 bigrams in model
      (2L, "zz yy xx ww vv"),              // 0/4
      (3L, "the quick zz yy xx ww"))       // 1/5 < 3/5
    val got = gate(docs, ref)
    assert(got(1L) == (3L, 3L, 1L), s"got ${got(1L)}")
    assert(got(2L) == (4L, 0L, 0L))
    assert(got(3L) == (5L, 1L, 0L))
  }

  test("minCount prunes one-off reference bigrams from the model") {
    val ref = Seq((100L, "aa bb"), (101L, "aa bb"), (102L, "cc dd"))
    val docs = Seq((1L, "aa bb"), (2L, "cc dd"))
    val got = gate(docs, ref, minCount = 2)
    assert(got(1L)._2 == 1L, "aa-bb seen twice → in model")
    assert(got(2L)._2 == 0L, "cc-dd seen once → pruned")
  }

  test("bigram OCCURRENCES are counted, and empty-gram docs drop") {
    val ref = Seq((100L, "aa bb aa bb"))
    val docs = Seq((1L, "aa bb aa bb aa"), (2L, "single"), (3L, ""))
    val got = gate(docs, ref, minCount = 2)
    // doc 1: bigrams [aa-bb, bb-aa, aa-bb, bb-aa]; model has aa-bb(×2)
    // and bb-aa only once → hits = the two aa-bb OCCURRENCES
    assert(got(1L) == (4L, 2L, 0L), s"got ${got(1L)}")
    assert(!got.contains(2L) && !got.contains(3L), "no bigrams → no row")
  }
}
