package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** topKeywords rank semantics: tf DESC, df ASC (= idf DESC), token ASC,
  * k cutoff, and the min-token-length gate. */
class KeywordsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(docs: Seq[(Long, String)], k: Int = 3, minLen: Int = 4) = {
    import spark.implicits._
    TextOps.topKeywords(docs.toDF("doc_id", "text"), "doc_id", col("text"),
        k = k, minTokenLen = minLen)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
  }

  test("tf dominates; corpus-rare token beats common at equal tf; token ties alphabetic") {
    val got = run(Seq(
      (1L, "zebra zebra common rare1"),
      (2L, "common other words here")))
    // doc 1: zebra tf=2 wins; rare1 (df=1) beats common (df=2) at tf=1
    assert(got.filter(_._1 == 1L).map(t => (t._2, t._3, t._4, t._5)) ==
      Seq(("zebra", 2L, 1L, 1L), ("rare1", 1L, 1L, 2L), ("common", 1L, 2L, 3L)))
    // doc 2 all tf=1; common has df=2 so the three df=1 tokens outrank it,
    // alphabetic among themselves — "common" must NOT make the top 3
    assert(got.filter(_._1 == 2L).map(_._2) == Seq("here", "other", "words"))
  }

  test("k cutoff: exactly k rows per doc with rank 1..k") {
    val got = run(Seq((1L, "aaaa bbbb cccc dddd eeee")), k = 2)
    assert(got.map(_._2) == Seq("aaaa", "bbbb"))
    assert(got.map(_._5) == Seq(1L, 2L))
  }

  test("minTokenLen gate drops short tokens entirely (also from df)") {
    val got = run(Seq((1L, "ab cd longword ab")), minLen = 4)
    assert(got.map(_._2) == Seq("longword"))
  }
}
