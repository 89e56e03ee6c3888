package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Reciprocal Rank Fusion (q102): rank-only combination of retriever
  * lists with a deterministic list-name-ordered fold. */
class RrfFusionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def term(rank: Long): Double = 1.0 / (60.0 + rank.toDouble)

  test("fused scores equal the hand fold; single-list docs carry one term") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rank")
    val b = Seq((12L, 1L), (10L, 2L), (13L, 3L)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq("alpha" -> a, "beta" -> b), "id")
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    // fold order is list-NAME order (alpha before beta), matching the
    // oracle's list(... ORDER BY src_list)
    assert(got(10L) == ((2L, term(1) + term(2))))
    assert(got(12L) == ((2L, term(3) + term(1))))
    assert(got(11L) == ((1L, term(2))))
    assert(got(13L) == ((1L, term(3))))
  }

  test("output is ordered by rrf desc then id, capped at topK") {
    val a = (1L to 30L).map(i => (i, i)).toDF("id", "rank")
    val b = (1L to 30L).map(i => (i, 31L - i)).toDF("id", "rank")
    // every doc's rrf = 1/(60+r) + 1/(60+31-r): symmetric around
    // r=15.5, so ids 1 and 30, 2 and 29, ... tie pairwise and the id
    // tie-break must order each pair
    val rows = Retrieval.rrfFuse(Seq("x" -> a, "y" -> b), "id", topK = 6)
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 6)
    val scores = rows.map(_._3)
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    // extreme ranks maximize the fused sum (1/61 + 1/90 > middle pairs)
    assert(rows.take(2).map(_._1).toSet == Set(1L, 30L))
    assert(rows(0)._1 < rows(1)._1, "equal scores break ties by id")
  }

  test("three lists fold in name order and guards reject bad input") {
    val a = Seq((1L, 1L)).toDF("id", "rank")
    val b = Seq((1L, 2L)).toDF("id", "rank")
    val c = Seq((1L, 3L)).toDF("id", "rank")
    val got = Retrieval.rrfFuse(Seq("m" -> b, "z" -> c, "a" -> a), "id")
      .as[(Long, Long, Double)].collect().head
    assert(got == ((1L, 3L, (term(1) + term(2)) + term(3))))
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Seq("a" -> a), "id"))
    intercept[IllegalArgumentException](
      Retrieval.rrfFuse(Seq("a" -> a, "a" -> b), "id"))
  }
}
