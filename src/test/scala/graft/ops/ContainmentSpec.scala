package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Directional containment pairs: subset detection, asymmetry vs
  * Jaccard, thresholds in integer arithmetic, cap behavior. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(docs: Seq[(Long, String)], num: Int = 9, den: Int = 10,
                  maxDf: Int = Dedup.DefaultMaxBucketSize) = {
    import spark.implicits._
    Dedup.containmentPairs(docs.toDF("doc_id", "text"),
        threshNum = num, threshDen = den, maxGramDf = maxDf)
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("embedded quote: containment fires where Jaccard would not") {
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val quote = "alpha beta gamma delta epsilon" // 5 toks -> 3 grams, all in long
    val r = run(Seq((1L, long), (2L, quote)))
    // quote(2) fully contained in long(1); reverse direction far below 9/10
    assert(r == Seq((2L, 1L, 3L, 3L)))
  }

  test("identical docs contain each other in both directions") {
    val t = "one two three four five six"
    val r = run(Seq((1L, t), (2L, t)))
    assert(r == Seq((1L, 2L, 4L, 4L), (2L, 1L, 4L, 4L)))
  }

  test("threshold is exact integer arithmetic at the boundary") {
    // a has 10 grams, 9 shared -> 9/10 >= 9/10 passes; 8 shared fails.
    val words = (1 to 12).map(i => s"w$i") // 12 toks -> 10 grams
    val a = words.mkString(" ")
    val b9 = (words.take(11) :+ "zzz").mkString(" ") // kills gram 10 only...
    val r = run(Seq((1L, a), (2L, b9)))
    // b9 shares grams 1..9 of a (w1..w11 intact), so a->b9 is exactly 9/10
    assert(r.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 9L && p._4 == 10L))
  }

  test("over-cap grams form no candidates; sub-cap shared gram still pairs") {
    // 5 docs all share 'x y z'; with maxDf=4 that posting list drops.
    // Docs 1,2 also share a rare tail, so only they survive as a pair
    // via the rare gram (and verify on FULL sets -> containment exact).
    val common = "x y z"
    val docs = Seq(
      (1L, s"$common rare tail words"),
      (2L, s"$common rare tail words"),
      (3L, s"$common aa bb cc"),
      (4L, s"$common dd ee ff"),
      (5L, s"$common gg hh ii"))
    val r = run(docs, num = 1, den = 2, maxDf = 4)
    // pairs among 3,4,5 share ONLY the over-cap gram 'x y z' -> missed
    assert(r.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (2L, 1L)))
  }

  test("shingle-less docs never pair") {
    val r = run(Seq((1L, "two words"), (2L, "two words")))
    assert(r.isEmpty)
  }
}
