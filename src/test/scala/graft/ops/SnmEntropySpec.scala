package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Sorted-neighborhood blocking and fixed-point token entropy. */
class SnmEntropySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- sortedNeighborPairs ----

  private def snm(docs: Seq[(Long, String)], w: Int) =
    Dedup.sortedNeighborPairs(docs.toDF("doc_id", "text"), col("text"), w)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2)).toSeq

  test("snm: pairs are exactly the w successors in (key, id) order") {
    // sort order by key: b(4), c(1), d(3), e(2)
    val docs = Seq((1L, "c"), (2L, "e"), (3L, "d"), (4L, "b"))
    assert(snm(docs, 2).toSet == Set(
      (4L, 1L, 1L), (4L, 3L, 2L),   // b -> c, d
      (1L, 3L, 1L), (1L, 2L, 2L),   // c -> d, e
      (3L, 2L, 1L)))                // d -> e
  }

  test("snm: candidate volume is exactly sum over i of min(w, n-1-i)") {
    val docs = (1L to 10L).map(i => (i, s"k$i"))
    val r = snm(docs, 3)
    assert(r.size == 7 * 3 + 2 + 1)  // 24
    assert(r.count(_._3 == 1L) == 9 && r.count(_._3 == 3L) == 7)
  }

  test("snm: equal keys tie-break on id; null keys drop") {
    val docs = Seq((5L, "same"), (2L, "same"), (9L, null.asInstanceOf[String]))
    assert(snm(docs, 1) == Seq((2L, 5L, 1L)))
  }

  test("snm: determinism across reruns (distributed rank is stable)") {
    val docs = (1L to 200L).map(i => (i, s"key${i % 37}"))
    assert(snm(docs, 2) == snm(docs, 2))
  }

  // ---- sampleQuantiles ----

  test("sampleQuantiles: exact when the group fits below k") {
    val rows = (1L to 9L).map(i => (i, "g", i * 10L))
    val r = Sketch.sampleQuantiles(rows.toDF("doc_id", "grp", "v"),
        "grp", col("v"), "doc_id", k = 64)
      .collect().head
    assert(r.getLong(1) == 9L)                  // whole group sampled
    assert(r.getDouble(2) == 30.0 && r.getDouble(3) == 50.0
      && r.getDouble(4) == 70.0)                // exact quartiles of 10..90
  }

  test("sampleQuantiles: membership is data-determined — rerun and union stable") {
    val rows = (1L to 500L).map(i => (i, s"g${i % 3}", i))
    def run(data: Seq[(Long, String, Long)]) =
      Sketch.sampleQuantiles(data.toDF("doc_id", "grp", "v"),
          "grp", col("v"), "doc_id", k = 32)
        .collect().map(r => (r.getString(0), r.getDouble(3))).toMap
    assert(run(rows) == run(rows.reverse)) // input order is irrelevant
  }

  test("sampleQuantiles: rank filter compiles to WindowGroupLimit") {
    val rows = (1L to 100L).map(i => (i, "g", i))
    val plan = Sketch.sampleQuantiles(rows.toDF("doc_id", "grp", "v"),
        "grp", col("v"), "doc_id", k = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  // ---- tokenEntropy ----

  test("tokenEntropy: exact integers against a Scala fixLog2 reference") {
    def fixLog2(x: Long): Long = {
      // floor(2^8 * log2 x) by 8 squaring steps on a 17-bit mantissa
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      var m = (x << 17) >> e
      var f = 0L
      for (_ <- 1 to 8) {
        m = (m * m) >> 17
        f *= 2
        if (m >= (1L << 18)) { m >>= 1; f += 1 }
      }
      e * 256 + f
    }
    val docs = Seq(
      (1L, "a", "x x x y"), (2L, "a", "x z"),
      (3L, "b", "w w w w"))
    val r = TextOps.tokenEntropy(docs.toDF("doc_id", "source", "text"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4, t._5))).toMap
    // source a: x:4, y:1, z:1 -> n=6, distinct=3
    val aSum = 4 * fixLog2(4) + 1 * fixLog2(1) + 1 * fixLog2(1)
    assert(r("a") == ((6L, 3L, aSum, 6 * fixLog2(6))))
    // source b: w:4 -> n=4, distinct=1, H=0 pieces: sum = 4*log2(4), n_log2n same
    assert(r("b") == ((4L, 1L, 4 * fixLog2(4), 4 * fixLog2(4))))
  }

  test("tokenEntropy: uniform distribution maximizes the entropy numerator") {
    val uniform = Seq((1L, "u", "a b c d e f g h"))
    val skewed = Seq((2L, "s", "a a a a a a a h"))
    val r = TextOps.tokenEntropy(
        (uniform ++ skewed).toDF("doc_id", "source", "text"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> (t._5 - t._4)).toMap // n*log2(n) - sum c*log2(c) ∝ H
    assert(r("u") > r("s"))
  }
}
