package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Pairwise group-overlap matrix on KMV sketches: exact-branch equality
  * with brute-force set algebra, the union-at-k exact/estimate boundary,
  * estimator sanity above k, and the one-exchange + broadcast-pair plan. */
class OverlapMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def df(rows: Seq[(String, String)]) = rows.toDF("g", "x")

  private def run(rows: Seq[(String, String)], k: Int) =
    Sketch.overlapMatrix(df(rows), "g", col("x"), k)
      .as[(String, String, Long, Long, Long, Long, Double, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("exact branch equals brute-force set algebra, all pairs present") {
    val rows =
      Seq("a", "b", "c", "d").map(("g1", _)) ++
      Seq("c", "d", "e").map(("g2", _)) ++
      Seq("x", "y").map(("g3", _)) // disjoint from both
    val got = run(rows, k = 16)
    assert(got.map(r => (r._1, r._2)) == Seq(("g1", "g2"), ("g1", "g3"), ("g2", "g3")))
    val m = got.map(r => (r._1, r._2) -> r).toMap
    assert(m(("g1", "g2")) == ("g1", "g2", 4L, 3L, 2L, 5L, 2.0 / 5.0, true))
    assert(m(("g1", "g3")) == ("g1", "g3", 4L, 2L, 0L, 6L, 0.0, true))
    assert(m(("g2", "g3")) == ("g2", "g3", 3L, 2L, 0L, 5L, 0.0, true))
  }

  test("duplicate occurrences don't inflate counts (distinct semantics)") {
    val rows = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"),
      ("g2", "a"), ("g2", "a"), ("g2", "a"))
    val got = run(rows, k = 16)
    assert(got == Seq(("g1", "g2", 2L, 1L, 1L, 2L, 0.5, true)))
  }

  test("exact flag drops exactly when the pairwise UNION reaches k") {
    // g1: 20 distinct, g2: 20 distinct, overlap 10 -> union 30
    val rows = (1 to 20).map(i => ("g1", s"v$i")) ++
      (11 to 30).map(i => ("g2", s"v$i"))
    val Seq(wide) = run(rows, k = 32)
    assert(wide._8, "union 30 < 32 must be exact")
    assert(wide == ("g1", "g2", 20L, 20L, 10L, 30L, 10.0 / 30.0, true))
    // k = 16 < union: both sketches saturate, flag must drop
    val Seq(est) = run(rows, k = 16)
    assert(!est._8, s"union 30 >= 16 must be estimated: $est")
  }

  test("estimate branch: saturated sketches stay within the KMV error envelope") {
    // two groups of 3000 distinct values sharing 1500 -> J = 1/3
    val shared = (1 to 1500).map(i => s"s$i")
    val rows = (shared ++ (1 to 1500).map(i => s"a$i")).map(("g1", _)) ++
      (shared ++ (1 to 1500).map(i => s"b$i")).map(("g2", _))
    val Seq(r) = run(rows, k = 256)
    assert(!r._8, "3000-distinct groups must be in the estimate branch")
    // ~1/sqrt(254) ~ 6.3% relative error; allow 4 sigma
    assert(math.abs(r._3 - 3000.0) / 3000.0 < 0.25, s"n_a estimate off: $r")
    assert(math.abs(r._4 - 3000.0) / 3000.0 < 0.25, s"n_b estimate off: $r")
    assert(math.abs(r._6 - 4500.0) / 4500.0 < 0.25, s"union estimate off: $r")
    assert(math.abs(r._7 - 1.0 / 3.0) < 0.15, s"jaccard estimate off: $r")
  }

  test("plan: one k-bounded aggregate exchange; pair stage broadcasts") {
    val rows = (1 to 50).map(i => ("g" + i % 4, s"v$i"))
    val q = Sketch.overlapMatrix(df(rows), "g", col("x"), 32)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_k_min_distinct"),
      s"partial KMV aggregate must run below the exchange:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the sketch-table self-pair must broadcast:\n$plan")
  }
}
