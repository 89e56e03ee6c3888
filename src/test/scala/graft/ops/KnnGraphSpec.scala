package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Corpus k-NN graph semantics: planted twins rank first, the graph is
  * bounded by k and by the bucket cap, and reruns are deterministic. */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val dim = 8

  /** deterministic unit-ish vectors: two tight clusters + exact twins */
  private def fixture() = {
    import spark.implicits._
    def v(base: Int, jitter: Double): Seq[Double] =
      (0 until dim).map(i => (if (i == base) 1.0 else 0.0) + jitter * ((i * 7 + 3) % 5))
    val rows = Seq(
      (1L, v(0, 0.0)), (2L, v(0, 0.0)),          // exact twins, cluster 0
      (3L, v(0, 0.01)), (4L, v(0, 0.02)),        // near cluster 0
      (5L, v(3, 0.0)), (6L, v(3, 0.0)),          // exact twins, cluster 3
      (7L, v(3, 0.015)))
    rows.toDF("vec_id", "embedding")
  }

  test("exact twins are each other's rank-1 neighbor") {
    import spark.implicits._
    val g = Ann.knnGraph(fixture(), k = 3, dim = dim)
      .as[(Long, Long, Long, Double)].collect()
    val rank1 = g.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    assert(rank1(1L) == 2L && rank1(2L) == 1L, s"cluster-0 twins: $rank1")
    assert(rank1(5L) == 6L && rank1(6L) == 5L, s"cluster-3 twins: $rank1")
  }

  test("per-node degree is bounded by k and ranks are 1..deg") {
    import spark.implicits._
    val g = Ann.knnGraph(fixture(), k = 2, dim = dim)
      .as[(Long, Long, Long, Double)].collect()
    g.groupBy(_._1).foreach { case (node, rows) =>
      assert(rows.length <= 2, s"node $node degree ${rows.length}")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length).toSeq,
        s"node $node ranks ${rows.map(_._2).toSeq}")
    }
  }

  test("neighbor scores are non-increasing in rank") {
    import spark.implicits._
    val g = Ann.knnGraph(fixture(), k = 5, dim = dim)
      .as[(Long, Long, Long, Double)].collect()
    g.groupBy(_._1).foreach { case (node, rows) =>
      val byRank = rows.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        s"node $node scores $byRank")
    }
  }

  test("a planted mega-bucket drops from the graph; small buckets survive") {
    import spark.implicits._
    // 6 IDENTICAL vectors (the hot-template scenario): every signature
    // cell they occupy holds ≥ 6 ids, over a cap of 4 → every cell
    // drops, so NO hot-family node gets an edge. The orthogonal twin
    // pair's cells stay at size 2 and survive.
    val hot = (0 until dim).map(i => if (i == 0) 1.0 else 0.0)
    val pair = (0 until dim).map(i => if (i == 5) 1.0 else 0.0)
    val df = ((1L to 6L).map(i => (i, hot)) ++
      Seq((91L, pair), (92L, pair))).toDF("vec_id", "embedding")
    val obs = new org.apache.spark.sql.Observation("knn-cap")
    val g = Ann.knnGraph(df, k = 3, dim = dim,
        maxBucketSize = 4, stats = Some(obs))
      .as[(Long, Long, Long, Double)].collect()
    assert(g.map(_._1).toSet == Set(91L, 92L),
      s"only the small-bucket pair may have edges: ${g.toSeq}")
    val m = obs.get
    assert(m("dropped_buckets").asInstanceOf[Long] >= 8L, s"metrics: $m")
    assert(m("max_bucket").asInstanceOf[Long] >= 6L, s"metrics: $m")
  }

  test("mega-bucket drop WARNs by default on the knnGraph path too") {
    import spark.implicits._
    graft.ops.CapStats.drainFired()
    // keep a surviving under-cap pair so the result is non-empty (AQE
    // empty-propagation would elide the metrics node otherwise)
    val hot = (0 until dim).map(i => if (i == 0) 1.0 else 0.0)
    val pair = (0 until dim).map(i => if (i == 5) 1.0 else 0.0)
    val df = ((1L to 6L).map(i => (i, hot)) ++
      Seq((91L, pair), (92L, pair))).toDF("vec_id", "embedding")
    Ann.knnGraph(df, k = 3, dim = dim, maxBucketSize = 4).count()
    val deadline = System.nanoTime() + 10e9.toLong
    var fired = Seq.empty[(String, Long, Long)]
    while (fired.isEmpty && System.nanoTime() < deadline) {
      fired = graft.ops.CapStats.drainFired().filter(_._1 == "cappedSelfCandidates")
      if (fired.isEmpty) Thread.sleep(50)
    }
    assert(fired.exists { case (_, d, m) => d >= 8L && m >= 6L },
      s"expected default-on drop record: $fired")
  }

  test("reruns are deterministic") {
    import spark.implicits._
    def run() = Ann.knnGraph(fixture(), k = 3, dim = dim)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(run() == run())
  }

  test("per-node top-k compiles to WindowGroupLimit (map-side bound)") {
    val plan = Ann.knnGraph(fixture(), k = 3, dim = dim)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }

  // ---- hardNegatives ----

  /** seven near-identical vectors (they collide in every table) with
    * labels split 1-4 / 5-7 — the candidate graph is dense, so the
    * cluster FILTER is the only thing separating the groups */
  private def tightFixture() = {
    import spark.implicits._
    (1L to 7L).map(i =>
        (i, (0 until dim).map(j => (if (j == 0) 1.0 else 0.0) + 0.002 * i * j)))
      .toDF("vec_id", "embedding")
  }
  private val labels: Map[Long, Long] =
    Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 2L, 6L -> 2L, 7L -> 2L)

  test("hard negatives never come from the query's own cluster") {
    import spark.implicits._
    val clusters = labels.toSeq.toDF("vec_id", "cluster_id")
    val neg = Ann.hardNegatives(tightFixture(), clusters, k = 3, dim = dim)
      .as[(Long, Long, Long, Double)].collect()
    assert(neg.nonEmpty, "near-identical vectors must produce candidates")
    neg.foreach { case (src, _, dst, _) =>
      assert(labels(src) != labels(dst), s"$src got same-cluster negative $dst")
    }
  }

  test("cluster filter runs before the top-k: negatives fill the k slots") {
    import spark.implicits._
    val clusters = labels.toSeq.toDF("vec_id", "cluster_id")
    // with k=2, an after-the-window filter would let node 1's nearest
    // SAME-cluster rows crowd the slots and then be deleted, leaving
    // degree < 2; the before-scoring filter must deliver both slots
    val negByNode = Ann.hardNegatives(tightFixture(), clusters, k = 2, dim = dim)
      .as[(Long, Long, Long, Double)].collect().groupBy(_._1)
    labels.keys.foreach { n =>
      assert(negByNode.get(n).map(_.length).contains(2),
        s"node $n must get exactly 2 cross-cluster negatives: " +
          s"${negByNode.get(n).map(_.toSeq)}")
    }
  }
}
