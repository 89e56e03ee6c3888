package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkTestBase

/** Product quantization (r15, q163). */
class PqSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** deterministic 8-dim corpus: 4 well-separated cluster anchors,
    * members = anchor + small id-dependent jitter; ids 100/101 are
    * EXACT duplicates of each other */
  private def corpus() = {
    val anchors = Seq(
      Array(10.0, 0, 0, 0, 0, 0, 0, 0), Array(0.0, 10, 0, 0, 0, 0, 10, 0),
      Array(0.0, 0, 10, 0, 0, 10, 0, 0), Array(0.0, 0, 0, 10, 10, 0, 0, 0))
    val rows = (0L until 40L).map { id =>
      val a = anchors((id % 4).toInt)
      val v = a.zipWithIndex.map { case (x, i) => x + ((id * 7 + i) % 5) * 0.01 }
      (id, v.toSeq)
    } ++ Seq((100L, anchors(0).toSeq), (101L, anchors(0).toSeq))
    rows.toDF("vec_id", "embedding")
  }

  test("train/encode: m codebooks of k cells; identical vectors get identical codes") {
    val cb = Pq.train(corpus(), m = 2, k = 4, iters = 3)
    cb.m shouldBe 2
    cb.subDim shouldBe 4
    cb.books.foreach(_.centroids.length shouldBe 4)
    val codes = Pq.encode(corpus(), cb).as[(Long, Seq[Int])].collect().toMap
    codes(100L) shouldBe codes(101L)
    codes.values.foreach { cs =>
      cs should have length 2
      all(cs) should (be >= 0 and be < 4)
    }
  }

  test("ADC: the query's own codes attain the global table minimum; ties break by id") {
    val c = corpus()
    val cb = Pq.train(c, m = 2, k = 4, iters = 3)
    // query 100's exact duplicate 101 shares code(100) — the
    // per-subspace argmin of 100's ADC table — so its ADC is the
    // smallest POSSIBLE score. Other cluster-0 members can land in the
    // same cells (identical codes ⇒ bit-identical ADC), so the top of
    // the ranking is the code-tie group in id order: every neighbor
    // ranked at or above 101 must carry exactly code(100).
    val out = Pq.searchAdc(c, c.filter($"vec_id" === 100L), cb, topK = 20)
      .orderBy("rank").collect()
    out.map(_.getLong(1)) shouldBe (1L to out.length).toArray
    val codes = Pq.encode(c, cb).as[(Long, Seq[Int])].collect().toMap
    val qCodes = codes(100L)
    val dupRank = out.find(_.getLong(2) == 101L).map(_.getLong(1))
      .getOrElse(fail("exact duplicate missing from top-20"))
    out.filter(_.getLong(1) <= dupRank).foreach { r =>
      Seq(r.getInt(3), r.getInt(4)) shouldBe qCodes
    }
    // self is excluded; witnesses match encode()'s assignment everywhere
    out.map(_.getLong(2)) should not contain 100L
    out.foreach { r =>
      Seq(r.getInt(3), r.getInt(4)) shouldBe codes(r.getLong(2))
    }
  }

  test("codebooksDF: m·k rows keyed (sub, cell), centroid dims = subDim") {
    val cb = Pq.train(corpus(), m = 4, k = 4, iters = 2)
    val df = Pq.codebooksDF(spark, cb).collect()
    df.length shouldBe 16
    df.map(r => (r.getInt(0), r.getInt(1))).toSet shouldBe
      (for { s <- 0 until 4; c <- 0 until 4 } yield (s, c)).toSet
    df.foreach(_.getSeq[Double](2) should have length 2)
  }

  test("ADC top-k compiles to WindowGroupLimit (map-side bound before the one exchange)") {
    val c = corpus()
    val cb = Pq.train(c, m = 2, k = 4, iters = 1)
    val plan = Pq.searchAdc(c, c.filter($"vec_id" === 100L), cb, topK = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }
}
