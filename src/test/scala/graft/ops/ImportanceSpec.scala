package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.expressions.GraftFunctions

/** DSIR fixed-point importance scoring (q100): the exact integer log2
  * and the weight/score pipeline built on it. */
class ImportanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("fixLog2 is exact on powers of two and rejects out-of-domain input") {
    assert(GraftFunctions.fixLog2(1L) == 0L)
    assert(GraftFunctions.fixLog2(2L) == 256L)
    assert(GraftFunctions.fixLog2(1024L) == 2560L)
    assert(GraftFunctions.fixLog2(1L << 45) == 45L * 256L)
    intercept[IllegalArgumentException](GraftFunctions.fixLog2(0L))
    intercept[IllegalArgumentException](GraftFunctions.fixLog2(1L << 46))
  }

  test("fixLog2 tracks 256*log2 within floor truncation and is monotone") {
    var prev = -1L
    for (x <- (1L to 3000L) ++ Seq(12345L, 999999L, (1L << 40) + 7L)) {
      val v = GraftFunctions.fixLog2(x)
      val t = 256.0 * (math.log(x.toDouble) / math.log(2.0))
      // truncation at the normalizer and at each of 8 squarings only
      // ever rounds DOWN, by strictly less than ~2 units total
      assert(v <= t + 1e-9 && v > t - 3.0, s"x=$x v=$v true=$t")
      if (x <= 3000L) { assert(v >= prev, s"not monotone at $x"); prev = v }
    }
  }

  test("fixLog2 as a column equals the static helper (interpreted and codegen paths)") {
    val xs = Seq(1L, 2L, 3L, 7L, 100L, 131071L, 131072L, 999999999L)
    val got = spark.range(0, 1).crossJoin(xs.toDF("x"))
      .select(Importance.fixLog2(col("x")).as("v")).as[Long].collect()
    assert(got.toSeq == xs.map(GraftFunctions.fixLog2))
  }

  test("target == raw gives identically zero weights and scores") {
    val docs = (1L to 40L).map(i => (i, s"alpha beta gamma d$i e${i % 7}"))
      .toDF("doc_id", "text")
    val w = Importance.importanceWeights(docs, docs, "doc_id", "text", buckets = 64)
    assert(w.count() == 64)
    // ct == cr and nt == nr, so the four fixLog2 terms cancel EXACTLY
    assert(w.filter(col("w") =!= 0L).count() == 0)
    val s = Importance.importanceScores(docs, docs, "doc_id", "text", buckets = 64)
    assert(s.filter(col("score") =!= 0L).count() == 0)
    assert(s.count() == 40)
  }

  test("docs resembling the target outscore docs that don't; short docs score 0") {
    val raw = (
      (1L to 20L).map(i => (i, "spark shuffles partitions across executors")) ++
      (21L to 40L).map(i => (i, "llamas graze quietly on mountain slopes")) ++
      Seq((41L, "single"), (42L, ""))
    ).toDF("doc_id", "text")
    val target = raw.filter(col("doc_id") <= 20L)
    val s = Importance.importanceScores(raw, target, "doc_id", "text", buckets = 256)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s(1L)._1 > s(21L)._1,
      s"target-like doc must outscore non-target: ${s(1L)} vs ${s(21L)}")
    // all target-like docs share a text, as do all non-target: scores equal within class
    assert((2L to 20L).forall(i => s(i) == s(1L)))
    assert((22L to 40L).forall(i => s(i) == s(21L)))
    // one token -> no bigrams -> zero score, zero features, row still present
    assert(s(41L) == ((0L, 0L)) && s(42L) == ((0L, 0L)))
  }

  test("scoring plan: broadcast weight join, partial aggregation below both exchanges") {
    val docs = (1L to 50L).map(i => (i, s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 5}"))
      .toDF("doc_id", "text")
    val q = Importance.importanceScores(docs, docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", buckets = 128)
    q.collect() // force AQE to finalize
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"weight table must broadcast:\n$plan")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"), plan)
  }
}
