package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Token-budget mixture semantics on hand-built fixtures. */
class MixingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mix(budgets: Map[String, Long], rows: (Long, String, Long)*) = {
    import spark.implicits._
    Mixing.tokenBudgetMixture(
        rows.toDF("doc_id", "source", "ntok"),
        budgets, tokensCol = col("ntok"))
      .select("doc_id").as[Long].collect().toSet
  }

  test("admits a hash-ordered prefix whose token total stays within budget") {
    val rows = (1L to 10L).map(i => (i, "a", 10L))
    val got = mix(Map("a" -> 35L), rows: _*)
    assert(got.size == 3, s"3×10 ≤ 35 < 4×10, got $got")
    // deterministic: same spec → same membership
    assert(mix(Map("a" -> 35L), rows: _*) == got)
  }

  test("sources absent from the spec are dropped") {
    val got = mix(Map("a" -> 100L), (1L, "a", 5L), (2L, "zzz", 5L))
    assert(got == Set(1L))
  }

  test("an overflowing doc stops its source (prefix, not knapsack)") {
    import spark.implicits._
    val rows = (1L to 6L).map(i => (i, "a", 10L))
    val admitted = Mixing.tokenBudgetMixture(
        rows.toDF("doc_id", "source", "ntok"), Map("a" -> 25L), col("ntok"))
      .select("doc_id").as[Long].collect().toSet
    // hash order is fixed; exactly the first 2 docs of that order fit
    val hashOrder = rows.map(_._1).sortBy(i =>
      (graft.ops.SamplingTestHook.bucket(i.toString), i))
    assert(admitted == hashOrder.take(2).toSet)
  }

  test("NULL token counts charge zero, not skip — accounting stays exact") {
    import spark.implicits._
    val rows = Seq((1L, "a", Some(10L)), (2L, "a", None), (3L, "a", Some(10L)))
    val out = Mixing.tokenBudgetMixture(
        rows.toDF("doc_id", "source", "ntok"), Map("a" -> 20L), col("ntok"))
      .select(col("doc_id"), col("__tok")).as[(Long, Long)].collect().toMap
    // the null-count doc is admitted at zero mass; both 10-token docs
    // still fit because null charged nothing but ALSO counted as 0
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(2L) == 0L, "__tok pinned to zero, not null")
  }

  test("budgets apply per source independently") {
    val rows = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "b", 10L), (4L, "b", 10L))
    val got = mix(Map("a" -> 10L, "b" -> 20L), rows: _*)
    assert(got.count(Set(3L, 4L)) == 2, "b admits both")
    assert(got.count(Set(1L, 2L)) == 1, "a admits exactly one")
  }
}

/** Test-side replica of Sampling.hashBucket for order assertions. */
object SamplingTestHook {
  def bucket(id: String): Long = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(id.getBytes("UTF-8"))
    val hex = sha.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % (1L << 30)
  }
}
