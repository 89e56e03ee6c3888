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

  // ---- temperatureMixture ----

  test("temperature budgets are totalBudget·⌊√tokens⌋/Σw, per source") {
    import spark.implicits._
    // a: 100 docs × 1 token (w=10); b: 400 docs × 1 token (w=20);
    // total 30 → budgets land exactly on 10 and 20
    val rows = (1L to 100L).map(i => (i, "a", 1L)) ++
      (101L to 500L).map(i => (i, "b", 1L))
    val out = Mixing.temperatureMixture(
        rows.toDF("doc_id", "source", "ntok"), totalBudget = 30L, col("ntok"))
      .select(col("source"), col("__budget")).as[(String, Long)].collect()
    val budgets = out.toSet
    assert(budgets == Set(("a", 10L), ("b", 20L)), s"got $budgets")
    val counts = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(counts == Map("a" -> 10, "b" -> 20), s"got $counts")
  }

  test("epoch mixture: full epochs ride free, fraction is the hash prefix") {
    import spark.implicits._
    // source 'a': 3 docs × 10 tokens = 30; budget 75 = 2 epochs + 15
    // remainder -> the first doc(s) in hash order whose cumsum <= 15
    // get +1. source 'b': budget 5 < size -> prefix only.
    val rows = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L),
      (10L, "b", 10L), (11L, "b", 4L))
    val out = Mixing.epochMixture(rows.toDF("doc_id", "source", "ntok"),
        Map("a" -> 75L, "b" -> 5L), col("ntok"))
      .select(col("doc_id"), col("repeat_count")).as[(Long, Long)]
      .collect().toMap
    // every 'a' doc appears with >= 2; exactly one gets the +1
    assert(Set(1L, 2L, 3L).forall(id => out(id) >= 2L))
    assert(Seq(1L, 2L, 3L).map(out).sum == 7L) // 2+2+2 + one remainder
    // 'b': only a doc fitting in 5 tokens survives, with count 1; the
    // hash order decides which — membership equals tokenBudgetMixture's
    val prefix = Mixing.tokenBudgetMixture(
        rows.toDF("doc_id", "source", "ntok"), Map("b" -> 5L), col("ntok"))
      .select("doc_id").as[Long].collect().toSet
    assert(out.keySet.filter(_ >= 10L) == prefix)
    assert(prefix.forall(out(_) == 1L))
  }

  test("epoch mixture: zero-token docs ride epochs but never the remainder") {
    import spark.implicits._
    val rows = Seq((1L, "a", 0L), (2L, "a", 10L))
    val out = Mixing.epochMixture(rows.toDF("doc_id", "source", "ntok"),
        Map("a" -> 25L), col("ntok"))
      .select(col("doc_id"), col("repeat_count")).as[(Long, Long)]
      .collect().toMap
    // size 10, budget 25 -> 2 epochs + remainder 5 (no doc fits 5)
    assert(out == Map(1L -> 2L, 2L -> 2L))
  }

  test("temperature mixture keeps every source and is deterministic") {
    import spark.implicits._
    val rows = Seq((1L, "a", 4L), (2L, "a", 4L), (3L, "tiny", 1L))
    def run() = Mixing.temperatureMixture(
        rows.toDF("doc_id", "source", "ntok"), totalBudget = 5L, col("ntok"))
      .select("doc_id").as[Long].collect().toSet
    val got = run()
    // w_a = ⌊√8⌋ = 2, w_tiny = 1, Σ=3 → budgets 3 and 1: the tiny
    // source is NOT starved (that is the point of temperature scaling)
    assert(got.contains(3L), s"tiny source admitted: $got")
    assert(run() == got, "same spec → same membership")
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
