package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Column profiling: exact counts incl. nulls and mixed types, the
  * approx default staying expand-free, and the 32-char render cap. */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val fixture = Seq(
    (1L, Some("alpha"), Some(10L)),
    (2L, Some("beta"), None),
    (3L, None, Some(30L)),
    (4L, Some("alpha"), Some(30L)),
    (5L, Some("x" * 50), Some(-7L))
  ).toDF("id", "s", "v")

  test("exact profile: rows, nulls, distincts, min/max per column") {
    val got = Profile.profile(fixture, Seq("id", "s", "v"), exact = true)
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") == ("id", 5L, 0L, 5L, "1", "5"))
    assert(got("s") == ("s", 5L, 1L, 3L, "alpha", "x" * 32))
    assert(got("v") == ("v", 5L, 1L, 3L, "-7", "30"))
  }

  test("all-null and constant columns profile sanely") {
    val df = Seq((1, Option.empty[String], "k"), (2, None, "k"))
      .toDF("id", "n", "c")
    val got = Profile.profile(df, Seq("n", "c"), exact = true)
      .as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("n") == ("n", 2L, 2L, 0L, null, null))
    assert(got("c") == ("c", 2L, 0L, 1L, "k", "k"))
  }

  test("approx default: HLL++ distinct, no Expand in the plan, counts near-exact at small n") {
    val df = (1 to 400).map(i => (i.toLong, s"v${i % 37}")).toDF("id", "s")
    val q = Profile.profile(df, Seq("id", "s"))
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx mode must not expand:\n$plan")
    assert(plan.contains("approx_count_distinct"), plan)
    val got = q.as[(String, Long, Long, Long, String, String)]
      .collect().map(r => r._1 -> r._4).toMap
    // rsd 1.6% default; tiny cardinalities are exact in practice
    assert(math.abs(got("id") - 400L) <= 8, s"id distinct ~400: $got")
    assert(math.abs(got("s") - 37L) <= 2, s"s distinct ~37: $got")
  }

  test("exact mode compiles to the Expand multi-distinct strategy") {
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    val plan = Profile.profile(df, Seq("id", "s"), exact = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"exact multi-distinct uses Expand:\n$plan")
  }
}
