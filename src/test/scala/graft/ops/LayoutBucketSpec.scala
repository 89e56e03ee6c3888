package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Bucketed-layout co-location: the join/agg shuffle elision that is
  * the entire point of paying the bucketed write. */
class LayoutBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val pid = ProcessHandle.current().pid()

  test("two same-bucketed tables join with ZERO exchanges; values exact") {
    val facts = spark.range(2000)
      .select((col("id") % 97).as("k"), (col("id") * 3).as("v"))
    val dims = spark.range(97).select(col("id").as("k"),
      concat(lit("n"), col("id")).as("name"))
    val ft = Layout.writeBucketed(facts, s"facts_bkt_$pid", "k", buckets = 8,
      sortCols = Seq("k"))
    val dt = Layout.writeBucketed(dims, s"dims_bkt_$pid", "k", buckets = 8,
      sortCols = Seq("k"))
    // broadcast would hide the point: force the sort-merge path
    val joined = ft.hint("merge").join(dt, "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"co-located bucketed join must not shuffle either side:\n$plan")
    // correctness: same result as the unbucketed join
    val got = joined.agg(sum(col("v")), count(lit(1))).as[(Long, Long)].head()
    val want = facts.join(dims, "k").agg(sum(col("v")), count(lit(1)))
      .as[(Long, Long)].head()
    assert(got == want)
  }

  test("groupBy on the bucket key aggregates without an exchange") {
    val facts = spark.range(1000).select((col("id") % 31).as("k"), col("id").as("v"))
    val ft = Layout.writeBucketed(facts, s"agg_bkt_$pid", "k", buckets = 4)
    val agg = ft.groupBy(col("k")).agg(sum(col("v")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketing is a persisted pre-shuffle — groupBy(k) must reuse it:\n$plan")
    val got = agg.as[(Long, Long)].collect().toMap
    val want = facts.groupBy(col("k")).agg(sum(col("v")))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val a = Layout.writeBucketed(
      spark.range(100).select((col("id") % 7).as("k"), col("id").as("v")),
      s"mis_a_$pid", "k", buckets = 4)
    val b = Layout.writeBucketed(
      spark.range(7).select(col("id").as("k")), s"mis_b_$pid", "k", buckets = 3)
    val n = a.hint("merge").join(b, "k").count()
    assert(n == 100L)
  }
}
