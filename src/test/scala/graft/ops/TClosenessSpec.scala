package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** t-closeness gate (q101): ordered-attribute EMD against the global
  * sensitive distribution, decided in exact integer arithmetic. */
class TClosenessSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // NOTE the global distribution the gate compares against is computed
  // over ALL groups — the two skewed groups below are mirror images so
  // the corpus baseline stays exactly 50/50
  private def fixture = (
    (1 to 5).map(i => (i.toLong, "g0", "a")) ++
    (6 to 10).map(i => (i.toLong, "g0", "b")) ++
    (11 to 19).map(i => (i.toLong, "g1", "a")) ++ Seq((20L, "g1", "b")) ++
    Seq((21L, "g2", "a")) ++ (22 to 30).map(i => (i.toLong, "g2", "b"))
  ).toDF("id", "grp", "src")

  test("skewed-but-diverse groups are dropped where l-diversity keeps them") {
    val df = fixture
    val lDiv = Pii.lDiversityGate(df, Seq("grp"), "src", l = 2)
    assert(lDiv.select("id").as[Long].collect().toSet == (1L to 30L).toSet,
      "all three groups are 2-diverse")
    // g0 mirrors the 50/50 baseline (emd 0); g1/g2 are 9:1 and 1:9
    // (emd = |0.9-0.5| = 0.4) — dropped at t=1/4
    val tClose = Pii.tClosenessGate(df, Seq("grp"), "src", tNum = 1, tDen = 4)
    assert(tClose.select("id").as[Long].collect().toSet == (1L to 10L).toSet,
      "only the baseline-matching group survives t=1/4")
    val emd = tClose.select("emd").distinct().as[Double].collect()
    assert(emd.toSeq == Seq(0.0))
  }

  test("emd audit value matches the closed form and group_n the group size") {
    // t=1/2 keeps all three; 0.4 is exact in binary (16/40)
    val got = Pii.tClosenessGate(fixture, Seq("grp"), "src", tNum = 1, tDen = 2)
      .select(col("grp"), col("group_n"), col("emd")).distinct()
      .as[(String, Long, Double)].collect()
      .map { case (g, n, e) => g -> ((n, e)) }.toMap
    assert(got("g0") == ((10L, 0.0)))
    assert(got("g1") == ((10L, 0.4)))
    assert(got("g2") == ((10L, 0.4)))
  }

  test("single sensitive value corpus-wide (m=1) keeps everything with emd 0") {
    val df = (1 to 12).map(i => (i.toLong, s"g${i % 3}", "only")).toDF("id", "grp", "src")
    val kept = Pii.tClosenessGate(df, Seq("grp"), "src", tNum = 1, tDen = 100)
    assert(kept.count() == 12)
    assert(kept.select("emd").distinct().as[Double].collect().toSeq == Seq(0.0))
  }

  test("NULL QI groups are gated like any other group (null-safe joins)") {
    // GROUP BY treats a NULL quasi-identifier tuple as a real group —
    // the grid fill and verdict join-back must match it (r11 advice:
    // plain === zero-filled / dropped NULL groups silently).
    val df = (
      (1 to 5).map(i => (i.toLong, null: String, "a")) ++
      (6 to 10).map(i => (i.toLong, null: String, "b")) ++
      (11 to 19).map(i => (i.toLong, "g1", "a")) ++ Seq((20L, "g1", "b"))
    ).toDF("id", "grp", "src")
    val kept = Pii.tClosenessGate(df, Seq("grp"), "src", tNum = 1, tDen = 1)
    // t=1 keeps everything — the point is the NULL group isn't dropped
    assert(kept.select("id").as[Long].collect().toSet == (1L to 20L).toSet)
    val nullEmd = kept.filter(col("grp").isNull).select("emd")
      .distinct().as[Double].collect().toSeq
    assert(nullEmd.nonEmpty && nullEmd.forall(e => e >= 0.0 && e <= 1.0))
  }

  test("verdict joins back broadcast; corpus shuffles once for the QI counts") {
    val df = (1 to 200).map(i => (i.toLong, s"g${i % 4}", s"s${i % 5}")).toDF("id", "grp", "src")
    val q = Pii.tClosenessGate(df, Seq("grp"), "src", tNum = 1, tDen = 2)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"gate must broadcast:\n$plan")
  }
}
