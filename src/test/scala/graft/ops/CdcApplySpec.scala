package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** CDC apply: upsert/delete semantics, latest-per-key compaction,
  * round-trip with snapshotDiff, and the anti-join plan shape. */
class CdcApplySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def snap(rows: (Long, String)*) = rows.toSeq.toDF("id", "v")

  test("upserts replace, inserts add, deletes remove, untouched rows survive") {
    val s = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val ch = Seq(
      (2L, "upsert", "B"),   // replace
      (4L, "upsert", "d"),   // insert
      (3L, "delete", null)   // remove
    ).toDF("id", "op", "v")
    val got = Diff.applyChanges(s, ch, "id")
      .as[(Long, String)].collect().toSet
    assert(got == Set(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("seq compaction: the latest change per key wins") {
    val s = snap(1L -> "a", 2L -> "b")
    val ch = Seq(
      (1L, 1L, "upsert", "tmp"), (1L, 2L, "delete", null),   // net delete
      (2L, 1L, "delete", null), (2L, 2L, "upsert", "B2"),    // net upsert
      (3L, 1L, "upsert", "x"), (3L, 2L, "upsert", "y")       // net y
    ).toDF("id", "seq", "op", "v")
    val got = Diff.applyChanges(s, ch, "id", seqCol = Some("seq"))
      .as[(Long, String)].collect().toSet
    assert(got == Set(2L -> "B2", 3L -> "y"))
  }

  test("round-trip: applying snapshotDiff's changes to prior rebuilds current") {
    val prior = snap(1L -> "a", 2L -> "b", 3L -> "c")
    val current = snap(2L -> "B", 3L -> "c", 4L -> "d")
    val diff = Diff.snapshotDiff(current, prior, "id", md5(col("v")))
    // turn the diff into a change set: removed -> delete, else upsert
    // with the current payload
    val ch = diff
      .withColumn("op",
        when(col("status") === "removed", lit("delete")).otherwise(lit("upsert")))
      .join(current, Seq("id"), "left")
      .select(col("id"), col("op"), col("v"))
    val got = Diff.applyChanges(prior, ch, "id")
      .as[(Long, String)].collect().toSet
    assert(got == current.as[(Long, String)].collect().toSet)
  }

  test("empty change set is the identity") {
    val s = snap(1L -> "a", 2L -> "b")
    val ch = Seq.empty[(Long, String, String)].toDF("id", "op", "v")
    assert(Diff.applyChanges(s, ch, "id").as[(Long, String)].collect().toSet ==
      Set(1L -> "a", 2L -> "b"))
  }

  test("plan: snapshot side anti-joins the touched keys, payload never shuffles") {
    val s = spark.range(0, 2000).select(col("id"), concat(lit("v"), col("id")).as("v"))
    val ch = Seq((1L, "upsert", "X"), (2L, "delete", null)).toDF("id", "op", "v")
    val q = Diff.applyChanges(s, ch, "id")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("BroadcastHashJoin"),
      s"small change set must broadcast under AQE:\n$plan")
  }
}
