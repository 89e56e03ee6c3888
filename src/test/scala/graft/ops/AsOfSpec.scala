package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** AsOf.asofJoin semantics on crafted frames: boundary equality (a right
  * row AT left.ts is visible), equal-ts tie-break (largest tieCol wins),
  * no-preceding-match → null, and key isolation. */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("as-of join: <= boundary, max-tie, null when nothing precedes, per-key") {
    import spark.implicits._
    // left: (id, key, ts)
    val left = Seq(
      (1L, "a", 10L),   // right rows at ts 10 visible (<=)
      (2L, "a", 5L),    // only r1 (ts 3)
      (3L, "a", 2L),    // nothing precedes -> null
      (4L, "b", 100L))  // key isolation: only b's row
      .toDF("id", "key", "ts")
    // right: (key, ts, rid) — two rows tie at ts=10 for key a
    val right = Seq(
      ("a", 3L, 31L),
      ("a", 10L, 41L),
      ("a", 10L, 42L),  // tie at ts=10: max rid (42) must win
      ("b", 90L, 51L),
      ("c", 1L, 61L))
      .toDF("key", "ts", "rid")

    val got = AsOf.asofJoin(left, right, Seq("key"), "ts", "ts",
        rightPayload = Seq("rid"), tieCol = "rid")
      .select(col("id"), col("asof_rid"))
      .as[(Long, Option[Long])].collect().toMap

    assert(got == Map(
      1L -> Some(42L),
      2L -> Some(31L),
      3L -> None,
      4L -> Some(51L)))
  }

  test("as-of join: non-numeric tie column (would throw under ANSI if cast)") {
    import spark.implicits._
    val left = Seq((1L, "k", 10L)).toDF("id", "key", "ts")
    val right = Seq(("k", 10L, "e42"), ("k", 10L, "e7"))
      .toDF("key", "ts", "rid")
    val row = AsOf.asofJoin(left, right, Seq("key"), "ts", "ts",
        rightPayload = Seq("rid"), tieCol = "rid")
      .select(col("asof_rid")).as[String].collect().toSeq
    assert(row == Seq("e7")) // max STRING tie: "e7" > "e42" lexicographically
  }

  test("as-of join: multiple payload columns carried together") {
    import spark.implicits._
    val left = Seq((1L, "k", 20L)).toDF("id", "key", "ts")
    val right = Seq(("k", 10L, 7L, "x"), ("k", 15L, 8L, "y"))
      .toDF("key", "ts", "rid", "tag")
    val row = AsOf.asofJoin(left, right, Seq("key"), "ts", "ts",
        rightPayload = Seq("rid", "tag"), tieCol = "rid")
      .select(col("asof_rid"), col("asof_tag"))
      .as[(Long, String)].collect().toSeq
    assert(row == Seq((8L, "y")))
  }
}
