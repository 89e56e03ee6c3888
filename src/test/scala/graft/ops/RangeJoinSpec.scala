package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** RangeJoin.followingPairs on crafted frames: exact (t, t+W] boundary
  * semantics, matches that cross a bin boundary, key isolation, and
  * equality with the naive theta-join formulation on a random frame. */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val W = 100L

  test("boundaries: strict lower, inclusive upper, bin-crossing match") {
    import spark.implicits._
    // left at ts=95 (bin 0): window (95, 195] spans bins 0 and 1
    val left = Seq((1L, "k", 95L)).toDF("id", "key", "ts")
    val right = Seq(
      ("k", 95L, 10L),   // == leftTs -> excluded (strict lower)
      ("k", 96L, 11L),   // in, same bin
      ("k", 150L, 12L),  // in, NEXT bin (bin-crossing)
      ("k", 195L, 13L),  // == leftTs+W -> included (inclusive upper)
      ("k", 196L, 14L),  // out
      ("x", 100L, 15L))  // other key
      .toDF("key", "ts", "rid")
    val got = RangeJoin.followingPairs(left, right, Seq("key"), "ts", "ts", W, Seq("rid"))
      .select(col("r_rid")).as[Long].collect().toSet
    assert(got == Set(11L, 12L, 13L))
  }

  test("equals the naive theta join on a random frame") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(i =>
      (i.toLong, s"u${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
    val df = rows.toDF("id", "key", "ts")
    val banded = RangeJoin.followingPairs(
        df, df.select(col("key"), col("ts"), col("id").as("rid")),
        Seq("key"), "ts", "ts", W, Seq("rid"))
      .select(col("id"), col("r_rid")).as[(Long, Long)].collect().toSet
    val naive = df.as("l").join(df.as("r"),
        col("l.key") === col("r.key") &&
          col("r.ts") > col("l.ts") && col("r.ts") <= col("l.ts") + W)
      .select(col("l.id"), col("r.id")).as[(Long, Long)].collect().toSet
    assert(banded == naive)
    assert(banded.nonEmpty)
  }
}
