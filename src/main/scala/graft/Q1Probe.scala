package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Probe for the q1 cross-round drift (VERDICT r3 "What's wrong" #4):
  * times the scan alone, a double-sum variant, and the decimal q1 as
  * shipped, min-of-3 each. Finding (2026-08-12, quiet machine):
  *   scan_project 0.17  double_agg 0.26  decimal_agg 1.00  q1 1.12
  * → the decimal aggregation IS the cost (wide sum buffer leaves the
  * compact-long decimal path); see the q1 comment in SparkEntry for why
  * that stays. Re-run with `sbt "runMain graft.Q1Probe"` if q1 drifts
  * again — a real regression would show up in scan_project/double_agg,
  * not in the decimal constant. */
object Q1Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build()
    // honor the same env override as Bench, so a probe re-run against
    // another scale factor measures the data it claims to
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once()
      val ts = (1 to 3).map(_ => once())
      println(f"PROBE $tag min=${ts.min}%.3f runs=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    val li = Tables.load(spark, dir, "lineitem")
    println("PROBE rows=" + li.count())
    time("scan_project")(li.select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"))
    time("double_agg")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("a"), sum(col("l_extendedprice")).as("b"),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("c"),
        count(lit(1)).as("n")))
    time("decimal_agg")(li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("a"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("b"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(28, 6))).as("c"),
        count(lit(1)).as("n")))
    time("q1_as_shipped")(SparkEntry.queries("q1_pricing_summary")(spark, dir))
    spark.stop()
  }
}
