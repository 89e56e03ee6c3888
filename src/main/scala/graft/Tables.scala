package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * All tables are single parquet files under a scale-factor dir. Loading
  * goes through one place so every query benefits from the same read
  * settings, and so the 100 TB story is uniform: at cluster scale these
  * become partitioned directories and nothing else changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; with spark.sql.legacy.parquet.nanosAsLong=true
      // (set once at session build — GraftSession) it arrives as raw
      // nanos, converted here to a microsecond timestamp (Spark's native
      // resolution). DuckDB reads the same file at nanos and truncates
      // identically at micro granularity.
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      // `ts div 1000`, NOT `ts / 1000`: Spark's `/` is double division,
      // and epoch nanos (~1.7e18) exceed a double's 2^53 integer range —
      // the rounded quotient is off by ±1 µs (caught by q30's raw-micros
      // oracle; day/window bucketing had absorbed it).
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
    df
  }

  /** Register all tables as temp views so spark.sql(...) can be used with
    * the same statements the DuckDB oracle runs. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
