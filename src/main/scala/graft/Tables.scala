package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

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

  /** once-per-PATH guard for the events.ts nanos-magnitude probe — keyed
    * per parquet path, not JVM-wide: one session can load several sfDirs
    * (sf0.001 smoke + sf0.1 bench), and a later dir with a different
    * int64 encoding must be probed too, or it gets the 1000x-off
    * conversion the probe exists to catch (ADVICE r6). */
  private val nanosProbedPaths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.parquet(path)
    if (name == "events") normalizeEventTs(df, probeKey = Some(path)) else df
  }

  /** Normalize events.ts to a session-TZ (UTC) TimestampType at
    * microsecond resolution, whatever physical type the driver generated:
    *
    *  - parquet TIMESTAMP(NANOS): Spark's vectorized reader rejects it
    *    unless spark.sql.legacy.parquet.nanosAsLong=true (set once at
    *    session build — GraftSession), under which it arrives as raw nano
    *    LONGs. `ts div 1000`, NOT `ts / 1000`: Spark's `/` is double
    *    division, and epoch nanos (~1.7e18) exceed a double's 2^53
    *    integer range — the rounded quotient is off by ±1 µs (caught by
    *    q30's raw-micros oracle; day/window bucketing had absorbed it).
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *    TIMESTAMP_NTZ; with the session TZ pinned to UTC the cast to
    *    TimestampType is the identity on the underlying micros, and
    *    DuckDB reads the same file at the same naive micro values.
    *  - already TimestampType: pass through.
    */
  def normalizeEventTs(df: DataFrame, probeKey: Option[String] = None): DataFrame =
    df.schema("ts").dataType match {
      case types.LongType =>
        // A raw LONG ts is assumed to be epoch NANOS (the
        // nanosAsLong reading of TIMESTAMP(NANOS) — the only way the
        // session produces LongType here). If a future testdata
        // regeneration wrote UNANNOTATED int64 micros instead, `div
        // 1000` would be silently off by 1000x — so probe the
        // magnitude once per path (`probeKey`; no key → probe every
        // call): 2020..2100 epoch nanos are ~1.6e18..4.1e18, micros
        // ~1.6e15; one 1-row take, then free for that path.
        // (ADVICE r5: verify the assumption, don't just trust it.)
        if (probeKey.forall(nanosProbedPaths.add)) {
          df.select(col("ts")).limit(1).collect().headOption
            .filterNot(_.isNullAt(0)) // a null first ts proves nothing
            .foreach { r =>
              val v = math.abs(r.getLong(0))
              // Fail only in the plausibly-MICROS band: ~1e14..1e17 is
              // epoch micros for ~1973..5138, far outside any nanos
              // reading (< 28 hours after epoch). Values below the band
              // are ambiguous epoch-near fixtures — legitimate as nanos
              // — and values above are the expected nanos magnitude.
              require(v <= 1e14.toLong || v > 1e17.toLong,
                s"events.ts LongType looks like MICROS (|ts| = $v), not the " +
                  "NANOS this reader assumes — the driver's parquet format " +
                  "changed; update Tables.normalizeEventTs (see TESTDATA.md)")
            }
        }
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(types.TimestampType))
      case _ => df
    }

  /** Register all tables as temp views so spark.sql(...) can be used with
    * the same statements the DuckDB oracle runs. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
