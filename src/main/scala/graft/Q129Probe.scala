package graft

import org.apache.spark.sql.functions._

/** Second-point diagnosis for q129 (SCALING r16): the sf1.0→sf2.0 pair
  * measured 2.84× for a 2× corpus. This probe decomposes the growth:
  * gram occurrences (scan volume), duplicated grams (df >= 2), the
  * candidate join's Σ df·(df−1)/2 (pair volume — the dedup-physics
  * term that grows superlinearly whenever duplication DENSITY grows
  * with corpus size), over-cap drops, and final span count.
  * Run: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.Q129Probe". */
object Q129Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = 32
    val cap = graft.ops.Dedup.DefaultMaxBucketSize
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("id"), col("text").as("t"))
      .filter(col("t").isNotNull && length(col("t")) >= k)
    val grams = transform(sequence(lit(0), length(col("t")) - k),
      i => xxhash64(col("t").substr(i + lit(1), lit(k))))
    val pos = d.select(explode(grams).as("gh"))
    val sizes = pos.groupBy(col("gh")).agg(count(lit(1)).as("df"))
    val row = sizes.agg(
      sum(col("df")).as("occurrences"),
      count(lit(1)).as("distinct_grams"),
      sum(when(col("df") >= 2, 1L).otherwise(0L)).as("dup_grams"),
      sum(when(col("df") >= 2 && col("df") <= cap,
        (col("df") * (col("df") - 1) / 2).cast("long")).otherwise(0L)).as("pair_volume"),
      sum(when(col("df") > cap, 1L).otherwise(0L)).as("overcap_grams"),
      max(col("df")).as("max_df")).first()
    println(s"Q129PROBE dir=$dir occ=${row.getLong(0)} grams=${row.getLong(1)} " +
      s"dup=${row.getLong(2)} pairVol=${row.getLong(3)} " +
      s"overcap=${row.getLong(4)} maxDf=${row.getLong(5)}")
    spark.stop()
  }
}
