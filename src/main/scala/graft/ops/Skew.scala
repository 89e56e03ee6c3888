package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys.
  *
  * AQE's skew-join splitting handles joins; pathological AGGREGATION
  * keys (one key holding 1% of 100 TB) still funnel through a single
  * reducer after the partial-agg combine when per-key partial state is
  * large (e.g. collect-like or high-cardinality intermediate). Salting
  * splits each key into `salts` subkeys for a first aggregation, then
  * combines the per-salt results in a second, tiny aggregation — the
  * heavy shuffle spreads over `salts`× more reducers.
  */
object Skew {

  /** A re-aggregable measure: `fn` in {sum, count, min, max}. */
  final case class Measure(col: String, fn: String, as: String)

  def saltedAggregate(df: DataFrame, keys: Seq[String], salts: Int,
                      measures: Seq[Measure]): DataFrame = {
    require(salts > 0)
    val stage1Aggs: Seq[Column] = measures.map { m =>
      (m.fn match {
        case "sum" => sum(col(m.col))
        case "count" => count(lit(1))
        case "min" => min(col(m.col))
        case "max" => max(col(m.col))
        case other => throw new IllegalArgumentException(s"not re-aggregable: $other")
      }).as(m.as)
    }
    // deterministic per-row salt: row identity spread over `salts` buckets
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id(), spark_partition_id()), lit(salts)))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(stage1Aggs.head, stage1Aggs.tail: _*)
    // stage 2: combine per-salt partials (count becomes sum)
    val stage2Aggs: Seq[Column] = measures.map { m =>
      (m.fn match {
        case "sum" | "count" => sum(col(m.as))
        case "min" => min(col(m.as))
        case "max" => max(col(m.as))
      }).as(m.as)
    }
    stage1.groupBy(keys.map(col): _*).agg(stage2Aggs.head, stage2Aggs.tail: _*)
  }
}
