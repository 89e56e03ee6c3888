package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling — the SUMMARIZE/`DESCRIBE`-style one-shot audit a
  * curation pipeline runs before and after every transform: per column,
  * row/null/distinct counts and value range. The kind of operator the
  * reference exposes implicitly through its export stats endpoints;
  * here it is a first-class relational pass.
  */
object Profile {

  /** One row per profiled column: (column, n_rows, n_null, n_distinct,
    * min_32, max_32) — min/max rendered as strings truncated to 32
    * chars so heterogeneous column types share one schema.
    *
    * Plan shape: ONE aggregation over one scan. With `exact = true`
    * the multi-column `countDistinct` compiles to Catalyst's Expand
    * strategy — the scan's rows are replicated once per distinct-
    * counted column before the exchange (a deliberate k× map-side
    * cost, documented here because at 100 TB it is the dominant term;
    * partial aggregation still collapses each replica to its distinct
    * values per partition before anything moves). With `exact = false`
    * (the 100 TB default) `approx_count_distinct` (HyperLogLog++,
    * rsd 1.6%) keeps the pass expand-free: every statistic partial-
    * aggregates in a single map-side pass and ONE 1-row exchange.
    * The unpivot to per-column rows happens on the 1-row aggregate —
    * free. */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def nd(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c)
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        nd(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").cast("long").as("n_distinct"),
        substring(col(s"__mn_$c"), 1, 32).as("min_32"),
        substring(col(s"__mx_$c"), 1, 32).as("max_32"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
