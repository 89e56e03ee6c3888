package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DATA-LAYOUT keys — Z-order (Morton) interleaving for multi-column
  * clustering. THE 100 TB table-layout tool: sorting/range-partitioning
  * a corpus by `zOrderKey(dims)` before the parquet write makes file
  * min/max ranges tight in EVERY interleaved dimension at once, so
  * later scans filtering on any of them prune files (the data-skipping
  * property a single-column sort only gives to its leading column).
  * Z-ordering is pure layout: it changes which rows share a file,
  * never query results — which is why the operator is a key
  * EXPRESSION (compose with `repartitionByRange` + `sortWithinPartitions`
  * and any writer) rather than a bespoke writer.
  *
  * Implementation: bit interleaving as a sum of codegen'd
  * shift/mask/shift terms over pre-quantized integer dims — bit j of
  * dim i lands at position j·n + i; positions are disjoint so `+` is
  * `|`. No UDF, whole-stage codegen keeps it inside the scan stage.
  * `bits · cols.size` must stay ≤ 63 (sign-safe in a BIGINT — also
  * what keeps the key comparable in every engine that reads the
  * layout metadata).
  */
object Layout {
  /** Morton key over `cols`, each already quantized to [0, 2^bits). */
  def zOrderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zOrderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*dims must be in [1, 63], got $bits*${cols.size}")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ + _)
  }

  /** Quantize a numeric column into [0, 2^bits) given a fixed domain —
    * the caller supplies (lo, hi) from domain knowledge or a stats
    * pass; clamping makes out-of-domain stragglers land on the edge
    * buckets instead of corrupting the interleave. */
  def quantize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, "quantize needs hi > lo")
    val buckets = 1L << bits
    val scaled = ((c.cast("double") - lit(lo)) / lit(hi - lo)) * lit(buckets.toDouble)
    least(greatest(floor(scaled).cast("long"), lit(0L)), lit(buckets - 1L))
  }

  /** The DuckDB twin of [[zOrderKey]] for oracle queries: the same
    * term list as SQL text. */
  def zOrderSql(cols: Seq[String], bits: Int): String = {
    val n = cols.size
    (for {
      (c, i) <- cols.zipWithIndex
      j <- 0 until bits
    } yield s"((($c >> $j) & 1) << ${j * n + i})").mkString(" + ")
  }

  /** 2-D Hilbert key over pre-quantized dims — [[zOrderKey]]'s
    * better-locality sibling: consecutive Hilbert indices are always
    * 4-adjacent cells (Z-order takes a long diagonal jump every 2^k
    * rows), so equal-width key ranges have smaller x/y bounding boxes
    * → tighter file min/max → fewer files read per 2-D range scan.
    * The per-level rotation makes it a native expression
    * ([[graft.expressions.HilbertIndexExpr]], codegen'd static call);
    * the curve walk is pure integer, and [[hilbertSql]] emits the
    * bit-identical unrolled-CTE twin for oracle queries. Same
    * pure-layout contract as [[zOrderKey]]: compose with
    * `repartitionByRange` + `sortWithinPartitions` + any writer. */
  def hilbertKey(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(graft.expressions.HilbertIndexExpr(
      GraftSqlShim.expression(x.cast("long")),
      GraftSqlShim.expression(y.cast("long")), bits))
  }

  /** The DuckDB twin of [[hilbertKey]]: unrolled per-level CTE chain
    * (the [[graft.ops.Importance]] fix_log2 oracle discipline — state
    * per level, constants inlined). Expects `base` to expose integer
    * columns x, y in [0, 2^bits); emits CTEs `h0..h{bits}` (each
    * carrying the in-flight state (x, y, hx, hy, hd)) plus a final CTE
    * `h` that projects the result as (x, y, hkey). Splice as:
    * `WITH base AS (...), ${hilbertSql("base", b)} SELECT ... FROM h`
    * — the q108 oracle does exactly this. */
  def hilbertSql(base: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val init = s"h0 AS (SELECT x, y, x AS hx, y AS hy, 0::BIGINT AS hd FROM $base)"
    val steps = (1 to bits).map { k =>
      val s = 1L << (bits - k)
      val sm1 = s - 1
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      s"""h$k AS (
         |  SELECT x, y,
         |    CASE WHEN (hy & $s) = 0 THEN
         |      (CASE WHEN (hx & $s) > 0 THEN $sm1 - hy ELSE hy END)
         |      ELSE hx END AS hx,
         |    CASE WHEN (hy & $s) = 0 THEN
         |      (CASE WHEN (hx & $s) > 0 THEN $sm1 - hx ELSE hx END)
         |      ELSE hy END AS hy,
         |    hd + ${s * s} * xor(3 * $rx, $ry) AS hd
         |  FROM h${k - 1})""".stripMargin
    }
    (init +: steps).mkString(",\n") +
      s",\nh AS (SELECT x, y, hd AS hkey FROM h$bits)"
  }

  /** Hash-bucketed (+ optionally bucket-sorted) table layout — the
    * OTHER half of the 100 TB layout story next to [[zOrderKey]]:
    * Z-order buys scan pruning, bucketing buys SHUFFLE-FREE joins and
    * aggregations. Two tables bucketed on the same key with the same
    * bucket count join without either side exchanging — at 100 TB
    * that is the difference between "the fact table crosses the wire
    * every nightly join" and "it never moves again after ingest";
    * same for repeated `groupBy(key)` (bucketing IS a persisted
    * pre-shuffle). The price is paid once at write time: the writer
    * hash-partitions rows into `buckets` files per partition-dir and
    * records the layout in the catalog, which is what lets the
    * planner elide the Exchange (and the Sort too, with `sortCols`
    * and one file per bucket).
    *
    * Spark's bucketed-scan join elision needs EQUAL bucket counts on
    * both sides (or set `spark.sql.bucketing.coalesceBucketsInJoin
    * .enabled` for multiples) — size `buckets` to the cluster once
    * and reuse it corpus-wide. LayoutBucketSpec pins the elision on
    * the plan text.
    *
    * Returns the re-read catalog table (the thing later queries should
    * reference — the bucketing metadata lives on the TABLE, reading
    * the parquet dir directly would forget it). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
    spark.table(table)
  }
}
