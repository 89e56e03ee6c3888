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
}
