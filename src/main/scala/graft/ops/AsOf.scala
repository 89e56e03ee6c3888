package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, attach the single latest right row
  * with `right.ts <= left.ts` in the same key group (the time-series
  * alignment primitive: trade→quote, purchase→click attribution,
  * event→latest-snapshot).
  *
  * Spark has no native ASOF JOIN; the usual naive encodings are a range
  * join (quadratic per key) or a per-left-row subquery. This is the
  * scalable composition: UNION both sides tagged, ONE shuffle on the
  * key, one ordered window pass per partition carrying the last-seen
  * right payload forward. Cost is sort-shuffle O(|L|+|R|) — the same
  * plan a hand-written merge-as-of would need, expressed declaratively
  * so Catalyst/AQE keep owning partitioning and spill.
  *
  * Determinism: right rows tying on (ts) resolve to the LARGEST
  * `tieCol`; a right row at exactly left.ts IS visible (<=, the
  * standard as-of convention) because right sorts before left at equal
  * ts via the tag.
  *
  * 100 TB note: the shuffle key is the join key (e.g. user_id) — high
  * cardinality, fully parallel. A single pathological hot key serializes
  * its own group only; salting cannot apply (the carry-forward is order-
  * dependent within the group) — shard such keys upstream if needed.
  */
object AsOf {

  /** @param rightPayload right columns carried onto matches, emitted as
    *                     `asof_<name>` (null when no right row precedes)
    * @param tieCol       right column breaking equal-ts ties (max wins) */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String], tieCol: String): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val payloadStruct = struct(rightPayload.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    // the tie column keeps its own type: casting (e.g. to long) would
    // throw under ANSI for string ids and truncate doubles into
    // nondeterministic ties (round-3 self-review finding)
    val tieType = right.select(col(tieCol)).schema.head.dataType
    val keyCols = keys.map(col)

    val taggedRight = right.select(
      keyCols ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__tag"),
        col(tieCol).as("__tie"),
        payloadStruct.as("__r"),
        lit(null).cast(left.schema).as("__l")): _*)
    val taggedLeft = left.select(
      keyCols ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(payloadType).as("__r"),
        struct(left.columns.map(col): _*).as("__l")): _*)

    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))

    val leftCols = left.columns.map(c => col("__l").getField(c).as(c))
    val asofCols = rightPayload.map(c => col("__asof").getField(c).as(s"asof_$c"))
    carried.filter(col("__tag") === 1).select(leftCols ++ asofCols: _*)
  }
}
