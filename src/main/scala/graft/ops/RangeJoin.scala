package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range join — pair each left row with the right rows
  * whose timestamp falls in `(leftTs, leftTs + windowUs]` within the
  * same key group. The "events that follow within an hour" primitive.
  *
  * Spark plans a key-equi + range-theta join as a sort-merge join on
  * the key with the range as a post-join filter — per-key CARTESIAN
  * work, quadratic on hot keys. Binning bounds it: both sides get a
  * time bin of width `windowUs`; a half-open window of that length
  * spans at most two consecutive bins, so each left row probes exactly
  * 2 (key, bin) buckets and the exact range predicate filters inside
  * the bucket. Shuffle volume O(2·L + R), per-bucket work proportional
  * to actual temporal density — the plan survives a hot key with a
  * million rows as long as they spread over time, which is precisely
  * the case the naive plan dies on.
  *
  * Bins use integral `div` (epoch micros overflow a double's exact
  * integer range is fine at 2^53, but staying integral keeps boundary
  * semantics exact — the Tables.load lesson).
  */
object RangeJoin {

  /** Matched pairs: left.* plus `payload` columns from right (prefixed
    * `r_`). Strict lower bound, inclusive upper: rightTs ∈ (leftTs,
    * leftTs + windowUs]. */
  def followingPairs(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, windowUs: Long,
                     payload: Seq[String]): DataFrame = {
    require(windowUs > 0, "windowUs must be positive")
    val keyCols = keys.map(col)
    val r = right.select(
      keyCols ++ Seq(col(rightTs).as("__rts"), expr(s"$rightTs div $windowUs").as("__bin")) ++
        payload.map(c => col(c).as(s"r_$c")): _*)
    // a (t, t+W] window touches bin(t) and bin(t)+1 only
    val l = left
      .withColumn("__bin", explode(array(
        expr(s"$leftTs div $windowUs"), expr(s"$leftTs div $windowUs") + 1)))
    l.join(r, keys :+ "__bin")
      .filter(col("__rts") > col(leftTs) && col("__rts") <= col(leftTs) + windowUs)
      .drop("__bin", "__rts")
  }
}
