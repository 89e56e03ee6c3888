package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching. At 100 TB "how many distinct X"
  * is a planning input (shuffle sizing, dedup forecasting, vocabulary
  * budgets) long before it is a report number, and the exact answer
  * costs a corpus-wide distinct shuffle. The KMV (k-minimum-values)
  * estimator gets within ~1/sqrt(k-2) relative error for the price of
  * a per-partition top-k: `orderBy(hash).limit(k)` compiles to
  * TakeOrderedAndProject — every partition keeps its k smallest
  * hashes in a heap and only k rows per partition ever move. NO
  * shuffle of the data, no hash table proportional to the
  * cardinality (the HyperLogLog alternative, approx_count_distinct,
  * is engine-specific in its register layout and therefore can't be
  * oracle-checked across engines; KMV's k-th order statistic is
  * exactly reproducible anywhere that can hash and sort).
  *
  * Estimator (Bar-Yossef et al. 2002): hash each key uniformly into
  * [0, 2^60) (md5 hex prefix — the repo's engine-portable 60-bit
  * integer hash, same construction as the winnowing oracle hash),
  * keep the k smallest DISTINCT hash values; if the k-th smallest is
  * `h_k`, the distinct count is ≈ (k-1) * 2^60 / h_k. All arithmetic
  * to the estimate is IEEE double ((k-1) and 2^60 are exactly
  * representable; one multiply, one divide, one floor) so an oracle
  * reproduces it bit-for-bit.
  *
  * Output: ONE row (k, kth_hash, est_distinct). Pass
  * `withExact = true` in tests/small runs to append the true
  * distinct count for error inspection — that branch DOES pay the
  * exact-distinct aggregation and is not the 100 TB path.
  */
object Sketch {

  /** 60-bit portable uniform hash of a column (md5 hex prefix). */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 15), 16, 10).cast("long")

  def kmvDistinct(df: DataFrame, key: Column, k: Int = 256,
                  withExact: Boolean = false): DataFrame = {
    require(k >= 16, "KMV needs k >= 16 for a usable error bound")
    val mins = df.select(hash60(key).as("h"))
      .distinct()                       // KMV is over distinct hash values
      .orderBy(col("h"))
      .limit(k)                         // TakeOrderedAndProject: k rows/partition max
    val est = mins
      .agg(count(lit(1)).cast("long").as("k_used"), max(col("h")).as("kth_hash"))
      .select(col("k_used"), col("kth_hash"),
        // fewer than k distinct hashes survive ⇒ the sketch SAW every
        // distinct value and the count is exact, not estimated
        when(col("k_used") < lit(k.toLong), col("k_used"))
          .otherwise(floor((col("k_used").cast("double") - lit(1.0))
            * lit(1.152921504606846976e18)
            / col("kth_hash").cast("double")).cast("long"))
          .as("est_distinct"))
    if (!withExact) est
    else {
      val exact = df.select(key.as("x")).agg(countDistinct(col("x")).as("n_exact"))
      est.crossJoin(broadcast(exact))
    }
  }
}
