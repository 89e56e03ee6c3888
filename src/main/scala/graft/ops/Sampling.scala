package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Random sampling (`df.sample`) is seed- and partitioning-dependent —
  * rerunning after a repartition yields a different corpus, which
  * silently invalidates train/eval splits. Everything here keys on a
  * content-independent hash of the row's ID instead: the same row lands
  * in the same split on every run, on any cluster layout, and the split
  * is reproducible from SQL (the hash is the portable sha256-prefix also
  * used by the simhash oracle — 60 bits of the hex digest, exact in
  * BIGINT and DuckDB-replicable).
  *
  * Scale: pure codegen'd projections — no shuffle for `hashBucket` /
  * `deterministicSample`; `stratifiedSample` adds one window shuffle on
  * the stratum key (parallel across strata).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the sha256 of the id. A null id
    * hashes as the empty string — deterministic and non-null, so splits
    * stay disjoint-and-covering even for null-id rows (a null bucket
    * would drop the row from BOTH sides of a split). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(sha2(coalesce(id.cast("string"), lit("")), 256), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Keep rows whose hash bucket falls below `pct` (of 100): a stable
    * pct% sample / split assignment. */
  def deterministicSample(df: DataFrame, idCol: String, pct: Int,
                          buckets: Int = 100): DataFrame =
    df.filter(hashBucket(col(idCol), buckets) < pct)

  /** At most `perStratum` rows per stratum, chosen by hash order (with
    * the id as tie-break) — a stable stratified sample whose membership
    * survives reruns and repartitions. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       perStratum: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol), 1 << 30), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }

  /** Deterministic train/val/test split assignment: every row gets the
    * label of the bucket range its id-hash falls in — `splits` is
    * (label, weight) with weights summing to `buckets` (e.g.
    * ("train",90),("val",5),("test",5)). Disjoint and covering by
    * construction (null ids hash too — see [[hashBucket]]), stable
    * across reruns/repartitions/engines, and membership of a row never
    * changes when OTHER rows are added — the property a modulo-on-
    * row_number split lacks and the reason eval sets stay closed as
    * the corpus grows. Pure codegen'd projection: zero shuffle. */
  def splitAssign(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
                  buckets: Int = 100): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "splitAssign needs positive split weights")
    require(splits.map(_._2).sum == buckets,
      s"split weights must sum to buckets=$buckets: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"split labels must be unique: $splits")
    val b = hashBucket(col(idCol), buckets)
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cuts).init
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), cut), acc) => when(b < cut, lit(name)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** Deterministic global training-order shuffle: every row gets a
    * (shard, pos) address — shard by id-hash, position within the shard
    * by (finer id-hash, id). Training loaders read shards in parallel
    * and rows within a shard in `pos` order; because the address is a
    * pure function of the id, the order is identical on every run, any
    * cluster layout, and any engine (unlike `df.orderBy(rand(seed))`,
    * whose sample-and-range partitioning is layout-dependent).
    *
    * Scale: the ONE window shuffle partitions by shard — parallelism =
    * `shards`, so size shards to the cluster (thousands), never 1: a
    * global `row_number` with no partition would be one reducer. */
  def corpusShuffle(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val w = Window.partitionBy(col("shard"))
      .orderBy(hashBucket(col(idCol), 1 << 30), col(idCol))
    df.withColumn("shard", hashBucket(col(idCol), shards))
      .withColumn("pos", row_number().over(w).cast("long"))
  }
}
