package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SNAPSHOT DIFF (CDC between corpus versions) — classify every key of
  * two snapshots as added / removed / changed / (optionally) unchanged.
  * The recrawl bookkeeping step every periodically-rebuilt corpus
  * needs: what entered, what left, what mutated since the last build —
  * the batch complement of the change feed
  * (reference: the version arithmetic of
  * library/models/base-data-model.js:190-220, which hash-compares each
  * incoming record against `meta.records[id].hash` and deletes entries
  * missing from the new archive; re-expressed as one relational pass).
  *
  * Scale shape: the content hash is computed BEFORE the join, so the
  * only thing that crosses the shuffle is (key, hash) — two narrow
  * columns per side, never the payload. One full-outer shuffle join on
  * the key, then the classification is a codegen'd projection. At
  * 100 TB the cost is two corpus scans + one narrow-row exchange;
  * consumers that need changed PAYLOADS re-join the emitted key set
  * against the current snapshot (a semi-join on the small diff side),
  * instead of dragging payloads through the diff itself.
  *
  * `contentHash` is caller-supplied: pass `xxhash64(cols)` in
  * production (8-byte keys through the shuffle); the oracle-pinned
  * query passes `md5(concat_ws(...))` so DuckDB replicates it
  * bit-for-bit. Classification depends only on hash EQUALITY, so any
  * collision-resistant hash yields the same diff.
  */
object Diff {
  def snapshotDiff(current: DataFrame, prior: DataFrame, keyCol: String,
                   contentHash: Column,
                   includeUnchanged: Boolean = false): DataFrame = {
    val cur = current.select(col(keyCol).cast("long").as("k"),
      contentHash.cast("string").as("cur_hash"))
    val pri = prior.select(col(keyCol).cast("long").as("k"),
      contentHash.cast("string").as("prior_hash"))
    val joined = cur.join(pri, Seq("k"), "full_outer")
      .withColumn("status",
        when(col("prior_hash").isNull, lit("added"))
          .when(col("cur_hash").isNull, lit("removed"))
          .when(col("cur_hash") =!= col("prior_hash"), lit("changed"))
          .otherwise(lit("unchanged")))
    val filtered =
      if (includeUnchanged) joined
      else joined.filter(col("status") =!= "unchanged")
    filtered.select(col("k").as(keyCol), col("status"),
      col("cur_hash"), col("prior_hash"))
  }
}
