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

  /** Apply a CDC change set to a snapshot — [[snapshotDiff]]'s inverse
    * and the merge step of every periodically-rebuilt corpus: `changes`
    * carries (key, `opCol` ∈ upsert|delete, payload columns matching
    * the snapshot schema) and the result is the next snapshot version.
    *
    * With `seqCol` the change set is first COMPACTED to the
    * highest-seq change per key (the log-to-table collapse of a
    * multi-batch CDC stream; seq must totally order each key's
    * changes — ties tie-break on op so the result is still
    * deterministic, but a real stream should carry a strict sequence).
    * Without it, keys must be unique in `changes`.
    *
    * Scale shape: compaction is one WindowGroupLimit-compiled window
    * keyed by the change key (change-set-sized, not corpus-sized); the
    * apply is ONE left-anti join of the snapshot against the touched
    * keys (narrow key column — AQE broadcasts it when the change set
    * is small, the overwhelmingly common case) plus a union with the
    * upsert payloads. The snapshot payload never shuffles. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String = "op",
                   seqCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val compacted = seqCol match {
      case Some(sc) =>
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col(sc).desc, col(opCol).desc)
        changes.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", sc)
      case None => changes
    }
    val touched = compacted.select(col(keyCol)).distinct()
    snapshot.join(touched, Seq(keyCol), "left_anti")
      .unionByName(compacted.filter(col(opCol) === "upsert").drop(opCol))
  }
}
