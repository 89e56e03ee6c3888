package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.Tables
import graft.core.{Cbor, PoObj, PoSet, PoStr}
import graft.lens.{CommutativeMapFn, Lens, MapContext, MapFn}
import graft.store.{DataPath, Store, WriteMode}

/** Lens-on-lens CASCADE under the hard signal (SURVEY §2.6 step 8;
  * reference: library/models/lens.js:351-367 cascading rebuilds,
  * lens.js:66-81 the reverse-edge map — a lens's input can be another
  * lens, so a dataset commit propagates through the whole view DAG).
  *
  * Shape: dataset → lens A (token index, q44's tokenizer) → lens B
  * (first-char bucket → the SET of tokens in that bucket). Commit 1
  * ingests the corpus and both lenses build FULL; commit 2 is q44's
  * exact touched-subset merge (updates %7, tombstones %13==2, five new
  * docs) and both lenses rebuild INCREMENTALLY in dependency order.
  * The emitted frame pins the cascade at every level at once:
  *  - bucket/n_tokens/tokens: lens B's final state — must equal a
  *    from-scratch rebuild over the post-commit-2 corpus (the oracle
  *    computes exactly that relationally);
  *  - version: B's hash-gated output version — 1 where the bucket's
  *    token set survived commit 2 unchanged (B's cache carried it),
  *    2 where it changed (oracle: compare the two corpora's bucketed
  *    token sets);
  *  - n_map_calls_a: A's incremental map invocations = |updated ∩
  *    alive| + |new| documents (the q44 gate proof);
  *  - n_map_calls_b: B's incremental map invocations = the number of
  *    TOKENS whose posting set changed or that are brand-new — i.e.
  *    exactly the records lens A's hash gate version-bumped. A full
  *    re-map at either level puts the corpus/vocabulary size there and
  *    breaks the hash; so does an over-eager B rebuild after a no-op A
  *    commit.
  * Deletion flows through BOTH levels: a doc tombstone drops postings
  * in A; a token that loses its last posting vanishes from A, and B's
  * freshness gate must then drop its cached bucket contribution — a
  * resurrection shows up as a stale token in `tokens`.
  *
  * Accumulator caveat (same as q44): at-least-once under task retries;
  * the driver contract runs local-mode where no retries occur. */
object CascadeLensQuery {

  /** Lens B's map: input records are lens A's (token → posting set);
    * emit (first char of token → {token}). Set-union is commutative →
    * the partial-aggregating reduce path. */
  final class BucketFn(acc: LongAccumulator)
      extends MapFn with CommutativeMapFn {
    def map(ctx: MapContext): Unit = {
      acc.add(1L)
      val token = ctx.path.recordID
      ctx.output(token.substring(0, 1), PoSet(PoStr(token)))
    }
  }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // pid-scoped scratch, reaped + reused (the q44/q136 discipline);
    // everything is dropped up front so build 1 always starts cold and
    // the invocation counts never see a previous run's caches
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val root = graft.core.Fs.pidScratch(s"graft-cascq-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-casc")
    if (ds.exists) ds.drop()
    ds.create()

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    def enc(id: Long, text: String): (String, Array[Byte], Boolean) =
      (id.toString, Cbor.encode(PoObj("text" -> PoStr(text))), false)

    // ---- commit 1: the whole corpus
    ds.writeEntriesDF(docs.as[(Long, String)]
      .map { case (id, t) => enc(id, t) }.toDF("id", "value", "tombstone"),
      WriteMode.Overwrite)

    val accA = spark.sparkContext.longAccumulator("graft.q138.mapCallsA")
    val accB = spark.sparkContext.longAccumulator("graft.q138.mapCallsB")
    val lensA = new Lens(store, "bench", "tok-casc",
      Seq(DataPath("datasets", "bench", "docs-casc")),
      new IncrementalLensQuery.CountingTokenFn(accA))
    if (lensA.output.exists) lensA.output.drop()
    lensA.create()
    val lensB = new Lens(store, "bench", "buck-casc",
      Seq(DataPath("lenses", "bench", "tok-casc")),
      new BucketFn(accB))
    if (lensB.output.exists) lensB.output.drop()
    lensB.create()

    // full builds, dependency order (the LensHub cascade runs exactly
    // this ordering off the change feed; the fixture calls it directly
    // so the accumulators attribute cleanly to one build each)
    lensA.build()
    lensB.build()

    // ---- commit 2 (merge): q44's exact touched subsets
    val updates = docs
      .filter(col("doc_id") % 7 === 0 && col("doc_id") % 13 =!= 2)
      .as[(Long, String)]
      .map { case (id, t) => enc(id, t + " graftupdate") }
      .toDF("id", "value", "tombstone")
    val deletes = docs.filter(col("doc_id") % 13 === 2)
      .select(col("doc_id").cast("string")).as[String]
      .map(id => (id, Array.empty[Byte], true))
      .toDF("id", "value", "tombstone")
    val news = spark.range(1, 6)
      .as[Long].map(i => enc(1000000L + i, s"brand new graft doc $i"))
      .toDF("id", "value", "tombstone")
    ds.writeEntriesDF(updates.unionByName(deletes).unionByName(news),
      WriteMode.Merge)

    // ---- incremental cascade: A then B, each counting its map calls
    accA.reset(); accB.reset()
    lensA.build()
    lensB.build()
    val (nA, nB) = (accA.value, accB.value)

    lensB.output.records.map { r =>
      val toks = Cbor.decode(r.value).asInstanceOf[PoSet].items
        .collect { case PoStr(t) => t }.sorted
      (r.id, toks.length.toLong, toks.mkString(","), r.version)
    }.toDF("bucket", "n_tokens", "tokens", "version")
      .withColumn("n_map_calls_a", lit(nA))
      .withColumn("n_map_calls_b", lit(nB))
      .orderBy(col("bucket"))
  }
}
