package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.Tables
import graft.core._
import graft.lens.{CommutativeMapFn, Lens, MapContext, MapFn}
import graft.store.{DataPath, Store, WriteMode}

/** Incremental lens maintenance under the hard signal (SURVEY §2.6 —
  * version-gated recompute + compute-cache reuse + deletion drop;
  * reference: library/models/lens.js:134-190 inputVersions gate,
  * :163 compute-cache entries).
  *
  * Shape: commit 1 ingests every document and a FULL build maps them
  * all; commit 2 touches three disjoint subsets — updates (text
  * append, record hash changes → fresh), deletions (tombstones →
  * cached contributions must drop), and brand-new records — and the
  * INCREMENTAL build may invoke the map only on updated+new paths.
  * The emitted frame proves both halves at once:
  *  - token/n_docs/doc_ids: the final inverted index — must equal a
  *    from-scratch rebuild over the post-commit-2 corpus (the oracle
  *    computes exactly that relationally);
  *  - version: the hash-gated output version — 1 where the token's
  *    posting set survived commit 2 unchanged (cache carried it), 2
  *    where it changed (oracle: compare build-1 vs build-2 posting
  *    strings);
  *  - n_map_calls: actual executor-side map invocations during the
  *    incremental build, via a LongAccumulator — equals
  *    |updated ∩ alive| + |new| exactly when the engine maps ONLY
  *    changed paths (a full re-map would show the whole corpus count
  *    and break the hash). Accumulators are at-least-once under task
  *    retries; the driver contract runs local-mode where no retries
  *    occur, and on a real cluster the count is diagnostic, not part
  *    of the data path.
  */
object IncrementalLensQuery {

  /** q9's oracle-matched tokenizer (lowercase, split outside [a-z0-9])
    * with an invocation counter — the counter is the proof that the
    * freshness gate, not the tokenizer, decides what re-maps. */
  final class CountingTokenFn(acc: LongAccumulator)
      extends MapFn with CommutativeMapFn {
    def map(ctx: MapContext): Unit = {
      acc.add(1L)
      val text = ctx.data match {
        case o: PoObj => o.fields.get("text") match {
          case Some(PoStr(t)) => t
          case _ => return
        }
        case _ => return
      }
      val docId = PoInt(ctx.path.recordID.toLong)
      text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").iterator
        .filter(_.nonEmpty).toArray.distinct
        .foreach(tok => ctx.output(tok, PoSet(docId)))
    }
  }

  /** q142's map: token-counts every doc, console-logs the count for
    * doc_id % 17 == 3, throws (AFTER emitting — the outputs-kept
    * contract) for doc_id % 31 == 5. Deterministic, so the captured
    * log/error rows are oracle-derivable from the corpus. */
  final class LoggingTokenFn extends MapFn {
    def map(ctx: MapContext): Unit = {
      val id = ctx.path.recordID.toLong
      val text = ctx.data match {
        case o: PoObj => o.fields.get("text") match {
          case Some(PoStr(t)) => t
          case _ => return
        }
        case _ => return
      }
      val n = text.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").count(_.nonEmpty)
      if (id % 17 == 3) ctx.log("len", n.toString)
      ctx.output(s"n$n", PoSet(PoInt(id)))
      if (id % 31 == 5) throw new IllegalStateException(s"bad doc $id")
    }
  }

  /** Per-input log/error capture under the hard signal (§2.4/S13
    * surface; reference: javascript-lens-worker.js:66-73 console
    * capture, :27-49 error capture, served per input by lens.js:87-92
    * — logs are DATA, queryable after the build). One full build of a
    * [[LoggingTokenFn]] lens, then `Lens.logsOf` — the engine serves
    * log rows from the compute-cache spool, so this also pins that the
    * spool retains exactly the current inputs' log/err rows. The
    * oracle re-derives every captured row (including the token count
    * inside the log message and the error message text) from the
    * documents table; a doc that hits BOTH gates (%17==3 and %31==5)
    * must yield both rows — logs emitted before a throw survive. */
  def lensLogs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val root = graft.core.Fs.pidScratch(s"graft-logq-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-log")
    if (ds.exists) ds.drop()
    ds.create()
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    ds.writeEntriesDF(docs.as[(Long, String)].map { case (id, t) =>
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone"), WriteMode.Overwrite)

    val lens = new Lens(store, "bench", "log-lens",
      Seq(DataPath("datasets", "bench", "docs-log")), new LoggingTokenFn)
    if (lens.output.exists) lens.output.drop()
    lens.create()
    lens.build()

    Lens.logsOf(store, "bench", "log-lens")
      .select(
        substring_index(col("path"), "/", -1).as("id"),
        col("kind"),
        when(col("kind") === "log", concat_ws(" ", col("logArgs")))
          .otherwise(lit(null)).as("log_msg"),
        col("errType").as("err_type"),
        col("errMsg").as("err_msg"))
      .orderBy(col("id").cast("long"), col("kind"))
  }

  /** Phase timer for the q44 cost-attribution audits (VERDICT r11 #3):
    * `SPARK_GRAFT_PHASELOG=1` prints one stderr line per phase of the
    * fixture+build pipeline — the per-stage complement of BenchOne's
    * JOBLOG. Off (zero-cost) unless the env var is set. */
  private val phaselog = sys.env.get("SPARK_GRAFT_PHASELOG").contains("1")
  private def phase[A](name: String)(body: => A): A =
    if (!phaselog) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"PHASELOG ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $name")
      r
    }

  def run(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // scratch store keyed by (scale factor, pid) and REUSED across runs
    // in one process (a fresh dir per invocation would leak a full
    // corpus copy every bench iteration). The pid suffix keeps
    // concurrent processes off each other's store — commits would
    // serialize safely (Store.withLock holds an OS file lock) but this
    // query asserts exact map-invocation counts, which a concurrent
    // rebuilder would perturb; dead processes' dirs are reaped here,
    // the ivf-centroids pattern. Both collections are dropped up front:
    // dropping the lens output removes its compute cache with it, so
    // build 1 below always maps everything and the invocation count
    // never sees state from a previous run.
    val sfName = java.nio.file.Paths.get(sfDir).getFileName.toString
    val root = graft.core.Fs.pidScratch(s"graft-incq-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "documents-inc")
    if (ds.exists) ds.drop()
    ds.create()

    // The documents table is one parquet file → one partition; without
    // a spread, the CBOR encode here AND the store's hash/link prep run
    // single-threaded. Repartitioning the ingest frame is the right
    // call at any scale (bulk ingest from few files is exactly when a
    // loader should rebalance before the expensive per-row work).
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    def enc(id: Long, text: String): (String, Array[Byte], Boolean) =
      (id.toString, Cbor.encode(PoObj("text" -> PoStr(text))), false)

    // ---- commit 1: the whole corpus
    phase("commit1_overwrite") {
      ds.writeEntriesDF(docs.as[(Long, String)]
        .map { case (id, t) => enc(id, t) }.toDF("id", "value", "tombstone"),
        WriteMode.Overwrite)
    }

    val acc = spark.sparkContext.longAccumulator("graft.q44.mapCalls")
    val lens = new Lens(store, "bench", "token-index-inc",
      Seq(DataPath("datasets", "bench", "documents-inc")),
      new CountingTokenFn(acc))
    if (lens.output.exists) lens.output.drop() // removes cache + logs too
    lens.create()
    phase("build1_full") {
      lens.build() // full: empty cache maps everything → output version 1
    }

    // ---- commit 2 (merge): disjoint touched subsets
    //   deleted:  doc_id % 13 == 2            (tombstones)
    //   updated:  doc_id % 7 == 0, not deleted (text append → new hash)
    //   new:      1000001..1000005
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
    phase("commit2_merge") {
      ds.writeEntriesDF(updates.unionByName(deletes).unionByName(news),
        WriteMode.Merge)
    }

    // ---- incremental build: only updated+new paths may re-map
    acc.reset()
    phase("build2_incremental") {
      lens.build()
    }
    val nMapCalls = acc.value

    lens.output.records.map { r =>
      val ids = Cbor.decode(r.value).asInstanceOf[PoSet].items
        .collect { case PoInt(i) => i }.sorted
      (r.id, ids.length.toLong, ids.mkString(","), r.version)
    }.toDF("token", "n_docs", "doc_ids", "version")
      .withColumn("n_map_calls", lit(nMapCalls))
      .orderBy("token")
  }
}
