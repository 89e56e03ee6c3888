package graft.queries

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.core.{Cbor, NaturalOrder, PoArr, PoInt, PoObj, PoSet, PoStr}
import graft.store.{AttachmentStore, DataPath, Export, Import, ReadPath, Store, WriteMode}

/** Driver-verified queries over the store's commit/version machinery. */
object StoreQueries {

  /** Pid-scoped scratch root (the ivf-centroids / IncrementalLensQuery
    * hygiene) — the shared helper lives in [[graft.core.Fs.pidScratch]]. */
  private def pidScratch(prefix: String): String =
    graft.core.Fs.pidScratch(prefix)

  /** `?at=` incremental export (S9/F2, reference
    * export-controller.js:25-41): two real commits into a collection,
    * then an export where records older than `at` emit version stubs
    * with NULL data. The oracle re-derives the version arithmetic
    * relationally, so this checks hash-gated version assignment AND the
    * stub projection end-to-end through the engine.
    *
    * Commit 1 (overwrite): even doc_ids. Commit 2 (merge): odd doc_ids
    * (new → v2) plus doc_id%10==0 rewritten with changed text (hash
    * differs → v2); untouched evens stay v1.
    */
  def atExport(spark: SparkSession, sfDir: String, at: Long = 2,
               buckets: Option[Int] = None): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val tag = buckets.map(b => s"-b$b").getOrElse("")
    // pid-scoped (same hazard the pointLookup fix closed): concurrent
    // processes must not share a store root
    val root = pidScratch(s"graft-atq-$sfName$tag")
    val store = new Store(spark, root, buckets)
    val ds = store.dataset("bench", "docs-at")
    if (ds.exists) ds.drop()
    ds.create()

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")

    def entries(df: DataFrame, mod: Boolean): DataFrame =
      df.as[(Long, String)].map { case (id, text) =>
        val t = if (mod) s"MODIFIED: $text" else text
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone")

    ds.writeEntriesDF(entries(docs.filter(col("doc_id") % 2 === 0), mod = false),
      WriteMode.Overwrite)
    ds.writeEntriesDF(
      entries(docs.filter(col("doc_id") % 2 === 1), mod = false)
        .unionByName(entries(docs.filter(col("doc_id") % 10 === 0), mod = true)),
      WriteMode.Merge)

    // the export projection: version >= at ? data : stub (NULL data)
    ds.records.map { r =>
      val data =
        if (r.version >= at)
          Cbor.decode(r.value).asInstanceOf[PoObj].fields("text") match {
            case PoStr(t) => t
            case _ => null
          }
        else null
      (r.id, r.version, data)
    }.toDF("id", "version", "data")
      .orderBy(col("id").cast("long"))
  }

  /** Attachment GC under the hard signal (W8, reference
    * attachments.js:161-195): blobs keyed by sha256 of deterministic
    * content (`blob-<doc_id>` linked from records, `orphan-<doc_id>`
    * never linked), one real commit, then `gc()` — the distributed
    * anti-join of the executor-listed blob inventory against every
    * collection's exploded `links` column. Emits the POST-GC filesystem
    * inventory (one row per surviving blob hash) plus the deleted count,
    * so both over- and under-deletion break the hash. The oracle
    * re-derives the same sets relationally (DuckDB sha256 over the same
    * content strings).
    *
    * Blob ingest is the reference's driver-facing upload API (blobs
    * arrive one request at a time, attachment-controller.js) — the
    * fixture mirrors that; the operator under test (gc) is fully
    * distributed: executor-listed inventory, left-anti join, executor
    * deletes. */
  def attachmentGc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // fresh store per invocation: surviving state from a previous run
    // (or a concurrent process) must never leak into the inventory
    val root = java.nio.file.Files.createTempDirectory("graft-gcq").toString
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-gc").create()
    val ids = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct().as[Long].collect().sorted
    val linked = ids.filter(_ % 3 != 2)
    val orphans = ids.filter(_ % 5 == 0)
    val urls = linked.map { id =>
      val hex = store.attachments.write(s"blob-$id".getBytes)
      id -> store.attachments.url(hex, "text/plain")
    }.toMap
    orphans.foreach(id => store.attachments.write(s"orphan-$id".getBytes))
    val entries = spark.createDataset(linked.toSeq.map { id =>
      (id.toString, Cbor.encode(PoObj("file" -> PoStr(urls(id)))), false)
    }).toDF("id", "value", "tombstone")
    ds.writeEntriesDF(entries, WriteMode.Overwrite)
    val nDeleted = store.attachments.gc(graceMs = 0)
    store.attachments.inventoryDF
      .select(col("h").as("hash"))
      .withColumn("n_deleted", lit(nDeleted))
      .orderBy(col("hash"))
  }

  /** S3 point lookup under the hard signal (reference
    * base-data-model.js:105-118 read): the q15 two-commit fixture
    * (evens v1, odds new v2, %10 rewritten v2), then a per-id
    * `readRow` for every doc_id % `lookupMod` == 7 — each lookup is
    * the pushed-predicate scan path (`Store.readRow`: id equality
    * pushes to the parquet scan, PLANS pins `PushedFilters`). The
    * oracle re-derives the version arithmetic relationally for the
    * same id subset, so a lookup returning a stale version, wrong
    * value, or a miss breaks the hash.
    *
    * The lookup set goes through [[graft.store.Store]]'s batched
    * `readRows` — one bucket-pruned scan with the id IN-list pushed
    * into the touched `bucket=k` dirs (r18; the per-id `read()` path
    * still serves the one-HTTP-GET-per-key shape and stays covered by
    * StoreSpec/BucketedStoreSpec). */
  def pointLookup(spark: SparkSession, sfDir: String,
                  lookupMod: Long = 101): DataFrame = {
    import spark.implicits._
    // pid-scoped like the other store queries: a fixed path would let
    // two concurrent processes corrupt one store root, and dead
    // processes' dirs would never be reaped
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-ptq-$sfName")
    // BUCKETED store (VERDICT r16 Next #4): the per-id lookups below are
    // the whole point of this fixture, and on a bucketed store each one
    // prunes to its id's single `bucket=k` dir (1/16 of the snapshot's
    // files) instead of scanning the full snapshot — the shape a point
    // lookup must have at 100 TB. Values/versions are layout-independent,
    // so the oracle contract is unchanged.
    val store = new Store(spark, root, buckets = Some(16))
    val ds = store.dataset("bench", "docs-pt")
    if (ds.exists) ds.drop()
    ds.create()

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    def entries(df: DataFrame, mod: Boolean): DataFrame =
      df.as[(Long, String)].map { case (id, text) =>
        val t = if (mod) s"MODIFIED: $text" else text
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone")
    ds.writeEntriesDF(entries(docs.filter(col("doc_id") % 2 === 0), mod = false),
      WriteMode.Overwrite)
    ds.writeEntriesDF(
      entries(docs.filter(col("doc_id") % 2 === 1), mod = false)
        .unionByName(entries(docs.filter(col("doc_id") % 10 === 0), mod = true)),
      WriteMode.Merge)

    val ids = docs.select(col("doc_id"))
      .filter(col("doc_id") % lookupMod === 7)
      .as[Long].collect().sorted
    // ONE bucket-pruned multi-id scan for the whole batch (VERDICT r17
    // Next #4): the previous per-id readRow loop ran ~50 sequential
    // driver round-trips whose per-job overhead dominated the wall
    // (the single-id read() path still serves the per-request HTTP
    // GET shape). Values/versions per id are identical either way, so
    // the oracle contract is unchanged.
    val rows = ds.readRows(ids.map(_.toString)).map { r =>
      val text = Cbor.decode(r.value).asInstanceOf[PoObj].fields("text") match {
        case PoStr(t) => t
        case _ => null
      }
      (r.id, r.version, text)
    }
    spark.createDataset(rows.toSeq).toDF("id", "version", "data")
      .orderBy(col("id").cast("long"))
  }

  /** S6 meta-VFS catalog listing under the hard signal (reference
    * meta-vfs.js:8-55): a fresh store populated with one dataset per
    * distinct document lang and one lens per distinct source, then the
    * `/meta/system:system` virtual collection is read through the SAME
    * ReadPath machinery real collections use, its `authors`/`datasets`/
    * `lenses` CBOR values decoded and exploded to relational rows. The
    * oracle re-derives the expected catalog from the documents table,
    * so a listing that misses a collection, invents one, or mangles a
    * path breaks the hash.
    *
    * Catalog-sized by construction (rows = collections + authors), the
    * admin-contract envelope — the 100 TB corpus never enters. */
  def metaVfsListing(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // pid-scoped scratch, reaped + REUSED across runs in one process
    // (a fresh temp dir per invocation would leak one per bench rep);
    // keyed by sf so another scale's catalog never leaks into this
    // listing; collection creation below is idempotent on reuse
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-mvq-$sfName")
    val store = new Store(spark, root)
    val docs = Tables.load(spark, sfDir, "documents")
    val langs = docs.select(col("lang")).distinct().as[String].collect().sorted
    val srcs = docs.select(col("source")).distinct().as[String].collect().sorted
    langs.foreach { l =>
      val c = store.dataset("bench", s"docs-$l"); if (!c.exists) c.create()
    }
    srcs.foreach { s =>
      val c = store.lens("bench", s"lens-$s"); if (!c.exists) c.create()
    }

    val meta = ReadPath.read(store, DataPath("meta", "system", "system"))
      .select(col("id"), col("value")).collect()
      .map(r => r.getString(0) -> Cbor.decode(r.getAs[Array[Byte]]("value")))
      .toMap
    def listingRows(kind: String): Seq[(String, String, String)] =
      meta(kind).asInstanceOf[PoArr].items.map { v =>
        val o = v.asInstanceOf[PoObj].fields
        def s(k: String): String = o(k).asInstanceOf[PoStr].s
        (kind, s("author"), s("name"))
      }
    val authorRows = meta("authors").asInstanceOf[PoArr].items
      .map(a => ("authors", a.asInstanceOf[PoStr].s, null: String))
    spark.createDataset(
        authorRows ++ listingRows("datasets") ++ listingRows("lenses"))
      .toDF("kind", "author", "name")
      .orderBy(col("kind"), col("author"), col("name"))
  }

  /** W9 cid:→hash:// rewrite under the hard signal (reference
    * record-structure.js:44-72 resolveContentIDs): every doc_id % 7 == 0
    * uploads a deterministic blob (`att-<doc_id>`), its record value
    * references it as `cid:file-<doc_id>`, and ingest resolves the cid
    * through the uploaded-files map into the canonical
    * `hash://sha256/<hex>?type=...` URL — executor-side over the entry
    * frame (the map is small by the upload-batch contract and travels
    * in the task closure). The committed records are then read back and
    * the resolved URL extracted. The oracle recomputes the same sha256
    * over the same content (the q35 discipline), so a wrong hash, a
    * missed rewrite, or a mangled mime encoding breaks the driver hash. */
  def cidRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // pid-scoped scratch, reaped + reused (see metaVfsListing): the
    // blobs are sha-keyed and deterministic, so re-running writes the
    // SAME files — no growth across bench reps
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-cidq-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-cid")
    if (ds.exists) ds.drop()
    ds.create()
    val ids = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long")).distinct()
      .filter(col("doc_id") % 7 === 0).as[Long].collect().sorted
    val files: Map[String, (String, String)] = ids.map { id =>
      s"file-$id" -> (store.attachments.write(s"att-$id".getBytes), "text/plain")
    }.toMap
    val entries = spark.createDataset(ids.toSeq).toDF("doc_id")
      .as[Long].map { id =>
        val raw = PoObj(
          "file" -> PoStr(s"cid:file-$id"),
          "note" -> PoStr(s"doc $id"))
        (id.toString,
          Cbor.encode(AttachmentStore.resolveContentIDs(raw, files)), false)
      }.toDF("id", "value", "tombstone")
    ds.writeEntriesDF(entries, WriteMode.Overwrite)
    ds.records.map { r =>
      val url = Cbor.decode(r.value).asInstanceOf[PoObj].fields("file") match {
        case PoStr(u) => u
        case _ => null
      }
      (r.id, url)
    }.toDF("id", "url")
      .orderBy(col("id").cast("long"))
  }

  /** S10 + S8 zip ROUND TRIP under the hard signal (reference
    * streamArchive export-controller.js:43-91 + dataset-controller.js
    * :249-298 file import): the whole corpus commits into a source
    * collection, exports as a zip of `records/<id>.json` entries, the
    * archive is unzipped and re-imported through the per-extension
    * codec path into a SECOND collection, and the destination's
    * records are emitted. The oracle is the original documents table —
    * any loss, duplication, id mangling, codec asymmetry, or version
    * drift anywhere along export → zip → unzip → decode → commit
    * breaks the hash.
    *
    * The zip stream is driver-side by design (the reference's HTTP
    * download path; Export.zip's scaladoc documents the 100 TB
    * alternative — distributed flat-file framings). */
  def zipRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val sfName = Paths.get(sfDir).getFileName.toString
    val store = new Store(spark, pidScratch(s"graft-zipq-$sfName"))
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    zipFormatRoundTrip(store, "docs-zipsrc", "docs-ziprt", "json", docs)
      .orderBy(col("id").cast("long"))
  }

  /** One export→zip→unzip→decode→commit cycle for `fmt` — the shared
    * body of q135 (json) and q147 (the other codecs). Returns the
    * destination's records decoded back to (id, version, data). */
  private def zipFormatRoundTrip(store: Store, srcName: String,
                                 dstName: String, fmt: String,
                                 docs: DataFrame): DataFrame = {
    val spark = store.spark
    import spark.implicits._
    val src = store.dataset("bench", srcName)
    if (src.exists) src.drop()
    src.create()
    src.writeEntriesDF(docs.as[(Long, String)].map { case (id, t) =>
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone"), WriteMode.Overwrite)

    val baos = new java.io.ByteArrayOutputStream()
    Export.zip(store, DataPath("datasets", "bench", srcName), fmt, baos)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(baos.toByteArray))
    val uploads = Iterator.continually(zin.getNextEntry)
      .takeWhile(_ != null)
      .filter(e => !e.isDirectory && e.getName.startsWith("records/"))
      .map(e => (e.getName, zin.readAllBytes()))
      .toVector

    val dst = store.dataset("bench", dstName)
    if (dst.exists) dst.drop()
    dst.create()
    Import.files(dst, uploads, WriteMode.Overwrite)
    dst.records.map { r =>
      val text = Cbor.decode(r.value).asInstanceOf[PoObj].fields("text") match {
        case PoStr(t) => t
        case _ => null
      }
      (r.id, r.version, text)
    }.toDF("id", "version", "data")
  }

  /** F1 recordID filter under the hard signal (reference
    * read-path.js:33-36): a lens whose INPUT path carries a recordID
    * builds from exactly that one record — the freshness scan filters
    * before the map stage, and the map-invocation accumulator proves
    * it (n_map_calls = 1 rides every output row; a full-corpus map
    * would put |docs| there and break the hash). Output: the token
    * index of the single addressed document. */
  def recordFilteredLens(spark: SparkSession, sfDir: String,
                         recordId: String = "17"): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-f1q-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-f1")
    if (ds.exists) ds.drop()
    ds.create()
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    ds.writeEntriesDF(docs.as[(Long, String)].map { case (id, t) =>
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone"), WriteMode.Overwrite)

    val acc = spark.sparkContext.longAccumulator("graft.q136.mapCalls")
    val lens = new graft.lens.Lens(store, "bench", "token-index-f1",
      Seq(DataPath("datasets", "bench", "docs-f1", recordID = Some(recordId))),
      new IncrementalLensQuery.CountingTokenFn(acc))
    if (lens.output.exists) lens.output.drop()
    lens.create()
    lens.build()
    val nMapCalls = acc.value
    lens.output.records.map { r =>
      val ids = Cbor.decode(r.value).asInstanceOf[PoSet].items
        .collect { case PoInt(i) => i }.sorted
      (r.id, ids.length.toLong, ids.mkString(","))
    }.toDF("token", "n_docs", "doc_ids")
      .withColumn("n_map_calls", lit(nMapCalls))
      .orderBy(col("token"))
  }

  /** W5 tombstone delete + reinsert under the hard signal (reference
    * base-data-model.js:243-252 record delete; docs/api/datasets.md:46
    * `undefined`-as-value ⇒ delete; pinned by test/test-models-dataset
    * .js): the q15 two-commit fixture (evens v1, odds new v2, %10
    * rewritten v2) plus a THIRD merge commit that tombstones every
    * doc_id % 9 == 4 and a FOURTH that re-inserts half of the deleted
    * ids (doc_id % 18 == 4) with their ORIGINAL text, then the
    * collection is read back in full. The still-deleted ids
    * (% 18 == 13) must be ABSENT, survivors must keep their exact
    * pre-delete versions (the tombstone batch must not perturb the
    * carry-forward), re-inserted ids must stamp the NEW commit version
    * (4) — a delete leaves no hash for the gate to match, so a
    * reinsert is a fresh write even when the content equals what was
    * deleted — and the collection version must have bumped once per
    * commit (`coll_version` rides every row, so an un-bumped — or
    * over-bumped — meta breaks the hash). The oracle re-derives the
    * whole lifecycle relationally. */
  def tombstoneExport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-tombq-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-tomb")
    if (ds.exists) ds.drop()
    ds.create()

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    def entries(df: DataFrame, mod: Boolean): DataFrame =
      df.as[(Long, String)].map { case (id, text) =>
        val t = if (mod) s"MODIFIED: $text" else text
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone")
    ds.writeEntriesDF(entries(docs.filter(col("doc_id") % 2 === 0), mod = false),
      WriteMode.Overwrite)
    ds.writeEntriesDF(
      entries(docs.filter(col("doc_id") % 2 === 1), mod = false)
        .unionByName(entries(docs.filter(col("doc_id") % 10 === 0), mod = true)),
      WriteMode.Merge)

    // commit 3: tombstones only — value bytes are empty, the flag does
    // the deleting (the DF form of the reference's undefined-as-value)
    ds.writeEntriesDF(
      docs.filter(col("doc_id") % 9 === 4)
        .select(col("doc_id").cast("string")).as[String]
        .map(id => (id, Array.empty[Byte], true))
        .toDF("id", "value", "tombstone"),
      WriteMode.Merge)

    // commit 4: re-insert half of the deleted ids with their ORIGINAL
    // text — the gate has no old hash for them, so they stamp v4
    ds.writeEntriesDF(
      entries(docs.filter(col("doc_id") % 18 === 4), mod = false),
      WriteMode.Merge)

    val collVersion = ds.meta.version
    ds.records.map { r =>
      val data = Cbor.decode(r.value).asInstanceOf[PoObj].fields("text") match {
        case PoStr(t) => t
        case _ => null
      }
      (r.id, r.version, data)
    }.toDF("id", "version", "data")
      .withColumn("coll_version", lit(collVersion))
      .orderBy(col("id").cast("long"))
  }

  /** W3 overwrite semantics under the hard signal (reference
    * base-data-model.js:166-225, the `overwrite` flag at :182; pinned
    * by test/test-models-dataset.js version arithmetic): an overwrite
    * commit REPLACES the collection — unmentioned ids are dropped —
    * while the hash gate still carries versions for records whose
    * content is unchanged. Three overwrite commits over the documents
    * corpus:
    *   1. all docs, original text                     → everything v1
    *   2. only doc_id % 3 != 1 (a third DROPPED), with
    *      doc_id % 10 == 0 rewritten                  → modified v2,
    *      unchanged carry v1
    *   3. ALL docs again: the dropped third reinstated with its
    *      ORIGINAL text, the rest byte-identical to commit 2
    * The reinstated ids must stamp v3 — an overwrite-drop leaves no
    * hash for the gate to match, so "same bytes as before the drop"
    * is still a fresh write (exactly the tombstone-reinsert rule,
    * q137) — while every other id carries its commit-2 version
    * through the full-collection rewrite. coll_version (3) rides
    * every row, so an over- or under-bumped meta breaks the hash. */
  def overwriteExport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-ovwq-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-ovw")
    if (ds.exists) ds.drop()
    ds.create()

    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    def entries(df: DataFrame, mod: Boolean): DataFrame =
      df.as[(Long, String)].map { case (id, text) =>
        val t = if (mod) s"MODIFIED: $text" else text
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone")

    ds.writeEntriesDF(entries(docs, mod = false), WriteMode.Overwrite)
    val keep = docs.filter(col("doc_id") % 3 =!= 1)
    def commit2Shape(d: DataFrame): DataFrame =
      entries(d.filter(col("doc_id") % 10 =!= 0), mod = false)
        .unionByName(entries(d.filter(col("doc_id") % 10 === 0), mod = true))
    ds.writeEntriesDF(commit2Shape(keep), WriteMode.Overwrite)
    ds.writeEntriesDF(
      commit2Shape(keep)
        .unionByName(entries(docs.filter(col("doc_id") % 3 === 1), mod = false)),
      WriteMode.Overwrite)

    val collVersion = ds.meta.version
    ds.records.map { r =>
      val data = Cbor.decode(r.value).asInstanceOf[PoObj].fields("text") match {
        case PoStr(t) => t
        case _ => null
      }
      (r.id, r.version, data)
    }.toDF("id", "version", "data")
      .withColumn("coll_version", lit(collVersion))
      .orderBy(col("id").cast("long"))
  }

  /** S12 change feed under the hard signal (reference
    * update-events.js:7-14 — every commit emits (path, version);
    * export-controller.js:153-176 serves the feed): one merge commit
    * per distinct document lang into one collection, then `compact()`
    * rolls the per-commit files into a segment, then the BATCH view of
    * the durable log is read back. The oracle derives the expected
    * event set from the corpus (one event per lang, versions numbering
    * the commits in lang order), so a missed notify, a double event, a
    * compaction that loses or duplicates a row, or wrong version
    * stamping all break the hash. ts/seq are wall-clock and are
    * deliberately NOT emitted — the (collection, version) sequence IS
    * the deterministic content of the feed. */
  def changeFeedView(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-cfq-$sfName")
    // fresh LOG per invocation: the batch view is "all commits so
    // far", so a reused scratch store must not leak a previous run's
    // events into this one
    graft.core.Fs.rmTree(Paths.get(root, "_commits"))
    val store = new Store(spark, root)
    val log = new graft.streaming.CommitLog(store).install()
    val ds = store.dataset("bench", "docs-cf")
    if (ds.exists) ds.drop()
    ds.create()
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "text")
    val langs = docs.select(col("lang")).distinct().as[String].collect().sorted
    langs.foreach { l =>
      ds.writeEntriesDF(
        docs.filter(col("lang") === l).as[(Long, String, String)]
          .map { case (id, _, t) =>
            (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
          }.toDF("id", "value", "tombstone"),
        WriteMode.Merge)
    }
    log.compact(minFiles = 2)
    log.batch
      .select(col("source"), col("author"), col("name"), col("version"))
      .orderBy(col("version"))
  }

  /** §3.3 ephemeral (run-once) lens under the hard signal (reference
    * lens-controller.js:205-217 — build, stream frames, `finally
    * lens.delete`): the corpus commits once, an ephemeral token-index
    * lens streams its record frames through the loan-pattern iterator
    * (driver holds one partition at a time — the serving contract),
    * and the frames decode to the same rows q9's persistent lens
    * yields. `dropped` rides every row as the POST-RUN existence check
    * of the throwaway collection — a leaked ephemeral output breaks
    * the hash, pinning the run-once deletion semantics. */
  def ephemeralLens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-ephq-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-eph")
    if (ds.exists) ds.drop()
    ds.create()
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .repartition(spark.sparkContext.defaultParallelism)
    ds.writeEntriesDF(docs.as[(Long, String)].map { case (id, t) =>
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone"), WriteMode.Overwrite)

    // a crashed previous rep can leave the fixed-suffix throwaway
    // behind; the ephemeral contract requires a fresh name
    val leftover = store.collection(DataPath("lenses", "system", "ephemeral-q144"))
    if (leftover.exists) leftover.drop()
    val acc = spark.sparkContext.longAccumulator("graft.q144.mapCalls")
    val rows = graft.lens.EphemeralLens.stream(store,
        Seq(DataPath("datasets", "bench", "docs-eph")),
        new IncrementalLensQuery.CountingTokenFn(acc), suffix = "q144") { frames =>
      frames.collect {
        case PoObj(fields) if fields.contains("record") =>
          val rec = fields("record").asInstanceOf[PoObj].fields
          val token = rec("id").asInstanceOf[PoStr].s
          val ids = rec("data").asInstanceOf[PoSet].items
            .collect { case PoInt(i) => i }.sorted
          (token, ids.length.toLong, ids.mkString(","))
      }.toVector
    }
    val dropped = !ReadPath.exists(store,
      DataPath("lenses", "system", "ephemeral-q144"))
    spark.createDataset(rows).toDF("token", "n_docs", "doc_ids")
      .withColumn("dropped", lit(dropped))
      .orderBy(col("token"))
  }

  /** S4 readPath polymorphic LIST scan under the hard signal
    * (reference read-path.js:6-49 — one record, a whole collection, or
    * a LIST of paths, across sources, concatenated): a dataset subset
    * (doc_id % 3 == 0), a token-index lens over it, and a read of
    * [whole dataset, one explicit record path, whole lens] through ONE
    * ReadPath call — the union frame's (path, id, version) rows are
    * re-derived relationally (the record path contributes its row a
    * second time: the reference concatenates, it does not dedup across
    * LIST entries — dedup is the LENS input rule, not readPath's). */
  def readPathUnion(spark: SparkSession, sfDir: String,
                    recordId: String = "42"): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-rpq-$sfName")
    val store = new Store(spark, root)
    val ds = store.dataset("bench", "docs-rp")
    if (ds.exists) ds.drop()
    ds.create()
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
      .filter(col("doc_id") % 3 === 0)
      .repartition(spark.sparkContext.defaultParallelism)
    ds.writeEntriesDF(docs.as[(Long, String)].map { case (id, t) =>
        (id.toString, Cbor.encode(PoObj("text" -> PoStr(t))), false)
      }.toDF("id", "value", "tombstone"), WriteMode.Overwrite)

    val lens = new graft.lens.Lens(store, "bench", "rp-lens",
      Seq(DataPath("datasets", "bench", "docs-rp")),
      new IncrementalLensQuery.CountingTokenFn(
        spark.sparkContext.longAccumulator("graft.q145.mapCalls")))
    if (lens.output.exists) lens.output.drop()
    lens.create()
    lens.build()

    ReadPath.read(store, Seq(
        DataPath("datasets", "bench", "docs-rp"),
        DataPath("datasets", "bench", "docs-rp", recordID = Some(recordId)),
        DataPath("lenses", "bench", "rp-lens")))
      .select(col("path"), col("id"), col("version"))
      .orderBy(col("path"), col("id"))
  }

  /** S11 raw record serving + W4 single-record writes, END-TO-END OVER
    * HTTP (reference: export-controller.js:178-197 the `/as/:format/
    * :recordID` raw route — string/bytes roots serve AS-IS; dataset
    * write route `PUT /datasets/A:N/records/R`): every doc_id %
    * `mod` == 7 is written as a STRING-ROOTED record one PUT at a
    * time (the reference's per-request write contract — this is W4,
    * not bulk ingest), then read back through the raw route. Emitted
    * per id: the PUT-returned version (each single write is its OWN
    * commit, so the Nth PUT in doc_id order stamps version N — the
    * oracle re-derives that as a row_number), the raw body (must be
    * the text BYTE-FOR-BYTE — any codec framing, quoting, or charset
    * mangling breaks the hash) and the content type.
    *
    * FIXED-SIZE fixture (`limit` PUTs, lowest matching ids): the
    * per-request envelope is commit-per-write by contract — N single
    * PUTs rewrite touched state N times, so an unbounded fixture
    * would measure O(N) commit overhead (~0.5 s each), not the
    * serving surface. The store is BUCKETED so each commit's COW
    * merge rewrites one id-bucket and hardlink-carries the rest —
    * the write path a single-record PUT takes at 100 TB. */
  def rawServing(spark: SparkSession, sfDir: String,
                 mod: Long = 101, limit: Int = 12): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-rawq-$sfName")
    val store = new Store(spark, root, buckets = Some(8))
    val ds = store.dataset("bench", "docs-raw")
    if (ds.exists) ds.drop()
    ds.create()
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % mod === 7)
      .select(col("doc_id").cast("long"), col("text"))
      .orderBy(col("doc_id")).limit(limit)
      .as[(Long, String)].collect().sortBy(_._1)

    val api = new graft.api.HttpApi(store).start()
    try {
      val c = java.net.http.HttpClient.newHttpClient()
      val base = s"http://127.0.0.1:${api.boundPort}"
      def put(id: Long, text: String): Long = {
        val body = graft.codec.JsonCodec.encode(PoStr(text))
        val resp = c.send(java.net.http.HttpRequest
            .newBuilder(java.net.URI.create(
              s"$base/datasets/bench:docs-raw/records/$id"))
            .header("Content-Type", "application/json")
            .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
            .build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode == 200, s"PUT $id -> ${resp.statusCode}")
        graft.codec.JsonCodec.decode(resp.body.getBytes("UTF-8")) match {
          case PoObj(fields) => fields("version") match {
            case PoInt(v) => v
            case _ => -1L
          }
          case _ => -1L
        }
      }
      def getRaw(id: Long): (String, String) = {
        val resp = c.send(java.net.http.HttpRequest
            .newBuilder(java.net.URI.create(
              s"$base/datasets/bench:docs-raw/as/json/$id"))
            .GET.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        require(resp.statusCode == 200, s"GET raw $id -> ${resp.statusCode}")
        (resp.body, resp.headers.firstValue("Content-Type").orElse(""))
      }
      val rows = docs.map { case (id, text) =>
        val version = put(id, text)
        val (body, ctype) = getRaw(id)
        (id.toString, version, body, ctype)
      }
      spark.createDataset(rows.toSeq).toDF("id", "version", "body", "ctype")
        .orderBy(col("id").cast("long"))
    } finally api.stop()
  }

  /** S13 codec matrix under the hard signal (reference codec layer:
    * the library/models/codec modules — every format must round-trip
    * arbitrary documents; pinned at fixture scale by
    * test/test-models-codec.js): the q135 zip round trip run for FOUR
    * MORE codecs — yaml, cbor, msgpack, xml — each over its quarter
    * of the corpus (doc_id % 4 partitions the docs, so the total
    * volume equals one corpus pass). Real document text flows through
    * encode → zip → unzip → per-extension decode → commit per codec;
    * any escaping, framing, charset, or numeric-shape asymmetry on
    * REAL data (not just the codec spec corpus) breaks the hash.
    * JSON is q135's; this closes the remaining write+read codecs. */
  def codecMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    val sfName = Paths.get(sfDir).getFileName.toString
    val store = new Store(spark, pidScratch(s"graft-cmq-$sfName"))
    val docs = Tables.load(spark, sfDir, "documents").select("doc_id", "text")
    val parts = Seq("yaml", "cbor", "msgpack", "xml").zipWithIndex
      .map { case (fmt, k) =>
        zipFormatRoundTrip(store, s"docs-cm-$fmt", s"docs-cmrt-$fmt", fmt,
            docs.filter(col("doc_id") % 4 === k))
          .withColumn("codec", lit(fmt))
      }
    parts.reduce(_ unionByName _)
      .select(col("codec"), col("id"), col("version"), col("data"))
      .orderBy(col("codec"), col("id").cast("long"))
  }

  /** W6 delete collection under the hard signal (reference
    * base-data-model.js:276-294 delete + auth-controller drop routes;
    * catalog surface meta-vfs.js:8-55): one dataset per distinct
    * document lang is created WITH a committed record, the
    * lexicographically FIRST HALF of them are dropped, and the
    * meta-VFS datasets listing plus each collection's existence checks
    * are read back. A drop that leaves catalog residue (the dir, the
    * listing row) or that takes neighbors with it breaks the hash;
    * `n_live` = the surviving collection count rides every row so an
    * over- or under-drop is visible even if the listing happens to
    * filter it. The oracle re-derives the survivor set from the
    * corpus's lang values. */
  def dropCollections(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sfName = Paths.get(sfDir).getFileName.toString
    val root = pidScratch(s"graft-dropq-$sfName")
    val store = new Store(spark, root)
    val langs = Tables.load(spark, sfDir, "documents")
      .select(col("lang")).distinct().as[String].collect().sorted
    langs.foreach { l =>
      val c = store.dataset("bench", s"docs-dr-$l")
      if (c.exists) c.drop() // reused scratch: previous run's state
      c.create()
      // a real committed record, so drop removes DATA, not just meta
      c.writeEntriesDF(
        spark.createDataset(Seq((l, Cbor.encode(PoStr(s"doc of $l")), false)))
          .toDF("id", "value", "tombstone"), WriteMode.Overwrite)
    }
    val (toDrop, toKeep) = langs.splitAt(langs.length / 2)
    toDrop.foreach(l => store.dataset("bench", s"docs-dr-$l").drop())

    val listed = ReadPath.read(store, DataPath("meta", "system", "system"))
      .filter(col("id") === "datasets")
      .select(col("value")).collect()
      .flatMap(r => Cbor.decode(r.getAs[Array[Byte]]("value"))
        .asInstanceOf[PoArr].items.map { v =>
          v.asInstanceOf[PoObj].fields("name").asInstanceOf[PoStr].s
        })
      .filter(_.startsWith("docs-dr-")).sorted
    require(listed.sameElements(toKeep.map(l => s"docs-dr-$l")),
      s"catalog listing disagrees with drops: ${listed.mkString(",")}")
    spark.createDataset(langs.toSeq.map(l =>
        (l, store.dataset("bench", s"docs-dr-$l").exists)))
      .toDF("lang", "live")
      .withColumn("n_live", lit(toKeep.length.toLong))
      .orderBy(col("lang"))
  }

  /** Natural-order sort (W7, reference base-data-model.js:46): ids with
    * digit runs sort numerically via the lexicographic naturalKey
    * rewrite. The oracle re-derives the same order relationally
    * (prefix, then numeric id), so this pins naturalKey's semantics
    * against an independent implementation. */
  def naturalOrder(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.register(spark)
    val ids = Tables.load(spark, sfDir, "documents")
      .select(concat(
        when(col("doc_id") % 3 === 0, lit("alpha")).otherwise(lit("beta")),
        col("doc_id")).as("id"))
    // Parallel global rank: range-partitioned sort on the codegen'd
    // natural_key, then per-partition offsets (zipWithIndex = one
    // count-per-partition job + a mapPartitions adding running
    // offsets). Identical output to row_number() over a global window,
    // but every partition ranks in parallel — no single-reducer
    // WindowExec at any scale.
    ids.orderBy(expr("natural_key(id)"))
      .select(col("id")).as[String]
      .rdd.zipWithIndex()
      .map { case (id, i) => (i + 1, id) }
      .toDF("rank", "id")
      .orderBy(col("rank"))
  }
}
