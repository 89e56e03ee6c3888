package graft.lens

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{Cbor, NaturalOrder, Reduce, RecordStructure}
import graft.store.{Collection, DataPath, RecordRow, Store}

/** One row of the spooled map stage — the lens compute cache. Kinds:
  *  - "seen": one row per mapped input record, carrying the input
  *    record's version (`inVersion`) — the freshness gate for
  *    incremental builds (reference: lens.js:141 inputVersions check);
  *  - "out":  one emitted (id, value) pair (CBOR bytes in `value`);
  *  - "log"/"err": captured console lines / thrown errors.
  * This is the Spark analogue of the reference's per-input compute-cache
  * entries `{logs, errors, outputs}` (reference: library/models/lens.js:163).
  * `ord`/`natKey`/`outIdx` fix the reduce order: lens-input ordinal, then
  * natural record-id order within an input, then emit order within one
  * map call — the reduce lattice is order-sensitive (SURVEY §2.5).
  */
final case class BuildEmit(kind: String, path: String, inVersion: Long,
                           ord: Int, natKey: String, outIdx: Int,
                           outId: String, value: Array[Byte],
                           logKind: String, logArgs: Seq[String],
                           errType: String, errMsg: String)

/** A lens: a materialized view defined by a [[MapFn]] over 1..n input
  * collections, reduced by the fixed system merge lattice
  * (reference: library/models/lens.js:1-27). The output is an ordinary
  * versioned [[Collection]] under /lenses/, so lenses compose (a lens can
  * read another lens's output).
  */
final class Lens(val store: Store, val author: String, val name: String,
                 val inputs: Seq[DataPath], val fn: MapFn,
                 val timeoutMs: Long = MapRunner.NoTimeoutMs,
                 val sandboxed: Boolean = false,
                 val memCapBytes: Long = MapRunner.DefaultMemCapBytes,
                 val memo: String = "") {
  require(inputs.nonEmpty, "a lens needs at least one input")

  /** per-map-call budget (the reference's 50 ms lensTimeout) — armed for
    * untrusted map code; cooperative (checked at emit/log). */
  def withTimeout(ms: Long): Lens =
    new Lens(store, author, name, inputs, fn, ms, sandboxed, memCapBytes, memo)

  /** Preemptive isolate-style sandbox (the reference's lens worker caps:
    * 50 ms + 256 MB, javascript-lens-worker.js:55,116): each map call
    * runs on a watched worker thread; blowing the time or allocation
    * budget abandons the call and records the error. Use for untrusted
    * map code; [[withTimeout]] alone is the cheaper cooperative budget
    * for trusted code. */
  def withSandbox(ms: Long = MapRunner.DefaultTimeoutMs,
                  memCap: Long = MapRunner.DefaultMemCapBytes): Lens =
    new Lens(store, author, name, inputs, fn, ms, sandboxed = true, memCap, memo)

  val path: DataPath = DataPath("lenses", author, name)
  def output: Collection = store.collection(path)

  /** Creates the output collection AND persists the lens configuration
    * (inputs, map type) next to it, so the read-only configuration
    * surface (reference: lens-controller.js:61-75 readMeta) works from
    * any process — not just the one holding this Lens instance. */
  def create(): Lens = {
    output.create()
    saveConfig()
    this
  }

  /** (Re)writes lens.json WITHOUT touching the output collection — the
    * `PUT /lenses/A:N/configuration` path (lens-controller.js:76-99
    * updateMeta), where the collection already exists and only the map
    * definition / inputs / memo change. The config carries the map
    * itself for wire-expressible types ('javascript' code string,
    * 'dsl' spec JSON — reference meta shape lens.js:60-67 {mapType,
    * code, inputs, memo}), so [[Lens.fromConfig]] can reconstruct the
    * lens in a different process; in-process Scala fns persist their
    * class name, resolvable only when that class is on the classpath. */
  def saveConfig(): Lens = {
    import graft.core.{PoArr, PoObj, PoStr}
    val (mapType, code) = fn match {
      case js: JsMapFn => ("javascript", PoStr(js.code))
      case dsl: MapDsl.DslMapFn =>
        ("dsl", graft.codec.JsonCodec.decodeString(dsl.rawSpecJson))
      case other => ("scala", PoStr(other.getClass.getName))
    }
    import graft.core.PoInt
    val cfg = PoObj(
      "memo" -> PoStr(memo),
      "mapType" -> PoStr(mapType),
      "code" -> code,
      // the reference's lensTimeout (package.json:82) is configuration,
      // not a constant — persisting it makes [[Lens.fromConfig]] honor
      // the budget the creating process chose (a trusted in-process
      // lens with no deadline must not gain a 50 ms one when a
      // maintainer process reconstructs it: a loaded box would time
      // out real map calls and cache the failure as that record's
      // result until the next full rebuild)
      "timeoutMs" -> PoInt(timeoutMs),
      "inputs" -> PoArr(inputs.map(p => PoStr(p.collectionPath)).toVector))
    Files.write(store.dir(path).resolve("lens.json"),
      graft.codec.JsonCodec.encode(cfg))
    this
  }
  def exists: Boolean = output.exists

  /** Per-input logs and captured errors of the last build
    * (reference: lens.js:87-92 iterateLogs). Columns:
    * path, kind, logKind, logArgs, errType, errMsg. */
  def logs: DataFrame = Lens.logsOf(store, author, name)

  /** Incremental build (SURVEY §2.6): unchanged input records reuse the
    * compute cache; only fresh/new records re-map; deleted inputs drop
    * their cached contributions. First build (no cache) maps everything.
    * A build where nothing changed commits nothing and returns the
    * current version. */
  def build(): Long = LensBuild.build(this, incremental = true)

  /** Full rebuild — re-maps every input record and rewrites the cache.
    * Required after changing the map function or input list. */
  def buildFull(): Long = LensBuild.build(this, incremental = false)

  private[lens] def cacheDir: Path = store.dir(path).resolve("cache")
}

object Lens {
  /** Persisted lens configuration by path (read-only surface for the
    * HTTP facade; written by [[Lens.create]]). */
  def configOf(store: Store, author: String, name: String): Option[graft.core.PoValue] = {
    val f = store.dir(DataPath("lenses", author, name)).resolve("lens.json")
    if (Files.exists(f))
      Some(graft.codec.JsonCodec.decode(Files.readAllBytes(f)))
    else None
  }

  /** Reconstructs a runnable Lens from its persisted lens.json — the
    * multi-process dual of [[Lens.create]]: an HTTP `PUT` or a separate
    * maintainer process can rebuild a lens it did not configure
    * (reference: lens.js:117-129 loads {mapType, code} from meta and
    * hands it to the worker). Wire map types ('javascript', 'dsl')
    * recompile from the stored code and run SANDBOXED (the code arrived
    * over the wire once); mapType 'scala' resolves the stored class name
    * to its singleton object, or a zero-arg constructor — None when the
    * class is not on this process's classpath or the code no longer
    * parses. */
  def fromConfig(store: Store, author: String, name: String): Option[Lens] =
    configOf(store, author, name).flatMap {
      case graft.core.PoObj(fields) =>
        val inputs = fields.get("inputs") match {
          case Some(graft.core.PoArr(items)) =>
            items.collect { case graft.core.PoStr(s) => s }
              .flatMap(s => DataPath.parse(s.stripSuffix("/"))).toSeq
          case _ => Seq.empty
        }
        if (inputs.isEmpty) None
        else {
          val memo = fields.get("memo") match {
            case Some(graft.core.PoStr(m)) => m
            case _ => ""
          }
          val timeoutMs = fields.get("timeoutMs") match {
            case Some(graft.core.PoInt(ms)) => ms
            case _ => MapRunner.DefaultTimeoutMs // pre-timeout configs
          }
          def wired(fn: MapFn): Lens =
            new Lens(store, author, name, inputs, fn,
              timeoutMs, sandboxed = true,
              MapRunner.DefaultMemCapBytes, memo)
          (fields.get("mapType"), fields.get("code")) match {
            case (Some(graft.core.PoStr("javascript")), Some(graft.core.PoStr(code))) =>
              // `rejections: "lenient"` = reference-worker compatibility:
              // an unhandled promise rejection only logs to the lens
              // error stream and outputs are kept (V8 warns on stderr);
              // default is the strict loud mode (JsMapFn scaladoc)
              val strict =
                !fields.get("rejections").contains(graft.core.PoStr("lenient"))
              JsMapFn.compile(code, strict).toOption.map(wired)
            case (Some(graft.core.PoStr("dsl")), Some(spec)) =>
              try Some(wired(MapDsl.compile(spec)))
              catch { case _: IllegalArgumentException => None }
            case (Some(graft.core.PoStr("scala")), Some(graft.core.PoStr(cls))) =>
              resolveScalaFn(cls).map(fn =>
                new Lens(store, author, name, inputs, fn, memo = memo))
            case _ => None
          }
        }
      case _ => None
    }

  /** `object Foo extends MapFn` → MODULE$; else zero-arg constructor. */
  private def resolveScalaFn(className: String): Option[MapFn] =
    try {
      val cls = Class.forName(className)
      val inst =
        if (className.endsWith("$")) cls.getField("MODULE$").get(null)
        else cls.getDeclaredConstructor().newInstance()
      inst match { case fn: MapFn => Some(fn); case _ => None }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Last-build logs by path (reference: lens.js:87-92 iterateLogs),
    * without needing the original Lens instance — the logs parquet is
    * self-describing. Columns: path, kind, logKind, logArgs, errType,
    * errMsg. Ordered by (input ordinal, natural record order) so the
    * framing is deterministic — parquet file order is map-partition
    * order, which is not. */
  def logsOf(store: Store, author: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = store.spark
    val cols = Seq("path", "kind", "logKind", "logArgs", "errType", "errMsg")
    // Logs are served from the COMPUTE CACHE: the spool a build writes
    // there contains exactly the log/err rows of every current input
    // (retained rows keep the rows from the build that last mapped
    // them), so a separate logs parquet would duplicate it byte for
    // byte — one write job per build, deleted in round 6. kind is a
    // leading filter → parquet predicate pushdown skips the out/seen
    // row groups.
    // Migration note (round 7): the round-6 transition fallback to a
    // pre-cache `logs/` dir is gone — any store built by round 6+
    // has the cache dir after its first build, and the fallback (plus
    // the rmTree of `logs/` every build) was dead weight on the build
    // path. A pre-round-6 store simply reports no logs until its next
    // build, which is what the empty frame below says.
    val cacheDir = store.dir(DataPath("lenses", author, name)).resolve("cache")
    val src = if (Files.isDirectory(cacheDir)) Some(cacheDir) else None
    src match {
      case Some(dir) =>
        spark.read
          .schema(org.apache.spark.sql.Encoders.product[BuildEmit].schema)
          .parquet(dir.toString)
          .filter(col("kind") === "log" || col("kind") === "err")
          .orderBy(col("ord"), col("natKey"))
          .select(cols.map(col): _*)
      case None =>
        spark.emptyDataset(org.apache.spark.sql.Encoders.product[BuildEmit])
          .toDF().select(cols.map(col): _*)
    }
  }
}

/** The change-feed cascade (reference: update-events.js:7-14 +
  * lens.js:351-367): registered lenses rebuild incrementally whenever a
  * collection they read commits; their own commits re-enter the bus, so
  * lens-on-lens DAGs settle in topological waves. By default rebuilds
  * serialize (faithful to the reference's global lock); with
  * `parallelCascade` the independent lenses of one wave — same DAG
  * depth, disjoint outputs — rebuild CONCURRENTLY: per-collection commit
  * locks and the gc gate already make concurrent commits safe, and on a
  * cluster N independent lens builds are N independent Spark job chains
  * that have no business queueing on one driver thread. Self-cycles are
  * guarded by an in-progress set either way. */
final class LensHub(store: Store, parallelCascade: Boolean = false) {
  private val lenses = scala.collection.mutable.LinkedHashMap[String, Lens]()
  private val building = scala.collection.mutable.Set[String]()
  // lenses whose input committed WHILE they were building: on a
  // DIAMOND (two mid lenses feeding one sink), the second mid lens's
  // commit can land while the sink is already rebuilding for the
  // first — dropping that event would leave the sink permanently
  // stale on the second input (an under-build; q153 pins this). The
  // claim holder re-runs the build until no commit arrived during it;
  // the freshness gate makes a spurious extra pass a cheap no-op.
  private val pending = scala.collection.mutable.Set[String]()

  store.onCommit((p, _) => onUpdate(p))

  def register(l: Lens): Lens = synchronized {
    lenses(l.path.collectionPath) = l; l
  }

  private def onUpdate(p: DataPath): Unit = {
    val dependents = synchronized {
      lenses.values.filter(_.inputs.exists(_.collectionPath == p.collectionPath)).toSeq
    }
    val claimed = dependents.filter { l =>
      val key = l.path.collectionPath
      synchronized {
        if (building(key)) { pending += key; false }
        else { building += key; true }
      }
    }
    def run(l: Lens): Unit = {
      val key = l.path.collectionPath
      try {
        var more = true
        while (more) {
          l.build()
          // pending-check and claim-release are ONE atomic step: a
          // commit landing between "no pending" and the release would
          // otherwise mark pending with nobody left to honor it
          synchronized {
            if (pending(key)) pending -= key // go again
            else { building -= key; more = false }
          }
        }
      } catch {
        case e: Throwable =>
          // release ONLY the claim — a pending flag set by a commit
          // that landed mid-build must survive the failure, so the
          // next onUpdate's first pass re-covers the dropped event
          // (ADVICE r14: clearing it here reintroduced the q153
          // under-build class on the error path)
          synchronized { building -= key }
          throw e
      }
    }
    // every claimed lens MUST release its claim even if an earlier
    // build in the wave throws: run() releases its own key, and the
    // serial path's finally releases the keys of lenses the abort
    // prevented from running at all — otherwise one failed build would
    // leave siblings marked in-progress forever, silently starving
    // every future rebuild wave for them
    if (parallelCascade && claimed.size > 1) {
      // one wave = one thread per build (commit rates are human-scale;
      // the heavy lifting inside each build is Spark jobs, which stay
      // fully parallel regardless). Each build's own commit re-enters
      // the bus from its thread, so deeper waves recurse naturally.
      // First failure propagates to the committing writer, like the
      // serial path; sibling failures in the same wave ride along as
      // suppressed exceptions (Throwable.addSuppressed is synchronized)
      // so a multi-lens failure is diagnosable from the one throw.
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val threads = claimed.map { l =>
        val t = new Thread(() =>
          try run(l)
          catch {
            case e: Throwable =>
              if (!failure.compareAndSet(null, e)) failure.get().addSuppressed(e)
          })
        t.start(); t
      }
      threads.foreach(_.join())
      if (failure.get() != null) throw failure.get()
    } else {
      var i = 0
      try {
        while (i < claimed.size) { run(claimed(i)); i += 1 }
      } finally synchronized {
        // a throw at index i: run() already released key i; release the
        // never-run remainder (no-op when the loop completed) but KEEP
        // their triggering event as pending — the abort dropped it, and
        // the next claim's first pending-check re-runs for it
        claimed.drop(i + 1).foreach { l =>
          building -= l.path.collectionPath
          pending += l.path.collectionPath
        }
      }
    }
  }
}

object LensBuild {

  /** The whole build — map → spool → reduce → commit → cache swap —
    * runs under the output collection's writer lock (Store.withLock:
    * JVM monitor + OS file lock), because the compute-cache staging
    * dir (`cache-next`) is a SHARED path: two processes
    * building one lens concurrently would interleave Spark overwrites
    * into the same `_temporary` dir and race the final swaps. Under
    * the lock, the second builder enters after the first's cache swap,
    * its freshness gate sees everything current, and it no-ops — the
    * at-least-once absorption the maintainer relies on, now safe
    * across processes, not just within the in-JVM cascade's `building`
    * set. The nested `commitPrepared` re-enters via the lock's hold
    * count. */
  def build(lens: Lens, incremental: Boolean): Long =
    lens.store.withLock(lens.path)(doBuild(lens, incremental))

  private def doBuild(lens: Lens, incremental: Boolean): Long = {
    val store = lens.store
    val spark = store.spark
    import spark.implicits._
    val emitEnc = org.apache.spark.sql.Encoders.product[BuildEmit]

    // ---- 0. O(metadata) no-op fast path (VERDICT r15 Next #3): the
    //         compute cache records the INPUT COLLECTION VERSIONS it
    //         was built against; when none moved, the previous gate
    //         outcome still holds — nothing can be fresh or deleted —
    //         and the build returns without scheduling ANY Spark job.
    //         The at-least-once redelivery storm (q159) and settled
    //         cascade levels (q153/q138) cost manifest reads instead
    //         of a ~5-job gate query per build. Versions are read
    //         BEFORE the scan, so a commit racing the build records
    //         the pre-commit version and merely causes one extra
    //         (gate-absorbed) rebuild — never a missed one.
    val cacheDirFp = lens.cacheDir
    val inputVersionsNow: Option[Map[String, Long]] =
      try Some(lens.inputs.map { p =>
        val dp = DataPath(p.source, p.author, p.name)
        dp.collectionPath -> store.collection(dp).meta.version
      }.toMap)
      catch { case _: Throwable => None } // missing input: the scan below throws, as before
    if (incremental && Files.isDirectory(cacheDirFp) && inputVersionsNow.isDefined &&
        readInputVersions(cacheDirFp).contains(inputVersionsNow.get))
      return lens.output.meta.version

    // ---- 1. input scan: per-input ordinal, record filter (F1), then
    //         union-distinct by record path keeping the FIRST input's copy
    //         (reference: lens.js:119-132 inputRecordPaths dedup)
    val perInput = lens.inputs.zipWithIndex.map { case (p, i) =>
      val coll = store.collection(DataPath(p.source, p.author, p.name))
      var df = coll.toDF.select(col("id"), col("value"), col("version"))
      p.recordID.foreach(rid => df = df.filter(col("id") === lit(rid)))
      df.withColumn("ord", lit(i))
        .withColumn("source", lit(p.source))
        .withColumn("author", lit(p.author))
        .withColumn("cname", lit(p.name))
    }
    val unioned = perInput.reduce(_ unionByName _)
    // The first-input-wins dedup window only matters when a record path
    // can appear under MORE than one input (reference: lens.js:119-132).
    // With a single input, ids are unique within the collection snapshot
    // by construction — running the window anyway would shuffle the
    // whole corpus once per build for nothing (at 100 TB, the single
    // largest avoidable cost in this plan). Multi-input lenses keep the
    // exact reference dedup semantics.
    val deduped =
      if (lens.inputs.size == 1) unioned
      else {
        val byPath = Window.partitionBy(col("source"), col("author"), col("cname"), col("id"))
          .orderBy(col("ord"))
        unioned
          .withColumn("rn", row_number().over(byPath))
          .filter(col("rn") === 1).drop("rn")
      }
    val current = deduped
      .withColumn("path", concat(lit("/"), col("source"), lit("/"),
        col("author"), lit(":"), col("cname"), lit("/records/"), col("id")))
    var gatePersisted: Option[DataFrame] = None
    var freshPersisted: Option[Dataset[BuildEmit]] = None
    var idsPersisted: Option[DataFrame] = None
    var deltaPersisted: Option[DataFrame] = None
    try {

    // ---- shared stages ------------------------------------------------
    // Map stage: executor-side flatMap with log/error capture over the
    // FRESH records only (reference spools to scratch: lens.js:151-160).
    val fn = lens.fn
    val timeoutMs = lens.timeoutMs
    val sandboxed = lens.sandboxed
    val memCap = lens.memCapBytes
    def mapEmits(in: DataFrame): Dataset[BuildEmit] = in
      .select("id", "value", "version", "ord", "source", "author", "cname")
      .as[(String, Array[Byte], Long, Int, String, String, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes, ver, ord, source, author, cname) =>
          val mp = MapPath(s"/$source/$author:$cname/records/$id",
            source, author, cname, id)
          val res =
            if (sandboxed) MapRunner.runSandboxed(fn, mp, Cbor.decode(bytes), timeoutMs, memCap)
            else MapRunner.run(fn, mp, Cbor.decode(bytes), timeoutMs)
          val nk = NaturalOrder.naturalKey(id)
          val outs = res.outputs.zipWithIndex.map { case ((oid, v), idx) =>
            BuildEmit("out", mp.string, ver, ord, nk, idx, oid, Cbor.encode(v),
              null, null, null, null)
          }
          val logs = res.logs.map(l =>
            BuildEmit("log", mp.string, ver, ord, nk, 0, null, null,
              l.kind, l.args, null, null))
          val errs = res.error.map(e =>
            BuildEmit("err", mp.string, ver, ord, nk, 0, null, null,
              null, null, e.errType, e.message))
          BuildEmit("seen", mp.string, ver, ord, nk, 0, null, null,
            null, null, null, null) +: (outs ++ logs ++ errs)
        }
      }(emitEnc)

    // Merge-reduce per output id. Two physical strategies, same
    // semantics for the values each admits:
    //  - default: ONE shuffle on the id, values folded in (input
    //    ordinal, natural record order, emit order) — exact
    //    order-sensitive reference semantics (lens.js:204-215);
    //  - CommutativeMapFn: partial-aggregating shuffle (map-side
    //    combine) — shuffle volume drops from O(emitted pairs) to
    //    O(distinct keys × partitions), the 100 TB path for
    //    set-union/sum lenses.
    def reduceOuts(outs: Dataset[BuildEmit]): DataFrame =
      (if (fn.isInstanceOf[CommutativeMapFn])
        outs.groupByKey(_.outId).agg(ReduceAggregator.toColumn.name("value"))
      else
        outs.groupByKey(_.outId)
          .flatMapSortedGroups(col("ord"), col("natKey"), col("outIdx")) {
            (id: String, it: Iterator[BuildEmit]) =>
              Iterator((id, Cbor.encode(it.map(e => Cbor.decode(e.value))
                .reduceLeft(Reduce.merge))))
          })
        .map { case (id, bytes) =>
          val v = Cbor.decode(bytes)
          (id, bytes, Cbor.hash(v), RecordStructure.listHashURLs(v): Seq[String])
        }.toDF("id", "value", "hash", "links")

    val cacheDir = lens.cacheDir
    val cacheNext = cacheDir.resolveSibling("cache-next")
    val out = lens.output
    val useCache = incremental && Files.isDirectory(cacheDir)

    val v: Long = if (!useCache) {
      // ==== FULL BUILD ==================================================
      // Map everything, spool everything, reduce everything; the spool
      // becomes the next compute cache. `pbuckets` > 1 lays the cache
      // out as `pbucket=k` partitions hashed on the input path so later
      // INCREMENTAL builds rewrite only the buckets their delta touches
      // (copy-on-write, the snapshot-commit profile) — derived from the
      // input snapshot size (scale-adaptive; 1 at bench scale, where a
      // partitioned layout would only fragment a tiny cache), overridable
      // via `graft.lens.cachePartitions` for tests/production tuning.
      val pbuckets = derivePBuckets(lens)
      // Map-stage parallelism: the map fn is the expensive stage of a
      // build (user JS, CBOR decode). On a SINGLE-INPUT FULL build the
      // plan is a narrow snapshot scan — partitions = input files, and a
      // small collection (one ~MB parquet) runs the whole map in ONE
      // task. Repartition up to the session's parallelism in exactly that
      // case. Narrow-plan-only by construction: `.rdd` under AQE
      // materializes query stages, so probing partition counts is only
      // free when the plan has no exchanges (single input ⇒ no dedup
      // window; no cache ⇒ no gate join). Multi-input builds are already
      // wide (the dedup window shuffles). At scale a big collection has
      // ≫ cores file-partitions and this is a no-op.
      val freshSel = current
        .select("id", "value", "version", "ord", "source", "author", "cname")
      val smallInput = lens.inputs.size == 1 &&
        freshSel.rdd.getNumPartitions < spark.sparkContext.defaultParallelism
      val mapIn =
        if (smallInput) freshSel.repartition(spark.sparkContext.defaultParallelism)
        else freshSel
      // The spool is BOTH the next compute cache (parquet, swapped in at
      // the end) and the input to the reduce + logs stages. Persist it so
      // the write job doubles as the materialization and the reduce reads
      // memory/local-disk instead of re-reading the parquet it just wrote.
      // At pbuckets == 1 the AQE rebalance sits BELOW the persist so ONE
      // shuffle serves both consumers: the cache lands size-targeted
      // (1-2 files at bench scale, advisory-sized at 100 TB — not a file
      // per map task) and the reduce reads the coalesced blocks. The
      // pbuckets > 1 write shuffles by pbucket inside writeCache instead.
      val spoolDs =
        if (pbuckets == 1) mapEmits(mapIn).hint("rebalance")
        else mapEmits(mapIn)
      val spooled = spoolDs
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      freshPersisted = Some(spooled)
      // Overlap the cache write with the reduce+commit (r18, guide §2.6
      // "overlap independent jobs"): both consume the persisted spool
      // and are independent until the manifest swap — running them
      // sequentially left the cluster idle through each action's
      // scheduling tail. Exactly-once map calls are preserved: the
      // persist's per-partition block lock makes concurrent
      // materializations compute each partition once (spec-pinned by
      // IncrementalLensSpec's exact invocation counts).
      val cacheWritten = runCacheWrite(spark) {
        writeCache(spooled.toDF(), cacheNext, pbuckets)
      }

      // hash-gated materialize: unchanged output records keep their
      // version (same gate as a dataset commit)
      val reduced = reduceOuts(spooled.filter(col("kind") === "out"))
      val newVersion = out.nextVersion
      val old = out.toDF.select(col("id"), col("version").as("old_version"),
        col("hash").as("old_hash"))
      val rows = reduced
        .join(old, Seq("id"), "left")
        .withColumn("version",
          when(col("old_hash") === col("hash"), col("old_version"))
            .otherwise(lit(newVersion)))
        .select(col("id"), col("version"), col("hash"), col("links"), col("value"))
        .as[RecordRow]
      val committed = out.commitPrepared(rows)
      scala.concurrent.Await.result(cacheWritten,
        scala.concurrent.duration.Duration.Inf)
      // the fast-path manifest rides the cache swap (atomic with it)
      inputVersionsNow.foreach(writeInputVersions(cacheNext, _, pbuckets))
      swapDir(cacheNext, cacheDir)
      committed
    } else {
      // ==== INCREMENTAL BUILD — O(delta), not O(corpus) =================
      // (VERDICT r16 Next #3.) Three delta-scaled legs after the gate:
      //  1. the compute-cache rewrite touches only the `pbucket=k` dirs
      //     containing a fresh/deleted path (hardlink-carry for the rest);
      //  2. the merge-reduce runs only over the output ids whose
      //     contributions moved (retained contributions of those ids are
      //     re-read from the cache; everything else is never decoded);
      //  3. the output commit carries unchanged rows straight from the
      //     previous snapshot (byte-identical by the hash-gate argument:
      //     unchanged contributions reduce to the same value) and
      //     hash-gates only the changed ids.
      // The gate itself stays O(corpus metadata) — one full-outer join of
      // narrow (path, version) rows — which is the irreducible cost of
      // detecting new and deleted records.

      // ---- freshness gate (reference: lens.js:134-190 — version-gated
      //      recompute, cache retain). ONE full-outer join against the
      //      cache's seen rows classifies every path — fresh (new or
      //      version-bumped), retained (cached and unchanged), deleted
      //      (cached only). Schema pinned: we wrote this parquet; skips
      //      the footer-infer job. `pbucket` (when the cache is
      //      partitioned) arrives as a discovered partition column.
      val cacheRaw = spark.read.schema(emitEnc.schema).parquet(cacheDir.toString)
      val emitCols = emitEnc.schema.fieldNames.toSeq.map(col)
      val cache = cacheRaw.select(emitCols: _*).as[BuildEmit](emitEnc)
      val pbuckets = readPBuckets(cacheDirFp).getOrElse(1)
      val usePB = pbuckets > 1 && cacheRaw.columns.contains("pbucket")
      val seen = cache.filter(col("kind") === "seen")
        .select(col("path"), col("inVersion").as("cachedV"))
      val gate = current.join(seen, Seq("path"), "full_outer")
        .withColumn("isCur", col("version").isNotNull) // RecordRow.version is non-null
        .withColumn("isFresh", col("isCur") &&
          (col("cachedV").isNull || col("cachedV") < col("version")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      gatePersisted = Some(gate)
      val changed = gate.filter(col("isFresh") || !col("isCur"))
      // ONE small job over the persisted gate answers the no-op probe
      // AND names the cache buckets the rewrite must touch (replaces the
      // previous separate nFresh/nDeleted aggregate)
      val pbOf =
        if (usePB) pmod(xxhash64(col("path")), lit(pbuckets.toLong)) else lit(0L)
      val touched = changed.select(pbOf.as("pb")).distinct().as[Long].collect().toSet
      if (touched.isEmpty) {
        // record-versions unchanged though collection versions moved
        // (identical rewrites bump only the latter): advance the
        // manifest so the NEXT build takes the zero-job fast path
        inputVersionsNow.foreach(writeInputVersions(cacheDirFp, _, pbuckets))
        return out.meta.version // no-op
      }
      val changedPaths = changed.select("path")
      val freshEmits = mapEmits(gate.filter(col("isFresh")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      freshPersisted = Some(freshEmits)

      // ---- cache copy-on-write: rewrite ONLY the touched pbuckets
      //      (retained rows of those buckets + all fresh emits — a fresh
      //      path's emits land in its own path-hash bucket, so the delta
      //      frame covers exactly the touched dirs); every untouched
      //      bucket dir carries forward by hardlink. The retained-row
      //      classification is an ANTI-join against the DELTA-SIZED
      //      changed-path set (broadcastable), not a semi-join against
      //      the O(corpus) retain set the previous shape shuffled.
      val retainSrc =
        if (usePB) cacheRaw.filter(col("pbucket").isin(touched.toSeq: _*))
          .select(emitCols: _*)
        else cache.toDF()
      val retainedTouched = retainSrc.join(changedPaths, Seq("path"), "left_anti")
      // At pbuckets == 1 the delta IS the whole next cache (retained ∪
      // fresh) — persist it so the cache write's materialization also
      // serves the reduce below, which then never re-scans the previous
      // cache parquet (r18: one fewer scan + anti-join leg per build).
      val deltaRaw = retainedTouched.unionByName(freshEmits.toDF())
      val delta =
        if (pbuckets == 1) {
          val d = deltaRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          deltaPersisted = Some(d)
          d
        } else deltaRaw
      // Amortized rebalance (r18, VERDICT r17 Next #1): the delta frame
      // is a no-shuffle cache scan (broadcast anti-join) plus the AQE-
      // coalesced fresh emits — a handful of partitions — so paying a
      // rebalance SHUFFLE on every incremental build only re-compacted
      // an already-small file set. Compact only once the cache has
      // actually accumulated files past the threshold (~+2 per build).
      val cacheParquets = graft.core.Fs.list(cacheDir)
        .count(_.getFileName.toString.endsWith(".parquet"))
      // Overlap the cache write + hardlink carry with the reduce/commit
      // below (r18, guide §2.6): independent until the manifest swap,
      // exactly-once map calls via the persist's per-partition block
      // locks (the full-build rationale above).
      val cacheWritten = runCacheWrite(spark) {
        writeCache(
          if (pbuckets == 1 && cacheParquets > graft.store.Store.RebalanceFileThreshold)
            delta.hint("rebalance")
          else delta,
          cacheNext, pbuckets)
        if (usePB) carryCacheBuckets(cacheDir, cacheNext, touched)
      }

      // ---- changed output ids (delta-scaled): an id's reduced value can
      //      move only if some contribution to it did — it appears in the
      //      NEW emits of a fresh path, or in the CACHED emits of a
      //      fresh-or-deleted path (old contributions of an updated path
      //      may shrink; a fully-deleted path may vanish its ids, which
      //      the carry below must not resurrect). The cached-emits leg
      //      only needs the TOUCHED buckets' rows (a changed path hashes
      //      to a touched bucket by definition), so it reads retainSrc —
      //      on a partitioned cache that is a pbucket-pruned scan, not
      //      the full cache (r18).
      val cacheOuts = cache.filter(col("kind") === "out")
      val changedOutIds = freshEmits.toDF().filter(col("kind") === "out")
        .select(col("outId").as("id"))
        .unionByName(retainSrc.filter(col("kind") === "out")
          .join(changedPaths, Seq("path"), "left_semi")
          .select(col("outId").as("id")))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      idsPersisted = Some(changedOutIds)

      // ---- delta reduce: contributions of the changed ids only —
      //      retained cache rows (anti the changed paths) semi-joined to
      //      the changed-id set, plus every fresh emit. Unchanged ids are
      //      never decoded, merged, or re-hashed. At pbuckets == 1 the
      //      persisted delta already holds exactly (retained ∪ fresh),
      //      so the semi-join over it IS that set — the fresh emits must
      //      not be unioned again (every fresh out's id is in
      //      changedOutIds by construction).
      val contrib =
        (if (pbuckets == 1)
          delta.filter(col("kind") === "out")
            .join(changedOutIds.select(col("id").as("outId")), Seq("outId"), "left_semi")
        else
          cacheOuts.join(changedPaths, Seq("path"), "left_anti")
            .join(changedOutIds.select(col("id").as("outId")), Seq("outId"), "left_semi")
            .unionByName(freshEmits.toDF().filter(col("kind") === "out")))
          .select(emitCols: _*).as[BuildEmit](emitEnc)
      val reducedChanged = reduceOuts(contrib)

      // ---- hash-gated materialize over the delta; everything else is
      //      carried byte-identical from the previous output snapshot.
      //      commitPrepared gets the changed-id set so a bucketed output
      //      rewrites only the touched id-buckets (the writeEntriesDF COW
      //      profile, for lens commits too) — at 100 TB the difference
      //      between rewriting the whole derived collection per
      //      incremental tick and rewriting 1/B of it.
      val newVersion = out.nextVersion
      val old = out.toDF
      val carried = old.join(changedOutIds, Seq("id"), "left_anti")
        .select(col("id"), col("version"), col("hash"), col("links"), col("value"))
      val oldChanged = old.join(changedOutIds, Seq("id"), "left_semi")
        .select(col("id"), col("version").as("old_version"),
          col("hash").as("old_hash"))
      val gated = reducedChanged.join(oldChanged, Seq("id"), "left")
        .withColumn("version",
          when(col("old_hash") === col("hash"), col("old_version"))
            .otherwise(lit(newVersion)))
        .select(col("id"), col("version"), col("hash"), col("links"), col("value"))
      val rows = carried.unionByName(gated).as[RecordRow]
      val committed = out.commitPrepared(rows, Some(changedOutIds))
      scala.concurrent.Await.result(cacheWritten,
        scala.concurrent.duration.Duration.Inf)
      // the fast-path manifest rides the cache swap (atomic with it)
      inputVersionsNow.foreach(writeInputVersions(cacheNext, _, pbuckets))
      swapDir(cacheNext, cacheDir)
      committed
    }
    // (logs need no write of their own — Lens.logsOf serves them from
    // the cache parquet the spool becomes, reference lens.js:87-92)
    v
    } finally {
      gatePersisted.foreach(_.unpersist(blocking = false))
      freshPersisted.foreach(_.unpersist(blocking = false))
      idsPersisted.foreach(_.unpersist(blocking = false))
      deltaPersisted.foreach(_.unpersist(blocking = false))
    }
  }

  /** Executor for the cache-write leg that overlaps the reduce+commit
    * inside one build (guide §2.6). Daemon cached pool: builds are
    * serialized per lens by their callers, so at most one write per
    * in-flight build; threads idle out after use. */
  private val sideEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-lens-cache-write")
        t.setDaemon(true)
        t
      }))

  /** Run the cache-write leg — concurrent with the caller's reduce+
    * commit when `graft.lens.overlapCacheWrite` (default true) allows;
    * inline otherwise. The knob exists for contention studies: the
    * overlap wins when the two legs underfill the cluster (the bench's
    * small-build regime), and can lose when both legs are
    * cluster-saturating and memory-bound. */
  private def runCacheWrite(spark: org.apache.spark.sql.SparkSession)(
      body: => Unit): scala.concurrent.Future[Unit] =
    if (spark.conf.get("graft.lens.overlapCacheWrite", "true") == "true")
      scala.concurrent.Future(body)(sideEc)
    else { body; scala.concurrent.Future.successful(()) }

  /** Cache-layout write: `pbuckets` > 1 hashes rows into `pbucket=k`
    * partition dirs on the input path — one shuffle keyed on the bucket
    * (so each bucket lands in exactly one task → one file per bucket,
    * never tasks × buckets small files), then a partitioned write. At
    * `pbuckets == 1` the layout is a plain parquet dir, exactly the
    * pre-COW shape. */
  private def writeCache(df: DataFrame, dest: Path, pbuckets: Int): Unit =
    if (pbuckets > 1)
      df.withColumn("pbucket", pmod(xxhash64(col("path")), lit(pbuckets.toLong)))
        .repartition(col("pbucket"))
        .write.mode("overwrite").partitionBy("pbucket").parquet(dest.toString)
    else
      // pbuckets == 1: plain layout; callers rebalance the frame FIRST
      // (full builds below their persist, so one shuffle serves both the
      // write and the reduce) — otherwise the cache inherits
      // (cache-scan ∪ map) parallelism as its file count and fragments
      // compounding (measured ~65 files of a 5 000-row spool by the
      // second build, every later gate/reduce scan scheduling a task
      // per file)
      df.write.mode("overwrite").parquet(dest.toString)

  /** Hardlink-carry every untouched `pbucket=k` dir of the previous
    * cache generation into the next — the COW half of the cache swap,
    * O(#files) metadata work (the bucketed-snapshot carryBuckets
    * profile). */
  private def carryCacheBuckets(from: Path, to: Path, skip: Set[Long]): Unit =
    graft.core.Fs.linkOrCopyDirs(
      graft.core.Fs.list(from).flatMap { p =>
        val n = p.getFileName.toString
        if (!n.startsWith("pbucket=")) None
        else n.stripPrefix("pbucket=").toLongOption.collect {
          case k if !skip(k) => (p, to.resolve(n))
        }
      })

  /** Cache partition count for a full (re)write: explicit
    * `graft.lens.cachePartitions` session conf wins; otherwise derived
    * from the current input snapshot bytes at ~64 MB of input per
    * bucket, so the granularity a single-record commit rewrites stays
    * bounded as the corpus grows. 1 at bench scale (a partitioned
    * layout would only fragment a tiny cache into per-bucket files);
    * capped so the directory count stays filesystem-friendly. */
  private val TargetCacheBucketBytes = 64L * 1024 * 1024
  private val MaxCacheBuckets = 65536
  private def derivePBuckets(lens: Lens): Int = {
    val conf = lens.store.spark.conf.get("graft.lens.cachePartitions", "auto")
    conf.toIntOption.filter(_ >= 1).getOrElse {
      val bytes = lens.inputs.map { p =>
        try lens.store.collection(DataPath(p.source, p.author, p.name))
          .currentSnapshotBytes
        catch { case _: Throwable => 0L } // missing input: the scan throws later, as before
      }.sum
      math.min(MaxCacheBuckets.toLong, bytes / TargetCacheBucketBytes + 1).toInt
    }
  }

  private def swapDir(tmp: Path, dst: Path): Unit = {
    graft.core.Fs.rmTree(dst)
    Files.move(tmp, dst)
  }

  /** input-collection versions the cache was built against — the
    * zero-job no-op fast path's manifest (doBuild step 0) — plus the
    * cache's pbucket count under [[PBucketsKey]] (can't collide with a
    * collection path, which always starts with '/'). Lives inside the
    * cache dir so the atomic swap keeps cache and manifest consistent;
    * absent/corrupt reads fall back to the gate query / the
    * unpartitioned-layout full rewrite. */
  private def inputVersionsFile(cacheDir: Path): Path =
    // underscore prefix: Spark/Hadoop file listings ignore `_*` files,
    // so the parquet reads over the cache dir never see the manifest
    cacheDir.resolve("_input_versions.json")

  private val PBucketsKey = "__pbuckets"

  private[lens] def readPBuckets(cacheDir: Path): Option[Int] =
    try {
      val f = inputVersionsFile(cacheDir)
      if (!Files.isRegularFile(f)) None
      else ("\"" + PBucketsKey + "\":(\\d+)").r
        .findFirstMatchIn(Files.readString(f)).map(_.group(1).toInt)
    } catch { case _: Throwable => None }

  private def readInputVersions(cacheDir: Path): Option[Map[String, Long]] =
    try {
      val f = inputVersionsFile(cacheDir)
      if (!Files.isRegularFile(f)) None
      else {
        val s = Files.readString(f)
        val re = """"((?:[^"\\]|\\.)*)":(\d+)""".r
        // single left-to-right unescape pass (ADVICE r16): sequential
        // replace() mis-decodes a literal backslash-then-quote key
        // (\\\" would unescape the quote first, then fuse the escapes)
        def unescape(k: String): String = {
          val sb = new java.lang.StringBuilder(k.length)
          var i = 0
          while (i < k.length) {
            val c = k.charAt(i)
            if (c == '\\' && i + 1 < k.length) {
              k.charAt(i + 1) match {
                case 'n' => sb.append('\n'); case 't' => sb.append('\t')
                case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
                case 'f' => sb.append('\f')
                case 'u' if i + 5 < k.length =>
                  sb.append(Integer.parseInt(k.substring(i + 2, i + 6), 16).toChar)
                  i += 4
                case other => sb.append(other)
              }
              i += 2
            } else { sb.append(c); i += 1 }
          }
          sb.toString
        }
        Some(re.findAllMatchIn(s).map { m =>
          unescape(m.group(1)) -> m.group(2).toLong
        }.toMap - PBucketsKey) // the layout key is not an input version
      }
    } catch { case _: Throwable => None }

  private def writeInputVersions(cacheDir: Path, vs: Map[String, Long],
                                 pbuckets: Int): Unit =
    try {
      val json = (vs.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${graft.Verify.jsonString(k)}:$v" } :+
        s""""$PBucketsKey":$pbuckets""")
        .mkString("{", ",", "}")
      Files.writeString(inputVersionsFile(cacheDir), json)
    } catch { case _: Throwable => () } // best-effort: absence = gate path
}
