package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.lens.Lens
import graft.store.Store

/** Commit-log-driven lens maintenance — the MULTI-PROCESS scale form of
  * [[graft.lens.LensHub]].
  *
  * `LensHub` keeps lenses fresh via in-JVM `store.onCommit` callbacks:
  * correct when the writer and the lens builder are the same process.
  * On a real cluster they usually are not — ingest jobs commit from one
  * driver while a standing maintenance job owns lens builds. This class
  * is that standing job: a Structured Streaming query over the DURABLE
  * commit log (`CommitLog.stream` — the same JSON file source the SSE
  * feed rides), `foreachBatch` → incremental `Lens.build()` for every
  * lens whose inputs the batch touched. Every PROCESS that writes the
  * shared log (the ingest driver, and this process — lens builds
  * commit their outputs) must construct its CommitLog with
  * `soleWriter = false`: cross-process append collision handling and
  * scan-served reads (see the CommitLog class doc).
  *
  * Semantics under the log's delivery guarantees:
  *   - At-least-once is sufficient: `build()` is version-gated
  *     incremental — a re-delivered (or compaction-re-presented) event
  *     triggers a build that sees no fresh inputs and returns without
  *     committing (LensBuild's no-op early return). No dedup state is
  *     needed, so the maintainer itself is stateless and restart-safe:
  *     the stream checkpoint (file-source offsets) is the only state.
  *   - Lens-on-lens DAGs settle through the log itself: a build commits
  *     its output collection, that commit appends to the log, and the
  *     NEXT micro-batch triggers the dependents — topological waves
  *     without any in-process DAG bookkeeping. Run ONE maintainer per
  *     lens: the store's commit locks are in-JVM, so two maintainer
  *     PROCESSES building the same lens concurrently would race the
  *     snapshot swap (partition the lens set, or run one maintainer —
  *     the log itself is multi-writer-safe, see CommitLog.append).
  *   - Self-cycles (a lens listed among its own inputs) are rejected at
  *     registration — with a trigger-per-commit loop they would rebuild
  *     forever.
  *
  * Catch-up vs continuous: [[runOnce]] drains everything committed so
  * far (Trigger.AvailableNow) and returns — the cron/batch form;
  * [[start]] polls on an interval — the standing-job form.
  */
final class LensMaintainer(log: CommitLog, lenses: Seq[Lens],
                           checkpointDir: String) {

  lenses.foreach { l =>
    require(!l.inputs.exists(_.collectionPath == l.path.collectionPath),
      s"lens ${l.path.collectionPath} reads its own output: a log-driven " +
        "maintainer would rebuild it on every build it performs")
  }

  /** input collectionPath → lenses reading it (one lens may appear under
    * several inputs; builds below dedupe by lens). */
  private val byInput: Map[String, Seq[Lens]] =
    lenses.flatMap(l => l.inputs.map(_.collectionPath -> l))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

  /** Lenses whose last build attempt threw — re-attempted on EVERY
    * subsequent micro-batch (not only when their inputs are touched
    * again). Guarded by the foreachBatch serial execution (one batch at
    * a time per query).
    *
    * SEEDED WITH ALL LENSES: the set is in-memory, and a failed build's
    * triggering batch has already committed its checkpoint — after a
    * restart the event will never replay, so a fresh maintainer
    * reconciles EVERYTHING on its first batch instead. Settled lenses
    * make that a version-gated no-op (two cheap emptiness probes each);
    * stale ones — from a pre-restart failure or from commits consumed
    * by a checkpoint that predates this lens's registration — rebuild.
    * Known residual: micro-batches only fire on new commits, so a
    * transiently-failed build on a then-quiescent log heals at the next
    * commit or the next maintainer start, not on a timer. */
  private val retry = scala.collection.mutable.LinkedHashSet[Lens](lenses: _*)

  /** One micro-batch: distinct touched paths (bounded by the number of
    * collections, not the number of commits — the driver collect is
    * safe), then ONE incremental build per dependent lens.
    *
    * Failure isolation: a throwing build must not fail the batch — the
    * stream checkpoint would then replay the same batch forever and one
    * poison lens would halt maintenance for every other lens (the
    * LensHub parallel path collects sibling failures for the same
    * reason, Lens.scala). Failures are logged, the lens is queued for
    * re-attempt on every following batch, and the batch commits. */
  private def onBatch(batch: DataFrame, batchId: Long): Unit = {
    val touched = batch.select("path").distinct()
      .collect().map(_.getString(0))
    val dependents =
      (touched.flatMap(p => byInput.getOrElse(p, Nil)) ++ retry).distinct
    dependents.foreach { l =>
      try { l.build(); retry -= l }
      catch {
        case scala.util.control.NonFatal(e) =>
          retry += l
          System.err.println(
            s"[lens-maintainer] build of ${l.path.collectionPath} failed " +
              s"(will re-attempt next batch): $e")
      }
    }
  }

  private def query(trigger: Trigger): StreamingQuery =
    log.stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(onBatch _)
      .trigger(trigger)
      .start()

  /** Drain all commits logged so far, then return. AvailableNow
    * snapshots the source offsets at start, so commits produced by this
    * run's own builds are NOT consumed by it — a lens-on-lens DAG
    * settles with one runOnce() per DAG level (each level's builds are
    * version-gated no-ops once settled, so over-calling is cheap and
    * converges). The continuous [[start]] form settles DAGs without
    * help, one micro-batch per level. */
  def runOnce(): Unit = {
    val q = query(Trigger.AvailableNow())
    try q.awaitTermination() finally q.stop()
  }

  /** Standing maintenance job, polling the log every `intervalMs`. */
  def start(intervalMs: Long = 1000L): StreamingQuery =
    query(Trigger.ProcessingTime(intervalMs))
}

object LensMaintainer {
  /** Every persisted lens config in the store, reconstructed via
    * [[graft.lens.Lens.fromConfig]]. Returns `(runnable, skipped)`:
    * skipped collectionPaths either failed to resolve in THIS process
    * (Scala class not on the classpath, code no longer parses, missing/
    * malformed lens.json) or read their own output (a log-driven
    * maintainer would rebuild such a lens forever). Callers decide
    * whether skipped is an error; [[fromStore]] proceeds without them —
    * a maintainer deployment should keep the healthy lenses fresh even
    * when one config is broken. */
  def storedLenses(store: Store): (Seq[Lens], Seq[String]) = {
    val paths = for {
      author <- store.listAuthors("lenses")
      name <- store.listCollections("lenses", author)
    } yield (author, name)
    val (ok, bad) = paths.map { case (author, name) =>
      Lens.fromConfig(store, author, name)
        .filter(l => !l.inputs.exists(_.collectionPath == l.path.collectionPath))
        .toRight(s"/lenses/$author:$name")
    }.partition(_.isRight)
    (ok.flatMap(_.toOption), bad.collect { case Left(p) => p })
  }

  /** The multi-process deployment entry: a maintainer that discovers
    * its lens set from the store's persisted configs — it owns nothing
    * but the store path and a checkpoint dir, so an ingest process and
    * a maintainer process need share no code or wiring beyond the
    * filesystem (reference: the lens worker pool serving whatever
    * lenses the models directory holds, worker-server.js:7-12). */
  def fromStore(store: Store, log: CommitLog, checkpointDir: String): LensMaintainer =
    new LensMaintainer(log, storedLenses(store)._1, checkpointDir)
}
