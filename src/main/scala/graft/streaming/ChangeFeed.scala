package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

import graft.store.{DataPath, Store}

/** Durable change feed — the commit log behind S12 (reference:
  * library/utility/update-events.js:7-14 is an in-process event bus; a
  * Spark engine wants the same events REPLAYABLE, so every commit
  * appends one JSON file to `_commits/`, which doubles as a Structured
  * Streaming file source: `readStream` over the log is the SSE stream,
  * `foreachBatch` over it is the lens-rebuild trigger, and late
  * subscribers can catch up from any point (the `?at=` pull-sync
  * protocol's push-side complement).
  *
  * One small file per commit: the file-source contract (files are
  * immutable once visible) is exactly the commit contract, and commit
  * rates are human-scale (the reference serializes commits globally).
  */
final class CommitLog(store: Store) {
  private val seq = new AtomicLong(0)

  private def dir: Path = Paths.get(store.root, "_commits")

  /** install: every commit of this store appends to the log */
  def install(): CommitLog = {
    store.onCommit((p, v) => append(p, v))
    this
  }

  def append(path: DataPath, version: Long): Unit = {
    Files.createDirectories(dir)
    val ts = System.currentTimeMillis()
    val n = seq.incrementAndGet()
    val line =
      s"""{"path":"${path.collectionPath}","source":"${path.source}","author":"${path.author}","name":"${path.name}","version":$version,"ts":$ts,"seq":$n}"""
    val tmp = dir.resolve(s".tmp-$ts-$n")
    Files.write(tmp, (line + "\n").getBytes(UTF_8))
    // atomic rename: the file source must never see a partial file
    Files.move(tmp, dir.resolve(f"commit-$ts%013d-$n%06d.json"),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** All commits so far, batch view (ordered by event file). */
  def batch: DataFrame =
    store.spark.read.schema(CommitLog.schema).json(dir.toString)

  /** The live stream: `readStream` over the log. Compose with
    * `.writeStream.foreachBatch(...)` for cascading rebuilds or any
    * push-sync sink. */
  def stream: DataFrame = {
    Files.createDirectories(dir)
    store.spark.readStream.schema(CommitLog.schema).json(dir.toString)
  }

  /** Driver-side event iterator (the SSE framing of
    * export-controller.js:153-176) for an HTTP layer: events appended
    * after the (afterTs, afterSeq) cursor, in log order.
    *
    * Multiple commits can land in one millisecond (the seq suffix in
    * the file name exists for exactly that), so a timestamp alone is
    * not a safe resume point. A client that tracks the full cursor
    * (the `ts`/`seq` fields on every event) resumes exactly-once; a
    * client with only a timestamp gets `>=` semantics on that
    * millisecond (at-least-once — dedup by (path, version)) instead of
    * silently losing same-ms events. */
  def eventsSince(afterTs: Long, afterSeq: Long = -1L): Seq[String] =
    eventsSinceCursor(afterTs, afterSeq).map(_._2)

  /** As eventsSince, but each event carries its (ts, seq) cursor so a
    * long-lived consumer (the SSE route) can resume-poll exactly. */
  def eventsSinceCursor(afterTs: Long, afterSeq: Long): Seq[((Long, Long), String)] =
    if (!Files.isDirectory(dir)) Seq.empty
    else graft.core.Fs.list(dir).iterator
      .filter(p => p.getFileName.toString.startsWith("commit-"))
      .toSeq.sortBy(_.getFileName.toString)
      .flatMap { p =>
        val name = p.getFileName.toString
        val parts = name.stripPrefix("commit-").stripSuffix(".json").split("-")
        val ts = parts(0).toLong
        val seqN = parts(1).toLong
        if (ts > afterTs || (ts == afterTs && seqN > afterSeq))
          Some(((ts, seqN), new String(Files.readAllBytes(p), UTF_8).trim))
        else None
      }

  /** The newest event's (ts, seq), or (0, -1) on an empty log — the
    * "subscribe from now" starting cursor. */
  def latestCursor: (Long, Long) =
    if (!Files.isDirectory(dir)) (0L, -1L)
    else {
      val names = graft.core.Fs.list(dir).iterator
        .map(_.getFileName.toString).filter(_.startsWith("commit-")).toSeq
      if (names.isEmpty) (0L, -1L)
      else {
        val parts = names.max.stripPrefix("commit-").stripSuffix(".json").split("-")
        (parts(0).toLong, parts(1).toLong)
      }
    }
}

object CommitLog {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType), StructField("source", StringType),
    StructField("author", StringType), StructField("name", StringType),
    StructField("version", LongType), StructField("ts", LongType),
    StructField("seq", LongType)))
}
