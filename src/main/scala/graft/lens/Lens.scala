package graft.lens

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{Cbor, NaturalOrder, Reduce, RecordStructure}
import graft.store.{Collection, DataPath, RecordRow, Store}

/** One row of the spooled map stage — outputs, logs and errors share a
  * scratch dataset discriminated by `kind` ("out" | "log" | "err"), the
  * Spark analogue of the reference's per-input compute-cache entries
  * `{logs, errors, outputs}` (reference: library/models/lens.js:163).
  * `ord`/`natKey`/`outIdx` fix the reduce order: lens-input ordinal, then
  * natural record-id order within an input, then emit order within one
  * map call — the reduce lattice is order-sensitive (SURVEY §2.5).
  */
final case class BuildEmit(kind: String, path: String, ord: Int,
                           natKey: String, outIdx: Int, outId: String,
                           value: Array[Byte], logKind: String,
                           logArgs: Seq[String], errType: String,
                           errMsg: String)

/** A lens: a materialized view defined by a [[MapFn]] over 1..n input
  * collections, reduced by the fixed system merge lattice
  * (reference: library/models/lens.js:1-27). The output is an ordinary
  * versioned [[Collection]] under /lenses/, so lenses compose (a lens can
  * read another lens's output).
  */
final class Lens(val store: Store, val author: String, val name: String,
                 val inputs: Seq[DataPath], val fn: MapFn) {
  require(inputs.nonEmpty, "a lens needs at least one input")

  val path: DataPath = DataPath("lenses", author, name)
  def output: Collection = store.collection(path)

  def create(): Lens = { output.create(); this }
  def exists: Boolean = output.exists

  private def logsDir: Path = store.dir(path).resolve("logs")

  /** Per-input logs and captured errors of the last build
    * (reference: lens.js:87-92 iterateLogs). Columns:
    * path, kind, logKind, logArgs, errType, errMsg. */
  def logs: DataFrame = {
    val spark = store.spark
    if (Files.isDirectory(logsDir))
      spark.read.parquet(logsDir.toString)
        .select("path", "kind", "logKind", "logArgs", "errType", "errMsg")
    else spark.emptyDataset(org.apache.spark.sql.Encoders.product[BuildEmit])
      .toDF().select("path", "kind", "logKind", "logArgs", "errType", "errMsg")
  }

  /** Full rebuild (SURVEY §2.6; incremental arrives in engine.incremental):
    * scan inputs (union-distinct by record path, first input wins) →
    * flatMap the map function with log/error capture → spool → ordered
    * merge-reduce per output id → hash-gated materialize into the output
    * collection. Returns the output collection's new version. */
  def build(): Long = LensBuild.fullBuild(this)

  private[lens] def scratchDir: Path = store.dir(path).resolve("scratch")
  private[lens] def logsDirPath: Path = logsDir
}

object LensBuild {

  def fullBuild(lens: Lens): Long = {
    val store = lens.store
    val spark = store.spark
    import spark.implicits._

    // ---- 1. input scan: per-input ordinal, record filter (F1), then
    //         union-distinct by record path keeping the FIRST input's copy
    //         (reference: lens.js:119-132 inputRecordPaths dedup)
    val perInput = lens.inputs.zipWithIndex.map { case (p, i) =>
      val coll = store.collection(DataPath(p.source, p.author, p.name))
      var df = coll.toDF.select(col("id"), col("value"))
      p.recordID.foreach(rid => df = df.filter(col("id") === lit(rid)))
      df.withColumn("ord", lit(i))
        .withColumn("source", lit(p.source))
        .withColumn("author", lit(p.author))
        .withColumn("cname", lit(p.name))
    }
    val unioned = perInput.reduce(_ unionByName _)
    val byPath = Window.partitionBy(col("source"), col("author"), col("cname"), col("id"))
      .orderBy(col("ord"))
    val deduped = unioned
      .withColumn("rn", row_number().over(byPath))
      .filter(col("rn") === 1).drop("rn")

    // ---- 2. map stage: executor-side flatMap with log/error capture,
    //         spooled to scratch (the reference spools to a scratch file:
    //         lens.js:151-160) so outputs and logs come from ONE map pass
    val fn = lens.fn
    val emits: Dataset[BuildEmit] = deduped
      .select("id", "value", "ord", "source", "author", "cname")
      .as[(String, Array[Byte], Int, String, String, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes, ord, source, author, cname) =>
          val mp = MapPath(s"/$source/$author:$cname/records/$id",
            source, author, cname, id)
          val res = MapRunner.run(fn, mp, Cbor.decode(bytes))
          val nk = NaturalOrder.naturalKey(id)
          val outs = res.outputs.zipWithIndex.map { case ((oid, v), idx) =>
            BuildEmit("out", mp.string, ord, nk, idx, oid, Cbor.encode(v),
              null, null, null, null)
          }
          val logs = res.logs.map(l =>
            BuildEmit("log", mp.string, ord, nk, 0, null, null,
              l.kind, l.args, null, null))
          val errs = res.error.map(e =>
            BuildEmit("err", mp.string, ord, nk, 0, null, null,
              null, null, e.errType, e.message))
          outs ++ logs ++ errs
        }
      }

    val scratch = lens.scratchDir
    emits.write.mode("overwrite").parquet(scratch.toString)
    val spooled = spark.read.parquet(scratch.toString).as[BuildEmit]

    // ---- 3. ordered merge-reduce per output id: one shuffle on the id,
    //         values folded in (input ordinal, natural record order, emit
    //         order) — exact reference semantics (lens.js:204-215)
    val reduced: Dataset[(String, Array[Byte], String, Seq[String])] =
      spooled.filter(col("kind") === "out")
        .groupByKey(_.outId)
        .flatMapSortedGroups(col("ord"), col("natKey"), col("outIdx")) {
          (id: String, it: Iterator[BuildEmit]) =>
            val merged = it.map(e => Cbor.decode(e.value)).reduceLeft(Reduce.merge)
            Iterator((id, Cbor.encode(merged), Cbor.hash(merged),
              RecordStructure.listHashURLs(merged): Seq[String]))
        }

    // ---- 4. hash-gated materialize: unchanged output records keep their
    //         version (same gate as a dataset commit)
    val out = lens.output
    val newVersion = out.nextVersion
    val old = out.toDF.select(col("id"), col("version").as("old_version"),
      col("hash").as("old_hash"))
    val rows = reduced.toDF("id", "value", "hash", "links")
      .join(old, Seq("id"), "left")
      .withColumn("version",
        when(col("old_hash") === col("hash"), col("old_version"))
          .otherwise(lit(newVersion)))
      .select(col("id"), col("version"), col("hash"), col("links"), col("value"))
      .as[RecordRow]

    // ---- 5. logs store for this build (reference keeps logs queryable
    //         per input path: lens.js:87-92)
    val logsTmp = lens.logsDirPath.resolveSibling("logs-next")
    spooled.filter(col("kind") =!= "out").toDF()
      .write.mode("overwrite").parquet(logsTmp.toString)

    val v = out.commitPrepared(rows)

    swapDir(logsTmp, lens.logsDirPath)
    deleteDir(scratch)
    v
  }

  private def swapDir(tmp: Path, dst: Path): Unit = {
    deleteDir(dst)
    Files.move(tmp, dst)
  }

  private def deleteDir(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteDir)
    Files.deleteIfExists(p)
  }
}
