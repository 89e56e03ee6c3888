package graft.lens

import scala.collection.immutable.VectorMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.expr

import graft.core._
import graft.expressions.GraftFunctions
import graft.store.{DataPath, Store}

/** Ephemeral lens — the ad-hoc query path (reference:
  * library/controllers/lens-controller.js:191-218): create a throwaway
  * lens under `system:ephemeral-<suffix>`, build it, stream out all logs
  * then all records, then delete everything. Response framing matches
  * docs/api/lenses.md:82-137: `{log: {...}}` objects first, then
  * `{record: {id, version, hash, data}}` objects.
  */
object EphemeralLens {

  /** Loan-pattern streaming run — the serving shape (the reference
    * streams the response: lens-controller.js:205-208). Builds the
    * throwaway lens, hands `consume` a LAZY frame iterator (log frames
    * then record frames), and drops the lens after `consume` returns —
    * the reference's `finally: lens.delete` (lens-controller.js:215-217).
    *
    * Both frame sections iterate via `toLocalIterator`: the natural-order
    * sort runs on the cluster (codegen'd `natural_key` range-partitioned
    * sort) and the driver holds at most one partition of output at a
    * time, so an ephemeral lens over a huge input streams in O(partition)
    * driver memory — never a full collect. */
  /** `sandbox = true` runs every map call under the PREEMPTIVE budget
    * (MapRunner.runSandboxed, the reference's 50 ms + 256 MB isolate
    * caps) — REQUIRED when the map came over the wire: a DSL spec can
    * smuggle compute bombs the cooperative deadline never sees (e.g. a
    * catastrophically-backtracking split regex pins a core between
    * emit checkpoints). A preempted call records the error and loses
    * its outputs, like an isolate kill. */
  def stream[A](store: Store, inputs: Seq[DataPath], fn: MapFn,
                suffix: String = java.util.UUID.randomUUID().toString.take(8),
                sandbox: Boolean = false,
                sandboxMs: Long = MapRunner.DefaultTimeoutMs,
                sandboxMemCap: Long = MapRunner.DefaultMemCapBytes)
               (consume: Iterator[PoValue] => A): A = {
    val base = new Lens(store, "system", s"ephemeral-$suffix", inputs, fn)
    val lens = if (sandbox) base.withSandbox(sandboxMs, sandboxMemCap) else base
    require(!lens.exists, s"ephemeral lens collision: ${lens.path.encoded}")
    lens.create()
    try {
      lens.build()
      GraftFunctions.register(store.spark)
      val logFrames = lens.logs.toLocalIterator().asScala.map { r =>
        val kind = r.getAs[String]("kind")
        val body: Vector[(String, PoValue)] =
          Vector("path" -> PoStr(r.getAs[String]("path"))) ++ (kind match {
            case "log" =>
              Vector("type" -> PoStr(r.getAs[String]("logKind")),
                "args" -> PoArr(Option(r.getAs[Seq[String]]("logArgs"))
                  .getOrElse(Seq.empty).map(PoStr.apply).toVector))
            case _ =>
              Vector("type" -> PoStr("error"),
                "error" -> PoObj(
                  "type" -> PoStr(r.getAs[String]("errType")),
                  "message" -> PoStr(r.getAs[String]("errMsg"))))
          })
        PoObj("log" -> PoObj(VectorMap.from(body)))
      }
      val recordFrames = lens.output.records
        .orderBy(expr("natural_key(id)"))
        .toLocalIterator().asScala
        .map { r =>
          PoObj("record" -> PoObj(
            "id" -> PoStr(r.id),
            "version" -> PoInt(r.version),
            "hash" -> PoStr(r.hash),
            "data" -> Cbor.decode(r.value)))
        }
      consume(logFrames ++ recordFrames)
    } finally {
      lens.output.drop()
    }
  }

  /** Run the map over the inputs once and return the framed output
    * materialized — the small-result convenience over [[stream]]. The
    * temp lens is deleted before returning. */
  def run(store: Store, inputs: Seq[DataPath], fn: MapFn,
          suffix: String = java.util.UUID.randomUUID().toString.take(8)): Vector[PoValue] =
    stream(store, inputs, fn, suffix)(_.toVector)
}
