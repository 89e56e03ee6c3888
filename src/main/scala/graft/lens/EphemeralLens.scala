package graft.lens

import scala.collection.immutable.VectorMap

import graft.core._
import graft.store.{DataPath, Store}

/** Ephemeral lens — the ad-hoc query path (reference:
  * library/controllers/lens-controller.js:191-218): create a throwaway
  * lens under `system:ephemeral-<suffix>`, build it, stream out all logs
  * then all records, then delete everything. Response framing matches
  * docs/api/lenses.md:82-137: `{log: {...}}` objects first, then
  * `{record: {id, version, hash, data}}` objects.
  */
object EphemeralLens {

  /** Run the map over the inputs once and return the framed output
    * stream. The temp lens is deleted before returning (the reference's
    * `finally: lens.delete`, lens-controller.js:215-217). */
  def run(store: Store, inputs: Seq[DataPath], fn: MapFn,
          suffix: String = java.util.UUID.randomUUID().toString.take(8)): Vector[PoValue] = {
    val lens = new Lens(store, "system", s"ephemeral-$suffix", inputs, fn)
    require(!lens.exists, s"ephemeral lens collision: ${lens.path.encoded}")
    lens.create()
    try {
      lens.build()
      val logFrames = lens.logs.collect().toVector.map { r =>
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
      val recordFrames = lens.output.records.collect().toVector
        .sortBy(r => NaturalOrder.naturalKey(r.id))
        .map { r =>
          PoObj("record" -> PoObj(
            "id" -> PoStr(r.id),
            "version" -> PoInt(r.version),
            "hash" -> PoStr(r.hash),
            "data" -> Cbor.decode(r.value)))
        }
      logFrames ++ recordFrames
    } finally {
      lens.output.drop()
    }
  }
}
