package graft.lens

import graft.core.PoValue

/** The path handed to a map function for each input record — mirrors the
  * reference's `{string, source, author, name, recordID}` shape
  * (reference: library/workers/javascript-lens-worker.js:126-129). */
final case class MapPath(string: String, source: String, author: String,
                         name: String, recordID: String)

/** One captured console line (`console.log/info/warn/error`), kept per
  * input as data (reference: javascript-lens-worker.js:66-73). */
final case class LogEntry(kind: String, args: Seq[String])

/** A captured thrown error — the build continues; errors are queryable
  * per input afterwards (reference: javascript-lens-worker.js:27-49,
  * lens.js:87-92). */
final case class CapturedError(errType: String, message: String)

/** Result of mapping one input record: zero or more (id, value) outputs
  * (flatMap), captured logs, and at most one captured error. Outputs
  * emitted BEFORE a throw are kept — the reference's golden lens fixture
  * depends on it (test/test-models-lens.js:39-53: record `ghi` throws
  * after emitting its tags and still appears in the index). */
final case class MapResult(outputs: Vector[(String, PoValue)],
                           logs: Vector[LogEntry],
                           error: Option[CapturedError])

/** A deterministic map function — the engine's UDF surface (SURVEY §2.4).
  * The reference executes user JavaScript in an isolate; our v1 surface
  * is deterministic Scala behind the same contract (emit via
  * `ctx.output`, logs via `ctx.log`, throw to record an error), so a JS
  * engine can slot in behind the same interface later. Implementations
  * MUST be deterministic and serializable (they run on executors).
  */
trait MapFn extends Serializable {
  def map(ctx: MapContext): Unit
}

/** Execution context for one map call: the input path + decoded value,
  * an `output(id, value)` emitter and console-style log capture
  * (reference: javascript-lens-worker.js:75-95). */
final class MapContext(val path: MapPath, val data: PoValue) {
  private val outs = Vector.newBuilder[(String, PoValue)]
  private val logBuf = Vector.newBuilder[LogEntry]

  def output(id: String, value: PoValue): Unit = {
    require(id != null && id.nonEmpty && id.length <= 10000,
      "output id must be a non-empty string of <= 10000 chars")
    outs += (id -> value)
  }
  def log(args: Any*): Unit = logBuf += LogEntry("log", args.map(String.valueOf))
  def info(args: Any*): Unit = logBuf += LogEntry("info", args.map(String.valueOf))
  def warn(args: Any*): Unit = logBuf += LogEntry("warn", args.map(String.valueOf))
  def error(args: Any*): Unit = logBuf += LogEntry("error", args.map(String.valueOf))

  private[lens] def result(err: Option[CapturedError]): MapResult =
    MapResult(outs.result(), logBuf.result(), err)
}

object MapRunner {
  /** Run one map call, capturing a thrown error as data while keeping
    * any outputs and logs emitted before the throw. */
  def run(fn: MapFn, path: MapPath, data: PoValue): MapResult = {
    val ctx = new MapContext(path, data)
    try { fn.map(ctx); ctx.result(None) }
    catch {
      case e: Throwable =>
        ctx.result(Some(CapturedError(e.getClass.getSimpleName,
          String.valueOf(e.getMessage))))
    }
  }
}
