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

/** Thrown (and captured as a per-input error) when a map call exceeds
  * its time budget — the reference's 50 ms isolate timeout
  * (package.json:82 lensTimeout, javascript-lens-worker.js:116,133). */
final class MapTimeoutException(ms: Long)
  extends RuntimeException(s"map call exceeded ${ms}ms lens timeout")

/** Thrown (and captured as a per-input error) when a sandboxed map call
  * allocates past its memory budget — the reference's 256 MB isolate
  * cap (javascript-lens-worker.js:55 memoryLimit). */
final class MapMemoryException(bytes: Long)
  extends RuntimeException(s"map call exceeded ${bytes}-byte lens memory cap")

/** Execution context for one map call: the input path + decoded value,
  * an `output(id, value)` emitter and console-style log capture
  * (reference: javascript-lens-worker.js:75-95).
  *
  * The time budget is enforced COOPERATIVELY: the deadline is checked at
  * every `output`/`log` call and once after the map returns — deliberate,
  * because preempting arbitrary Scala needs a thread per record (the
  * wrong trade inside executors); the reference pays a forked isolate
  * for preemption. A compute-only runaway map is the one case this
  * cannot stop. */
final class MapContext(val path: MapPath, val data: PoValue,
                       timeoutMs: Long = MapRunner.DefaultTimeoutMs) {
  private val outs = Vector.newBuilder[(String, PoValue)]
  private val logBuf = Vector.newBuilder[LogEntry]
  private val deadline =
    if (timeoutMs >= MapRunner.NoTimeoutMs) Long.MaxValue
    else System.nanoTime() + timeoutMs * 1000000L

  private[lens] def checkDeadline(): Unit = {
    // an abandoned sandbox worker (preempted by MapRunner.runSandboxed)
    // is interrupted; dying at the next emit/log keeps abandonment
    // cheap. Checked ONLY on sandbox threads — the cooperative path
    // runs on the Spark task thread, where a task interrupt
    // (kill/cancel/speculation) must cancel the TASK, not be swallowed
    // as a per-record data error for every remaining record.
    if (MapRunner.onSandboxThread.get() && Thread.currentThread().isInterrupted)
      throw new InterruptedException("map call preempted by sandbox")
    if (System.nanoTime() > deadline) throw new MapTimeoutException(timeoutMs)
  }

  def output(id: String, value: PoValue): Unit = {
    checkDeadline()
    require(id != null && id.nonEmpty && id.length <= 10000,
      "output id must be a non-empty string of <= 10000 chars")
    outs += (id -> value)
  }
  def log(args: Any*): Unit = { checkDeadline(); logBuf += LogEntry("log", args.map(String.valueOf)) }
  def info(args: Any*): Unit = { checkDeadline(); logBuf += LogEntry("info", args.map(String.valueOf)) }
  def warn(args: Any*): Unit = { checkDeadline(); logBuf += LogEntry("warn", args.map(String.valueOf)) }
  def error(args: Any*): Unit = { checkDeadline(); logBuf += LogEntry("error", args.map(String.valueOf)) }

  private[lens] def result(err: Option[CapturedError]): MapResult =
    MapResult(outs.result(), logBuf.result(), err)
}

object MapRunner {
  /** reference lensTimeout default (package.json:82) — the budget for
    * UNTRUSTED map code; trusted Scala lenses default to no timeout
    * (a GC pause must not spuriously drop a record's outputs). */
  val DefaultTimeoutMs: Long = 50L
  /** sentinel: at or above this, no deadline is armed */
  val NoTimeoutMs: Long = 9000000000L

  /** reference lens memory cap (javascript-lens-worker.js:55): 256 MB
    * of allocation per map call in sandboxed mode. */
  val DefaultMemCapBytes: Long = 256L * 1024 * 1024

  /** Run one map call, capturing a thrown error (including timeout) as
    * data while keeping any outputs and logs emitted before the throw. */
  def run(fn: MapFn, path: MapPath, data: PoValue,
          timeoutMs: Long = NoTimeoutMs): MapResult = {
    val ctx = new MapContext(path, data, timeoutMs)
    try {
      fn.map(ctx)
      ctx.checkDeadline()
      ctx.result(None)
    } catch {
      case e: Throwable => ctx.result(Some(toCaptured(e)))
    }
  }

  /** A JS-lens throw reports the THROWN VALUE's constructor name, the
    * way the reference does (javascript-lens-worker.js:44
    * `error.constructor.name`); host exceptions report their class. */
  private[lens] def toCaptured(e: Throwable): CapturedError = e match {
    case graft.js.JsThrown(v) =>
      CapturedError(graft.js.PoBridge.errorTypeOf(v), graft.js.Values.errorMessageOf(v))
    case other =>
      CapturedError(other.getClass.getSimpleName, String.valueOf(other.getMessage))
  }

  // --- preemptive sandbox ------------------------------------------------

  private lazy val sandboxPool = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => {
      val t = new Thread(r, "graft-map-sandbox")
      t.setDaemon(true)
      t
    })

  /** True on sandbox worker threads — scopes the interrupt checkpoint
    * in MapContext.checkDeadline to preempted sandbox calls. */
  private[lens] val onSandboxThread: ThreadLocal[java.lang.Boolean] =
    ThreadLocal.withInitial(() => java.lang.Boolean.FALSE)

  /** HotSpot's per-thread allocation counter — the JVM-native stand-in
    * for an isolate's memory limit. Null where unsupported (then only
    * the time budget is enforced preemptively). */
  private lazy val threadMx: com.sun.management.ThreadMXBean =
    java.lang.management.ManagementFactory.getThreadMXBean match {
      case mx: com.sun.management.ThreadMXBean if mx.isThreadAllocatedMemorySupported =>
        mx.setThreadAllocatedMemoryEnabled(true); mx
      case _ => null
    }

  /** Run one map call PREEMPTIVELY sandboxed — the reference's isolate
    * semantics (javascript-lens-worker.js:55,116,133): a dedicated
    * worker thread executes the map while the caller polls its clock
    * and its allocation counter; blowing either budget abandons the
    * worker and reports the error. Unlike [[run]]'s cooperative budget,
    * this stops compute-only runaway maps and allocation bombs — and,
    * like an isolate kill, a preempted call loses its partial outputs
    * (a normal throw still keeps them, same as [[run]]).
    *
    * The JVM cannot safely kill a thread, so a preempted worker is
    * interrupted and ABANDONED: it dies at its next emit/log checkpoint
    * or blocking call; a pure-compute loop that never checks leaks its
    * (daemon) thread until it finishes — the documented residual vs a
    * real isolate, bounded by one thread per preempted call. */
  def runSandboxed(fn: MapFn, path: MapPath, data: PoValue,
                   timeoutMs: Long = DefaultTimeoutMs,
                   memCapBytes: Long = DefaultMemCapBytes): MapResult = {
    val ctx = new MapContext(path, data, timeoutMs)
    val workerId = new java.util.concurrent.CompletableFuture[Long]()
    val done = new java.util.concurrent.CompletableFuture[MapResult]()
    val task = sandboxPool.submit(new Runnable {
      def run(): Unit = {
        onSandboxThread.set(java.lang.Boolean.TRUE)
        workerId.complete(Thread.currentThread().getId)
        val res =
          try { fn.map(ctx); ctx.checkDeadline(); ctx.result(None) }
          catch {
            case e: Throwable => ctx.result(Some(toCaptured(e)))
          }
        done.complete(res)
      }
    })
    val wid = workerId.get()
    val baseAlloc = if (threadMx != null) threadMx.getThreadAllocatedBytes(wid) else 0L
    val deadlineNs = System.nanoTime() +
      (if (timeoutMs >= NoTimeoutMs) Long.MaxValue / 2 else timeoutMs * 1000000L)
    def preempt(err: CapturedError): MapResult = {
      task.cancel(true) // interrupt; the worker dies at its next checkpoint
      MapResult(Vector.empty, Vector.empty, Some(err)) // isolate kill: outputs lost
    }
    while (!done.isDone) {
      if (System.nanoTime() > deadlineNs)
        return preempt(CapturedError("MapTimeoutException",
          new MapTimeoutException(timeoutMs).getMessage))
      if (threadMx != null &&
          threadMx.getThreadAllocatedBytes(wid) - baseAlloc > memCapBytes)
        return preempt(CapturedError("MapMemoryException",
          new MapMemoryException(memCapBytes).getMessage))
      java.util.concurrent.locks.LockSupport.parkNanos(200000L) // 0.2 ms
    }
    done.get()
  }
}
