package graft.js

import scala.collection.mutable

/** PROMISES + ASYNC FUNCTIONS (round 14 — closes the VERDICT r13 #3
  * "out-of-subset tail" item for `async`/`await`, the last
  * language-level delta vs the reference's full-V8 lens worker,
  * reference: library/workers/javascript-lens-worker.js:100-145).
  *
  * Determinism argument: the sandbox has NO timers, NO IO and NO
  * wall-clock (`Date`/`Math.random` already throw), so every promise
  * settles from code the map call itself runs — job order is a pure
  * function of the program. The reference worker `await`s the map
  * apply (worker:131), i.e. the isolate's microtask queue drains
  * before outputs are collected; this engine makes that the explicit
  * contract: [[Interp.drainJobs]] runs the queue to quiescence after
  * the map body returns, then outputs are collected. A rejection
  * nobody handled by quiescence is surfaced as the map call's error —
  * V8 merely warns on stderr; loud-not-silent is this engine's
  * standing policy for host-boundary divergences (see the
  * detached-`this` note in JsConformanceSpec).
  *
  * Execution model for async function BODIES: the generator machinery
  * ([[Generators]]) — an async call runs its body on a pooled worker
  * with strict synchronous handoff; `await v` IS `yield v` at the
  * frame level (Await in [[Interp.eval]] calls
  * [[Generators.yieldValue]]), and the DRIVER below turns each
  * suspension into the spec's Await steps: PromiseResolve the operand
  * (native promises pass through — the ES2019 normative change, so
  * `await nativePromise` costs exactly one tick), PerformPromiseThen
  * with resume reactions, park. Resumptions run as microtask jobs on
  * the drain thread — at any instant exactly one of (host thread,
  * async body) runs, so the shared [[Budget]] and all user objects
  * keep single-threaded semantics, and an abandoned awaiting body is
  * reaped by [[Interp.closeGenerators]] like any suspended generator
  * (its `finally` blocks run; an `await` inside them observes the
  * closed flag and unwinds).
  *
  * Ordering is SPEC-LITERAL where V8 is observable:
  *  - reaction jobs are FIFO per queue, enqueued at settle time;
  *  - `resolve(thenable)` costs a PromiseResolveThenableJob tick
  *    before the `then` call (so resolving with a native promise adds
  *    TWO ticks end-to-end — V8-observable, pinned in JsAsyncSpec);
  *  - an async function's `return thenable` goes through the same
  *    resolution (extra ticks), while `await` of a native promise
  *    does not (PromiseResolve identity);
  *  - `Promise.prototype.finally` is ThenFinally/CatchFinally
  *    (27.2.5.3): the callback's result is awaited, its value
  *    discarded, pass-through preserved.
  * All of it V8-differential-fuzzed by tools/jsfuzz/asyncgen.js (the
  * gengen.js discipline) and pinned in JsAsyncSpec ordering tables. */
object Promises {

  /** One registered reaction: `handler` is the user onFulfilled /
    * onRejected for the matching state (None = pass-through), `target`
    * receives the outcome. */
  final case class Reaction(onFul: Option[JsValue], onRej: Option[JsValue],
                            target: Target)
  sealed trait Target
  /** `then`-derived promise: handler result resolves it (throw rejects). */
  final case class Derived(p: JsPromise) extends Target
  /** an async frame's resume hooks (Await): no derived promise. */
  final case class Resume(onValue: JsValue => Unit, onError: JsValue => Unit)
      extends Target

  def newPromise(interp: Interp): JsPromise = {
    interp.budget.allocate(8)
    new JsPromise
  }

  // ---------------- settle / resolve ----------------

  def fulfill(p: JsPromise, v: JsValue, interp: Interp): Unit = {
    if (p.state != 0) return
    p.state = 1; p.value = v
    val rs = p.reactions; p.reactions = null
    rs.foreach(r => enqueueReaction(r, 1, v, interp))
  }

  def rejectP(p: JsPromise, v: JsValue, interp: Interp): Unit = {
    if (p.state != 0) return
    p.state = 2; p.value = v
    val rs = p.reactions; p.reactions = null
    if (rs.nonEmpty) p.handled = true
    rs.foreach(r => enqueueReaction(r, 2, v, interp))
    if (!p.handled) interp.trackRejection(p)
  }

  /** ES ResolvePromise: thenables (including native promises handed to
    * a resolve function) assimilate through a PromiseResolveThenableJob
    * — one job tick before their `then` runs, exactly V8's observable
    * ordering. Self-resolution is the spec's chaining-cycle TypeError. */
  def resolveP(p: JsPromise, v: JsValue, interp: Interp): Unit = {
    if (p.state != 0) return
    v match {
      case same: JsPromise if same eq p =>
        rejectP(p, Values.makeError("TypeError",
          "Chaining cycle detected for promise"), interp)
      case _ =>
        // `then` lookup routes the full member path (prototype chain,
        // accessors, proxy get traps); a throwing getter rejects, per
        // the spec's Get(resolution, "then") abrupt-completion step
        val thenFn: Option[JsValue] = v match {
          case _: JsPromise => Some(JsNull) // marker: native fast then
          case _: JsObject | _: JsProxyV | _: JsArray =>
            try Some(interp.getMember(v, JsStr("then"), Ast.Pos(0))).filter(isCallable)
            catch {
              case JsThrown(err) => rejectP(p, err, interp); return
            }
          case _ => None
        }
        thenFn match {
          case None => fulfill(p, v, interp)
          case Some(t) =>
            // PromiseResolveThenableJob: the job owns a FRESH resolving
            // pair (its own already-resolved latch, per the spec's
            // CreateResolvingFunctions) — the caller's pair locking out
            // further settles must not lock out the thenable's
            interp.enqueueJob { () =>
              v match {
                case inner: JsPromise =>
                  // native promise: the job performs the then directly
                  performThen(inner, None, None, Derived(p), interp)
                case _ =>
                  val (resFn, rejFn) = resolvingFunctions(p, interp)
                  try { interp.callFunction(t, v, Vector(resFn, rejFn), Ast.Pos(0), "then"); () }
                  catch {
                    case JsThrown(err) => // latch-guarded: a resolve that
                      // already happened wins over the later throw (spec)
                      interp.callFunction(rejFn, JsUndefined, Vector(err), Ast.Pos(0), "reject")
                      ()
                  }
              }
            }
        }
    }
  }

  private def isCallable(v: JsValue): Boolean = v.isInstanceOf[JsFunc]

  /** the (resolve, reject) pair handed to executors and thenables —
    * shared already-resolved latch per the spec's CreateResolvingFunctions */
  def resolvingFunctions(p: JsPromise, interp: Interp): (JsValue, JsValue) = {
    val latch = new java.util.concurrent.atomic.AtomicBoolean(false)
    val res = new JsNative("resolve", (_, args) => {
      if (latch.compareAndSet(false, true))
        resolveP(p, args.headOption.getOrElse(JsUndefined), interp)
      JsUndefined
    })
    val rej = new JsNative("reject", (_, args) => {
      if (latch.compareAndSet(false, true))
        rejectP(p, args.headOption.getOrElse(JsUndefined), interp)
      JsUndefined
    })
    (res, rej)
  }

  // ---------------- then / reactions ----------------

  /** PerformPromiseThen: register or enqueue. Registering ANY reaction
    * marks the promise handled (pass-through rejection responsibility
    * moves to the derived promise, which starts unhandled). */
  def performThen(p: JsPromise, onFul: Option[JsValue], onRej: Option[JsValue],
                  target: Target, interp: Interp): Unit = {
    p.handled = true
    val r = Reaction(onFul, onRej, target)
    p.state match {
      case 0 => p.reactions += r
      case s => enqueueReaction(r, s, p.value, interp)
    }
  }

  private def enqueueReaction(r: Reaction, state: Int, v: JsValue,
                              interp: Interp): Unit =
    interp.enqueueJob { () =>
      val handler = if (state == 1) r.onFul else r.onRej
      r.target match {
        case Resume(onValue, onError) =>
          // Await reactions: no handler call, direct resumption
          if (state == 1) onValue(v) else onError(v)
        case Derived(d) =>
          handler match {
            case None => // pass-through (identity / thrower)
              if (state == 1) fulfill(d, v, interp) else rejectP(d, v, interp)
            case Some(h) =>
              try resolveP(d, interp.callFunction(h, JsUndefined, Vector(v),
                Ast.Pos(0), "promise reaction"), interp)
              catch { case JsThrown(err) => rejectP(d, err, interp) }
          }
      }
    }

  /** `.then` with spec handler filtering (non-callables are identity /
    * thrower pass-throughs). Returns the derived promise. */
  def thenMethod(p: JsPromise, onFul: JsValue, onRej: JsValue,
                 interp: Interp): JsPromise = {
    val d = newPromise(interp)
    performThen(p, Some(onFul).filter(isCallable),
      Some(onRej).filter(isCallable), Derived(d), interp)
    d
  }

  /** `.finally` per 27.2.5.3: callback runs on either outcome with no
    * arguments; its result is awaited (thenable assimilation) but its
    * VALUE is discarded — the original outcome passes through. */
  def finallyMethod(p: JsPromise, onFinally: JsValue, interp: Interp): JsPromise = {
    if (!isCallable(onFinally)) return thenMethod(p, onFinally, onFinally, interp)
    val thenFinally = new JsNative("thenFinally", (_, args) => {
      val v = args.headOption.getOrElse(JsUndefined)
      val result = interp.callFunction(onFinally, JsUndefined, Vector.empty, Ast.Pos(0), "onFinally")
      val pr = promiseResolve(result, interp)
      thenMethod(pr, new JsNative("", (_, _) => v), JsUndefined, interp)
    })
    val catchFinally = new JsNative("catchFinally", (_, args) => {
      val e = args.headOption.getOrElse(JsUndefined)
      val result = interp.callFunction(onFinally, JsUndefined, Vector.empty, Ast.Pos(0), "onFinally")
      val pr = promiseResolve(result, interp)
      thenMethod(pr, new JsNative("", (_, _) => throw JsThrown(e)), JsUndefined, interp)
    })
    thenMethod(p, thenFinally, catchFinally, interp)
  }

  /** ES PromiseResolve: native promises pass through IDENTICALLY (the
    * fast path `await` and the statics rely on); anything else wraps. */
  def promiseResolve(v: JsValue, interp: Interp): JsPromise = v match {
    case p: JsPromise => p
    case other =>
      val p = newPromise(interp)
      resolveP(p, other, interp)
      p
  }

  // ---------------- async function driver ----------------

  /** Call an async function: the body runs SYNCHRONOUSLY on its worker
    * until the first `await` or completion (spec AsyncFunctionStart),
    * then each resumption is a microtask job. Returns the result
    * promise immediately. */
  def callAsync(frame: JsGenerator, interp: Interp): JsPromise = {
    val result = newPromise(interp)
    step(frame, () => Generators.next(frame, JsUndefined, interp), result, interp)
    result
  }

  private def step(frame: JsGenerator, advance: () => (JsValue, Boolean),
                   result: JsPromise, interp: Interp): Unit = {
    val out =
      try advance()
      catch {
        case JsThrown(err) => rejectP(result, err, interp); return
        // host errors (budget, deadline, protocol) stay uncatchable and
        // abort the whole map call — the generator contract
      }
    out match {
      case (v, true) =>
        // `return v` resolves (thenable assimilation — extra ticks for
        // returned promises, exactly V8)
        resolveP(result, v, interp)
      case (sig: AwaitSignal, false) =>
        // spec Await: PromiseResolve (native promises pass through),
        // then resume reactions
        val pr = promiseResolve(sig.v, interp)
        performThen(pr,
          None, None,
          Resume(
            v => step(frame, () => Generators.next(frame, v, interp), result, interp),
            e => step(frame, () => Generators.gthrow(frame, e, interp), result, interp)),
          interp)
      case (_, false) =>
        // a plain async function can only suspend via await (the parser
        // bans yield outside generators) — anything else is a driver bug
        throw new IllegalStateException(
          "internal: untagged suspension reached the async-function driver")
    }
  }

  // ---------------- async generator driver (r14) ----------------

  private def iterResult(v: JsValue, done: Boolean): JsValue =
    JsObject.of("value" -> v, "done" -> JsBool(done))

  /** One `next`/`return`/`throw` call on an async generator: enqueue
    * an AsyncGeneratorRequest and return its promise. Requests are
    * served strictly in order — a second `next()` issued before the
    * first settles queues behind it (the spec's request list; V8's
    * observable interleave is pinned in JsAsyncSpec). */
  def asyncGenRequest(ag: JsAsyncGenerator, cmd: Generators.GenCmd,
                      interp: Interp): JsPromise = {
    val result = newPromise(interp)
    interp.budget.allocate(8)
    ag.requests.enqueue((cmd, result))
    pumpAsyncGen(ag, interp)
    result
  }

  /** Serve queued requests while the machine is idle. Each live step
    * chain parks in the microtask machinery (every yield/return value
    * is AWAITED first, so a request NEVER settles synchronously); its
    * completion clears `running` and re-enters this pump. */
  private def pumpAsyncGen(ag: JsAsyncGenerator, interp: Interp): Unit = {
    while (!ag.running && ag.requests.nonEmpty) {
      val (cmd, result) = ag.requests.dequeue()
      if (ag.finished) {
        // completed machine: next → {undefined, true}; return echoes
        // its value; throw rejects (ES 27.6.3.x on a "completed" state)
        cmd match {
          case Generators.GenNext(_) => fulfill(result, iterResult(JsUndefined, done = true), interp)
          case Generators.GenReturn(v) => fulfill(result, iterResult(v, done = true), interp)
          case Generators.GenThrow(e) => rejectP(result, e, interp)
          case Generators.GenKill => ()
        }
      } else {
        ag.running = true
        asyncGenStep(ag, cmd, result, interp)
      }
    }
  }

  private def asyncGenStep(ag: JsAsyncGenerator, cmd0: Generators.GenCmd,
                           result: JsPromise, interp: Interp): Unit = {
    val frame = ag.frame
    def settleAndPump(f: () => Unit): Unit = {
      f()
      ag.running = false
      pumpAsyncGen(ag, interp)
    }
    def advance(cmd: Generators.GenCmd): Unit = {
      val out =
        try cmd match {
          case Generators.GenNext(v) => Generators.next(frame, v, interp)
          case Generators.GenThrow(v) => Generators.gthrow(frame, v, interp)
          case Generators.GenReturn(v) => Generators.gret(frame, v, interp)
          case Generators.GenKill =>
            // no caller enqueues GenKill as a request; returning here
            // would leave ag.running latched and wedge the queue — be
            // loud like the untagged-suspension guard (ADVICE r14)
            throw new IllegalStateException(
              "internal: GenKill reached the async-generator request driver")
        }
        catch {
          case JsThrown(err) => // body threw (or throw() uncaught): the
            // request rejects and the machine completes
            ag.finished = true
            settleAndPump(() => rejectP(result, err, interp))
            return
          // host errors (budget/deadline/protocol) propagate uncatchably
        }
      out match {
        case (sig: AwaitSignal, false) =>
          // an internal `await`: resume the body with the outcome —
          // the request stays in flight
          performThen(promiseResolve(sig.v, interp), None, None, Resume(
            v => advance(Generators.GenNext(v)),
            e => advance(Generators.GenThrow(e))), interp)
        case (sig: PreAwaitedYield, false) =>
          // a delegated `yield*` value (r15): already awaited by the
          // delegation's inner-result await — settle the request
          // directly, no re-await (the tc39 redundant-await removal;
          // V8-observable one-tick-earlier delivery, fuzz-pinned)
          settleAndPump(() => fulfill(result, iterResult(sig.v, done = false), interp))
        case (v, false) =>
          // a `yield`: the yielded VALUE is awaited first
          // (AsyncGeneratorYield step 5 — a rejecting yield operand
          // throws INTO the body at the yield, V8-pinned g3 shape)
          performThen(promiseResolve(v, interp), None, None, Resume(
            rv => settleAndPump(() => fulfill(result, iterResult(rv, done = false), interp)),
            er => advance(Generators.GenThrow(er))), interp)
        case (v, true) =>
          // completion: the return value is awaited too (V8 g2 shape);
          // a rejecting return value rejects the request
          performThen(promiseResolve(v, interp), None, None, Resume(
            rv => { ag.finished = true
              settleAndPump(() => fulfill(result, iterResult(rv, done = true), interp)) },
            er => { ag.finished = true
              settleAndPump(() => rejectP(result, er, interp)) }), interp)
      }
    }
    advance(cmd0)
  }
}
