package graft.js

import Ast._
import Values._
import scala.collection.mutable
import scala.util.control.NoStackTrace

/** Execution budget. Step and allocation violations are HOST exceptions
  * (not [[JsThrown]]) so user `try`/`catch` cannot swallow them — the
  * same way the reference's isolate timeout/memory kill cannot be caught
  * by lens code (reference: javascript-lens-worker.js:55,133).
  *
  * `control` is invoked every [[ControlEvery]] steps; the lens worker
  * points it at `MapContext.checkDeadline()` so wall-clock timeouts and
  * sandbox preemption fire mid-loop, not only at emit points.
  */
final class Budget(val maxSteps: Long, val maxAllocUnits: Long,
                   val control: () => Unit) {
  private var steps = 0L
  private var alloc = 0L
  def tick(): Unit = {
    steps += 1
    if ((steps & 2047) == 0) control()
    if (steps > maxSteps)
      throw new JsBudgetExceeded(s"lens code exceeded $maxSteps interpreter steps")
  }
  /** units ≈ chars or elements; a coarse but monotone proxy for heap use */
  def allocate(units: Long): Unit = {
    alloc += units
    if (alloc > maxAllocUnits)
      throw new JsBudgetExceeded(s"lens code exceeded $maxAllocUnits allocation units")
  }
}
object Budget {
  /** generous defaults: far above any sane per-record map, far below a
    * runaway loop's appetite */
  val DefaultMaxSteps: Long = 20L * 1000 * 1000
  val DefaultMaxAlloc: Long = 64L * 1000 * 1000
  def default(control: () => Unit = () => ()): Budget =
    new Budget(DefaultMaxSteps, DefaultMaxAlloc, control)
}

final class JsBudgetExceeded(msg: String) extends RuntimeException(msg)

/** ES IteratorClose hook: iterate()'s adapters over generators and
  * user iterator-protocol objects implement it so for-of break /
  * early-bound destructuring can close the SOURCE (running its finally
  * blocks / `return` method) no matter how many protocol layers sit in
  * between. Builtin-backed iterators don't implement it (no-op). */
private[js] trait JsIterClose { def closeIter(): Unit }

// ---- control-flow signals (never escape a function boundary) ----
private[js] final case class ReturnSig(v: JsValue) extends RuntimeException with NoStackTrace
private[js] final case class BreakSig(label: Option[String]) extends RuntimeException with NoStackTrace
private[js] final case class ContinueSig(label: Option[String]) extends RuntimeException with NoStackTrace

/** Tree-walking evaluator for the parsed subset. One instance per map
  * call (cheap: scopes are small); the AST is shared and immutable. */
final class Interp(globalScope: Scope, val budget: Budget) {

  def runProgram(prog: Program, scope: Scope): Unit = {
    hoist(prog.body, scope)
    // the program IS a function body in the lens contract
    // (`function map (path, data) { <code> }`) — a top-level `return`
    // simply ends the call
    try prog.body.foreach(exec(_, scope))
    catch { case ReturnSig(_) => () }
  }

  /** hoisting: `var` names → undefined, function declarations → bound,
    * in the given (function-level) scope; does not descend into nested
    * functions */
  private def patternNames(pat: Pattern): Seq[String] = pat match {
    case IdPattern(n, _) => Seq(n)
    case ArrayPattern(elems, rest, _) => elems.flatten.flatMap(patternNames) ++ rest
    case ObjectPattern(entries, rest, _) => entries.map(_._2).flatMap(patternNames) ++ rest
    case DefaultPattern(inner, _, _) => patternNames(inner)
  }

  private def hoist(stmts: Seq[Stmt], scope: Scope): Unit = {
    def walk(s: Stmt): Unit = s match {
      case VarDecl("var", decls, _) =>
        decls.foreach { case (pat, _) => patternNames(pat).foreach { n =>
          if (!scope.vars.contains(n)) scope.declare(n, JsUndefined)
        } }
      case FnDecl(name, fn, _) => scope.declare(name, makeClosure(fn, scope, JsUndefined))
      case Block(ss, _) => ss.foreach(walk)
      case If(_, c, a, _) => walk(c); a.foreach(walk)
      case While(_, b, _) => walk(b)
      case DoWhile(b, _, _) => walk(b)
      case For(i, _, _, b, _) => i.foreach(walk); walk(b)
      case ForInOf(_, _, _, _, _, b, _) => walk(b)
      case Try(b, _, cb, fb, _) => walk(b); cb.foreach(walk); fb.foreach(walk)
      case Labeled(_, b, _) => walk(b)
      case Switch(_, cases, _) => cases.foreach(_._2.foreach(walk))
      case _ => ()
    }
    stmts.foreach(walk)
  }

  private def makeClosure(fn: FnExpr, env: Scope, thisV: JsValue): JsClosure =
    new JsClosure(fn.name, fn.params, fn.restParam, fn.body, fn.exprBody, fn.isArrow,
      env, thisV, fn.isGenerator, fn.isAsync)

  // ---------------- statements ----------------

  def exec(s: Stmt, scope: Scope): Unit = {
    budget.tick()
    s match {
      case ExprStmt(e, _) => eval(e, scope); ()
      case VarDecl(kind, decls, _) =>
        decls.foreach { case (pat, init) =>
          // `var x;` with no initializer must NOT clobber a value already
          // assigned to the hoisted binding
          if (kind != "var" || init.isDefined) {
            val v = init.map(eval(_, scope)).getOrElse(JsUndefined)
            bindPattern(pat, v, scope, kind)
          }
        }
      case _: FnDecl => () // bound during hoisting
      case ClassDecl(name, ce, _) => // classes are NOT hoisted (TDZ)
        scope.declare(name, buildClass(ce, scope))
      case Block(stmts, _) =>
        val inner = new Scope(scope)
        hoistFnDeclsOnly(stmts, inner)
        stmts.foreach(exec(_, inner))
      case If(test, cons, alt, _) =>
        if (truthy(eval(test, scope))) exec(cons, scope)
        else alt.foreach(exec(_, scope))
      case w: While => execLoop(w, scope, None)
      case d: DoWhile => execLoop(d, scope, None)
      case f: For => execLoop(f, scope, None)
      case f: ForInOf => execLoop(f, scope, None)
      case Return(value, _) => throw ReturnSig(value.map(eval(_, scope)).getOrElse(JsUndefined))
      case Throw(value, _) => throw JsThrown(eval(value, scope))
      case Try(block, catchParam, catchBlock, finallyBlock, _) =>
        try {
          try exec(block, scope)
          catch {
            case JsThrown(v) if catchBlock.isDefined =>
              val cScope = new Scope(scope)
              catchParam.foreach(bindPattern(_, v, cScope, "let"))
              exec(catchBlock.get, cScope)
          }
        } finally finallyBlock.foreach(exec(_, scope))
      case Break(label, _) => throw BreakSig(label)
      case Continue(label, _) => throw ContinueSig(label)
      case Labeled(label, body, _) =>
        body match {
          case loop @ (_: While | _: DoWhile | _: For | _: ForInOf) =>
            execLoop(loop, scope, Some(label))
          case other =>
            try exec(other, scope)
            catch { case BreakSig(Some(l)) if l == label => () }
        }
      case Switch(disc, cases, _) =>
        val d = eval(disc, scope)
        val swScope = new Scope(scope)
        var matched = false
        try {
          cases.foreach { case (test, stmts) =>
            if (!matched && test.exists(t => strictEquals(d, eval(t, swScope)))) matched = true
            if (matched) stmts.foreach(exec(_, swScope))
          }
          if (!matched) {
            // default clause (and fallthrough after it)
            val di = cases.indexWhere(_._1.isEmpty)
            if (di >= 0) cases.drop(di).foreach(_._2.foreach(exec(_, swScope)))
          }
        } catch { case BreakSig(None) => () }
      case Empty(_) => ()
    }
  }

  /** function declarations inside a block are block-scoped here (sane
    * subset of the spec's annex-B mess) */
  private def hoistFnDeclsOnly(stmts: Seq[Stmt], scope: Scope): Unit =
    stmts.foreach {
      case FnDecl(name, fn, _) => scope.declare(name, makeClosure(fn, scope, JsUndefined))
      case _ => ()
    }

  /** run one loop statement, handling break/continue — both unlabeled and
    * (when `label` is set) this loop's own label */
  private def execLoop(loop: Stmt, scope: Scope, label: Option[String]): Unit = {
    def body(b: Stmt, s: Scope): Unit =
      try exec(b, s)
      catch {
        case ContinueSig(None) => ()
        case ContinueSig(l) if label.isDefined && l == label => ()
      }
    try {
      loop match {
        case While(test, b, _) =>
          while (truthy(eval(test, scope))) body(b, scope)
        case DoWhile(b, test, _) =>
          var go = true
          while (go) { body(b, scope); go = truthy(eval(test, scope)) }
        case For(init, test, update, b, _) =>
          val forScope = new Scope(scope)
          init.foreach(exec(_, forScope))
          // ES2015 per-iteration environments: `for (let i ...)` gives
          // each iteration its OWN copy of the let bindings, so closures
          // created in the body capture that iteration's value (the
          // classic `fns.push(() => i)` emits 0,1,2 — not 3,3,3). The
          // body runs in a fresh scope seeded with the current values;
          // body assignments copy back so test/update observe them.
          val letNames: Seq[String] = init match {
            case Some(VarDecl("let", decls, _)) => decls.flatMap(d => patternNames(d._1))
            case _ => Nil
          }
          while (test.forall(t => truthy(eval(t, forScope)))) {
            if (letNames.isEmpty) body(b, forScope)
            else {
              val iterScope = new Scope(scope)
              letNames.foreach(n => iterScope.declare(n, forScope.vars(n)))
              body(b, iterScope)
              letNames.foreach(n => forScope.vars.put(n, iterScope.vars(n)))
            }
            update.foreach(eval(_, forScope))
          }
        case f: ForInOf =>
          val obj = eval(f.obj, scope)
          val it: Iterator[JsValue] =
            if (f.isOf && f.isAwait) forAwaitIterator(obj, f.pos)
            else if (f.isOf) iterate(obj, f.pos)
            else obj match { // for-in: enumerable own keys as strings
              case o: JsObject => ownEntries(o).iterator.map(e => JsStr(e._1))
              case a: JsArray => a.items.indices.iterator.map(i => JsStr(i.toString))
              case p: JsProxyV => proxyOwnKeys(p).iterator.map(JsStr(_))
              case _ => Iterator.empty // incl. null/undefined: zero iterations
            }
          // ES IteratorClose: a for-of left EARLY over a generator or a
          // custom iterable closes the SOURCE (finally blocks / the
          // protocol's return method run at the exit point — the hook
          // rides on the iterator, so every protocol layering works).
          // break/continue/return propagate close-time throws; an
          // in-flight exception wins over one (both V8).
          def closeGen(swallow: Boolean): Unit = it match {
            case c: JsIterClose =>
              try c.closeIter()
              catch { case _: JsThrown if swallow => () }
            case _ => ()
          }
          try {
            while (it.hasNext) {
              budget.tick()
              val v = it.next()
              val iterScope = new Scope(scope)
              f.kind match {
                case "" =>
                  val IdPattern(n, _) = f.target: @unchecked
                  if (!scope.assign(n, v)) throwRef(s"$n is not defined")
                case kind => bindPattern(f.target, v, iterScope, kind)
              }
              body(f.body, iterScope)
            }
          } catch {
            case e @ (_: BreakSig | _: ContinueSig | _: ReturnSig) =>
              closeGen(swallow = false); throw e
            case e: Throwable =>
              closeGen(swallow = true); throw e
          }
        case other => exec(other, scope)
      }
    } catch {
      case BreakSig(None) => ()
      case BreakSig(l) if label.isDefined && l == label => ()
    }
  }

  /** Property-key conversion: a well-known symbol keys its reserved
    * internal slot (hidden from enumeration — Values.symbolSlot);
    * everything else is ToString. Every member read/write/has/delete
    * and computed-key site routes through this, so `obj[Symbol.
    * iterator]` works everywhere a string key does. */
  @inline private def propKeyStr(key: JsValue): String = key match {
    case s: JsSymbolV => s.slot // display/trap-name use only — STORAGE routes through symProps
    case other => toStr(other)
  }

  /** UNIQUE symbols (r15): per-Interp creation counter + slot→instance
    * registry. The counter gives each `Symbol(desc)` a fresh `@@u<n>`
    * slot (identity by construction); the registry lets enumeration
    * surfaces (Object.getOwnPropertySymbols, Reflect.ownKeys) hand back
    * the CANONICAL instance for a stored slot, so
    * `getOwnPropertySymbols(o)[0] === s` holds like V8. Per-Interp —
    * one Interp per map call, so no cross-record state; seeded with the
    * well-known instances (JVM-global canonicals, immutable). */
  private[js] val symbolSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  private val symbolRegistry = mutable.HashMap[String, JsSymbolV](
    JsSymbols.iterator.slot -> JsSymbols.iterator,
    JsSymbols.asyncIterator.slot -> JsSymbols.asyncIterator)
  private[js] def registerSymbol(sym: JsSymbolV): Unit =
    symbolRegistry.synchronized { symbolRegistry.put(sym.slot, sym); () }
  private[js] def symbolForSlot(slot: String): Option[JsSymbolV] =
    symbolRegistry.synchronized { symbolRegistry.get(slot) }
  /** `Symbol.for`'s GlobalSymbolRegistry (key → symbol) and its
    * reverse for `Symbol.keyFor`. PER-INTERP like everything else the
    * environment rebuilds per record (V8's registry is
    * isolate-lifetime; cross-record `Symbol.for` identity is
    * unobservable here — symbols cannot reach output() — so the
    * per-record registry diverges only in unobservable state, the
    * standing per-record-environment policy). */
  private[js] val symbolForRegistry = mutable.HashMap[String, JsSymbolV]()
  private[js] val symbolForKeys = mutable.HashMap[JsSymbolV, String]()

  /** first symbol-keyed slot for `slot` along the prototype chain
    * (own symProps first) — the symbol twin of chainSlot */
  private def symChainSlot(o: JsObject, slot: String): Option[JsValue] = {
    var cur = o
    while (cur != null) {
      if (cur.symProps != null) {
        val v = cur.symProps.getOrElse(slot, null)
        if (v != null) return Some(v)
      }
      cur = cur.protoV
    }
    None
  }

  /** symbol-keyed member READ: objects resolve their symProps chain,
    * proxies trap (receiving the SYMBOL itself, like V8), the symbol
    * RECEIVER answers description/toString, everything else reads
    * undefined (builtins expose no symbol props in this subset). */
  private def symbolGet(obj: JsValue, sym: JsSymbolV, pos: Pos): JsValue = obj match {
    case JsNull | (_: JsUndefinedKind) =>
      throwType(s"Cannot read properties of ${toStr(obj)} (reading 'Symbol(${sym.description})')")
    case o: JsObject => symChainSlot(o, sym.slot).map {
      case acc: JsAccessorProp =>
        acc.getter.map(g => callFunction(g, o, Vector.empty, pos, sym.slot)).getOrElse(JsUndefined)
      case v => v
    }.getOrElse(JsUndefined)
    case p: JsProxyV => proxyGet(p, sym, pos)
    case cls: JsClassV => // `static [s]() {}` reads off the statics chain (r15)
      symChainSlot(cls.statics, sym.slot).map {
        case acc: JsAccessorProp =>
          acc.getter.map(g => callFunction(g, cls, Vector.empty, pos, sym.slot)).getOrElse(JsUndefined)
        case v => v
      }.getOrElse(JsUndefined)
    case ag: JsAsyncGenerator if sym.slot == "@@asyncIterator" =>
      // asyncGen[Symbol.asyncIterator]() === the generator itself (V8)
      new JsNative("[Symbol.asyncIterator]", (_, _) => ag)
    case _ => JsUndefined
  }

  /** symbol-keyed member WRITE (objects + proxies + class statics;
    * no-op elsewhere). A chain ACCESSOR receives the write through its
    * setter — getter-only assignment is the sloppy-mode silent no-op,
    * same as the string path (r15). */
  private def symbolSet(obj: JsValue, sym: JsSymbolV, v: JsValue, pos: Pos): Unit = obj match {
    case o: JsObject => symChainSlot(o, sym.slot) match {
      case Some(acc: JsAccessorProp) =>
        acc.setter.foreach(s => callFunction(s, o, Vector(v), pos, sym.slot))
      case _ => if (!o.frozen) { budget.allocate(4); o.symPut(sym.slot, v) }
    }
    case p: JsProxyV => proxySet(p, sym, v, pos)
    case cls: JsClassV => symChainSlot(cls.statics, sym.slot) match {
      case Some(acc: JsAccessorProp) =>
        acc.setter.foreach(s => callFunction(s, cls, Vector(v), pos, sym.slot))
      case _ => budget.allocate(4); cls.statics.symPut(sym.slot, v)
    }
    case _ => ()
  }

  /** drive a user ITERATOR-PROTOCOL object (`{ next() {...} }` — what
    * `[Symbol.iterator]()` returned when it isn't a generator): the
    * `next` method is fetched once (V8's GetIterator), then called per
    * pull, reading `{value, done}` from each result */
  private def protocolIterator(it: JsValue, pos: Pos): Iterator[JsValue] = it match {
    case g: JsGenerator => Generators.iterator(g, this)
    case o: JsObject =>
      val nextF = getMember(o, JsStr("next"), pos) match {
        case f: JsFunc => f
        case other => throwType(
          s"result of the Symbol.iterator method has no callable 'next' (got ${typeOf(other)})")
      }
      new Iterator[JsValue] with JsIterClose {
        private var buf: JsValue = null
        private var done = false
        def hasNext: Boolean = {
          if (done) return false
          if (buf == null) {
            budget.tick()
            callFunction(nextF, o, Vector.empty, pos, "next") match {
              case r: JsObject =>
                // Get, not own-only: done/value may live on a prototype
                // or behind accessors (V8 IteratorComplete/IteratorValue)
                if (truthy(getMember(r, JsStr("done"), pos))) { done = true; return false }
                buf = getMember(r, JsStr("value"), pos)
              case other => throwType(
                s"iterator result is not an object (got ${typeOf(other)})")
            }
          }
          true
        }
        def next(): JsValue = {
          if (!hasNext) throw new NoSuchElementException
          val v = buf
          buf = null
          v
        }
        def closeIter(): Unit = {
          // IteratorClose: the iterator's own `return` method, if any
          if (!done) {
            done = true
            getMember(o, JsStr("return"), pos) match {
              case f: JsFunc => callFunction(f, o, Vector.empty, pos, "return"); ()
              case _ => ()
            }
          }
        }
      }
    case other => throwType(
      s"result of the Symbol.iterator method is not an iterator (got ${typeOf(other)})")
  }

  /** the for-of / spread iteration protocol over our builtin iterables */
  /** `for await` (r14) — runs ONLY on an async body's worker (parser-
    * enforced), so each pull can SUSPEND the frame: over an async
    * generator, every `next()` request is awaited (and early exit
    * awaits `return()` — IteratorClose through the async protocol);
    * over a sync iterable, each VALUE is awaited (the spec's
    * AsyncFromSyncIterator value unwrap), with the sync source's own
    * close hook preserved. Custom `[Symbol.asyncIterator]` objects
    * are out of the v1 subset — loud TypeError via iterate()'s
    * not-iterable paths rather than a silent sync fallback... except
    * that V8's fallback TO Symbol.iterator for plain iterables is
    * exactly the sync branch here. */
  private def forAwaitIterator(obj: JsValue, pos: Pos): Iterator[JsValue] = {
    def awaitHere(v: JsValue): JsValue =
      Generators.yieldValue(new AwaitSignal(v))
    obj match {
      case ag: JsAsyncGenerator =>
        new Iterator[JsValue] with JsIterClose {
          private var buf: JsValue = null
          private var fin = ag.finished
          def hasNext: Boolean = {
            if (fin) return false
            if (buf != null) return true
            awaitHere(Promises.asyncGenRequest(ag,
              Generators.GenNext(JsUndefined), Interp.this)) match {
              case o: JsObject =>
                if (truthy(o.props.getOrElse("done", JsUndefined))) { fin = true; false }
                else { buf = o.props.getOrElse("value", JsUndefined); true }
              case _ => fin = true; false // unreachable: requests settle with iter-results
            }
          }
          def next(): JsValue = { val v = buf; buf = null; v }
          def closeIter(): Unit = if (!fin) {
            fin = true // early exit: return() unwinds the body (finally runs), awaited
            awaitHere(Promises.asyncGenRequest(ag,
              Generators.GenReturn(JsUndefined), Interp.this))
            ()
          }
        }
      case other =>
        val base = iterate(other, pos)
        new Iterator[JsValue] with JsIterClose {
          def hasNext: Boolean = base.hasNext
          def next(): JsValue = awaitHere(base.next())
          def closeIter(): Unit = base match {
            case c: JsIterClose => c.closeIter()
            case _ => ()
          }
        }
    }
  }

  def iterate(v: JsValue, pos: Pos): Iterator[JsValue] = v match {
    case _: JsAsyncGenerator =>
      // sync iteration of an async generator is V8's TypeError — the
      // values are promises-in-flight, only `for await` can unwrap them
      throwType("an async generator is not (synchronously) iterable — use 'for await'")
    case a: JsArray => a.items.toVector.iterator.map(Values.deHole) // holes iterate as undefined
    case JsStr(s) =>
      // iterate code points, as JS string iteration does
      val cps = s.codePoints().toArray
      cps.iterator.map(cp => JsStr(new String(Character.toChars(cp))))
    case set: JsSetV => set.entries.values.toVector.iterator
    case m: JsMapV => m.entries.values.toVector.iterator.map { case (k, vv) => JsArray.of(k, vv) }
    case g: JsGenerator => Generators.iterator(g, this)
    case p: JsProxyV if proxyIsArray(p) =>
      // the array iterator through the proxy: length once, then per-
      // index gets (V8 re-reads length each step — subset divergence,
      // length-mutating get traps excepted)
      val len = toNumber(proxyGet(p, JsStr("length"), pos)).toInt
      (0 until len).iterator.map(i => proxyGet(p, JsStr(i.toString), pos))
    case p: JsProxyV =>
      // a [Symbol.iterator] read through the proxy (get trap or target)
      proxyGet(p, JsSymbols.iterator, pos) match {
        case f: JsFunc => protocolIterator(callFunction(f, p, Vector.empty, pos, "Symbol.iterator"), pos)
        case _ => throwType("proxy of a non-array is not iterable (cannot spread/for-of it)")
      }
    case o: JsObject =>
      // custom iterable: a [Symbol.iterator] method (own, prototype-
      // chain, or accessor-stored) — typically a generator (r13)
      symChainSlot(o, "@@iterator") match {
        case Some(slot) =>
          val f = slot match {
            case acc: JsAccessorProp =>
              acc.getter.map(g => callFunction(g, o, Vector.empty, pos, "Symbol.iterator"))
                .getOrElse(JsUndefined)
            case other => other
          }
          f match {
            case fn: JsFunc => protocolIterator(callFunction(fn, o, Vector.empty, pos, "Symbol.iterator"), pos)
            case _ => throwType("object's Symbol.iterator property is not a function")
          }
        case None => throwType("object is not iterable (cannot spread/for-of a plain object)")
      }
    case other => throwType(s"${typeOf(other)} is not iterable")
  }

  private def bindPattern(pat: Pattern, v: JsValue, scope: Scope, kind: String): Unit = pat match {
    case IdPattern(n, _) =>
      kind match {
        case "var" =>
          // var: function-scoped — find the scope that hoisting declared it in
          if (!scope.assign(n, v)) scope.declare(n, v)
        case "const" => scope.declare(n, v, const = true)
        case _ => scope.declare(n, v)
      }
    case DefaultPattern(inner, default, _) =>
      val actual = if (v == JsUndefined) eval(default, scope) else v
      bindPattern(inner, actual, scope, kind)
    case ArrayPattern(elems, rest, p0) =>
      val items: Vector[JsValue] = v match {
        case a: JsArray => a.items.toVector.map(Values.deHole) // destructuring reads holes as undefined
        case other =>
          val it = iterate(other, p0)
          if (rest.isEmpty) {
            // pull EXACTLY the bound element count, then IteratorClose —
            // `const [a] = infinite()` terminates, like V8 (the
            // adapters' hasNext performs the pull, so take(n) resumes
            // n times; works through custom-iterable layering too)
            val taken = it.take(elems.length).toVector
            it match { case c: JsIterClose => c.closeIter(); case _ => () }
            taken
          } else it.toVector
      }
      elems.zipWithIndex.foreach {
        case (Some(p), i) => bindPattern(p, items.lift(i).getOrElse(JsUndefined), scope, kind)
        case (None, _) => ()
      }
      rest.foreach { r =>
        val tail = items.drop(elems.length)
        budget.allocate(tail.length.toLong)
        bindPattern(IdPattern(r, p0), new JsArray(mutable.ArrayBuffer(tail: _*)), scope, kind)
      }
    case ObjectPattern(entries, rest, p0) =>
      v match {
        case JsNull | JsUndefined => throwType("cannot destructure null or undefined")
        case _ => ()
      }
      val taken = mutable.HashSet.empty[String]
      val takenSyms = mutable.HashSet.empty[String]
      entries.foreach { case (key, target) =>
        // computed keys (r15) evaluate at bind time, in entry order,
        // interleaved with the bindings (V8); a symbol key routes to
        // symProps via getMember and excludes its slot from rest
        val keyV: JsValue = key match {
          case Left(name) => JsStr(name)
          case Right(e) => eval(e, scope) match {
            case sym: JsSymbolV => sym
            case other => JsStr(toStrI(other))
          }
        }
        keyV match {
          case sym: JsSymbolV => takenSyms += sym.slot
          case JsStr(s) => taken += s
          case _ => ()
        }
        bindPattern(target, getMember(v, keyV, p0), scope, kind)
      }
      rest.foreach { r =>
        val o = JsObject.empty()
        v match {
          // rest is CopyDataProperties like spread: getters evaluate,
          // symbol-keyed props come along (V8) minus destructured ones
          case src: JsObject =>
            ownEvalEntries(src).foreach { case (k, pv) => if (!taken(k)) o.props.put(k, pv) }
            symEvalEntries(src).foreach { case (slot, pv) =>
              if (!takenSyms(slot)) o.symPut(slot, pv) }
          case src: JsProxyV => proxyOwnEntries(src).foreach { case (k, pv) => if (!taken(k)) o.props.put(k, pv) }
          case _ => ()
        }
        budget.allocate(o.props.size.toLong)
        bindPattern(IdPattern(r, p0), o, scope, kind)
      }
  }

  // ---------------- expressions ----------------

  def eval(e: Expr, scope: Scope): JsValue = {
    budget.tick()
    e match {
      case NumLit(v, _) => JsNum(v)
      case StrLit(v, _) => JsStr(v)
      case BoolLit(v, _) => JsBool(v)
      case NullLit(_) => JsNull
      case UndefinedLit(_) => JsUndefined
      case HoleLit(_) => JsHole // only ArrayLit emits these
      case RegexLit(pattern, flags, pos) => Builtins.compileRegex(pattern, flags, pos)
      case TemplateLit(parts, exprs, _) =>
        val sb = new java.lang.StringBuilder(parts.head)
        exprs.indices.foreach { i =>
          sb.append(toStrI(eval(exprs(i), scope)))
          sb.append(parts(i + 1))
        }
        budget.allocate(sb.length.toLong)
        JsStr(sb.toString)
      case tt: TaggedTemplate =>
        // tag`a${x}b` — evaluation order per spec: tag (with method
        // receiver binding, like a call), then the hole expressions.
        // DIVERGENCE NOTE: V8 canonicalizes one FROZEN strings array
        // per call site; this engine's arrays aren't freezable, so a
        // cached site object would be cross-call MUTABLE state (a
        // determinism hazard under partition-order nondeterminism) —
        // a fresh array per evaluation is built instead. Tags that
        // compare `strings` by identity across calls see fresh
        // objects; everything else (cooked/raw contents, undefined
        // cooked slots for invalid escapes) matches V8.
        budget.tick()
        val (fnV, thisV, nm) = tt.tag match {
          case m @ Member(objE, PrivName(pn, _), _, _, _) =>
            // private-method tag: this.#tag`x` binds the receiver,
            // exactly like a private method call
            val obj = eval(objE, scope)
            (getPrivate(obj, pn, scope, m.pos), obj, pn)
          case m: Member =>
            val obj = eval(m.obj, scope)
            (getMember(obj, evalPropKey(m, scope), m.pos), obj,
              if (!m.computed) m.prop.asInstanceOf[StrLit].v else "computed")
          case Ident(n, _) => (eval(tt.tag, scope), JsUndefined, n)
          case other => (eval(other, scope), JsUndefined, "tag")
        }
        val rawArr = JsArray.of(tt.raw.map(JsStr(_): JsValue): _*)
        val strings = JsArray.of(tt.cooked.map(c =>
          c.fold(JsUndefined: JsValue)(JsStr(_))): _*)
        strings.extraPut("raw", rawArr)
        budget.allocate(tt.raw.map(_.length.toLong).sum * 2 + 32)
        val vals = tt.exprs.map(e => eval(e, scope))
        callFunction(fnV, thisV, strings +: vals, tt.pos, name = nm)
      case Ident(name, _) =>
        scope.lookup(name).getOrElse(throwRef(s"$name is not defined"))
      case ThisExpr(_) =>
        val v = scope.lookup("this").getOrElse(JsUndefined)
        checkThisTdz(v) // pre-super() `this` in a derived ctor (ES TDZ)
        v
      case ArrayLit(items, spreads, pos) =>
        val buf = mutable.ArrayBuffer.empty[JsValue]
        items.zipWithIndex.foreach { case (item, i) =>
          if (spreads.contains(i)) buf ++= iterate(eval(item, scope), pos)
          else buf += eval(item, scope)
        }
        budget.allocate(buf.length.toLong + 1)
        new JsArray(buf)
      case ObjectLit(entries, computed, spreads, getters, setters, _) =>
        val o = JsObject.empty()
        entries.zipWithIndex.foreach { case ((k, v), i) =>
          if (spreads.contains(i)) {
            eval(v, scope) match {
              case src: JsObject =>
                // spread is CopyDataProperties: source GETTERS evaluate
                // into plain data props (V8); accessor-ness never
                // copies; SYMBOL-keyed props copy too (V8)
                ownEvalEntries(src).foreach { case (pk, pv) => o.props.put(pk, pv) }
                symEvalEntries(src).foreach { case (slot, pv) => o.symPut(slot, pv) }
              case src: JsProxyV =>
                proxyOwnEntries(src).foreach { case (pk, pv) => o.props.put(pk, pv) }
              case src: JsArray => src.items.zipWithIndex.foreach { case (pv, pi) => o.props.put(pi.toString, pv) }
              case JsNull | JsUndefined => ()
              case _ => ()
            }
          } else {
            val keyV: JsValue = if (computed.contains(i)) eval(k, scope)
                                else JsStr(k.asInstanceOf[StrLit].v)
            keyV match {
              case sym: JsSymbolV => // `{ [Symbol.iterator]: f }` / `*[Symbol.iterator](){}`
                if (getters.contains(i) || setters.contains(i)) {
                  // symbol-keyed accessors (r15): same get+set slot
                  // merge as string keys, stored in symProps
                  val fn = eval(v, scope).asInstanceOf[JsFunc]
                  val acc = (if (o.symProps != null) o.symProps.get(sym.slot)
                    else None) match {
                    case Some(a: JsAccessorProp) => a
                    case _ => new JsAccessorProp(None, None)
                  }
                  if (getters.contains(i)) acc.getter = Some(fn) else acc.setter = Some(fn)
                  o.symPut(sym.slot, acc)
                } else o.symPut(sym.slot, eval(v, scope))
              case _ =>
                val key = toStr(keyV)
                if (getters.contains(i) || setters.contains(i)) {
                  val fn = eval(v, scope).asInstanceOf[JsFunc]
                  // get+set for one key merge into a single slot; a later
                  // accessor over a data prop (or vice versa) replaces it,
                  // and LinkedHashMap re-put keeps the original position —
                  // both exactly the V8 object-literal rules
                  val acc = o.props.get(key) match {
                    case Some(a: JsAccessorProp) => a
                    case _ => new JsAccessorProp(None, None)
                  }
                  if (getters.contains(i)) acc.getter = Some(fn) else acc.setter = Some(fn)
                  o.props.put(key, acc)
                } else o.props.put(key, eval(v, scope))
            }
          }
        }
        budget.allocate(o.props.size.toLong + 1)
        o
      case fn: FnExpr =>
        val thisV = if (fn.isArrow) scope.lookup("this").getOrElse(JsUndefined) else JsUndefined
        makeClosure(fn, scope, thisV)
      case ce: ClassExpr => buildClass(ce, scope)
      case SuperRef(_) =>
        // only reachable as a base of write/delete/update targets (reads
        // route through evalChain) — a loud subset boundary, never silent
        throwType("assignment or delete through 'super' is not supported in lens code")
      case Unary(op, operand, _) => evalUnary(op, operand, scope)
      case u: Update => evalUpdate(u, scope)
      // ES2022 brand check `#x in obj` — the private name never
      // evaluates to a value, so it is consumed before the operands
      case Binary("in", PrivName(n, _), r, _) =>
        JsBool(privateIn(n, eval(r, scope), scope))
      case PrivName(n, _) =>
        // only reachable through a precedence splice like `a + #x in b`
        // (V8 rejects at parse; our guard admits the name only when
        // followed by `in`) — a loud boundary, never a silent value
        throwType(s"Unexpected private name $n")
      case Binary(op, l, r, pos) => evalBinary(op, eval(l, scope), eval(r, scope), pos)
      case Logical(op, l, r, _) =>
        val lv = eval(l, scope)
        op match {
          case "&&" => if (truthy(lv)) eval(r, scope) else lv
          case "||" => if (truthy(lv)) lv else eval(r, scope)
          case "??" => if (lv == JsNull || lv == JsUndefined) eval(r, scope) else lv
        }
      case Cond(test, cons, alt, _) =>
        if (truthy(eval(test, scope))) eval(cons, scope) else eval(alt, scope)
      case a: Assign => evalAssign(a, scope)
      case m: Member => evalChain(m, scope).getOrElse(JsUndefined)
      case c: Call => evalChain(c, scope).getOrElse(JsUndefined)
      case n: NewExpr => evalNew(n, scope)
      case Yield(argE, delegate, yp) =>
        // only reachable on a generator body's thread (parser-enforced)
        if (!delegate) Generators.yieldValue(argE.map(eval(_, scope)).getOrElse(JsUndefined))
        else {
          val inner = eval(argE.get, scope)
          val frame = Generators.current.get
          // the running frame's closure knows its kind: an async
          // generator's yield* AWAITS every inner step (r15,
          // Generators.delegateAsync); a sync generator's does not
          if (frame != null && frame.closure.isAsync)
            Generators.delegateAsync(inner, this, yp)
          else inner match {
            case g: JsGenerator => Generators.delegate(g, this)
            case other => Generators.delegateIterable(iterate(other, yp))
          }
        }
      case Await(argE, _) =>
        // only reachable on an async body's worker (parser-enforced):
        // at the frame level `await` IS `yield`, TAGGED so an async
        // GENERATOR driver can tell awaits from yields — the driver
        // (Promises.step / Promises.asyncGenRequest) turns the
        // suspension into the spec's Await (PromiseResolve + resume
        // reactions on the microtask queue)
        Generators.yieldValue(new AwaitSignal(eval(argE, scope)))
      case Sequence(exprs, _) => exprs.map(eval(_, scope)).last
    }
  }

  private def evalPropKey(m: Member, scope: Scope): JsValue =
    if (m.computed) eval(m.prop, scope)
    else m.prop match {
      case StrLit(s, _) => JsStr(s)
      case PrivName(n, _) => // destructuring/loop member targets — a
        // loud subset boundary (assignments/reads/calls have their own
        // private paths and never reach here)
        throwType(s"private member $n is not supported as a destructuring or loop target in lens code")
      case other => throwType(s"unsupported member key ${other.getClass.getSimpleName}")
    }

  private def evalUnary(op: String, operand: Expr, scope: Scope): JsValue = op match {
    case "typeof" =>
      operand match {
        case Ident(name, _) => JsStr(scope.lookup(name).map(typeOf).getOrElse("undefined"))
        case _ => JsStr(typeOf(eval(operand, scope)))
      }
    case "!" => JsBool(!truthy(eval(operand, scope)))
    case "-" => JsNum(-toNumberI(eval(operand, scope)))
    case "+" => JsNum(toNumberI(eval(operand, scope)))
    case "~" => JsNum((~toInt32(toNumberI(eval(operand, scope)))).toDouble)
    case "void" => eval(operand, scope); JsUndefined
    case "delete" => operand match {
      case m: Member =>
        val obj = eval(m.obj, scope)
        deleteMember(obj, evalPropKey(m, scope))
        JsBool(true)
      case _ => JsBool(true)
    }
  }

  /** A resolved assignment target. The object and property-key
    * expressions of a Member target are evaluated ONCE at resolution
    * (per spec order: target reference BEFORE the right-hand side) —
    * so `a[f()] += 1` / `a[f()]++` call `f` exactly once, and
    * `a[f()] = g()` runs `f` before `g`. */
  private sealed trait Ref { def get: JsValue; def set(v: JsValue): Unit }
  private def resolveRef(target: Expr, scope: Scope): Ref = target match {
    case Ident(name, _) => new Ref {
      def get: JsValue = scope.lookup(name).getOrElse(throwRef(s"$name is not defined"))
      def set(v: JsValue): Unit = if (!scope.assign(name, v)) throwRef(s"$name is not defined")
    }
    case m @ Member(objE, PrivName(n, _), _, _, _) =>
      val obj = eval(objE, scope)
      new Ref {
        def get: JsValue = getPrivate(obj, n, scope, m.pos)
        def set(v: JsValue): Unit = setPrivate(obj, n, v, scope, m.pos)
      }
    case m: Member =>
      val obj = eval(m.obj, scope)
      val key = evalPropKey(m, scope)
      new Ref {
        def get: JsValue = getMember(obj, key, m.pos)
        def set(v: JsValue): Unit = setMember(obj, key, v, m.pos)
      }
    case _ => throwType("invalid assignment target")
  }

  private def evalUpdate(u: Update, scope: Scope): JsValue = {
    val ref = resolveRef(u.target, scope)
    val old = toNumberI(ref.get)
    val neu = if (u.op == "++") old + 1 else old - 1
    ref.set(JsNum(neu))
    JsNum(if (u.prefix) neu else old)
  }

  private def evalAssign(a: Assign, scope: Scope): JsValue = {
    val ref = resolveRef(a.target, scope)
    val value: JsValue = a.op match {
      case "=" => eval(a.value, scope)
      case "&&=" =>
        val cur = ref.get
        if (!truthy(cur)) return cur
        eval(a.value, scope)
      case "||=" =>
        val cur = ref.get
        if (truthy(cur)) return cur
        eval(a.value, scope)
      case "??=" =>
        val cur = ref.get
        if (cur != JsNull && cur != JsUndefined) return cur
        eval(a.value, scope)
      case compound =>
        val binOp = compound.dropRight(1) // "+=" → "+"
        evalBinary(binOp, ref.get, eval(a.value, scope), a.pos)
    }
    ref.set(value)
    value
  }

  // ---------------- interp-aware coercion (ES ToPrimitive) ----------------

  /** ES OrdinaryToPrimitive for values with USER-overridable conversion
    * — plain objects, class instances (methods found on the prototype
    * chain), and proxies (method lookup routes the `get` trap). V8
    * honors a user `valueOf`/`toString` in `+`, relational, `==`, and
    * template coercion (`'' + {toString(){return 'X'}}` is "X"), which
    * the static [[Values.toPrimitive]] cannot do (no interpreter in
    * hand) — a silent-divergence class found by the round-13 coercion
    * probes. Everything else (arrays join, Dates stay epoch-number)
    * keeps the established static behavior. */
  def toPrimitiveI(v: JsValue, hint: String = "default"): JsValue = v match {
    case o: JsObject => ordinaryToPrimitive(o, hint)
    case p: JsProxyV => ordinaryToPrimitive(p, hint)
    // arrays join through the INTERP-AWARE element conversion: V8's
    // Array.prototype.toString → join runs ToString on each element,
    // so `'' + [obj]` honors a user toString/valueOf ON THE ELEMENT —
    // the static fallback stringified elements statically, diverging
    // one nesting level below the round-13 coercion wave (ADVICE r13)
    case a: JsArray => JsStr(arrayToStrI(a))
    case other => toPrimitive(other)
  }

  /** Arrays currently being joined (V8's JoinStack): a cyclic array —
    * direct nesting OR re-entry through a user toString — contributes
    * "" instead of recursing forever. Identity-keyed; single logical
    * thread (strict handoff), so a plain set suffices. Review find r14:
    * without it, `a.push(a); '' + a` escaped the catchable-error
    * contract with a raw JVM StackOverflowError. */
  private val joinStack = java.util.Collections.newSetFromMap(
    new java.util.IdentityHashMap[JsArray, java.lang.Boolean]())

  /** Array join with interp-aware per-element ToString (nested arrays
    * recurse here; holes/undefined/null join as empty, like V8). */
  private def arrayToStrI(a: JsArray): String = {
    if (!joinStack.add(a)) return "" // cycle: V8 joins the re-entry as empty
    try a.items.map {
      case JsNull | _: JsUndefinedKind => ""
      case x => toStrI(x)
    }.mkString(",")
    finally joinStack.remove(a)
  }

  private def ordinaryToPrimitive(recv: JsValue, hint: String): JsValue = {
    val order = if (hint == "string") Seq("toString", "valueOf") else Seq("valueOf", "toString")
    order.foreach { name =>
      getMember(recv, JsStr(name), Pos(0)) match {
        case f: JsFunc =>
          callFunction(f, recv, Vector.empty, Pos(0), name) match {
            case prim @ (JsNull | _: JsUndefinedKind | _: JsBool | _: JsNum | _: JsStr) =>
              return prim
            case _ => () // non-primitive result: try the next method (ES 7.1.1.1)
          }
        case _ => () // absent / not callable: try the next method
      }
    }
    throwType("Cannot convert object to primitive value")
  }

  /** `==` with the object side run through interp-aware ToPrimitive
    * (user valueOf/toString honored, proxy get traps routed). */
  private def looseEqualsI(a: JsValue, b: JsValue): Boolean = (a, b) match {
    // arrays included: their ToPrimitive joins via interp-aware element
    // ToString, so `[{toString(){return '2'}}] == 2` is true like V8
    case (JsNum(_) | JsStr(_) | JsBool(_), _: JsObject | _: JsProxyV | _: JsArray) =>
      looseEquals(a, toPrimitiveI(b))
    case (_: JsObject | _: JsProxyV | _: JsArray, JsNum(_) | JsStr(_) | JsBool(_)) =>
      looseEquals(toPrimitiveI(a), b)
    case _ => looseEquals(a, b)
  }

  /** ToString through user conversion methods (template literals, `+`). */
  def toStrI(v: JsValue): String = v match {
    case _: JsObject | _: JsProxyV => toStr(toPrimitiveI(v, "string"))
    case a: JsArray => arrayToStrI(a)
    case other => toStr(other)
  }

  /** ToNumber through user conversion methods (arithmetic operands).
    * Arrays route through the interp-aware join like every other
    * coercion surface (review find r14: `[{toString(){return '2'}}]*1`
    * was NaN here while `== 2` was true — and `[true] - 0` must be NaN
    * via the "true" join, not 1 via an element shortcut). */
  def toNumberI(v: JsValue): Double = v match {
    case _: JsObject | _: JsProxyV | _: JsArray => toNumber(toPrimitiveI(v, "number"))
    case other => toNumber(other)
  }

  def evalBinary(op: String, l: JsValue, r: JsValue, pos: Pos): JsValue = op match {
    case "+" =>
      val lp = toPrimitiveI(l); val rp = toPrimitiveI(r)
      (lp, rp) match {
        case (JsStr(a), _) => budget.allocate(a.length.toLong + 8); JsStr(a + toStr(rp))
        case (_, JsStr(b)) => budget.allocate(b.length.toLong + 8); JsStr(toStr(lp) + b)
        case _ => JsNum(toNumber(lp) + toNumber(rp))
      }
    case "-" => JsNum(toNumberI(l) - toNumberI(r))
    case "*" => JsNum(toNumberI(l) * toNumberI(r))
    case "/" => JsNum(toNumberI(l) / toNumberI(r))
    case "%" => JsNum(toNumberI(l) % toNumberI(r))
    // StrictMath, not Math: V8's ** is its fdlibm pow port — JDK
    // fdlibm halves the 1-ulp divergence rate vs java.lang.Math.pow
    // (see the Math builtins note in Builtins.scala)
    case "**" => JsNum(StrictMath.pow(toNumberI(l), toNumberI(r)))
    case "==" => JsBool(looseEqualsI(l, r))
    case "!=" => JsBool(!looseEqualsI(l, r))
    case "===" => JsBool(strictEquals(l, r))
    case "!==" => JsBool(!strictEquals(l, r))
    case "<" | ">" | "<=" | ">=" =>
      val lp = toPrimitiveI(l, "number"); val rp = toPrimitiveI(r, "number")
      (lp, rp) match {
        case (JsStr(a), JsStr(b)) =>
          val c = a.compareTo(b)
          JsBool(op match { case "<" => c < 0; case ">" => c > 0; case "<=" => c <= 0; case _ => c >= 0 })
        case _ =>
          val a = toNumber(lp); val b = toNumber(rp)
          if (java.lang.Double.isNaN(a) || java.lang.Double.isNaN(b)) JsBool(false)
          else JsBool(op match { case "<" => a < b; case ">" => a > b; case "<=" => a <= b; case _ => a >= b })
      }
    case "&" => JsNum((toInt32(toNumberI(l)) & toInt32(toNumberI(r))).toDouble)
    case "|" => JsNum((toInt32(toNumberI(l)) | toInt32(toNumberI(r))).toDouble)
    case "^" => JsNum((toInt32(toNumberI(l)) ^ toInt32(toNumberI(r))).toDouble)
    case "<<" => JsNum((toInt32(toNumberI(l)) << (toInt32(toNumberI(r)) & 31)).toDouble)
    case ">>" => JsNum((toInt32(toNumberI(l)) >> (toInt32(toNumberI(r)) & 31)).toDouble)
    case ">>>" => JsNum((toUint32(toNumberI(l)) >>> (toInt32(toNumberI(r)) & 31)).toDouble)
    case "instanceof" => JsBool(Builtins.instanceOf(l, r))
    case "in" =>
      (l, r) match { // symbol keys probe the symProps chain
        case (sym: JsSymbolV, o: JsObject) => return JsBool(symChainSlot(o, sym.slot).nonEmpty)
        case (_: JsSymbolV, p: JsProxyV) => return JsBool(proxyHas(p, l))
        case (_: JsSymbolV, _) => return JsBool(false)
        case _ => ()
      }
      r match {
        case p: JsProxyV => JsBool(proxyHas(p, l))
        // chain-aware: 'm' in instance is true for class methods (V8)
        case o: JsObject => JsBool(hasChainProp(o, propKeyStr(l)))
        case a: JsArray =>
          val i = toStr(l).toIntOption
          // a hole is an ABSENT property: `1 in [1,,3]` is false in V8
          JsBool(i.exists(x => x >= 0 && x < a.items.length && !(a.items(x) eq JsHole))
            || toStr(l) == "length")
        case _ => throwType("'in' needs an object right-hand side")
      }
  }

  // ---------------- member access / calls ----------------

  def getMember(obj: JsValue, key: JsValue, pos: Pos): JsValue = {
    key match { // symbol keys address the separate symProps table
      case sym: JsSymbolV if !obj.isInstanceOf[JsSymbolV] => return symbolGet(obj, sym, pos)
      case _ => ()
    }
    obj match {
      case JsNull | (_: JsUndefinedKind) =>
        throwType(s"Cannot read properties of ${toStr(obj)} (reading '${propKeyStr(key)}')")
      case _: AwaitSignal => // loud invariant guard (see AwaitSignal)
        throw new IllegalStateException("internal: await marker leaked into member access")
      case p: JsProxyV => proxyGet(p, key, pos)
      case o: JsObject =>
        val k = propKeyStr(key)
        chainSlot(o, k).map {
          case acc: JsAccessorProp => // getter-less accessor reads undefined
            acc.getter.map(g => callFunction(g, o, Vector.empty, pos, k)).getOrElse(JsUndefined)
          case v => v
        }.getOrElse(
          Builtins.objectMethod(o, k).getOrElse {
            // `.constructor` resolves to the defining CLASS for class
            // instances, else to the GLOBAL builtin of the object's
            // class by identity (`e.constructor === TypeError` must
            // hold — V8's prototype-chain answer); plain objects
            // answer Object. Own/proto props above shadow it, like V8.
            if (k == "constructor") {
              if (o.klass != null) o.klass
              else globalScope.lookup(o.className)
                .orElse(globalScope.lookup("Object")).getOrElse(JsUndefined)
            } else JsUndefined
          })
      case a: JsArray =>
        key match {
          case JsNum(d) if d >= 0 && d == math.floor(d) && d < a.items.length => Values.deHole(a.items(d.toInt))
          case _ =>
            val k = propKeyStr(key)
            if (k == "length") JsNum(a.items.length.toDouble)
            else k.toIntOption match {
              case Some(i) if i >= 0 && i < a.items.length => Values.deHole(a.items(i))
              // negative / out-of-range numeric keys are NAMED props in
              // JS (a[-1] = x is a["-1"]) — setMember stores them in
              // extra, so the read side must consult it too
              case Some(_) => a.extraGet(k).getOrElse(JsUndefined)
              case None => a.extraGet(k) // own named props shadow methods
                .orElse(Builtins.arrayMethod(a, k, this)).getOrElse(JsUndefined)
            }
        }
      case JsStr(s) =>
        key match {
          case JsNum(d) if d >= 0 && d == math.floor(d) && d < s.length => JsStr(s.charAt(d.toInt).toString)
          case _ =>
            val k = propKeyStr(key)
            if (k == "length") JsNum(s.length.toDouble)
            else k.toIntOption match {
              case Some(i) => if (i >= 0 && i < s.length) JsStr(s.charAt(i).toString) else JsUndefined
              case None => Builtins.stringMethod(s, k, this).getOrElse(JsUndefined)
            }
        }
      case n: JsNum => Builtins.numberMethod(n.v, propKeyStr(key)).getOrElse(JsUndefined)
      case b: JsBool => Builtins.booleanMethod(b.b, propKeyStr(key)).getOrElse(JsUndefined)
      case set: JsSetV => Builtins.setMethod(set, propKeyStr(key), this).getOrElse(JsUndefined)
      case m: JsMapV => Builtins.mapMethod(m, propKeyStr(key), this).getOrElse(JsUndefined)
      case g: JsGenerator => Builtins.generatorMethod(g, propKeyStr(key), this).getOrElse(JsUndefined)
      case p: JsPromise => Builtins.promiseMethod(p, propKeyStr(key), this).getOrElse(JsUndefined)
      case ag: JsAsyncGenerator => Builtins.asyncGeneratorMethod(ag, propKeyStr(key), this).getOrElse(JsUndefined)
      case bytes: JsBytes =>
        val k = propKeyStr(key)
        if (k == "length" || k == "byteLength") JsNum(bytes.bytes.length.toDouble)
        else k.toIntOption match {
          case Some(i) if i >= 0 && i < bytes.bytes.length => JsNum((bytes.bytes(i) & 0xff).toDouble)
          case _ => JsUndefined
        }
      case d: JsDate => Builtins.dateMethod(d, propKeyStr(key)).getOrElse(JsUndefined)
      case r: JsRegExpV => Builtins.regexMethod(r, propKeyStr(key), this).getOrElse(JsUndefined)
      case cls: JsClassV => // before the JsFunc catch-all: statics first
        val k = propKeyStr(key)
        if (k == "prototype") cls.protoObj
        else if (k == "name") JsStr(cls.clsName)
        else chainSlot(cls.statics, k) match { // parent statics inherit (V8)
          case Some(acc: JsAccessorProp) => // static accessor: this = the class
            acc.getter.map(g => callFunction(g, cls, Vector.empty, pos, k))
              .getOrElse(JsUndefined)
          case Some(v) => v
          case None => Builtins.functionMethod(cls, k, this).getOrElse(JsUndefined)
        }
      case sym: JsSymbolV => // symbol.description / .toString (V8 allows these reads)
        propKeyStr(key) match {
          case "description" =>
            if (sym.descIsUndefined) JsUndefined else JsStr(sym.description)
          case "toString" => new JsNative("toString", (_, _) => JsStr(s"Symbol(${sym.description})"))
          case _ => JsUndefined
        }
      case f: JsFunc => Builtins.functionMethod(f, propKeyStr(key), this).getOrElse(JsUndefined)
    }
  }

  def setMember(obj: JsValue, key: JsValue, v: JsValue, pos: Pos): Unit = key match {
    case sym: JsSymbolV => symbolSet(obj, sym, v, pos)
    case _ => obj match {
    case JsNull | JsUndefined =>
      throwType(s"Cannot set properties of ${toStr(obj)} (setting '${propKeyStr(key)}')")
    case p: JsProxyV => proxySet(p, key, v, pos)
    case o: JsObject =>
      val k = propKeyStr(key)
      // chain walk: an accessor ANYWHERE on the proto chain receives
      // the write (class setters); a chain DATA slot shadows into an
      // own prop, like V8's [[Set]]
      chainSlot(o, k) match {
        case Some(acc: JsAccessorProp) =>
          // setter runs even on a frozen object (freeze makes the slot
          // non-configurable; the accessor call itself is legal);
          // getter-only assignment is a sloppy-mode silent no-op — V8
          acc.setter.foreach(s => callFunction(s, o, Vector(v), pos, k))
        case _ => if (!o.frozen) { budget.allocate(4); o.props.put(k, v) }
      }
    case a: JsArray =>
      val k = propKeyStr(key)
      if (k == "length") {
        val n = toNumber(v)
        if (n < 0 || n != math.floor(n)) throwRange("invalid array length")
        val len = n.toInt
        if (len < a.items.length) a.items.remove(len, a.items.length - len)
        else { budget.allocate((len - a.items.length).toLong); while (a.items.length < len) a.items += JsHole } // extension creates HOLES, like V8
      } else k.toIntOption match {
        case Some(i) if i >= 0 =>
          if (i >= 1000000000) throwRange("array index too large for lens code")
          budget.allocate(math.max(1, i + 1 - a.items.length).toLong)
          while (a.items.length <= i) a.items += JsHole // gap slots are HOLES, like V8
          a.items(i) = v
        case _ => budget.allocate(4); a.extraPut(k, v) // named props, like V8
      }
    case c: JsClassV =>
      // writing a static: own property on the constructor (V8 [[Set]]
      // on a class object); a static accessor anywhere on the parent
      // chain receives the write with this = the class. Previously a
      // silent no-op — `A.count = 0` did nothing (caught by the
      // static-block work; static blocks assign through this = class).
      val k = propKeyStr(key)
      chainSlot(c.statics, k) match {
        case Some(acc: JsAccessorProp) =>
          acc.setter.foreach(s => callFunction(s, c, Vector(v), pos, k))
        case _ =>
          if (!c.statics.frozen) { budget.allocate(4); c.statics.props.put(k, v) }
      }
    case r: JsRegExpV if propKeyStr(key) == "lastIndex" => r.lastIndex = toNumber(v).toInt
    case _ => () // silent no-op on primitives, like sloppy-mode JS
    }
  }

  // ---------------- proxies (ES Proxy subset — see JsProxyV) ----------------

  /** the handler's trap, looked up like V8's GetMethod (prototype chain
    * + accessors — a class instance can be a handler); None when absent */
  private def proxyTrap(p: JsProxyV, name: String): Option[JsValue] = {
    if (p.revoked)
      throwType(s"Cannot perform '$name' on a proxy that has been revoked")
    getMember(p.handler, JsStr(name), Pos(0)) match {
      case JsUndefined | JsNull => None
      case f: JsFunc => Some(f)
      case other =>
        throwType(s"'$name' trap on proxy handler is not a function (got ${typeOf(other)})")
    }
  }

  /** the key as a trap sees it: symbols pass through (V8 hands the
    * handler the symbol itself), strings as JsStr */
  @inline private def trapKey(key: JsValue): JsValue = key match {
    case s: JsSymbolV => s
    case other => JsStr(toStr(other))
  }

  def proxyGet(p: JsProxyV, key: JsValue, pos: Pos): JsValue = proxyTrap(p, "get") match {
    case Some(f) => callFunction(f, p.handler, Vector(p.target, trapKey(key), p), pos, "get")
    case None => getMember(p.target, key, pos)
  }

  def proxySet(p: JsProxyV, key: JsValue, v: JsValue, pos: Pos): Unit = proxyTrap(p, "set") match {
    // a falsy trap return is a TypeError only in strict mode; lens code
    // runs the reference worker's sloppy function-body contract
    case Some(f) => callFunction(f, p.handler, Vector(p.target, trapKey(key), v, p), pos, "set"); ()
    case None => setMember(p.target, key, v, pos)
  }

  def proxyHas(p: JsProxyV, key: JsValue): Boolean = proxyTrap(p, "has") match {
    case Some(f) => truthy(callFunction(f, p.handler, Vector(p.target, trapKey(key)), Pos(0), "has"))
    case None => truthy(evalBinary("in", key, p.target, Pos(0)))
  }

  def proxyDelete(p: JsProxyV, key: JsValue): Unit = proxyTrap(p, "deleteProperty") match {
    case Some(f) => callFunction(f, p.handler, Vector(p.target, trapKey(key)), Pos(0), "deleteProperty"); ()
    case None => key match {
      case sym: JsSymbolV => p.target match {
        case o: JsObject => if (!o.frozen && o.symProps != null) { o.symProps.remove(sym.slot); () }
        case inner: JsProxyV => proxyDelete(inner, key)
        case _ => ()
      }
      case other => deleteKey(p.target, toStr(other))
    }
  }

  /** own ENUMERABLE keys through the ownKeys trap (no enumerability
    * filtering — this engine's objects have no descriptors; documented
    * subset divergence), else the target's own enumerable keys. */
  def proxyOwnKeys(p: JsProxyV): Vector[String] = proxyTrap(p, "ownKeys") match {
    case Some(f) =>
      callFunction(f, p.handler, Vector(p.target), Pos(0), "ownKeys") match {
        case a: JsArray =>
          val keys = a.items.toVector.map(v => toStr(Values.deHole(v)))
          if (keys.distinct.length != keys.length)
            throwType("proxy ownKeys trap returned duplicate entries")
          // V8 filters the trap's list through the target's (own)
          // property descriptors — phantom keys the target lacks never
          // reach Object.keys / for-in / spread / JSON (descriptor-less
          // subset: existence IS the filter)
          keys.filter(k => targetHasOwn(p.target, k))
        case other => throwType(s"proxy ownKeys trap must return an array (got ${typeOf(other)})")
      }
    case None => p.target match {
      case o: JsObject => ownEntries(o).map(_._1)
      case a: JsArray => a.items.zipWithIndex.collect {
        case (x, ix) if !(x eq JsHole) => ix.toString }.toVector
      case inner: JsProxyV => proxyOwnKeys(inner)
      case _ => Vector.empty
    }
  }

  private def targetHasOwn(t: JsValue, k: String): Boolean = t match {
    case o: JsObject => o.props.contains(k)
    case a: JsArray =>
      k == "length" ||
        k.toIntOption.exists(i => i >= 0 && i < a.items.length && !(a.items(i) eq JsHole)) ||
        (a.extra != null && a.extra.contains(k))
    case inner: JsProxyV => proxyOwnKeys(inner).contains(k)
    case f: JsFunc => k == "name" || k == "length"
    case _ => false
  }

  /** ownKeys + per-key get — the value-observing enumeration proxies
    * present to Object.values/entries, spread, rest and JSON. */
  def proxyOwnEntries(p: JsProxyV): Vector[(String, JsValue)] =
    proxyOwnKeys(p).map(k => (k, proxyGet(p, JsStr(k), Pos(0))))

  /** IsArray pierces proxies (V8: Array.isArray(new Proxy([], {})) is
    * true), and JSON serializes such a proxy as an ARRAY. */
  def proxyIsArray(v: JsValue): Boolean = v match {
    case _: JsArray => true
    case p: JsProxyV => proxyIsArray(p.target)
    case _ => false
  }

  /** the `delete` operator with a raw (possibly symbol) key — shared
    * by the operator and Reflect.deleteProperty */
  def deleteMember(obj: JsValue, keyV: JsValue): Unit = keyV match {
    case sym: JsSymbolV => obj match {
      case o: JsObject =>
        if (!o.frozen && o.symProps != null) { o.symProps.remove(sym.slot); () }
      case p: JsProxyV => proxyDelete(p, sym)
      case _ => ()
    }
    case other => deleteKey(obj, toStr(other))
  }

  /** the `delete` operator's per-type action, shared by the direct
    * path and the proxy no-trap fallback */
  private[js] def deleteKey(obj: JsValue, key: String): Unit = obj match {
    case o: JsObject => if (!o.frozen) { o.props.remove(key); () }
    case a: JsArray =>
      val i = key.toIntOption
      if (i.exists(x => x >= 0 && x < a.items.length)) a.items(i.get) = JsHole // V8 leaves a hole
    case p: JsProxyV => proxyDelete(p, JsStr(key))
    case _ => ()
  }

  private def nullish(v: JsValue): Boolean = v == JsNull || v == JsUndefined

  /** Evaluate a member/call chain with ES2020 optional-chaining
    * short-circuit: once ONE `?.` link sees a nullish base, the WHOLE
    * remaining chain — outer non-optional `.`/`[]` links AND calls,
    * whose arguments are then never evaluated — yields `undefined`
    * (`a?.b.c` on nullish `a` is `undefined`, not a TypeError on the
    * `.c` step). `None` = short-circuited. One subset divergence:
    * our parser discards parentheses, so `(a?.b).c` short-circuits
    * like `a?.b.c` instead of throwing. */
  private def evalChain(e: Expr, scope: Scope): Option[JsValue] = e match {
    // ---- super forms (parser guarantees these shapes) ----
    case Call(SuperRef(p), args, spreads, _, _) =>
      budget.tick()
      superConstruct(scope, spreadArgs(args, spreads, scope, p), p)
      Some(JsUndefined)
    case Call(m @ Member(SuperRef(p), _, _, _, _), args, spreads, _, cp) =>
      budget.tick()
      // super.m(...) runs the PARENT's method with the CURRENT `this`
      val fn = superMember(scope, propKeyStr(evalPropKey(m, scope)), p)
      val thisV = scope.lookup("this").getOrElse(JsUndefined)
      Some(callFunction(fn, thisV, spreadArgs(args, spreads, scope, cp), cp,
        name = if (!m.computed) m.prop.asInstanceOf[StrLit].v else "computed"))
    case m @ Member(SuperRef(p), _, _, _, _) =>
      budget.tick()
      Some(superMember(scope, propKeyStr(evalPropKey(m, scope)), p))
    case m @ Member(objE, PrivName(pn, _), _, _, _) =>
      budget.tick()
      evalChain(objE, scope) match {
        case None => None
        case Some(base) =>
          if (m.optional && nullish(base)) None
          else Some(getPrivate(base, pn, scope, m.pos))
      }
    case m: Member =>
      budget.tick()
      evalChain(m.obj, scope) match {
        case None => None
        case Some(base) =>
          if (m.optional && nullish(base)) None
          else Some(getMember(base, evalPropKey(m, scope), m.pos))
      }
    case c: Call =>
      budget.tick()
      c.callee match {
        case m @ Member(_, PrivName(pn, _), _, _, _) =>
          // private method call: receiver once, `this` = receiver
          evalChain(m.obj, scope) match {
            case None => None
            case Some(obj) =>
              if (m.optional && nullish(obj)) None
              else {
                val fnV = getPrivate(obj, pn, scope, m.pos)
                if (c.optional && nullish(fnV)) None
                else {
                  val args = spreadArgs(c.args, c.spreads, scope, c.pos)
                  Some(callFunction(fnV, obj, args, c.pos, name = pn))
                }
              }
          }
        case m: Member =>
          // method call: evaluate receiver once
          evalChain(m.obj, scope) match {
            case None => None
            case Some(obj) =>
              if (m.optional && nullish(obj)) None
              else {
                val fnV = getMember(obj, evalPropKey(m, scope), m.pos)
                if (c.optional && nullish(fnV)) None
                else {
                  val args = spreadArgs(c.args, c.spreads, scope, c.pos)
                  Some(callFunction(fnV, obj, args, c.pos,
                    name = if (!m.computed) m.prop.asInstanceOf[StrLit].v else "computed"))
                }
              }
          }
        case other =>
          evalChain(other, scope) match {
            case None => None
            case Some(fnV) =>
              if (c.optional && nullish(fnV)) None
              else {
                val args = spreadArgs(c.args, c.spreads, scope, c.pos)
                Some(callFunction(fnV, JsUndefined, args, c.pos, name = other match {
                  case Ident(n, _) => n
                  case _ => "expression"
                }))
              }
          }
      }
    case other => Some(eval(other, scope))
  }

  private def spreadArgs(args: Vector[Expr], spreads: Set[Int], scope: Scope, pos: Pos): Vector[JsValue] = {
    val buf = mutable.ArrayBuffer.empty[JsValue]
    args.zipWithIndex.foreach { case (a, i) =>
      if (spreads.contains(i)) buf ++= iterate(eval(a, scope), pos)
      else buf += eval(a, scope)
    }
    buf.toVector
  }

  // ---------------- classes ----------------

  /** First slot for `k` along the prototype chain (own first); raw —
    * accessor slots come back unevaluated for the caller to invoke
    * with the correct receiver. Plain objects have a null protoV, so
    * this is one map probe for them — the pre-class fast path. */
  private def chainSlot(o: JsObject, k: String): Option[JsValue] = {
    var cur = o
    while (cur != null) {
      val v = cur.props.getOrElse(k, null)
      if (v != null) return Some(v)
      cur = cur.protoV
    }
    None
  }

  /** `k` exists anywhere on the chain — the `in` operator's read. */
  private[js] def hasChainProp(o: JsObject, k: String): Boolean =
    chainSlot(o, k).nonEmpty

  /** the object declares a custom-iterable protocol (a
    * `[Symbol.iterator]` slot) — Array.from's iterable-vs-array-like
    * dispatch */
  private[js] def hasCustomIterator(o: JsObject): Boolean =
    symChainSlot(o, "@@iterator").nonEmpty

  private def buildClass(ce: ClassExpr, scope: Scope): JsClassV = {
    val parentV = ce.parent.map { pe =>
      eval(pe, scope) match {
        case c: JsClassV => c
        case other => throwType(
          s"Class extends value of type ${typeOf(other)} is not a lens-code class")
      }
    }
    val proto = JsObject.empty("Prototype")
    val statics = JsObject.empty("Function")
    parentV.foreach { p => proto.protoV = p.protoObj; statics.protoV = p.statics }
    val cls = new JsClassV(ce.name.getOrElse(""), None, proto, statics, parentV)
    // methods close over an inner scope carrying the class-name
    // self-reference (named-class-expression semantics) and the super
    // bindings the SuperRef evaluator reads
    val classScope = new Scope(scope)
    ce.name.foreach(n => classScope.declare(n, cls))
    classScope.declare("__super_class__", parentV.getOrElse(JsUndefined))
    classScope.declare("__super_proto__",
      parentV.map(_.protoObj: JsValue).getOrElse(JsUndefined))
    classScope.declare("__own_class__", cls)
    // every declared PRIVATE name binds '#name' → this class in the
    // class scope: member bodies resolve obj.#x lexically through it
    // (innermost declaring class wins — exactly JS's private
    // environments). The parser guarantees every use has a declaring
    // class, so eval-side lookups never miss.
    ce.members.foreach { m =>
      if (m.isPrivate) {
        cls.hasPrivates = true
        classScope.declare(m.name.asInstanceOf[StrLit].v, cls)
      }
    }
    // COMPUTED KEYS evaluate in a scope carrying ONLY the private-name
    // bindings over the outer scope — V8's PrivateEnvironment is in
    // force during ClassDefinitionEvaluation, so `[(#x in {}) ? ...]`
    // resolves, but classScope itself must NOT be used here: it also
    // holds the interpreter-internal __super/__own bindings (valid JS
    // identifiers a user key expression could accidentally read,
    // shadowing outer variables) and an already-initialized class
    // self-binding (V8 has it in TDZ during key evaluation; resolving
    // OUTER — the pre-r13 behavior — is the closer approximation).
    // '#names' can never collide with user identifiers, so this scope
    // is observationally exactly "outer + private names".
    val keyScope = new Scope(scope)
    ce.members.foreach { m =>
      if (m.isPrivate) keyScope.declare(m.name.asInstanceOf[StrLit].v, cls)
    }
    // static fields AND static blocks run once, AFTER all methods
    // exist, interleaved in SOURCE ORDER with this = the class (ES2022
    // ClassDefinitionEvaluation; blocks have no slot to assign).
    // Private static fields write their class-side slot instead of a
    // property (the Boolean flag).
    val staticInits = mutable.ArrayBuffer.empty[(Option[(String, Boolean)], JsClosure)]
    def privMap(select: JsClassV => mutable.HashMap[String, JsValue],
                assign: mutable.HashMap[String, JsValue] => Unit): mutable.HashMap[String, JsValue] = {
      if (select(cls) == null) assign(mutable.HashMap.empty)
      select(cls)
    }
    ce.members.foreach { m =>
      val keyV: JsValue =
        if (m.computed) eval(m.name, keyScope)
        else JsStr(m.name.asInstanceOf[StrLit].v)
      val closure = makeClosure(m.fn, classScope, JsUndefined)
      keyV match {
        case sym: JsSymbolV => // `*[Symbol.iterator]() {}` — symProps slot
          m.kind match {
            case "method" =>
              (if (m.isStatic) statics else proto).symPut(sym.slot, closure)
            case "get" | "set" => // symbol-keyed class accessors (r15)
              val target = if (m.isStatic) statics else proto
              val acc = (if (target.symProps != null) target.symProps.get(sym.slot)
                else None) match {
                case Some(a: JsAccessorProp) => a
                case _ => new JsAccessorProp(None, None)
              }
              if (m.kind == "get") acc.getter = Some(closure) else acc.setter = Some(closure)
              target.symPut(sym.slot, acc)
            case other => throwType(
              s"symbol-keyed class ${other}s are not supported in lens code")
          }
        case _ =>
          val key = toStr(keyV)
          m.kind match {
        case "ctor" => cls.ctor = Some(closure)
        case "method" =>
          if (m.isPrivate)
            privMap(_.pm(m.isStatic), h => cls.setPm(m.isStatic, h)).put(key, closure)
          else (if (m.isStatic) statics else proto).props.put(key, closure)
        case "field" =>
          // instance fields run per construction
          if (m.isStatic) {
            if (m.isPrivate) cls.privStaticFieldNames += key
            staticInits += ((Some((key, m.isPrivate)), closure))
          } else cls.fields :+= ((key, closure, m.isPrivate))
        case "staticblock" => staticInits += ((None, closure))
        case _ => // get | set share one slot, like object literals
          val slot: String => Option[JsValue] =
            if (m.isPrivate) privMap(_.pm(m.isStatic), h => cls.setPm(m.isStatic, h)).get
            else (if (m.isStatic) statics else proto).props.get
          val acc = slot(key) match {
            case Some(a: JsAccessorProp) => a
            case _ => new JsAccessorProp(None, None)
          }
          if (m.kind == "get") acc.getter = Some(closure) else acc.setter = Some(closure)
          if (m.isPrivate)
            privMap(_.pm(m.isStatic), h => cls.setPm(m.isStatic, h)).put(key, acc)
          else (if (m.isStatic) statics else proto).props.put(key, acc)
          }
      }
    }
    staticInits.foreach {
      case (Some((k, priv)), c) =>
        val v = invokeClosure(c, cls, Vector.empty)
        if (priv) {
          if (cls.privStaticVals == null) cls.privStaticVals = mutable.HashMap.empty
          cls.privStaticVals.put(k, v)
        } else statics.props.put(k, v)
      case (None, c) => invokeClosure(c, cls, Vector.empty)
    }
    budget.allocate(8L + ce.members.length)
    cls
  }

  /** [[Define]] the instance fields of exactly `cls` (not its chain)
    * on `self`, initializers run with `this` = self — no setter
    * consultation, own props always (ES 7.3.33 DefineField). Private
    * fields land in the instance's `privs` table keyed by the class;
    * the class BRAND stamps here too (ES2022 PrivateBrandAdd at the
    * same construction point), making this-class private METHODS
    * accessible on self from here on. */
  private def initFields(cls: JsClassV, self: JsObject): Unit = {
    if (cls.hasPrivates) {
      if (self.privBrands == null) self.privBrands = mutable.HashSet.empty
      self.privBrands += cls
    }
    cls.fields.foreach { case (k, c, priv) =>
      budget.allocate(4)
      val v = invokeClosure(c, self, Vector.empty)
      if (priv) {
        if (self.privs == null) self.privs = mutable.HashMap.empty
        self.privs.put((cls, k), v)
      } else self.props.put(k, v)
    }
  }

  // -------- private member access (obj.#x) --------
  // Resolution is LEXICAL: the parser guarantees '#x' appears only
  // under a declaring class, and buildClass bound '#x' → that class in
  // the class scope — so the owner lookup never misses.
  // If the invariant ever breaks (it shouldn't — but a catchable error
  // beats a JVM InternalError, which is a VirtualMachineError that
  // escapes the lens's NonFatal guard and could kill the host), surface
  // it as the contracted loud JS TypeError.
  private def privOwner(name: String, scope: Scope): JsClassV =
    scope.lookup(name) match {
      case Some(c: JsClassV) => c
      case _ => throwType(s"Private member $name is not declared by an enclosing class")
    }

  private def privReadError(name: String): Nothing =
    throwType(s"Cannot read private member $name from an object whose class did not declare it")

  def getPrivate(target: JsValue, name: String, scope: Scope, pos: Pos): JsValue = {
    val owner = privOwner(name, scope)
    if (owner.privStaticFieldNames.contains(name) ||
        (owner.privStaticMethods != null && owner.privStaticMethods.contains(name))) {
      // STATIC private: only the class object itself carries it (a
      // subclass does NOT — V8)
      if (!(target match { case c: JsClassV => c eq owner; case _ => false }))
        privReadError(name)
      if (owner.privStaticMethods != null && owner.privStaticMethods.contains(name))
        owner.privStaticMethods(name) match {
          case a: JsAccessorProp =>
            a.getter.map(g => callFunction(g, owner, Vector.empty, pos, name))
              .getOrElse(throwType(s"'$name' was defined without a getter"))
          case m => m
        }
      else owner.privStaticVals match {
        case h if h != null && h.contains(name) => h(name)
        case _ => privReadError(name) // before its initializer ran
      }
    } else target match {
      case o: JsObject =>
        if (owner.privMethods != null && owner.privMethods.contains(name)) {
          if (o.privBrands == null || !o.privBrands.contains(owner))
            privReadError(name)
          owner.privMethods(name) match {
            case a: JsAccessorProp =>
              a.getter.map(g => callFunction(g, o, Vector.empty, pos, name))
                .getOrElse(throwType(s"'$name' was defined without a getter"))
            case m => m
          }
        } else o.privs match {
          case p if p != null && p.contains((owner, name)) => p((owner, name))
          case _ => privReadError(name)
        }
      case _ => privReadError(name)
    }
  }

  def setPrivate(target: JsValue, name: String, v: JsValue, scope: Scope, pos: Pos): Unit = {
    val owner = privOwner(name, scope)
    def writeErr(): Nothing =
      throwType(s"Cannot write private member $name to an object whose class did not declare it")
    if (owner.privStaticFieldNames.contains(name) ||
        (owner.privStaticMethods != null && owner.privStaticMethods.contains(name))) {
      if (!(target match { case c: JsClassV => c eq owner; case _ => false }))
        writeErr()
      if (owner.privStaticMethods != null && owner.privStaticMethods.contains(name))
        owner.privStaticMethods(name) match {
          case a: JsAccessorProp =>
            a.setter.map(s => callFunction(s, owner, Vector(v), pos, name))
              .getOrElse(throwType(s"'$name' was defined without a setter"))
          case _ => throwType(s"Private method '$name' is not writable")
        }
      else {
        // a static private FIELD slot must exist (initializer ran)
        if (owner.privStaticVals == null || !owner.privStaticVals.contains(name))
          writeErr()
        owner.privStaticVals.put(name, v)
      }
    } else target match {
      case o: JsObject =>
        if (owner.privMethods != null && owner.privMethods.contains(name)) {
          if (o.privBrands == null || !o.privBrands.contains(owner)) writeErr()
          owner.privMethods(name) match {
            case a: JsAccessorProp =>
              a.setter.map(s => callFunction(s, o, Vector(v), pos, name))
                .getOrElse(throwType(s"'$name' was defined without a setter"))
            case _ => throwType(s"Private method '$name' is not writable")
          }
        } else {
          if (o.privs == null || !o.privs.contains((owner, name))) writeErr()
          budget.allocate(4)
          o.privs.put((owner, name), v)
        }
      case _ => writeErr()
    }
  }

  /** ES2022 `#x in obj` brand check. A non-object rhs is the same
    * TypeError as the ordinary `in` operator (V8-checked). */
  private def privateIn(name: String, target: JsValue, scope: Scope): Boolean = {
    target match {
      case _: JsObject | _: JsArray | _: JsFunc | _: JsRegExpV => ()
      case other => throwType(
        s"Cannot use 'in' operator to search for '$name' in ${toStr(other)}")
    }
    val owner = privOwner(name, scope)
    if (owner.privStaticFieldNames.contains(name) ||
        (owner.privStaticMethods != null && owner.privStaticMethods.contains(name)))
      (target match { case c: JsClassV => c eq owner; case _ => false }) &&
        (owner.privStaticMethods != null && owner.privStaticMethods.contains(name) ||
         owner.privStaticVals != null && owner.privStaticVals.contains(name))
    else target match {
      case o: JsObject =>
        if (owner.privMethods != null && owner.privMethods.contains(name))
          o.privBrands != null && o.privBrands.contains(owner)
        else o.privs != null && o.privs.contains((owner, name))
      case _ => false
    }
  }

  /** Run `cls`'s constructor on `self`; an undeclared constructor
    * forwards all args to the parent (the implicit derived ctor).
    * Returns the ctor body's return value for the base-class
    * return-object override. */
  // One frame per ACTIVE explicit derived-class constructor: ES 9.2
  // [[ConstructorKind]] "derived" gives `this` a TDZ until exactly one
  // super() call; V8 throws ReferenceError on zero calls (checked at
  // return), on a second call, and on any `this` access before the
  // first. A stack (not a single flag) because a derived ctor may
  // construct another derived instance before its own super() call;
  // frames carry the instance so `this`-TDZ only fires for the ctor's
  // OWN binding (a nested plain function's `this` is a different
  // binding and must not trip it).
  private final class CtorFrame(val self: JsObject) { var superDone = false }
  private val ctorFrames = mutable.ArrayBuffer.empty[CtorFrame]

  /** ReferenceError iff `v` is an instance whose derived ctor is still
    * pre-super() — the ES "this TDZ" (cheap: stack is empty outside
    * class construction). */
  private def checkThisTdz(v: JsValue): Unit = v match {
    case o: JsObject if ctorFrames.nonEmpty &&
        ctorFrames.exists(f => (f.self eq o) && !f.superDone) =>
      throwRef("Must call super constructor in derived class before " +
        "accessing 'this' or returning from derived constructor")
    case _ => ()
  }

  private[js] def runConstructor(cls: JsClassV, self: JsObject,
                                 args: Vector[JsValue]): JsValue =
    cls.ctor match {
      case Some(c) =>
        // base-class fields initialize BEFORE the ctor body; a derived
        // class's initialize when its super() returns (superConstruct)
        if (cls.parent.isEmpty) { initFields(cls, self); invokeClosure(c, self, args) }
        else {
          val frame = new CtorFrame(self)
          ctorFrames += frame
          val r = try invokeClosure(c, self, args)
                  finally ctorFrames.remove(ctorFrames.length - 1)
          // V8: an explicit object return from a derived ctor skips
          // the this-initialized check; anything else needs super()
          if (!frame.superDone && !r.isInstanceOf[JsObject] && !r.isInstanceOf[JsArray])
            throwRef("Must call super constructor in derived class before " +
              "returning from derived constructor")
          r
        }
      case None =>
        cls.parent.foreach(p => runConstructor(p, self, args))
        initFields(cls, self)
        JsUndefined
    }

  private def superClassOf(scope: Scope, pos: Pos): JsClassV =
    scope.lookup("__super_class__") match {
      case Some(c: JsClassV) => c
      case _ => throwType("'super' requires a class with 'extends'")
    }

  private def superConstruct(scope: Scope, args: Vector[JsValue], pos: Pos): Unit = {
    val parent = superClassOf(scope, pos)
    scope.lookup("this") match {
      case Some(self: JsObject) =>
        // end this instance's TDZ; V8 throws on a second call BEFORE
        // re-running the parent ctor
        ctorFrames.reverseIterator.find(_.self eq self).foreach { frame =>
          if (frame.superDone)
            throwRef("Super constructor may only be called once")
          frame.superDone = true
        }
        runConstructor(parent, self, args)
        // super() return is where THIS class's fields initialize (V8)
        scope.lookup("__own_class__") match {
          case Some(own: JsClassV) => initFields(own, self)
          case _ => ()
        }
      case _ => throwType("'super' called outside of an instance context")
    }
  }

  /** `super.k` — lookup starts at the PARENT's prototype, but accessor
    * receivers and method `this` stay the current instance (V8's
    * HomeObject semantics for this subset). */
  private def superMember(scope: Scope, k: String, pos: Pos): JsValue = {
    val proto = scope.lookup("__super_proto__") match {
      case Some(o: JsObject) => o
      case _ => throwType("'super' requires a class with 'extends'")
    }
    val thisV = scope.lookup("this").getOrElse(JsUndefined)
    chainSlot(proto, k) match {
      case Some(acc: JsAccessorProp) =>
        acc.getter.map(g => callFunction(g, thisV, Vector.empty, pos, k))
          .getOrElse(JsUndefined)
      case Some(v) => v
      case None => JsUndefined
    }
  }

  /** The callable `toJSON` of an object, own or inherited (class
    * method), through an accessor if that's how it's stored —
    * JSON.stringify's ES 25.5.2.3 step. None when absent or not
    * callable. */
  private[js] def toJsonMethod(o: JsObject): Option[JsFunc] =
    chainSlot(o, "toJSON").flatMap {
      case f: JsFunc => Some(f)
      case acc: JsAccessorProp =>
        acc.getter.map(g => callFunction(g, o, Vector.empty, Pos(0), "toJSON"))
          .collect { case f: JsFunc => f }
      case _ => None
    }

  /** Own entries with accessor slots EVALUATED (getter invoked with
    * `this` = the object; getter-less accessors read undefined) — the
    * value-observing enumeration Object.values/entries, spread,
    * JSON.stringify and output conversion share. Key-only enumeration
    * (Object.keys, for-in) uses Values.ownEntries directly and never
    * invokes getters, like V8. */
  def ownEvalEntries(o: JsObject): Vector[(String, JsValue)] =
    Values.ownEntries(o).map {
      case (k, acc: JsAccessorProp) =>
        (k, acc.getter.map(g => callFunction(g, o, Vector.empty, Pos(0), k))
          .getOrElse(JsUndefined))
      case kv => kv
    }

  /** Symbol-keyed own entries with accessor slots EVALUATED (getter
    * invoked with `this` = the SOURCE object) — the symbol half of
    * CopyDataProperties. Spread and destructuring-rest copy the
    * getter's current VALUE, never the accessor record (V8); a raw
    * symPut of a JsAccessorProp onto the copy would re-invoke the
    * getter later with the copy as receiver. */
  def symEvalEntries(o: JsObject): Vector[(String, JsValue)] =
    if (o.symProps == null) Vector.empty
    else o.symProps.toVector.map {
      case (slot, acc: JsAccessorProp) =>
        (slot, acc.getter.map(g => callFunction(g, o, Vector.empty, Pos(0), slot))
          .getOrElse(JsUndefined))
      case kv => kv
    }

  /** One own property with an accessor slot evaluated; None if absent. */
  def getOwnEval(o: JsObject, k: String): Option[JsValue] =
    o.props.get(k).map {
      case acc: JsAccessorProp =>
        acc.getter.map(g => callFunction(g, o, Vector.empty, Pos(0), k))
          .getOrElse(JsUndefined)
      case v => v
    }

  def callFunction(fnV: JsValue, thisV: JsValue, args: Vector[JsValue], pos: Pos,
                   name: String = ""): JsValue = {
    budget.tick()
    fnV match {
      case native: JsNative => native.fn(thisV, args)
      case closure: JsClosure => invokeClosure(closure, thisV, args)
      case cls: JsClassV => // V8: classes only construct
        throwType(s"Class constructor ${cls.clsName} cannot be invoked without 'new'")
      case p: JsProxyV if p.target.isInstanceOf[JsFunc] || p.target.isInstanceOf[JsProxyV] =>
        // [[Call]] with no apply trap forwards to the target (V8); an
        // apply TRAP is the out-of-subset boundary — loud, never silent
        if (p.revoked) throwType("Cannot perform 'apply' on a proxy that has been revoked")
        if (getMember(p.handler, JsStr("apply"), pos) != JsUndefined)
          throwType("proxy apply traps are not supported in lens code")
        callFunction(p.target, thisV, args, pos, name)
      case other => throwType(s"$name is not a function (got ${typeOf(other)})")
    }
  }

  // Call-depth cap: unbounded user recursion (`function f(){f()}f()`)
  // would hit a JVM StackOverflowError long before the step budget
  // (thousands of frames vs 20M steps). Real engines throw a CATCHABLE
  // RangeError here — match that, so lens code may try/catch it, while
  // the budget/timeout kills above stay uncatchable. PER-THREAD (r13):
  // the counter guards a JVM STACK, and each generator body owns its
  // worker's stack — a shared counter made 500 SUSPENDED generators
  // (each holding +1 forever) break unrelated calls on the main
  // thread, which V8 runs fine.
  private val callDepthTL: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](1))

  def invokeClosure(c: JsClosure, thisV: JsValue, args: Vector[JsValue]): JsValue = {
    // async GENERATOR first: isGenerator alone would hand back a SYNC
    // generator object and silently skip the await machinery
    if (c.isGenerator && c.isAsync) {
      budget.allocate(8)
      return new JsAsyncGenerator(makeGenerator(c, thisV, args))
    }
    if (c.isGenerator) return makeGenerator(c, thisV, args)
    // async call: the body is a suspendable frame on the generator
    // machinery (registered in liveGens so an abandoned awaiting body
    // is reaped at end-of-map like any suspended generator); it runs
    // synchronously to the first await, and the call evaluates to the
    // result promise (ES AsyncFunctionStart). An ASYNC GENERATOR call
    // runs nothing — a suspended async-generator object comes back,
    // its requests served in order by Promises.asyncGenRequest.
    if (c.isAsync) return Promises.callAsync(makeGenerator(c, thisV, args), this)
    val depth = callDepthTL.get
    depth(0) += 1
    if (depth(0) > Interp.MaxCallDepth) {
      depth(0) -= 1
      throwRange("Maximum call stack size exceeded")
    }
    try invokeClosureBody(c, thisV, args)
    finally depth(0) -= 1
  }

  // ---------------- microtasks (promises / async, r14) ----------------

  /** FIFO promise-job queue (ES HostEnqueuePromiseJob). Single queue,
    * single drain thread (the map-call task thread) — job order is a
    * pure function of the program because the sandbox has no timers or
    * IO. Async-body resumptions are jobs too, so at any instant
    * exactly one of (drain thread, one async body) runs. */
  private val microtasks = new java.util.ArrayDeque[() => Unit]()
  /** rejected promises nobody has handled (scanned at quiescence) */
  private val rejections = mutable.ArrayBuffer.empty[JsPromise]

  private[js] def enqueueJob(job: () => Unit): Unit = {
    budget.allocate(4)
    microtasks.addLast(job)
  }

  private[js] def trackRejection(p: JsPromise): Unit = rejections += p

  /** Run the queue to quiescence. Each job ticks the budget, so a
    * job-spawning loop (`function f(){ Promise.resolve().then(f) }`)
    * dies on the step budget like any other runaway. The lens worker
    * calls this after every map body (the reference worker `await`s
    * its map apply — worker:131 — so V8's queue likewise drains before
    * outputs return). */
  def drainJobs(): Unit = {
    while (!microtasks.isEmpty) {
      budget.tick()
      microtasks.pollFirst()()
    }
  }

  /** First still-unhandled rejection at quiescence, if any — surfaced
    * by the lens worker as the map call's error (DELIBERATE loud
    * divergence: V8 only warns on stderr; a lens that rejects and
    * never handles it almost certainly lost outputs silently). */
  def unhandledRejection: Option[JsValue] =
    rejections.find(p => !p.handled && p.state == 2).map(_.value)

  // ---------------- generators ----------------

  /** every generator object this Interp created — reaped by
    * [[closeGenerators]] at the end of the map call so abandoned
    * suspended bodies never leak their threads across records */
  private val liveGens = mutable.ArrayBuffer.empty[JsGenerator]

  /** calling a `function*`: the body does NOT run; a suspended
    * generator object comes back (ES 15.5.2). */
  private def makeGenerator(c: JsClosure, thisV: JsValue, args: Vector[JsValue]): JsGenerator = {
    budget.allocate(16) // a thread + two queues is well above a plain object
    val g = new JsGenerator(c, thisV, args)
    // synchronized: a generator body's code (incl. teardown-run finally
    // blocks) can create generators from its worker thread while
    // closeGenerators drains the registry on the task thread
    liveGens.synchronized {
      if (liveGens.length >= Interp.MaxLiveGenerators)
        throwRange(s"lens code created more than ${Interp.MaxLiveGenerators} generators in one map call")
      liveGens += g
    }
    g
  }

  /** Release every non-finished generator body's pooled worker (queue-
    * based GenKill — see Generators.close). The lens worker calls this
    * after EVERY map call (including error paths) — a suspended
    * generator would otherwise hold a pool worker for the life of the
    * executor. */
  def closeGenerators(): Unit = {
    // drain in BATCHES until stable: close() waits for each body's
    // unwind, and an unwinding finally may register NEW generators
    var more = true
    while (more) {
      val batch = liveGens.synchronized {
        val b = liveGens.toVector
        liveGens.clear()
        b
      }
      batch.foreach(Generators.close)
      more = batch.nonEmpty
    }
  }

  /** The generator BODY frame, run on the generator's own worker by
    * [[Generators.runBody]] — the plain closure frame minus the
    * isGenerator dispatch. Depth is per-thread, so the body charges its
    * OWN worker's counter (its frames live on that stack), never the
    * caller's. */
  private[js] def runGeneratorFrame(c: JsClosure, thisV: JsValue, args: Vector[JsValue]): JsValue = {
    val depth = callDepthTL.get
    depth(0) += 1
    if (depth(0) > Interp.MaxCallDepth) {
      depth(0) -= 1
      throwRange("Maximum call stack size exceeded")
    }
    try invokeClosureBody(c, thisV, args)
    finally depth(0) -= 1
  }

  private def invokeClosureBody(c: JsClosure, thisV: JsValue, args: Vector[JsValue]): JsValue = {
    val fnScope = new Scope(c.env)
    val effectiveThis = if (c.isArrow) c.capturedThis else thisV
    fnScope.declare("this", effectiveThis)
    // named function expressions can self-reference
    c.fnName.foreach(n => if (fnScope.lookup(n).isEmpty) fnScope.declare(n, c))
    c.params.zipWithIndex.foreach { case (p, i) =>
      bindPattern(p, args.lift(i).getOrElse(JsUndefined), fnScope, "let")
    }
    c.restParam.foreach { r =>
      val rest = args.drop(c.params.length)
      budget.allocate(rest.length.toLong + 1)
      fnScope.declare(r, new JsArray(mutable.ArrayBuffer(rest: _*)))
    }
    if (!c.isArrow) {
      budget.allocate(args.length.toLong + 1)
      fnScope.declare("arguments", new JsArray(mutable.ArrayBuffer(args: _*)))
    }
    c.exprBody match {
      case Some(e) => eval(e, fnScope)
      case None =>
        hoist(c.body, fnScope)
        try { c.body.foreach(exec(_, fnScope)); JsUndefined }
        catch { case ReturnSig(v) => v }
    }
  }

  private def evalNew(n: NewExpr, scope: Scope): JsValue = {
    val ctor = eval(n.callee, scope)
    val args = spreadArgs(n.args, n.spreads, scope, n.pos)
    Builtins.construct(ctor, args, this, n.pos)
  }

  // exposed for builtins that re-enter (map/filter/reduce/sort callbacks)
  def callCallback(fn: JsValue, args: Vector[JsValue], pos: Pos = Pos(0)): JsValue =
    callFunction(fn, JsUndefined, args, pos, "callback")
}

object Interp {
  /** user-function call depth cap (see the callDepth comment): 500
    * closure frames ≈ a few thousand JVM frames — far under the JVM
    * stack, far over any sane lens recursion */
  val MaxCallDepth = 500
  /** generator objects per map call: each holds a (lazy) daemon thread,
    * so the cap bounds thread pressure the way MaxCallDepth bounds
    * stacks. Catchable RangeError, like the call-depth cap. */
  val MaxLiveGenerators = 2000
}
