package graft.js

import Values._
import Ast.Pos
import scala.collection.mutable

/** The standard library available to lens code — the deterministic subset
  * the reference's isolate environment exposes
  * (reference: library/workers/environment.js/index.js blocks
  * Math.random; everything else is stock V8 built-ins).
  *
  * Notable deliberate traps, mirroring or extending the reference's
  * determinism rules:
  *  - `Math.random()` throws with the reference's exact message
  *    (environment.js/index.js:3-5).
  *  - argless `new Date()` / `Date.now()` throw — wall-clock reads would
  *    make lens rebuilds non-reproducible.
  */
object Builtins {

  private def native(name: String)(fn: (JsValue, Vector[JsValue]) => JsValue): JsNative =
    new JsNative(name, fn)

  private def arg(args: Vector[JsValue], i: Int): JsValue = args.lift(i).getOrElse(JsUndefined)

  /** a BUILTIN LAZY ITERATOR (r16): the protocol object V8 returns from
    * String.matchAll and Map/Set/Array keys·values·entries — `next`
    * drains the underlying pull, `[Symbol.iterator]()` answers itself.
    * Spread/for-of ride Interp.protocolIterator as before; manual
    * `.next()` now follows the protocol instead of the pre-r16 loud
    * array-subset boundary. Snapshot semantics where the backing
    * collection mutates mid-iteration (V8 iterates live — documented
    * subset divergence, same class as the prior array shape). */
  private[js] def builtinIterator(name: String, it: Iterator[JsValue]): JsObject = {
    val o = JsObject.empty(s"$name Iterator")
    o.props.put("next", native("next") { (_, _) =>
      val r = JsObject.empty()
      if (it.hasNext) {
        r.props.put("value", it.next()); r.props.put("done", JsBool(false))
      } else {
        r.props.put("value", JsUndefined); r.props.put("done", JsBool(true))
      }
      r
    })
    o.symPut("@@iterator", native("[Symbol.iterator]")((_, _) => o))
    o
  }

  // ---------------- global scope construction ----------------

  /** Build the global scope + the `global` self-referential object.
    * `extraGlobals` carries the lens API (output/console/Markup). */
  def makeGlobals(interp: () => Interp, extraGlobals: Seq[(String, JsValue)]): (Scope, JsObject) = {
    val scope = new Scope(null)
    val globalObj = JsObject.empty("global")

    def put(name: String, v: JsValue): Unit = {
      scope.declare(name, v)
      globalObj.props.put(name, v)
    }

    put("undefined", JsUndefined)
    put("NaN", JsNum(Double.NaN))
    put("Infinity", JsNum(Double.PositiveInfinity))
    put("globalThis", globalObj)
    put("global", globalObj)

    // HTML structured clone, the node-verified subset semantics: deep
    // copy with cycle identity preserved; sparse holes preserved;
    // getters evaluated into data; class instances flatten to plain
    // objects (own props only); RegExp clones with lastIndex reset;
    // functions throw DataCloneError. Dates are immutable here, so the
    // instance is shared.
    put("structuredClone", native("structuredClone") { (_, as) =>
      val memo = new java.util.IdentityHashMap[AnyRef, JsValue]()
      def clone1(v: JsValue): JsValue = v match {
        case f: JsFunc =>
          throw JsThrown(makeError("DataCloneError",
            s"${if (f.name.isEmpty) "function" else f.name} could not be cloned"))
        case _: JsGenerator =>
          throw JsThrown(makeError("DataCloneError",
            "[object Generator] could not be cloned"))
        case _: JsProxyV => // exotic object: V8 DataCloneError, never a silent unwrap
          throw JsThrown(makeError("DataCloneError",
            "#<Object> could not be cloned"))
        case sym: JsSymbolV =>
          throw JsThrown(makeError("DataCloneError",
            s"Symbol(${sym.description}) could not be cloned"))
        case a: JsArray =>
          val seen = memo.get(a)
          if (seen != null) seen
          else {
            val out = JsArray.empty
            memo.put(a, out)
            interp().budget.allocate(a.items.length.toLong + 1)
            a.items.foreach(it =>
              out.items += (if (it eq JsHole) JsHole else clone1(it)))
            out
          }
        case o: JsObject =>
          val seen = memo.get(o)
          if (seen != null) seen
          else {
            val out = JsObject.empty()
            memo.put(o, out)
            val entries = interp().ownEvalEntries(o)
            interp().budget.allocate(entries.length.toLong + 1)
            entries.foreach { case (k, pv) => out.props.put(k, clone1(pv)) }
            out
          }
        case s: JsSetV =>
          val seen = memo.get(s)
          if (seen != null) seen
          else {
            val out = JsSetV.empty
            memo.put(s, out)
            interp().budget.allocate(s.entries.size.toLong + 1)
            s.entries.values.foreach { v0 =>
              val c = clone1(v0); out.entries.put(new JsKey(c), c)
            }
            out
          }
        case m: JsMapV =>
          val seen = memo.get(m)
          if (seen != null) seen
          else {
            val out = JsMapV.empty
            memo.put(m, out)
            interp().budget.allocate(m.entries.size.toLong + 1)
            m.entries.values.foreach { case (k0, v0) =>
              val ck = clone1(k0); out.entries.put(new JsKey(ck), (ck, clone1(v0)))
            }
            out
          }
        case r: JsRegExpV => // fresh lastIndex = 0, like V8
          new JsRegExpV(r.source, r.flags, r.pattern, r.negGroups, r.negNames,
            r.jsToJava, r.jsGroups, r.laSentinels)
        case b: JsBytes => new JsBytes(b.bytes.clone())
        case prim => prim // numbers/strings/bools/null/undefined/dates
      }
      clone1(arg(as, 0))
    })
    put("Math", mathObject(interp))
    put("JSON", jsonObject(interp))
    put("Object", objectConstructor(interp))
    put("Array", arrayConstructor(interp))
    put("String", stringConstructor(interp))
    put("Number", numberConstructor(interp))
    put("Boolean", native("Boolean")((_, as) => JsBool(truthy(arg(as, 0)))))
    put("Set", setConstructor(interp))
    put("Map", mapConstructor(interp))
    put("RegExp", native("RegExp") { (_, as) =>
      val src = arg(as, 0) match {
        case r: JsRegExpV => r.source
        case other => toStr(other)
      }
      val flags = arg(as, 1) match {
        case JsUndefined => arg(as, 0) match { case r: JsRegExpV => r.flags; case _ => "" }
        case f => toStr(f)
      }
      compileRegex(src, flags, Pos(0))
    })
    put("Date", dateConstructor)
    Seq("Error", "TypeError", "RangeError", "SyntaxError", "ReferenceError", "EvalError").foreach { en =>
      put(en, native(en)((_, as) => makeError(en, arg(as, 0) match {
        case JsUndefined => ""
        case m => toStr(m)
      })))
    }
    // Symbol: well-known instances (r13) + UNIQUE `Symbol(desc)`
    // creation (r15 — closes the last named subset hole). Each call
    // mints a fresh per-Interp @@u<n> slot, so identity and symProps
    // keying come for free; the instance registers with the Interp so
    // enumeration surfaces can hand the canonical object back. A
    // SYMBOL argument throws (V8: ToString(sym) in the description
    // step); `new Symbol()` stays the V8 not-a-constructor TypeError.
    locally {
      val statics = JsObject.empty("Function")
      statics.props.put("iterator", JsSymbols.iterator) // THE canonical instance (identity matters for ===)
      statics.props.put("asyncIterator", JsSymbols.asyncIterator)
      // the GlobalSymbolRegistry pair (ES 20.4.2.2/20.4.2.6) — see the
      // Interp.symbolForRegistry scaladoc for the per-record scope note
      statics.props.put("for", native("for") { (_, as) =>
        val it = interp()
        val key = it.toStrI(arg(as, 0)) // ToString(key) — a symbol arg throws, V8
        it.symbolForRegistry.getOrElseUpdate(key, {
          it.budget.allocate(8)
          val sym = new JsSymbolV("@@u" + it.symbolSeq.incrementAndGet(), key)
          it.registerSymbol(sym)
          it.symbolForKeys.put(sym, key)
          sym
        })
      })
      statics.props.put("keyFor", native("keyFor") { (_, as) =>
        arg(as, 0) match {
          case sym: JsSymbolV =>
            interp().symbolForKeys.get(sym).map(JsStr(_): JsValue).getOrElse(JsUndefined)
          case other => throwType(s"${typeOf(other)} is not a symbol")
        }
      })
      statics.frozen = true
      put("Symbol", hybridCallable(native("Symbol") { (_, as) =>
        val it = interp()
        it.budget.allocate(8)
        val (desc, undef) = as.headOption match {
          case None | Some(JsUndefined) => ("", true)
          case Some(v) => (it.toStrI(v), false) // symbol arg throws here, like V8
        }
        val sym = new JsSymbolV("@@u" + it.symbolSeq.incrementAndGet(), desc, undef)
        it.registerSymbol(sym)
        sym
      }, statics))
    }
    // Proxy (r13 subset — see JsProxyV): construct-only, + revocable
    locally {
      val statics = JsObject.empty("Function")
      statics.props.put("revocable", native("revocable") { (_, as) =>
        makeProxy(as, interp()) match {
          case p: JsProxyV =>
            JsObject.of(
              "proxy" -> p,
              "revoke" -> native("revoke") { (_, _) => p.revoked = true; JsUndefined })
          case other => other // unreachable: makeProxy throws or returns a proxy
        }
      })
      put("Proxy", hybridCallable(native("Proxy") { (_, _) =>
        throwType("Constructor Proxy requires 'new'")
      }, statics))
    }
    // Reflect (the trap-forwarding subset handlers actually use):
    // thin wrappers over the interpreter's own member paths, so
    // Reflect.get(new Proxy(...), k) recurses through traps like V8
    put("Reflect", {
      val r = JsObject.empty("Reflect")
      // keys pass RAW (symbols reach the symProps table / proxy traps
      // as symbols, like V8 — and the member paths already accept any
      // key value, so no pre-stringification is needed at all)
      r.props.put("get", native("get")((_, as) =>
        interp().getMember(arg(as, 0), arg(as, 1), Pos(0))))
      r.props.put("set", native("set") { (_, as) =>
        interp().setMember(arg(as, 0), arg(as, 1), arg(as, 2), Pos(0))
        JsBool(true)
      })
      r.props.put("has", native("has")((_, as) =>
        interp().evalBinary("in", arg(as, 1), arg(as, 0), Pos(0))))
      r.props.put("deleteProperty", native("deleteProperty") { (_, as) =>
        interp().deleteMember(arg(as, 0), arg(as, 1))
        JsBool(true)
      })
      r.props.put("ownKeys", native("ownKeys") { (_, as) =>
        arg(as, 0) match {
          case o: JsObject =>
            // V8 order: string keys first, then own symbols (r15)
            val syms = if (o.symProps == null) Nil
              else o.symProps.keysIterator
                .flatMap(interp().symbolForSlot).map(s => s: JsValue).toList
            JsArray.of(ownEntries(o).map(e => JsStr(e._1): JsValue) ++ syms: _*)
          case a: JsArray =>
            // V8 EXCLUDES hole indices (holes are absent own properties:
            // Reflect.ownKeys([1,,3]) is ["0","2","length"]) and appends
            // 'length' — same hole filter as Interp.targetHasOwn
            JsArray.of((a.items.zipWithIndex.collect {
              case (x, ix) if !(x eq JsHole) => JsStr(ix.toString): JsValue
            }.toSeq :+ JsStr("length")): _*)
          case p: JsProxyV => JsArray.of(interp().proxyOwnKeys(p).map(JsStr(_): JsValue): _*)
          case other => throwType(s"Reflect.ownKeys called on non-object (got ${typeOf(other)})")
        }
      })
      r.frozen = true
      r
    })
    // Promises + async (r14): the sandbox has no timers/IO, so job
    // order is deterministic; the lens worker drains the queue to
    // quiescence after each map body (JsMapFn)
    put("Promise", promiseConstructor(interp))
    put("queueMicrotask", native("queueMicrotask") { (_, as) =>
      val fn = arg(as, 0)
      if (!fn.isInstanceOf[JsFunc])
        throwType("queueMicrotask argument is not a function")
      val i = interp()
      // a throwing microtask is the map call's error (V8 reports it as
      // an uncaught exception on the host — same boundary)
      i.enqueueJob(() => { i.callFunction(fn, JsUndefined, Vector.empty, Pos(0), "microtask"); () })
      JsUndefined
    })
    put("parseInt", native("parseInt")((_, as) => JsNum(parseIntJs(interp().toStrI(arg(as, 0)), arg(as, 1)))))
    put("parseFloat", native("parseFloat")((_, as) => JsNum(parseFloatJs(interp().toStrI(arg(as, 0))))))
    put("isNaN", native("isNaN")((_, as) => JsBool(java.lang.Double.isNaN(interp().toNumberI(arg(as, 0))))))
    put("isFinite", native("isFinite") { (_, as) =>
      val d = interp().toNumberI(arg(as, 0)); JsBool(!java.lang.Double.isNaN(d) && !java.lang.Double.isInfinite(d))
    })
    put("encodeURIComponent", native("encodeURIComponent") { (_, as) =>
      JsStr(java.net.URLEncoder.encode(toStr(arg(as, 0)), "UTF-8")
        .replace("+", "%20").replace("%21", "!").replace("%27", "'")
        .replace("%28", "(").replace("%29", ")").replace("%7E", "~"))
    })
    put("decodeURIComponent", native("decodeURIComponent") { (_, as) =>
      try JsStr(java.net.URLDecoder.decode(toStr(arg(as, 0)).replace("+", "%2B"), "UTF-8"))
      catch { case _: Exception => throw JsThrown(makeError("URIError", "URI malformed")) }
    })

    extraGlobals.foreach { case (n, v) => put(n, v) }
    (scope, globalObj)
  }

  // ---------------- constructors usable with `new` ----------------

  /** `new X(...)` dispatch: the interpreter calls this for NewExpr */
  def construct(ctor: JsValue, args: Vector[JsValue], interp: Interp, pos: Pos): JsValue = ctor match {
    case n: JsNative => n.name match {
      case "Set" | "Map" | "RegExp" | "Date" | "Error" | "TypeError" | "RangeError" |
           "SyntaxError" | "ReferenceError" | "EvalError" | "Array" | "Object" =>
        n.fn(JsUndefined, args) // these natives construct when called
      case "String" => JsStr(args.headOption.map(interp.toStrI).getOrElse(""))
      case "Number" => JsNum(args.headOption.map(interp.toNumberI).getOrElse(0.0))
      case "Boolean" => JsBool(args.headOption.exists(truthy))
      case "Proxy" => makeProxy(args, interp)
      case "Symbol" => throwType("Symbol is not a constructor")
      case "Promise" =>
        // new Promise(executor): executor runs SYNCHRONOUSLY with the
        // shared-latch (resolve, reject) pair; an executor throw
        // rejects unless already resolved (ES 27.2.3.1)
        val executor = args.headOption.getOrElse(JsUndefined)
        if (!executor.isInstanceOf[JsFunc])
          throwType("Promise resolver is not a function")
        val p = Promises.newPromise(interp)
        val (res, rej) = Promises.resolvingFunctions(p, interp)
        try { interp.callFunction(executor, JsUndefined, Vector(res, rej), pos, "executor"); () }
        catch {
          // reject THROUGH the pair (latch-guarded): a resolve the
          // executor already performed wins over its later throw (spec)
          case JsThrown(err) =>
            interp.callFunction(rej, JsUndefined, Vector(err), pos, "reject"); ()
        }
        p
      case other => throwType(s"$other is not a constructor in lens code")
    }
    case c: JsClosure =>
      // user constructor functions: `this` is a fresh object; return
      // object-result override, else `this`
      if (c.isGenerator) // V8: generator functions are not constructors
        throwType(s"${if (c.name.isEmpty) "anonymous generator" else c.name} is not a constructor")
      if (c.isAsync) // V8: async functions are not constructors
        throwType(s"${if (c.name.isEmpty) "anonymous async function" else c.name} is not a constructor")
      val self = JsObject.empty()
      interp.invokeClosure(c, self, args) match {
        case o: JsObject => o
        case a: JsArray => a
        case _ => self
      }
    case cls: JsClassV =>
      // class instantiation: fresh instance linked to the class's
      // prototype chain; a constructor returning an object overrides
      // (the base-class override rule, applied uniformly)
      val self = JsObject.empty()
      self.protoV = cls.protoObj
      self.klass = cls
      interp.budget.allocate(4)
      interp.runConstructor(cls, self, args) match {
        case o: JsObject => o
        case a: JsArray => a
        case _ => self
      }
    case other => throwType(s"${typeOf(other)} is not a constructor")
  }

  /** `new Proxy(target, handler)` — targets restricted to objects,
    * arrays, and nested proxies (no callable proxies: apply/construct
    * traps are out of the subset, per JsProxyV's scaladoc). */
  private def makeProxy(args: Vector[JsValue], interp: Interp): JsValue = {
    val target = args.headOption.getOrElse(JsUndefined)
    val handler = args.lift(1).getOrElse(JsUndefined)
    target match {
      // function targets are legal; CALLING such a proxy forwards to
      // the target (V8's [[Call]] with no apply trap) — an apply/
      // construct TRAP is the loud out-of-subset boundary, checked at
      // call time in Interp.callFunction
      case _: JsObject | _: JsArray | _: JsProxyV | _: JsFunc => ()
      case _ => throwType("Cannot create proxy with a non-object as target")
    }
    handler match {
      case h: JsObject =>
        interp.budget.allocate(8)
        new JsProxyV(target, h)
      case _ => throwType("Cannot create proxy with a non-object as handler")
    }
  }

  def instanceOf(v: JsValue, ctor: JsValue): Boolean = ctor match {
    case n: JsNative => n.name match {
      case "Array" => v match { // instanceof pierces proxies like isArray (V8 walks the target's chain)
        case _: JsArray => true
        case p: JsProxyV => instanceOf(p.target, ctor)
        case _ => false
      }
      case "Set" => v.isInstanceOf[JsSetV]
      case "Map" => v.isInstanceOf[JsMapV]
      case "RegExp" => v.isInstanceOf[JsRegExpV]
      case "Date" => v.isInstanceOf[JsDate]
      case "Promise" => v.isInstanceOf[JsPromise]
      case "Object" => v match {
        case _: JsObject | _: JsArray | _: JsSetV | _: JsMapV | _: JsFunc |
             _: JsRegExpV | _: JsProxyV | _: JsPromise => true
        case _ => false
      }
      case "Error" => v match {
        case o: JsObject => o.className.endsWith("Error")
        case _ => false
      }
      case en if en.endsWith("Error") => v match {
        case o: JsObject => o.className == en
        case _ => false
      }
      case _ => false
    }
    case cls: JsClassV => v match {
      case o: JsObject =>
        var k = o.klass
        while (k != null) {
          if (k eq cls) return true
          k = k.parent.orNull
        }
        false
      case _ => false
    }
    case _: JsClosure => false // ctor-fn prototypes unsupported; instanceof user-fn is always false here
    case _ => throwType("right-hand side of 'instanceof' is not callable")
  }

  // ---------------- Math ----------------

  private def mathObject(interp: () => Interp): JsObject = {
    val m = JsObject.empty("Math")
    // arguments coerce via interp-aware ToNumber (r13): user valueOf /
    // proxy get traps are honored, like V8
    def num(v: JsValue): Double = interp().toNumberI(v)
    def put1(name: String)(f: Double => Double): Unit =
      m.props.put(name, native(name)((_, as) => JsNum(f(num(arg(as, 0))))))
    m.props.put("PI", JsNum(math.Pi)); m.props.put("E", JsNum(math.E))
    m.props.put("LN2", JsNum(math.log(2))); m.props.put("LN10", JsNum(math.log(10)))
    m.props.put("LOG2E", JsNum(1 / math.log(2))); m.props.put("LOG10E", JsNum(1 / math.log(10)))
    m.props.put("SQRT2", JsNum(math.sqrt(2))); m.props.put("SQRT1_2", JsNum(math.sqrt(0.5)))
    put1("abs")(math.abs); put1("floor")(math.floor); put1("ceil")(math.ceil)
    put1("round")(d => math.floor(d + 0.5)) // JS round: half-up, not half-even
    put1("trunc")(d => if (d < 0) math.ceil(d) else math.floor(d))
    // Transcendentals go through StrictMath (JDK's fdlibm), NOT Math:
    // V8's Math.* are its base::ieee754 fdlibm ports, and a measured
    // 20k-sample V8-differential sweep (round 10) shows StrictMath
    // matches V8 BIT-FOR-BIT on exp/log/log10/sin/cos/tan where
    // java.lang.Math diverges by 1 ulp on 2-15% of inputs. cbrt/log2
    // (where the JDK has no matching fdlibm) use the repo's own
    // Ieee754 ports — 0 mismatches on a 60k-sample sweep. The ONLY
    // remaining 1-ulp tail is pow (StrictMath: 124/6000 off vs
    // Math.pow's 312/6000 — V8's pow is a later msun revision).
    // cbrt/log2 go through the repo's own fdlibm transliterations
    // ([[Ieee754]]): V8 ports FreeBSD's s_cbrt/e_log2 and the JDK has
    // neither (StrictMath.cbrt differs on 10% of samples; log/ln2 is a
    // different function entirely, 31% off) — the ports measure 0
    // mismatches on the sweep.
    put1("sign")(math.signum); put1("sqrt")(math.sqrt); put1("cbrt")(Ieee754.cbrt)
    put1("exp")(StrictMath.exp); put1("expm1")(StrictMath.expm1)
    put1("log")(StrictMath.log); put1("log2")(Ieee754.log2); put1("log10")(StrictMath.log10)
    put1("log1p")(StrictMath.log1p)
    put1("sin")(StrictMath.sin); put1("cos")(StrictMath.cos); put1("tan")(StrictMath.tan)
    put1("asin")(StrictMath.asin); put1("acos")(StrictMath.acos); put1("atan")(StrictMath.atan)
    put1("sinh")(StrictMath.sinh); put1("cosh")(StrictMath.cosh); put1("tanh")(StrictMath.tanh)
    put1("fround")(d => d.toFloat.toDouble)
    m.props.put("atan2", native("atan2")((_, as) => JsNum(StrictMath.atan2(num(arg(as, 0)), num(arg(as, 1))))))
    m.props.put("pow", native("pow")((_, as) => JsNum(StrictMath.pow(num(arg(as, 0)), num(arg(as, 1))))))
    m.props.put("hypot", native("hypot")((_, as) => JsNum(math.sqrt(as.map(a => { val d = num(a); d * d }).sum))))
    m.props.put("min", native("min") { (_, as) =>
      if (as.isEmpty) JsNum(Double.PositiveInfinity)
      else JsNum(as.map(num).reduce((a, b) => if (java.lang.Double.isNaN(a) || java.lang.Double.isNaN(b)) Double.NaN else math.min(a, b)))
    })
    m.props.put("max", native("max") { (_, as) =>
      if (as.isEmpty) JsNum(Double.NegativeInfinity)
      else JsNum(as.map(num).reduce((a, b) => if (java.lang.Double.isNaN(a) || java.lang.Double.isNaN(b)) Double.NaN else math.max(a, b)))
    })
    // the reference's determinism trap, message verbatim (environment.js/index.js:3-5)
    m.props.put("random", native("random") { (_, _) =>
      throw JsThrown(makeError("Error", "Math.random() is unavailable. Lenses must be deterministic, not random"))
    })
    m.frozen = true
    m
  }

  // ---------------- JSON ----------------

  private def jsonObject(interp: () => Interp): JsObject = {
    val j = JsObject.empty("JSON")
    j.props.put("stringify", native("stringify") { (_, as) =>
      val indent = arg(as, 2) match {
        case JsNum(d) if d >= 1 => " " * math.min(10, d.toInt)
        case JsStr(s) => s.take(10)
        case _ => ""
      }
      // ES 25.5.2 replacer (r13 — it was silently IGNORED before):
      // a function rides into the serializer; an array becomes the
      // PropertyList filter (string/number entries, deduped, in list
      // order; arrays are unaffected by the list, like V8)
      val (replacerFn, propList) = arg(as, 1) match {
        case f: JsFunc => (Some(f), None)
        case a: JsArray =>
          val keys = a.items.toVector.collect {
            case JsStr(s) => s
            case JsNum(d) => numToString(d)
          }.distinct
          (None, Some(keys))
        case _ => (None, None)
      }
      jsonStringify(arg(as, 0), indent, interp(), replacerFn, propList) match {
        case Some(s) => JsStr(s)
        case None => JsUndefined
      }
    })
    j.props.put("parse", native("parse") { (_, as) =>
      val parsed = jsonParse(toStr(arg(as, 0)))
      arg(as, 1) match {
        case f: JsFunc => jsonRevive(parsed, f, interp()) // ES 25.5.1 InternalizeJSONProperty
        case _ => parsed
      }
    })
    j.frozen = true
    j
  }

  /** ES 25.5.1 InternalizeJSONProperty: bottom-up reviver walk; an
    * `undefined` result deletes the member (array slots become holes,
    * like V8). */
  private def jsonRevive(root: JsValue, fn: JsFunc, interp: Interp): JsValue = {
    def walk(holder: JsValue, key: String, value: JsValue): JsValue = {
      interp.budget.tick()
      value match {
        case a: JsArray =>
          var i = 0
          while (i < a.items.length) {
            walk(a, i.toString, Values.deHole(a.items(i))) match {
              case JsUndefined => a.items(i) = JsHole
              case r => a.items(i) = r
            }
            i += 1
          }
        case o: JsObject =>
          ownEntries(o).foreach { case (k, v) =>
            walk(o, k, v) match {
              case JsUndefined => o.props.remove(k)
              case r => o.props.put(k, r)
            }
          }
        case _ => ()
      }
      interp.callFunction(fn, holder, Vector(JsStr(key), value), Pos(0), "reviver")
    }
    walk(JsObject.of("" -> root), "", root)
  }

  def jsonStringify(v: JsValue, indent: String, interp: Interp = null,
                    replacerFn: Option[JsFunc] = None,
                    propList: Option[Vector[String]] = None): Option[String] = {
    // open containers by REFERENCE (cycle guard): an identityHashCode-keyed
    // Set[Int] here would false-positive on hash collisions, which are
    // expected across the millions of per-record allocations of a long build
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[JsValue, java.lang.Boolean]())
    def quote(s: String): String = {
      val sb = new java.lang.StringBuilder("\"")
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append('"').toString
    }
    // `skipToJson`: per ES 25.5.2.3 a value's toJSON is invoked ONCE;
    // the RESULT is serialized structurally without re-invoking at the
    // same level (members still get theirs)
    def go(v: JsValue, depth: Int, skipToJson: Boolean = false): Option[String] = v match {
      case _: JsAccessorProp => // loud invariant guard (see JsAccessorProp)
        throw new IllegalStateException(
          "internal: accessor property record leaked into JSON.stringify")
      case _: JsUndefinedKind | _: JsFunc | _: JsSymbolV => None
      case JsNull => Some("null")
      case JsBool(b) => Some(b.toString)
      case JsNum(d) =>
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) Some("null")
        else Some(numToString(d))
      case JsStr(s) => Some(quote(s))
      case JsDate(ms) =>
        // invalid date (new Date('garbage')): toJSON returns null, so
        // JSON.stringify emits null — V8 behavior; jsIsoString THROWS
        if (ms.isNaN) Some("null")
        else Some(quote(jsIsoString(ms))) // toJSON layout, .SSS always
      case _: JsSetV | _: JsMapV | _: JsRegExpV => Some("{}") // JS stringifies these as {}
      case _: JsBytes => Some("{}")
      case _: JsGenerator => Some("{}") // an ordinary object with no own enumerable props (V8)
      case _: JsPromise | _: JsAsyncGenerator => Some("{}") // same: no own enumerable props (V8)
      case p: JsProxyV =>
        if (interp == null) throw new IllegalStateException(
          "internal: proxy reached JSON.stringify without an interpreter (traps unrunnable)")
        // toJSON resolves THROUGH the get trap (V8's GetV); a
        // non-callable result is ignored like everywhere else
        if (!skipToJson) interp.proxyGet(p, JsStr("toJSON"), Pos(0)) match {
          case f: JsFunc =>
            return go(interp.callFunction(f, p, Vector.empty, Pos(0), "toJSON"),
              depth, skipToJson = true)
          case _ => ()
        }
        if (seen.contains(p)) throw JsThrown(makeError("TypeError", "Converting circular structure to JSON"))
        seen.add(p)
        val out =
          if (interp.proxyIsArray(p)) {
            // IsArray pierces: serialize AS AN ARRAY via length + index
            // gets through the trap (V8 SerializeJSONArray)
            val len = toNumber(interp.proxyGet(p, JsStr("length"), Pos(0))).toInt
            fmtArr((0 until len).map(i =>
              go(interp.proxyGet(p, JsStr(i.toString), Pos(0)), depth + 1).getOrElse("null")), depth)
          } else
            fmtObj(interp.proxyOwnEntries(p).flatMap { case (k, pv) =>
              go(pv, depth + 1).map(s => (quote(k), s))
            }, depth)
        seen.remove(p)
        out
      case a: JsArray =>
        if (seen.contains(a)) throw JsThrown(makeError("TypeError", "Converting circular structure to JSON"))
        seen.add(a)
        val parts = a.items.map(it => go(it, depth + 1).getOrElse("null"))
        seen.remove(a)
        if (indent.isEmpty) Some("[" + parts.mkString(",") + "]")
        else if (parts.isEmpty) Some("[]")
        else {
          val pad = indent * (depth + 1)
          Some("[\n" + parts.map(pad + _).mkString(",\n") + "\n" + indent * depth + "]")
        }
      case o: JsObject =>
        // evaluate toJSON lookup ONCE (an accessor-stored toJSON's
        // getter must run a single time, V8's single Get)
        val toJson = if (!skipToJson && interp != null) interp.toJsonMethod(o) else None
        toJson match {
          case Some(f) =>
            go(interp.callFunction(f, o, Vector.empty, Pos(0), "toJSON"),
              depth, skipToJson = true)
          case None => stringifyPlainObject(o, depth)
        }
    }
    def stringifyPlainObject(o: JsObject, depth: Int): Option[String] = {
        if (seen.contains(o)) throw JsThrown(makeError("TypeError", "Converting circular structure to JSON"))
        seen.add(o)
        // accessor getters evaluate during stringify (V8); without an
        // Interp in hand a record falls through to the loud guard above
        val entries = if (interp != null) interp.ownEvalEntries(o) else ownEntries(o)
        val parts = entries.flatMap { case (k, pv) =>
          go(pv, depth + 1).map(s => (quote(k), s))
        }
        seen.remove(o)
        if (indent.isEmpty) Some("{" + parts.map { case (k, s) => s"$k:$s" }.mkString(",") + "}")
        else if (parts.isEmpty) Some("{}")
        else {
          val pad = indent * (depth + 1)
          Some("{\n" + parts.map { case (k, s) => s"$pad$k: $s" }.mkString(",\n") + "\n" + indent * depth + "}")
        }
    }
    def fmtArr(parts: Seq[String], depth: Int): Option[String] =
      if (indent.isEmpty) Some("[" + parts.mkString(",") + "]")
      else if (parts.isEmpty) Some("[]")
      else {
        val pad = indent * (depth + 1)
        Some("[\n" + parts.map(pad + _).mkString(",\n") + "\n" + indent * depth + "]")
      }
    def fmtObj(parts: Seq[(String, String)], depth: Int): Option[String] =
      if (indent.isEmpty) Some("{" + parts.map { case (k, s) => s"$k:$s" }.mkString(",") + "}")
      else if (parts.isEmpty) Some("{}")
      else {
        val pad = indent * (depth + 1)
        Some("{\n" + parts.map { case (k, s) => s"$pad$k: $s" }.mkString(",\n") + "\n" + indent * depth + "}")
      }
    if (replacerFn.isEmpty && propList.isEmpty) return go(v, 0)

    // ---- ES 25.5.2 SerializeJSONProperty with an active replacer /
    // PropertyList (r13): toJSON applies FIRST (with the key argument),
    // then the replacer sees its result with `this` = the holder; the
    // PropertyList drives non-array member selection in list order.
    def toJsonApplied(key: String, value: JsValue): JsValue = value match {
      case o: JsObject => interp.toJsonMethod(o) match {
        case Some(f) => interp.callFunction(f, o, Vector(JsStr(key)), Pos(0), "toJSON")
        case None => o
      }
      case p: JsProxyV => interp.proxyGet(p, JsStr("toJSON"), Pos(0)) match {
        case f: JsFunc => interp.callFunction(f, p, Vector(JsStr(key)), Pos(0), "toJSON")
        case _ => p
      }
      case d: JsDate => // the replacer must observe what date.toJSON returns (V8)
        if (d.epochMillis.isNaN) JsNull else JsStr(jsIsoString(d.epochMillis))
      case other => other
    }
    def serProp(key: String, value0: JsValue, holder: JsValue, depth: Int): Option[String] = {
      val v1 = toJsonApplied(key, value0)
      val v2 = replacerFn match {
        case Some(f) => interp.callFunction(f, holder, Vector(JsStr(key), v1), Pos(0), "replacer")
        case None => v1
      }
      v2 match {
        case _: JsAccessorProp | _: AwaitSignal =>
          throw new IllegalStateException(
            "internal: engine-internal record leaked into JSON.stringify")
        case _: JsUndefinedKind | _: JsFunc | _: JsSymbolV => None
        case JsNull => Some("null")
        case JsBool(b) => Some(b.toString)
        case JsNum(d) =>
          if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) Some("null")
          else Some(numToString(d))
        case JsStr(s) => Some(quote(s))
        case JsDate(ms) => // replacer RETURNED a date: its toJSON applies
          if (ms.isNaN) Some("null") else Some(quote(jsIsoString(ms)))
        case _: JsSetV | _: JsMapV | _: JsRegExpV | _: JsBytes | _: JsGenerator |
             _: JsPromise | _: JsAsyncGenerator => Some("{}")
        case a: JsArray =>
          if (seen.contains(a)) throw JsThrown(makeError("TypeError", "Converting circular structure to JSON"))
          seen.add(a)
          val parts = a.items.indices.map(i =>
            serProp(i.toString, Values.deHole(a.items(i)), a, depth + 1).getOrElse("null"))
          seen.remove(a)
          fmtArr(parts, depth)
        case o: JsObject =>
          if (seen.contains(o)) throw JsThrown(makeError("TypeError", "Converting circular structure to JSON"))
          seen.add(o)
          val entries = propList match {
            // Get(holder, key) per spec — absent keys read undefined
            // and drop; builtin-method reads are functions and drop
            case Some(list) => list.map(k => (k, interp.getMember(o, JsStr(k), Pos(0))))
            case None => interp.ownEvalEntries(o)
          }
          val parts = entries.flatMap { case (k, pv) =>
            serProp(k, pv, o, depth + 1).map(s => (quote(k), s))
          }
          seen.remove(o)
          fmtObj(parts, depth)
        case p: JsProxyV =>
          if (seen.contains(p)) throw JsThrown(makeError("TypeError", "Converting circular structure to JSON"))
          seen.add(p)
          val out =
            if (interp.proxyIsArray(p)) {
              val len = toNumber(interp.proxyGet(p, JsStr("length"), Pos(0))).toInt
              fmtArr((0 until len).map(i =>
                serProp(i.toString, interp.proxyGet(p, JsStr(i.toString), Pos(0)), p, depth + 1)
                  .getOrElse("null")), depth)
            } else {
              val entries = propList match {
                case Some(list) => list.map(k => (k, interp.proxyGet(p, JsStr(k), Pos(0))))
                case None => interp.proxyOwnEntries(p)
              }
              fmtObj(entries.flatMap { case (k, pv) =>
                serProp(k, pv, p, depth + 1).map(s => (quote(k), s))
              }, depth)
            }
          seen.remove(p)
          out
      }
    }
    serProp("", v, JsObject.of("" -> v), 0)
  }

  def jsonParse(s: String): JsValue = {
    // small recursive-descent JSON parser onto JsValue
    var i = 0
    def err(): Nothing = throw JsThrown(makeError("SyntaxError", s"Unexpected token in JSON at position $i"))
    def ws(): Unit = while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' || s.charAt(i) == '\t' || s.charAt(i) == '\r')) i += 1
    def value(): JsValue = {
      ws()
      if (i >= s.length) err()
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val o = JsObject.empty()
          if (i < s.length && s.charAt(i) == '}') { i += 1; return o }
          var more = true
          while (more) {
            ws()
            if (i >= s.length || s.charAt(i) != '"') err()
            val k = str()
            ws()
            if (i >= s.length || s.charAt(i) != ':') err()
            i += 1
            o.props.put(k, value())
            ws()
            if (i < s.length && s.charAt(i) == ',') i += 1
            else if (i < s.length && s.charAt(i) == '}') { i += 1; more = false }
            else err()
          }
          o
        case '[' =>
          i += 1; ws()
          val a = JsArray.empty
          if (i < s.length && s.charAt(i) == ']') { i += 1; return a }
          var more = true
          while (more) {
            a.items += value()
            ws()
            if (i < s.length && s.charAt(i) == ',') i += 1
            else if (i < s.length && s.charAt(i) == ']') { i += 1; more = false }
            else err()
          }
          a
        case '"' => JsStr(str())
        case 't' => if (s.startsWith("true", i)) { i += 4; JsBool(true) } else err()
        case 'f' => if (s.startsWith("false", i)) { i += 5; JsBool(false) } else err()
        case 'n' => if (s.startsWith("null", i)) { i += 4; JsNull } else err()
        case c if c == '-' || c.isDigit =>
          val start = i
          if (s.charAt(i) == '-') i += 1
          while (i < s.length && s.charAt(i).isDigit) i += 1
          if (i < s.length && s.charAt(i) == '.') { i += 1; while (i < s.length && s.charAt(i).isDigit) i += 1 }
          if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
            i += 1
            if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
            while (i < s.length && s.charAt(i).isDigit) i += 1
          }
          JsNum(java.lang.Double.parseDouble(s.substring(start, i)))
        case _ => err()
      }
    }
    def str(): String = {
      i += 1 // opening quote
      val sb = new java.lang.StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) err()
          s.charAt(i) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\'); case '/' => sb.append('/')
            case 'n' => sb.append('\n'); case 't' => sb.append('\t'); case 'r' => sb.append('\r')
            case 'b' => sb.append('\b'); case 'f' => sb.append('\f')
            case 'u' =>
              if (i + 4 >= s.length) err()
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case _ => err()
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      if (i >= s.length) err()
      i += 1 // closing quote
      sb.toString
    }
    val v = value()
    ws()
    if (i != s.length) err()
    v
  }

  // ---------------- Object / Array / String / Number constructors ----------------

  private def objectConstructor(interp: () => Interp): JsValue = {
    val o = JsObject.empty("Function")
    val _ = interp
    // value-observing enumeration EVALUATES accessor getters (Object.
    // values/entries — V8 invokes getters there); key-only enumeration
    // (keys, getOwnPropertyNames) must NOT, so it reads names raw
    def entriesOf(v: JsValue): Vector[(String, JsValue)] = v match {
      case obj: JsObject => interp().ownEvalEntries(obj)
      case a: JsArray => a.items.zipWithIndex.collect {
        case (x, ix) if !(x eq JsHole) => (ix.toString, x) }.toVector
      case JsStr(s) => s.zipWithIndex.map { case (c, ix) => (ix.toString, JsStr(c.toString)) }.toVector
      case p: JsProxyV => interp().proxyOwnEntries(p)
      case _ => Vector.empty
    }
    def keysOf(v: JsValue): Vector[String] = v match {
      case obj: JsObject => ownEntries(obj).map(_._1)
      case p: JsProxyV => interp().proxyOwnKeys(p)
      case other => entriesOf(other).map(_._1)
    }
    o.props.put("keys", native("keys")((_, as) => JsArray.of(keysOf(arg(as, 0)).map(JsStr(_)): _*)))
    o.props.put("values", native("values")((_, as) => JsArray.of(entriesOf(arg(as, 0)).map(_._2): _*)))
    o.props.put("entries", native("entries")((_, as) =>
      JsArray.of(entriesOf(arg(as, 0)).map { case (k, v) => JsArray.of(JsStr(k), v) }: _*)))
    o.props.put("assign", native("assign") { (_, as) =>
      as.headOption match {
        case Some(target @ (_: JsObject | _: JsProxyV)) =>
          as.drop(1).foreach {
            case src: JsObject =>
              // source getters evaluate; target writes go through
              // setMember so a target SETTER receives the value (V8's
              // [[Set]] semantics) and frozen targets no-op; symbol
              // props copy too (V8 assigns enumerable symbols)
              interp().ownEvalEntries(src).foreach { case (k, v) =>
                interp().setMember(target, JsStr(k), v, Pos(0)) }
              // symbol half of CopyDataProperties: source symbol GETTERS
              // evaluate (receiver = source), writes ride setMember so a
              // target symbol SETTER / frozen target behaves like [[Set]]
              interp().symEvalEntries(src).foreach { case (slot, v) =>
                val sym = interp().symbolForSlot(slot)
                  .getOrElse(new JsSymbolV(slot, slot))
                interp().setMember(target, sym, v, Pos(0)) }
            case src: JsProxyV =>
              interp().proxyOwnEntries(src).foreach { case (k, v) =>
                interp().setMember(target, JsStr(k), v, Pos(0)) }
            case _ => ()
          }
          target
        case _ => throwType("Object.assign target must be an object")
      }
    })
    o.props.put("is", native("is") { (_, as) =>
      val (x, y) = (arg(as, 0), arg(as, 1))
      JsBool((x, y) match {
        // SameValue: NaN equals NaN, +0 and -0 differ (exactly the two
        // places it departs from ===)
        case (JsNum(a), JsNum(b)) =>
          java.lang.Double.doubleToLongBits(a) == java.lang.Double.doubleToLongBits(b)
        case _ => strictEquals(x, y)
      })
    })
    o.props.put("freeze", native("freeze") { (_, as) =>
      arg(as, 0) match { case obj: JsObject => obj.frozen = true; obj; case other => other }
    })
    o.props.put("isFrozen", native("isFrozen") { (_, as) =>
      arg(as, 0) match { case obj: JsObject => JsBool(obj.frozen); case _ => JsBool(true) }
    })
    o.props.put("fromEntries", native("fromEntries") { (_, as) =>
      val out = JsObject.empty()
      // symbol keys route to symProps (r15), exactly the computed-key rule
      def putKey(k: JsValue, v: JsValue): Unit = k match {
        case sym: JsSymbolV => out.symPut(sym.slot, v)
        case other => out.props.put(toStr(other), v)
      }
      arg(as, 0) match {
        case a: JsArray => a.items.foreach {
          case pair: JsArray if pair.items.length >= 1 =>
            putKey(pair.items(0), pair.items.lift(1).getOrElse(JsUndefined))
          case _ => throwType("Object.fromEntries entries must be [key, value] pairs")
        }
        case m: JsMapV => m.entries.values.foreach { case (k, v) => putKey(k, v) }
        case _ => throwType("Object.fromEntries needs an iterable of entries")
      }
      out
    })
    o.props.put("create", native("create") { (_, as) =>
      arg(as, 0) match {
        case JsNull => JsObject.empty()
        case proto: JsObject =>
          val out = JsObject.empty()
          proto.props.foreach { case (k, v) => out.props.put(k, v) } // flattened; no live proto chain
          out
        case _ => throwType("Object.create needs an object or null prototype")
      }
    })
    o.props.put("getOwnPropertyNames", native("getOwnPropertyNames")((_, as) =>
      JsArray.of(keysOf(arg(as, 0)).map(JsStr(_)): _*)))
    // own SYMBOL keys in insertion order (r15) — canonical instances
    // via the Interp registry, so result[i] === the key that stored it
    o.props.put("getOwnPropertySymbols", native("getOwnPropertySymbols")((_, as) =>
      arg(as, 0) match {
        case obj: JsObject if obj.symProps != null =>
          JsArray.of(obj.symProps.keysIterator
            .flatMap(interp().symbolForSlot).map(s => s: JsValue).toSeq: _*)
        case _: JsObject | _: JsArray | _: JsProxyV => JsArray.of()
        // primitives go through ToObject (V8): the wrapper owns no
        // symbol keys, so the answer is [] — only null/undefined throw
        case JsNull | (_: JsUndefinedKind) => throwType(
          "Cannot convert undefined or null to object")
        case _ => JsArray.of()
      }))
    o.props.put("hasOwn", native("hasOwn") { (_, as) =>
      arg(as, 1) match { // symbol keys probe own symProps (r15)
        case sym: JsSymbolV => arg(as, 0) match {
          case obj: JsObject =>
            JsBool(obj.symProps != null && obj.symProps.contains(sym.slot))
          case _: JsArray => JsBool(false)
          case other => throwType(
            s"Object.hasOwn called on ${typeOf(other)} with a symbol key " +
              "(descriptor-trap subset boundary for proxies)")
        }
        case _ => arg(as, 0) match {
        case obj: JsObject => JsBool(obj.props.contains(toStr(arg(as, 1))))
        case a: JsArray => JsBool(toStr(arg(as, 1)).toIntOption.exists(ix =>
          ix >= 0 && ix < a.items.length && !(a.items(ix) eq JsHole)))
        // proxies answer from the ownKeys trap (V8 consults the
        // getOwnPropertyDescriptor trap — descriptor-less subset)
        case p: JsProxyV => JsBool(interp().proxyOwnKeys(p).contains(toStr(arg(as, 1))))
        case _ => JsBool(false)
        }
      }
    })
    hybridCallable(native("Object") { (_, as) =>
      arg(as, 0) match {
        case JsUndefined | JsNull => JsObject.empty()
        case obj => obj
      }
    }, o)
  }

  private def arrayConstructor(interp: () => Interp): JsValue = {
    val a = JsObject.empty("Function")
    a.props.put("isArray", native("isArray")((_, as) =>
      JsBool(interp().proxyIsArray(arg(as, 0))))) // pierces proxies (V8 IsArray)
    a.props.put("of", native("of")((_, as) => JsArray.of(as: _*)))
    a.props.put("from", native("from") { (_, as) =>
      val src = arg(as, 0)
      val base: Vector[JsValue] = src match {
        case arr: JsArray => arr.items.toVector.map(Values.deHole) // from() densifies
        case JsStr(s) => s.codePoints().toArray.toVector.map(cp => JsStr(new String(Character.toChars(cp))))
        case set: JsSetV => set.entries.values.toVector
        case m: JsMapV => m.entries.values.toVector.map { case (k, v) => JsArray.of(k, v) }
        case g: JsGenerator =>
          val buf = Vector.newBuilder[JsValue]
          val it = Generators.iterator(g, interp())
          while (it.hasNext) { interp().budget.allocate(1); buf += it.next() }
          buf.result()
        case o: JsObject if interp().hasCustomIterator(o) =>
          // custom iterable beats array-like (ES: iterables first)
          val buf = Vector.newBuilder[JsValue]
          val it = interp().iterate(o, Pos(0))
          while (it.hasNext) { interp().budget.allocate(1); buf += it.next() }
          buf.result()
        case o: JsObject =>
          // array-like: {length: n, 0: ..., 1: ...} — length is
          // user-controlled, so charge it before materializing
          val len = interp().getOwnEval(o, "length").map(v => math.max(0, toNumber(v).toInt)).getOrElse(0)
          interp().budget.allocate(len.toLong + 1)
          (0 until len).toVector.map(ix => interp().getOwnEval(o, ix.toString).getOrElse(JsUndefined))
        case JsUndefined | JsNull => throwType("Array.from needs an iterable")
        case _ => Vector.empty
      }
      val mapped = arg(as, 1) match {
        case JsUndefined => base
        case fn => base.zipWithIndex.map { case (v, ix) => interp().callCallback(fn, Vector(v, JsNum(ix))) }
      }
      JsArray.of(mapped: _*)
    })
    // calling Array(n) / new Array(n) — charged against the allocation
    // budget like every other materialization path (a bare `new
    // Array(1e8)` must not be a budget-free ~800 MB buffer)
    val callable = native("Array") { (_, as) =>
      as match {
        case Vector(JsNum(d)) if d == math.floor(d) && d >= 0 =>
          if (d > 100000000) throwRange("array length too large for lens code")
          interp().budget.allocate(d.toLong + 1)
          new JsArray(mutable.ArrayBuffer.fill(d.toInt)(JsHole: JsValue)) // Array(n) is ALL holes, like V8
        case _ => JsArray.of(as: _*)
      }
    }
    // merge statics onto the callable by boxing: we return a native that also
    // carries props via the objectMethod hook — simplest is a hybrid object
    hybridCallable(callable, a)
  }

  /** a native function that also exposes static properties (Array.isArray,
    * Object.keys, …): the statics ride ON the [[JsNative]] instance and are
    * resolved in [[functionMethod]]. (An earlier JVM-global registry here
    * grew by five entries per map call from concurrent executor threads —
    * an unbounded leak and an unsynchronized-IdentityHashMap race.) */
  private def hybridCallable(fn: JsNative, statics: JsObject): JsNative =
    new JsNative(fn.name, fn.fn, statics)

  private def stringConstructor(interp: () => Interp): JsValue = {
    val statics = JsObject.empty("Function")
    statics.props.put("fromCharCode", native("fromCharCode") { (_, as) =>
      JsStr(as.map(a => toNumber(a).toInt.toChar).mkString)
    })
    statics.props.put("fromCodePoint", native("fromCodePoint") { (_, as) =>
      val sb = new java.lang.StringBuilder
      as.foreach(a => sb.appendCodePoint(toNumber(a).toInt))
      JsStr(sb.toString)
    })
    // ES 22.1.2.4 String.raw(template, ...subs): interleave the raw
    // chunks with the substitutions — THE canonical template tag,
    // reachable now that tagged templates are in-subset. Accepts the
    // engine's strings array (raw rides in the array's extra slot), a
    // plain {raw: [...]} object, or {raw: 'chars'} (array-like).
    statics.props.put("raw", native("raw") { (_, as) =>
      val rawChunks: IndexedSeq[String] = arg(as, 0) match {
        case a: JsArray => a.extraGet("raw") match {
          case Some(r: JsArray) => r.items.toIndexedSeq.map(toStr)
          case Some(JsStr(s)) => s.map(_.toString)
          case _ => a.items.toIndexedSeq.map(toStr)
        }
        case o: JsObject => o.props.get("raw") match {
          case Some(r: JsArray) => r.items.toIndexedSeq.map(toStr)
          case Some(JsStr(s)) => s.map(_.toString)
          case _ => IndexedSeq.empty
        }
        case _ => IndexedSeq.empty
      }
      val subs = as.drop(1)
      val sb = new java.lang.StringBuilder
      rawChunks.indices.foreach { i =>
        sb.append(rawChunks(i))
        if (i < rawChunks.length - 1 && i < subs.length) sb.append(toStr(subs(i)))
      }
      JsStr(sb.toString)
    })
    // String(x) is ToString — user valueOf/toString and proxy get
    // traps honored (interp-aware, round-13 coercion wave). Symbols are
    // the one exception: the EXPLICIT String() conversion returns the
    // symbol's descriptive string ("Symbol(Symbol.iterator)") where
    // implicit ToString throws (ES 22.1.1.1 step 1.a; ADVICE r13)
    hybridCallable(native("String")((_, as) => as.headOption match {
      case Some(sym: JsSymbolV) => JsStr(s"Symbol(${sym.description})")
      case Some(v) => JsStr(interp().toStrI(v))
      case None => JsStr("")
    }), statics)
  }

  private def numberConstructor(interp: () => Interp): JsValue = {
    val statics = JsObject.empty("Function")
    statics.props.put("isInteger", native("isInteger")((_, as) => arg(as, 0) match {
      case JsNum(d) => JsBool(!java.lang.Double.isNaN(d) && !java.lang.Double.isInfinite(d) && d == math.floor(d))
      case _ => JsBool(false)
    }))
    statics.props.put("isSafeInteger", native("isSafeInteger")((_, as) => arg(as, 0) match {
      case JsNum(d) => JsBool(d == math.floor(d) && math.abs(d) <= 9007199254740991.0)
      case _ => JsBool(false)
    }))
    statics.props.put("isFinite", native("isFinite")((_, as) => arg(as, 0) match {
      case JsNum(d) => JsBool(!java.lang.Double.isNaN(d) && !java.lang.Double.isInfinite(d))
      case _ => JsBool(false)
    }))
    statics.props.put("isNaN", native("isNaN")((_, as) => arg(as, 0) match {
      case JsNum(d) => JsBool(java.lang.Double.isNaN(d))
      case _ => JsBool(false)
    }))
    statics.props.put("parseFloat", native("parseFloat")((_, as) => JsNum(parseFloatJs(toStr(arg(as, 0))))))
    statics.props.put("parseInt", native("parseInt")((_, as) => JsNum(parseIntJs(toStr(arg(as, 0)), arg(as, 1)))))
    statics.props.put("MAX_SAFE_INTEGER", JsNum(9007199254740991.0))
    statics.props.put("MIN_SAFE_INTEGER", JsNum(-9007199254740991.0))
    statics.props.put("MAX_VALUE", JsNum(Double.MaxValue))
    statics.props.put("MIN_VALUE", JsNum(java.lang.Double.MIN_VALUE))
    statics.props.put("EPSILON", JsNum(math.ulp(1.0)))
    statics.props.put("POSITIVE_INFINITY", JsNum(Double.PositiveInfinity))
    statics.props.put("NEGATIVE_INFINITY", JsNum(Double.NegativeInfinity))
    statics.props.put("NaN", JsNum(Double.NaN))
    hybridCallable(native("Number")((_, as) => JsNum(as.headOption.map(interp().toNumberI).getOrElse(0.0))), statics)
  }

  private def setConstructor(interp: () => Interp): JsValue =
    native("Set") { (_, as) =>
      val s = JsSetV.empty
      arg(as, 0) match {
        case JsUndefined | JsNull => ()
        case it => interp().iterate(it, Pos(0)).foreach(v => s.entries.put(new JsKey(v), v))
      }
      s
    }

  private def mapConstructor(interp: () => Interp): JsValue =
    native("Map") { (_, as) =>
      val m = JsMapV.empty
      arg(as, 0) match {
        case JsUndefined | JsNull => ()
        case it => interp().iterate(it, Pos(0)).foreach {
          case pair: JsArray if pair.items.nonEmpty =>
            val k = pair.items(0)
            m.entries.put(new JsKey(k), (k, pair.items.lift(1).getOrElse(JsUndefined)))
          case _ => throwType("Map entries must be [key, value] pairs")
        }
      }
      m
    }

  private def dateConstructor: JsValue = {
    val statics = JsObject.empty("Function")
    statics.props.put("now", native("now") { (_, _) =>
      throw JsThrown(makeError("Error",
        "Date.now() is unavailable. Lenses must be deterministic; pass timestamps in as record data"))
    })
    statics.props.put("parse", native("parse") { (_, as) =>
      try JsNum(java.time.Instant.parse(toStr(arg(as, 0))).toEpochMilli.toDouble)
      catch { case _: Exception => JsNum(Double.NaN) }
    })
    statics.props.put("UTC", native("UTC") { (_, as) =>
      val y = toNumber(arg(as, 0)).toInt
      val mo = arg(as, 1) match { case JsUndefined => 0; case v => toNumber(v).toInt }
      val d = arg(as, 2) match { case JsUndefined => 1; case v => toNumber(v).toInt }
      val h = arg(as, 3) match { case JsUndefined => 0; case v => toNumber(v).toInt }
      val mi = arg(as, 4) match { case JsUndefined => 0; case v => toNumber(v).toInt }
      val se = arg(as, 5) match { case JsUndefined => 0; case v => toNumber(v).toInt }
      val ms = arg(as, 6) match { case JsUndefined => 0; case v => toNumber(v).toInt }
      val instant = java.time.LocalDateTime.of(y, 1, 1, 0, 0, 0)
        .plusMonths(mo.toLong).plusDays((d - 1).toLong).plusHours(h.toLong)
        .plusMinutes(mi.toLong).plusSeconds(se.toLong)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli + ms
      JsNum(instant.toDouble)
    })
    hybridCallable(native("Date") { (_, as) =>
      as match {
        case Vector() =>
          throw JsThrown(makeError("Error",
            "new Date() with no arguments is unavailable. Lenses must be deterministic; pass timestamps in as record data"))
        case Vector(JsNum(ms)) => JsDate(ms)
        case Vector(JsStr(s)) =>
          try JsDate(java.time.Instant.parse(s).toEpochMilli.toDouble)
          catch { case _: Exception => JsDate(Double.NaN) }
        case _ => throwType("multi-argument Date construction is not supported in lens code (use Date.UTC)")
      }
    }, statics)
  }

  // ---------------- per-type method dispatch ----------------

  def functionMethod(f: JsFunc, name: String, interp: Interp): Option[JsValue] = {
    f match {
      case n: JsNative =>
        val statics = n.statics
        if (statics != null && statics.props.contains(name)) return Some(statics.props(name))
      case _ => ()
    }
    name match {
      case "name" => Some(JsStr(f.name))
      case "length" => Some(JsNum(f match {
        case c: JsClosure => c.params.length.toDouble
        case _ => 0.0
      }))
      case "call" => Some(native("call") { (_, as) =>
        interp.callFunction(f, arg(as, 0), as.drop(1), Pos(0), f.name)
      })
      case "apply" => Some(native("apply") { (_, as) =>
        val applied = arg(as, 1) match {
          case a: JsArray => a.items.toVector
          case JsUndefined | JsNull => Vector.empty[JsValue]
          case _ => throwType("apply arguments must be an array")
        }
        interp.callFunction(f, arg(as, 0), applied, Pos(0), f.name)
      })
      case "bind" => Some(native("bind") { (_, as) =>
        val boundThis = arg(as, 0)
        val boundArgs = as.drop(1)
        native(s"bound ${f.name}") { (_, callArgs) =>
          interp.callFunction(f, boundThis, boundArgs ++ callArgs, Pos(0), f.name)
        }
      })
      case "toString" => Some(native("toString")((_, _) => JsStr(toStr(f))))
      case _ => None
    }
  }

  def objectMethod(o: JsObject, name: String): Option[JsValue] = name match {
    case "hasOwnProperty" => Some(native("hasOwnProperty")((_, as) => JsBool(o.props.contains(toStr(arg(as, 0))))))
    case "toString" => Some(native("toString")((_, _) => JsStr(toStr(o))))
    case _ => None
  }

  def dateMethod(d: JsDate, name: String): Option[JsValue] = {
    lazy val utc = java.time.Instant.ofEpochMilli(d.epochMillis.toLong).atZone(java.time.ZoneOffset.UTC)
    name match {
      case "getTime" | "valueOf" => Some(native(name)((_, _) => JsNum(d.epochMillis)))
      case "toISOString" =>
        Some(native(name)((_, _) => JsStr(jsIsoString(d.epochMillis))))
      case "toJSON" =>
        // ES 21.4.4.37: toJSON returns NULL for a non-finite time value
        // (V8: new Date(NaN).toJSON() === null), unlike toISOString
        // which throws RangeError.
        Some(native(name)((_, _) =>
          if (d.epochMillis.isNaN) JsNull else JsStr(jsIsoString(d.epochMillis))))
      case "getUTCFullYear" => Some(native(name)((_, _) => JsNum(utc.getYear.toDouble)))
      case "getUTCMonth" => Some(native(name)((_, _) => JsNum((utc.getMonthValue - 1).toDouble)))
      case "getUTCDate" => Some(native(name)((_, _) => JsNum(utc.getDayOfMonth.toDouble)))
      case "getUTCDay" => Some(native(name)((_, _) => JsNum((utc.getDayOfWeek.getValue % 7).toDouble)))
      case "getUTCHours" => Some(native(name)((_, _) => JsNum(utc.getHour.toDouble)))
      case "getUTCMinutes" => Some(native(name)((_, _) => JsNum(utc.getMinute.toDouble)))
      case "getUTCSeconds" => Some(native(name)((_, _) => JsNum(utc.getSecond.toDouble)))
      case "getUTCMilliseconds" => Some(native(name)((_, _) => JsNum((d.epochMillis.toLong % 1000).toDouble)))
      case _ => None
    }
  }

  /** ES 21.4.4.36 Date.prototype.toISOString layout: milliseconds are
    * ALWAYS printed (`.000`), unlike java.time.Instant.toString which
    * drops a zero fraction; years outside [0, 9999] use the expanded
    * ±YYYYYY form. An invalid date (NaN time value, e.g. from
    * `new Date('unparseable')`) throws RangeError like V8 — NaN.toLong
    * is 0, which would otherwise SILENTLY print the epoch. */
  private def jsIsoString(epochMillis: Double): String = {
    if (epochMillis.isNaN)
      throw JsThrown(makeError("RangeError", "Invalid time value"))
    val z = java.time.Instant.ofEpochMilli(epochMillis.toLong)
      .atZone(java.time.ZoneOffset.UTC)
    val y = z.getYear
    val yearStr =
      if (y >= 0 && y <= 9999) f"$y%04d"
      else if (y > 0) f"+$y%06d"
      else f"-${-y}%06d"
    f"$yearStr-${z.getMonthValue}%02d-${z.getDayOfMonth}%02dT" +
      f"${z.getHour}%02d:${z.getMinute}%02d:${z.getSecond}%02d." +
      f"${z.getNano / 1000000}%03dZ"
  }

  // ---- regex ----

  def compileRegex(source: String, flags: String, pos: Pos): JsRegExpV = {
    var f = 0
    flags.foreach {
      case 'i' => f |= java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.UNICODE_CASE
      case 'm' => f |= java.util.regex.Pattern.MULTILINE
      case 's' => f |= java.util.regex.Pattern.DOTALL
      case 'g' | 'u' => () // g handled by callers; u is the default in java.util.regex
      case 'y' | 'd' => () // sticky / hasIndices (r16): no Java flag bit —
      // exec-time semantics via JsRegExpV.sticky/hasIndices
      case other => throw new JsSyntaxError(s"unsupported regex flag '$other'", pos.line)
    }
    validateJsQuantifiers(source)
    val (negG, negN) = negativeLookaroundCaptures(source)
    val (src2, jsToJava, jsG, sentinels) = planLookaroundSentinels(source)
    val javaPattern = translateRegex(src2, multiline = flags.contains('m'))
    try new JsRegExpV(source, flags,
      java.util.regex.Pattern.compile(javaPattern, f), negG, negN,
      jsToJava, jsG, sentinels)
    catch {
      case e: java.util.regex.PatternSyntaxException =>
        throw JsThrown(makeError("SyntaxError", s"Invalid regular expression: ${e.getDescription}"))
    }
  }

  /** SENTINEL plan for POSITIVE lookarounds that lexically contain
    * capture groups (r16 — closes the last V8-differential residual).
    * java.util.regex treats a COMPLETED lookaround atomically: when
    * the alternation branch holding it is later abandoned, the inner
    * captures survive, where ES's immutable match states discard them
    * (V8: group undefined). NORMAL groups do unwind on backtracking
    * (measured: `(?:(a)x|ab)` on "ab" → g1 null), so wrapping each
    * such lookaround as `(?:LA())` plants an empty SENTINEL group
    * whose participation (`m.start(idx) >= 0`) tells the result
    * builders whether the assertion lies on the accepting path; when
    * it does not, its contained captures read as undefined. The
    * wrapper also keeps Annex-B quantified lookaheads intact — a
    * trailing quantifier binds to the wrapper.
    *
    * Returns (java-ready source, 1-based jsGroup→javaGroup map (null =
    * identity), JS capture count, sentinel records (javaIdx,
    * containedJsGroups, containedNames)). Numeric backrefs `\N` are
    * rewritten to java numbering; named backrefs need no rewrite.
    * Zero-cost when no positive lookaround contains a capture: the
    * source passes through untouched. */
  private def planLookaroundSentinels(src: String)
      : (String, Array[Int], Int, Vector[(Int, Set[Int], Set[String])]) = {
    val n = src.length
    final class Frame(val openIdx: Int, val isPosLook: Boolean) {
      val groups = scala.collection.mutable.Set.empty[Int]
      val names = scala.collection.mutable.Set.empty[String]
    }
    var stack = List.empty[Frame]
    var inClass = false
    var jsG = 0
    val capOpens = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (offset, jsIdx)
    // positive-lookaround spans holding captures: (openIdx, closeIdx, groups, names)
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Set[Int], Set[String])]
    val backrefs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int)] // [start,end) -> jsRef
    var i = 0
    while (i < n) {
      val c = src.charAt(i)
      if (inClass) {
        if (c == '\\') i += 2
        else { if (c == ']') inClass = false; i += 1 }
      } else c match {
        case '\\' =>
          val j = i + 1
          if (j < n && src.charAt(j).isDigit && src.charAt(j) != '0') {
            var k = j
            while (k < n && src.charAt(k).isDigit) k += 1
            backrefs += ((i, k, src.substring(j, k).toInt))
            i = k
          } else i += 2
        case '[' => inClass = true; i += 1
        case '(' =>
          def at(o: Int): Char = if (i + o < n) src.charAt(i + o) else ' '
          val (posLook, capturing, name) =
            if (at(1) != '?') (false, true, None)
            else if (at(2) == '=') (true, false, None)                      // (?=
            else if (at(2) == '!') (false, false, None)                     // (?!
            else if (at(2) == '<' && at(3) == '=') (true, false, None)      // (?<=
            else if (at(2) == '<' && at(3) == '!') (false, false, None)     // (?<!
            else if (at(2) == '<') {                                        // (?<name>
              val close = src.indexOf('>', i + 3)
              (false, true, if (close < 0) None else Some(src.substring(i + 3, close)))
            } else (false, false, None)                                     // (?: …
          if (capturing) {
            jsG += 1
            capOpens += ((i, jsG))
            stack.foreach { fr => fr.groups += jsG; name.foreach(fr.names += _) }
          }
          stack = new Frame(i, posLook) :: stack
          i += 1
        case ')' =>
          stack match {
            case f :: rest =>
              stack = rest
              if (f.isPosLook && (f.groups.nonEmpty || f.names.nonEmpty))
                spans += ((f.openIdx, i, f.groups.toSet, f.names.toSet))
            case Nil => () // unbalanced: Pattern.compile will reject loudly
          }
          i += 1
        case _ => i += 1
      }
    }
    if (spans.isEmpty) return (src, null, jsG, Vector.empty)
    // java numbering: every capturing '(' in the REBUILT source, in
    // textual order — JS groups at their original offsets, each
    // sentinel conceptually just past its lookaround's ')' (2·off /
    // 2·close+1 keeps the interleaving exact)
    val events: Seq[(Long, Either[Int, Int])] =
      (capOpens.map { case (off, g) => (off.toLong * 2, Left(g): Either[Int, Int]) } ++
        spans.zipWithIndex.map { case ((_, close, _, _), si) =>
          (close.toLong * 2 + 1, Right(si): Either[Int, Int]) }).toSeq.sortBy(_._1)
    val jsToJava = new Array[Int](jsG + 1)
    val sentinelJava = new Array[Int](spans.length)
    var javaIdx = 0
    events.foreach { case (_, e) =>
      javaIdx += 1
      e match {
        case Left(g) => jsToJava(g) = javaIdx
        case Right(si) => sentinelJava(si) = javaIdx
      }
    }
    // rebuild: "(?:" before each span, "())" after; numeric backrefs
    // re-pointed at the java index of their JS group
    sealed trait Edit { def pos: Int }
    final case class Ins(pos: Int, text: String, order: Int) extends Edit
    final case class Repl(pos: Int, end: Int, text: String) extends Edit
    // at one offset a wrapper CLOSE ("())", order 0) must precede a
    // wrapper OPEN ("(?:", order 1): `(?=(a))(?=(b))*` would otherwise
    // fuse both lookarounds under the second one's quantifier
    val edits: Seq[Edit] =
      (spans.flatMap { case (open, close, _, _) =>
        Seq(Ins(open, "(?:", 1), Ins(close + 1, "())", 0)) } ++
        backrefs.collect { case (s0, e0, ref) if ref <= jsG =>
          Repl(s0, e0, "\\" + jsToJava(ref)) }).toSeq.sortBy {
        case Ins(p, _, o) => p.toLong * 4 + o
        case Repl(p, _, _) => p.toLong * 4 + 2
      }
    val sb = new java.lang.StringBuilder
    var cur = 0
    edits.foreach {
      case Ins(p, t, _) =>
        sb.append(src, cur, p).append(t); cur = p
      case Repl(p, e, t) =>
        sb.append(src, cur, p).append(t); cur = e
    }
    sb.append(src, cur, n)
    val sent = spans.zipWithIndex.map { case ((_, _, gs, ns), si) =>
      (sentinelJava(si), gs, ns) }.toVector
    (sb.toString, jsToJava, jsG, sent)
  }

  /** JS quantifier grammar check — java.util.regex ACCEPTS forms JS
    * rejects, with DIFFERENT semantics: `a++` is a Java possessive
    * quantifier, `$*`/`\b{2}` quantify anchors, `x?{2}` stacks
    * quantifiers. Passing them through would silently run Java
    * semantics where V8 throws SyntaxError (found by regex-differential
    * fuzzing). Rule (ES 22.2.1 Quantifier): after a quantifier only ONE
    * lazy `?` may follow; `^ $ \b \B` cannot be quantified at all.
    * Quantified lookaheads stay legal (Annex B B.1.4, what V8 ships). */
  private def validateJsQuantifiers(src: String): Unit = {
    def bad(what: String): Nothing =
      throw JsThrown(makeError("SyntaxError",
        s"Invalid regular expression: $what (java.util.regex would accept it with different semantics)"))
    // classify the position BEFORE each char: what the previous token was
    val ANCHOR = 1; val QUANT = 2; val QUANT_LAZY = 3; val OTHER = 0
    var prev = OTHER
    var i = 0
    var inClass = false
    val n = src.length
    // group-kind stack: is the group opened at this depth a LOOKBEHIND?
    // Per Annex B only lookAHEADS are QuantifiableAssertions — a
    // quantified lookbehind /(?<=a)*/ is a V8 SyntaxError but legal in
    // java.util.regex, so ')' closing a lookbehind must count as an
    // anchor for the quantifier check (found by the r7 ADVICE review).
    var groupKinds = List.empty[Boolean]
    /** is src(i) == '{' a quantifier opener ({n} / {n,} / {n,m})? */
    def braceQuant(at: Int): Int = { // returns end index AFTER '}', or -1
      var j = at + 1
      val d0 = j
      while (j < n && src.charAt(j).isDigit) j += 1
      if (j == d0) return -1
      if (j < n && src.charAt(j) == ',') { j += 1; while (j < n && src.charAt(j).isDigit) j += 1 }
      if (j < n && src.charAt(j) == '}') j + 1 else -1
    }
    while (i < n) {
      val c = src.charAt(i)
      if (inClass) {
        if (c == '\\') i += 2
        else { if (c == ']') { inClass = false; prev = OTHER }; i += 1 }
      } else c match {
        case '\\' =>
          val d = if (i + 1 < n) src.charAt(i + 1) else ' '
          prev = if (d == 'b' || d == 'B') ANCHOR else OTHER
          i += 2
        case '[' => inClass = true; i += 1
        case '(' =>
          // lookbehind opener: "(?<=" or "(?<!" (NOT "(?<name>")
          val lb = i + 3 < n && src.charAt(i + 1) == '?' &&
            src.charAt(i + 2) == '<' &&
            (src.charAt(i + 3) == '=' || src.charAt(i + 3) == '!')
          groupKinds = lb :: groupKinds
          prev = OTHER; i += 1
        case ')' =>
          val wasLookbehind = groupKinds.headOption.getOrElse(false)
          if (groupKinds.nonEmpty) groupKinds = groupKinds.tail
          prev = if (wasLookbehind) ANCHOR else OTHER
          i += 1
        case '^' | '$' => prev = ANCHOR; i += 1
        case '*' | '+' | '?' =>
          prev match {
            case ANCHOR => bad(s"nothing to repeat: quantifier '$c' after an anchor")
            case QUANT => if (c == '?') prev = QUANT_LAZY
              else bad(s"quantifier '$c' after a quantifier")
            case QUANT_LAZY => bad(s"quantifier '$c' after a lazy quantifier")
            case _ => prev = QUANT
          }
          i += 1
        case '{' =>
          val end = braceQuant(i)
          if (end < 0) { prev = OTHER; i += 1 } // literal brace, like JS sloppy
          else {
            prev match {
              case ANCHOR => bad("nothing to repeat: '{n}' after an anchor")
              case QUANT | QUANT_LAZY => bad("'{n}' after a quantifier")
              case _ => prev = QUANT
            }
            i = end
          }
        case _ => prev = OTHER; i += 1
      }
    }
  }

  /** JS → java.util.regex translation for the common subset. The engines
    * agree on almost everything lens code uses; the one systematic fixup
    * needed is `\d`-style classes inside `[]` (identical) and `\/`
    * (redundant escape in Java, harmless). Left as close to identity as
    * possible — divergences are documented subset limits. */
  /** JS \s per ECMA-262 WhiteSpace+LineTerminator — java.util.regex \s
    * is ASCII-only, so NBSP/ideographic-space-aware tokenizer lenses
    * would silently diverge without this. \t-\r covers \v and \f. */
  private val JsWhitespaceClass =
    "\\t-\\r \u00A0\u1680\u2000-\u200A\u2028\u2029\u202F\u205F\u3000\uFEFF"

  /** ECMA regex source → java.util.regex source. Same syntax for the
    * most part. KNOWN residual limit (V8-differential fuzz, one hit in
    * 4800 random patterns): a capture inside a NESTED quantified group
    * whose body can match empty — `(([ab]*)…)*` — may report Java's
    * last (empty) iteration where V8 keeps the last non-empty one;
    * that is engine-internal repetition-capture state, not a
    * translatable syntax difference. The silent divergences translated
    * here:
    *  - `\s`/`\S` → explicit JS whitespace class (Java's is ASCII-only);
    *    emitted as a nested class, legal both inside and outside `[...]`
    *  - bare `$` without the m flag → `\z` (Java's `$` matches BEFORE a
    *    final line terminator; JS anchors to the true end)
    *  - `[^]` → `[\s\S]` and `[]` → `(?!)` (Java rejects empty classes)
    *  - `\u{...}` → `\x{...}` code-point escapes
    *  - a literal `[` inside a class is escaped (Java would start a
    *    nested class union where JS reads a literal bracket) */
  private def translateRegex(src: String, multiline: Boolean): String = {
    val sb = new java.lang.StringBuilder
    var i = 0
    var inClass = false
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val d = src.charAt(i + 1)
        if (d == 's') { sb.append('[').append(JsWhitespaceClass).append(']'); i += 2 }
        else if (d == 'S') { sb.append("[^").append(JsWhitespaceClass).append(']'); i += 2 }
        else if (d == 'u' && i + 2 < n && src.charAt(i + 2) == '{') { sb.append("\\x"); i += 2 }
        else { sb.append(c).append(d); i += 2 }
      } else if (!inClass && c == '[') {
        if (src.startsWith("[^]", i)) { sb.append("[\\s\\S]"); i += 3 }
        else if (src.startsWith("[]", i)) { sb.append("(?!)"); i += 2 }
        else { inClass = true; sb.append(c); i += 1 }
      } else if (inClass && c == '[') { sb.append("\\["); i += 1 }
      else if (inClass && c == ']') { inClass = false; sb.append(c); i += 1 }
      else if (!inClass && c == '$' && !multiline) { sb.append("\\z"); i += 1 }
      else if (!inClass && c == '^' && multiline) {
        // Java quirk: MULTILINE `^` does NOT match the empty input
        // (find on "" is false) while JS `^` does — `\A` fills the gap
        sb.append("(?:\\A|^)"); i += 1
      }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** one [[Exec]]-equivalent search step from `from` under the regex's
    * sticky semantics (r16): sticky matches must start EXACTLY at
    * `from` — a Java region + lookingAt, with TRANSPARENT bounds so a
    * lookbehind sees text before lastIndex and NON-anchoring bounds so
    * `^`/`$` keep their true-input meaning (both V8-verified). After a
    * hit, m.start/m.end are absolute like a plain find. */
  private def findFrom(r: JsRegExpV, m: java.util.regex.Matcher,
                       s: String, from: Int): Boolean =
    if (r.sticky) {
      if (from > s.length) false
      else {
        m.region(from, s.length)
        m.useTransparentBounds(true)
        m.useAnchoringBounds(false)
        m.lookingAt()
      }
    } else from <= s.length && m.find(from)

  /** ES RegExpExec over this engine's exec semantics: anchored at
    * lastIndex when global OR sticky; lastIndex advances on a hit and
    * resets on a miss (for those two modes). The shared core of
    * exec / test / non-global match / non-global replace. */
  private def regExpExec(r: JsRegExpV, s: String): Option[java.util.regex.Matcher] = {
    val m = r.pattern.matcher(s)
    val tracked = r.global || r.sticky
    val start = if (tracked) r.lastIndex else 0
    if (findFrom(r, m, s, start)) {
      if (tracked) r.lastIndex = m.end
      Some(m)
    } else {
      if (tracked) r.lastIndex = 0
      None
    }
  }

  def regexMethod(r: JsRegExpV, name: String, interp: Interp): Option[JsValue] = name match {
    case "source" => Some(JsStr(r.source))
    case "flags" => Some(JsStr(r.canonicalFlags))
    case "global" => Some(JsBool(r.global))
    case "sticky" => Some(JsBool(r.sticky))
    case "hasIndices" => Some(JsBool(r.hasIndices))
    case "lastIndex" => Some(JsNum(r.lastIndex.toDouble))
    case "test" => Some(native("test") { (_, as) =>
      JsBool(regExpExec(r, toStr(arg(as, 0))).isDefined)
    })
    case "exec" => Some(native("exec") { (_, as) =>
      val s = toStr(arg(as, 0))
      regExpExec(r, s) match {
        case Some(m) => execResult(m, s, r)
        case None => JsNull
      }
    })
    case "toString" => Some(native("toString")((_, _) =>
      JsStr(s"/${r.source}/${r.canonicalFlags}")))
    case _ => None
  }

  /** captures discarded by NON-PARTICIPATING positive-lookaround
    * sentinels for this match (see [[JsRegExpV.laSentinels]]): the
    * assertion's branch was abandoned, so ES treats its inner
    * captures as never having matched. */
  private def sentinelDropped(r: JsRegExpV, m: java.util.regex.Matcher)
      : (Set[Int], Set[String]) =
    if (r.laSentinels.isEmpty) (Set.empty, Set.empty)
    else {
      var gi = Set.empty[Int]; var gn = Set.empty[String]
      r.laSentinels.foreach { case (sIdx, gs, ns) =>
        if (m.start(sIdx) < 0) { gi ++= gs; gn ++= ns }
      }
      (gi, gn)
    }

  /** JS-visible group values 1..jsGroupCount of one successful match:
    * js→java index mapping applied, negative-lookaround captures and
    * abandoned-lookaround captures read as undefined. The ONE shared
    * read path for exec/match/matchAll/split/replace. */
  private def jsGroupValues(r: JsRegExpV, m: java.util.regex.Matcher)
      : Vector[Option[String]] = {
    val (di, _) = sentinelDropped(r, m)
    (1 to r.jsGroupCount).map { g =>
      if (r.negGroups(g) || di(g)) None else Option(m.group(r.javaIdx(g)))
    }.toVector
  }

  /** same for declared capture NAMES, in pattern order. */
  private def jsNamedValues(r: JsRegExpV, m: java.util.regex.Matcher,
                            names: Seq[String]): Vector[(String, Option[String])] = {
    val (_, dn) = sentinelDropped(r, m)
    names.map(nm =>
      nm -> (if (r.negNames(nm) || dn(nm)) None else Option(m.group(nm)))).toVector
  }

  def execResult(m: java.util.regex.Matcher, input: String, r: JsRegExpV): JsArray = {
    val out = JsArray.empty
    out.items += JsStr(m.group(0))
    // a capture inside a NEGATIVE lookaround never participates in a
    // successful JS match (Java retains the failed attempt's value);
    // same for captures inside an abandoned POSITIVE lookaround
    jsGroupValues(r, m).foreach(v =>
      out.items += v.map(s => JsStr(s): JsValue).getOrElse(JsUndefined))
    // V8 match/exec results are arrays with own props (ES 22.2.7.2)
    out.extraPut("index", JsNum(m.start.toDouble))
    out.extraPut("input", JsStr(input))
    // named captures: `groups` is an object with EVERY declared name
    // (undefined for non-participants), or absent entirely when the
    // pattern has none — V8's exact shape. Java's (?<name>) syntax is
    // the same as JS's; names are restricted to Java's [A-Za-z][A-Za-z0-9]*
    // subset (a `$`/`_`-leading JS name fails at construction — a
    // documented subset limit, loud, never a silent divergence).
    val names = namedGroups(m.pattern.pattern)
    if (names.nonEmpty) {
      val g = JsObject.empty()
      jsNamedValues(r, m, names).foreach { case (nm, v) =>
        g.props.put(nm, v.map(s => JsStr(s): JsValue).getOrElse(JsUndefined))
      }
      out.extraPut("groups", g)
    }
    // the 'd' flag (r16): per-group [start, end] UTF-16 offsets —
    // undefined exactly where the group value is undefined (negative
    // lookarounds, abandoned lookaheads, plain non-participation), the
    // same mapping + sentinel discipline as the values
    if (r.hasIndices) {
      def span(a: Int, b: Int): JsValue = JsArray.of(JsNum(a.toDouble), JsNum(b.toDouble))
      val idx = JsArray.empty
      idx.items += span(m.start, m.end)
      val (di, dn) = sentinelDropped(r, m)
      (1 to r.jsGroupCount).foreach { g =>
        val j = r.javaIdx(g)
        idx.items +=
          (if (r.negGroups(g) || di(g) || m.start(j) < 0) JsUndefined
           else span(m.start(j), m.end(j)))
      }
      if (names.nonEmpty) {
        val gi = JsObject.empty()
        names.foreach { nm =>
          gi.props.put(nm,
            if (r.negNames(nm) || dn(nm) || m.start(nm) < 0) JsUndefined
            else span(m.start(nm), m.end(nm)))
        }
        idx.extraPut("groups", gi)
      }
      out.extraPut("indices", idx)
    }
    out
  }

  /** capture groups (by index and by declared name) lexically inside a
    * NEGATIVE lookaround (`(?!…)` / `(?<!…)`, any nesting depth): when
    * the assertion succeeds by FAILING, JS resets these captures while
    * java.util.regex keeps the attempt's partial values. */
  private def negativeLookaroundCaptures(src: String): (Set[Int], Set[String]) = {
    val idxs = scala.collection.mutable.Set.empty[Int]
    val nms = scala.collection.mutable.Set.empty[String]
    val stack = scala.collection.mutable.Stack.empty[Boolean] // isNeg per '('
    var i = 0
    var g = 0
    var negDepth = 0
    var inClass = false
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c == '\\') i += 2
      else if (inClass) { if (c == ']') inClass = false; i += 1 }
      else if (c == '[') { inClass = true; i += 1 }
      else if (c == '(') {
        val isNeg = src.startsWith("(?!", i) || src.startsWith("(?<!", i)
        val named = src.startsWith("(?<", i) && i + 3 < n &&
          src.charAt(i + 3) != '=' && src.charAt(i + 3) != '!'
        val capturing = named || !(i + 1 < n && src.charAt(i + 1) == '?')
        if (capturing) {
          g += 1
          if (negDepth > 0) idxs += g
          if (named && negDepth > 0) {
            val end = src.indexOf('>', i + 3)
            if (end > 0) nms += src.substring(i + 3, end)
          }
        }
        if (isNeg) negDepth += 1
        stack.push(isNeg)
        i += 1
      }
      else if (c == ')') { if (stack.nonEmpty && stack.pop()) negDepth -= 1; i += 1 }
      else i += 1
    }
    (idxs.toSet, nms.toSet)
  }

  /** declared named-capture groups of a compiled pattern source, in
    * order; skips escapes, classes, and (?<=/(?<! lookbehinds */
  private def namedGroups(src: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    var inClass = false
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c == '\\') i += 2
      else if (inClass) { if (c == ']') inClass = false; i += 1 }
      else if (c == '[') { inClass = true; i += 1 }
      else if (c == '(' && src.startsWith("(?<", i) && i + 3 < n
          && src.charAt(i + 3) != '=' && src.charAt(i + 3) != '!') {
        val end = src.indexOf('>', i + 3)
        if (end > 0) { out += src.substring(i + 3, end); i = end + 1 } else i += 1
      } else i += 1
    }
    out.result()
  }

  // ---- Set / Map methods ----

  /** generator-object surface: the ES iteration protocol's `next`/
    * `return`/`throw`, each returning a FRESH `{value, done}` result
    * object (V8 allocates one per call too). */
  def generatorMethod(g: JsGenerator, name: String, interp: Interp): Option[JsValue] = {
    def result(pair: (JsValue, Boolean)): JsValue =
      JsObject.of("value" -> pair._1, "done" -> JsBool(pair._2))
    name match {
      case "next" => Some(native("next") { (_, as) =>
        result(Generators.next(g, arg(as, 0), interp))
      })
      case "return" => Some(native("return") { (_, as) =>
        result(Generators.gret(g, arg(as, 0), interp))
      })
      case "throw" => Some(native("throw") { (_, as) =>
        result(Generators.gthrow(g, arg(as, 0), interp))
      })
      case "constructor" => Some(JsUndefined)
      case "toString" => Some(native("toString")((_, _) => JsStr(toStr(g))))
      case _ => None
    }
  }

  /** Async-generator instance methods (r14): next/return/throw each
    * return a promise; calls queue per the spec's request list
    * ([[Promises.asyncGenRequest]]). */
  def asyncGeneratorMethod(ag: JsAsyncGenerator, name: String, interp: Interp): Option[JsValue] = name match {
    case "next" => Some(native("next")((_, as) =>
      Promises.asyncGenRequest(ag, Generators.GenNext(arg(as, 0)), interp)))
    case "return" => Some(native("return")((_, as) =>
      Promises.asyncGenRequest(ag, Generators.GenReturn(arg(as, 0)), interp)))
    case "throw" => Some(native("throw")((_, as) =>
      Promises.asyncGenRequest(ag, Generators.GenThrow(arg(as, 0)), interp)))
    case "constructor" => Some(JsUndefined)
    case "toString" => Some(native("toString")((_, _) => JsStr(toStr(ag))))
    case _ => None
  }

  /** Promise instance methods (r14): then/catch/finally per ES 27.2.5,
    * derived promises chained through [[Promises]]. */
  def promiseMethod(p: JsPromise, name: String, interp: Interp): Option[JsValue] = name match {
    case "then" => Some(native("then") { (_, as) =>
      Promises.thenMethod(p, arg(as, 0), arg(as, 1), interp)
    })
    case "catch" => Some(native("catch") { (_, as) =>
      Promises.thenMethod(p, JsUndefined, arg(as, 0), interp)
    })
    case "finally" => Some(native("finally") { (_, as) =>
      Promises.finallyMethod(p, arg(as, 0), interp)
    })
    case "constructor" => Some(JsUndefined)
    case "toString" => Some(native("toString")((_, _) => JsStr(toStr(p))))
    case _ => None
  }

  /** The `Promise` global: statics per ES 27.2.4 (resolve/reject/all/
    * allSettled/race/any); construction with an executor lives in
    * [[construct]]. Calling without `new` is V8's TypeError. */
  private[js] def promiseConstructor(interp: () => Interp): JsValue = {
    import Promises._
    // the engine's full iteration protocol (arrays/sets/maps/strings/
    // generators/custom [Symbol.iterator] objects/proxies — review find
    // r14: the original whitelist falsely rejected custom iterables);
    // iterate() throws the TypeError for genuine non-iterables
    def it(v: JsValue, i: Interp): Vector[JsValue] = i.iterate(v, Pos(0)).toVector
    // a combinator never throws synchronously: iteration errors
    // (non-iterable argument, a throwing custom iterator) reject the
    // RESULT promise, so `Promise.all(5).catch(h)` reaches h like V8
    def combinator(name: String)(body: (Vector[JsValue], JsPromise, Interp) => Unit): JsNative =
      native(name) { (_, as) =>
        val i = interp()
        val result = newPromise(i)
        try body(it(arg(as, 0), i), result, i)
        catch { case JsThrown(err) => rejectP(result, err, i) }
        result
      }
    val statics = JsObject.empty("Function")
    statics.props.put("resolve", native("resolve") { (_, as) =>
      promiseResolve(arg(as, 0), interp())
    })
    statics.props.put("reject", native("reject") { (_, as) =>
      val i = interp()
      val p = newPromise(i)
      rejectP(p, arg(as, 0), i) // no assimilation — reject is verbatim (spec)
      p
    })
    statics.props.put("all", combinator("all") { (items, result, i) =>
      val values = Array.fill[JsValue](items.length)(JsUndefined)
      val remaining = Array(1)
      items.zipWithIndex.foreach { case (x, idx) =>
        remaining(0) += 1
        performThen(promiseResolve(x, i), None, None, Resume(
          v => {
            values(idx) = v
            remaining(0) -= 1
            if (remaining(0) == 0)
              fulfill(result, JsArray.of(values.toIndexedSeq: _*), i)
          },
          e => rejectP(result, e, i)), i)
      }
      remaining(0) -= 1
      if (remaining(0) == 0) fulfill(result, JsArray.of(values.toIndexedSeq: _*), i)
    })
    statics.props.put("allSettled", combinator("allSettled") { (items, result, i) =>
      val values = Array.fill[JsValue](items.length)(JsUndefined)
      val remaining = Array(1)
      def done(): Unit = {
        remaining(0) -= 1
        if (remaining(0) == 0)
          fulfill(result, JsArray.of(values.toIndexedSeq: _*), i)
      }
      items.zipWithIndex.foreach { case (x, idx) =>
        remaining(0) += 1
        performThen(promiseResolve(x, i), None, None, Resume(
          v => { values(idx) = JsObject.of("status" -> JsStr("fulfilled"), "value" -> v); done() },
          e => { values(idx) = JsObject.of("status" -> JsStr("rejected"), "reason" -> e); done() }), i)
      }
      done()
    })
    statics.props.put("race", combinator("race") { (items, result, i) =>
      items.foreach { x =>
        performThen(promiseResolve(x, i), None, None, Resume(
          v => resolveP(result, v, i),
          e => rejectP(result, e, i)), i)
      } // an empty iterable races forever — pending, like V8
    })
    statics.props.put("any", combinator("any") { (items, result, i) =>
      val errors = Array.fill[JsValue](items.length)(JsUndefined)
      val remaining = Array(1)
      def aggregate(): Unit = {
        val agg = Values.makeError("AggregateError", "All promises were rejected")
        agg.props.put("errors", JsArray.of(errors.toIndexedSeq: _*))
        rejectP(result, agg, i)
      }
      items.zipWithIndex.foreach { case (x, idx) =>
        remaining(0) += 1
        performThen(promiseResolve(x, i), None, None, Resume(
          v => resolveP(result, v, i),
          e => {
            errors(idx) = e
            remaining(0) -= 1
            if (remaining(0) == 0) aggregate()
          }), i)
      }
      remaining(0) -= 1
      if (remaining(0) == 0) aggregate()
    })
    statics.frozen = true
    hybridCallable(native("Promise") { (_, _) =>
      throwType("Promise constructor cannot be invoked without 'new'")
    }, statics)
  }

  def setMethod(s: JsSetV, name: String, interp: Interp): Option[JsValue] = name match {
    case "size" => Some(JsNum(s.entries.size.toDouble))
    case "add" => Some(native("add") { (_, as) =>
      val v = arg(as, 0); s.entries.put(new JsKey(v), v); s
    })
    case "has" => Some(native("has")((_, as) => JsBool(s.entries.contains(new JsKey(arg(as, 0))))))
    case "delete" => Some(native("delete")((_, as) => JsBool(s.entries.remove(new JsKey(arg(as, 0))).isDefined)))
    case "clear" => Some(native("clear")((_, _) => { s.entries.clear(); JsUndefined }))
    case "forEach" => Some(native("forEach") { (_, as) =>
      val fn = arg(as, 0)
      s.entries.values.toVector.foreach(v => interp.callCallback(fn, Vector(v, v, s)))
      JsUndefined
    })
    case "values" | "keys" => Some(native(name)((_, _) =>
      builtinIterator("Set", s.entries.values.toVector.iterator)))
    case "entries" => Some(native("entries")((_, _) =>
      builtinIterator("Set", s.entries.values.toVector.iterator
        .map(v => JsArray.of(v, v): JsValue))))
    case _ => None
  }

  def mapMethod(m: JsMapV, name: String, interp: Interp): Option[JsValue] = name match {
    case "size" => Some(JsNum(m.entries.size.toDouble))
    case "get" => Some(native("get")((_, as) => m.entries.get(new JsKey(arg(as, 0))).map(_._2).getOrElse(JsUndefined)))
    case "set" => Some(native("set") { (_, as) =>
      val k = arg(as, 0); m.entries.put(new JsKey(k), (k, arg(as, 1))); m
    })
    case "has" => Some(native("has")((_, as) => JsBool(m.entries.contains(new JsKey(arg(as, 0))))))
    case "delete" => Some(native("delete")((_, as) => JsBool(m.entries.remove(new JsKey(arg(as, 0))).isDefined)))
    case "clear" => Some(native("clear")((_, _) => { m.entries.clear(); JsUndefined }))
    case "forEach" => Some(native("forEach") { (_, as) =>
      val fn = arg(as, 0)
      m.entries.values.toVector.foreach { case (k, v) => interp.callCallback(fn, Vector(v, k, m)) }
      JsUndefined
    })
    case "keys" => Some(native("keys")((_, _) =>
      builtinIterator("Map", m.entries.values.toVector.iterator.map(_._1))))
    case "values" => Some(native("values")((_, _) =>
      builtinIterator("Map", m.entries.values.toVector.iterator.map(_._2))))
    case "entries" => Some(native("entries")((_, _) =>
      builtinIterator("Map", m.entries.values.toVector.iterator
        .map { case (k, v) => JsArray.of(k, v): JsValue })))
    case _ => None
  }

  // ---- Number.prototype ----

  def numberMethod(d: Double, name: String): Option[JsValue] = name match {
    case "toFixed" => Some(native("toFixed") { (_, as) =>
      val digits = arg(as, 0) match { case JsUndefined => 0; case v => toNumber(v).toInt }
      if (digits < 0 || digits > 100) throwRange("toFixed() digits argument must be between 0 and 100")
      if (java.lang.Double.isNaN(d)) JsStr("NaN")
      // spec: |x| ≥ 10^21 falls back to ToString (exponential), and the
      // exact-binary BigDecimal(d) constructor is the point — toFixed
      // rounds the true binary value ((1.005).toFixed(2) is "1.00")
      else if (math.abs(d) >= 1e21) JsStr(numToString(d))
      else JsStr(new java.math.BigDecimal(d).setScale(digits, java.math.RoundingMode.HALF_UP).toPlainString)
    })
    case "toString" => Some(native("toString") { (_, as) =>
      arg(as, 0) match {
        case JsUndefined => JsStr(numToString(d))
        case radixV =>
          val radix = toNumber(radixV).toInt
          if (radix < 2 || radix > 36) throwRange("toString() radix must be between 2 and 36")
          if (radix == 10) JsStr(numToString(d))
          else if (java.lang.Double.isNaN(d)) JsStr("NaN")
          else if (java.lang.Double.isInfinite(d)) JsStr(if (d > 0) "Infinity" else "-Infinity")
          else if (d == math.floor(d) && math.abs(d) < 9.007199254740992e15)
            JsStr(java.lang.Long.toString(d.toLong, radix))
          else JsStr(doubleToRadix(d, radix))
      }
    })
    case "valueOf" => Some(native("valueOf")((_, _) => JsNum(d)))
    case "toExponential" => Some(native("toExponential") { (_, as) =>
      if (java.lang.Double.isNaN(d)) JsStr("NaN")
      else if (java.lang.Double.isInfinite(d)) JsStr(if (d > 0) "Infinity" else "-Infinity")
      else {
        val fOpt = arg(as, 0) match { case JsUndefined => None; case v => Some(toNumber(v).toInt) }
        fOpt.foreach(f => if (f < 0 || f > 100)
          throwRange("toExponential() argument must be between 0 and 100"))
        JsStr(toExponentialString(d, fOpt))
      }
    })
    case "toPrecision" => Some(native("toPrecision") { (_, as) =>
      arg(as, 0) match {
        case JsUndefined => JsStr(numToString(d))
        case p =>
          val prec = toNumber(p).toInt
          if (prec < 1 || prec > 100) throwRange("toPrecision() argument must be between 1 and 100")
          JsStr(toPrecisionString(d, prec))
      }
    })
    case _ => None
  }

  /** Double → non-decimal radix string, the V8-compatible shape: emit
    * fraction digits while the remaining value exceeds half an ulp of
    * the original, then round the last digit to nearest (ties to even
    * on the digit parity) — the standard shortest-faithful radix
    * conversion (ECMA leaves non-decimal ToString implementation-
    * approximate; this is what every JS engine ships). Integer part via
    * BigDecimal (exact — doubles are dyadic rationals). */
  private def doubleToRadix(d: Double, radix: Int): String = {
    val neg = d < 0
    val ad = math.abs(d)
    val intPart = math.floor(ad)
    var frac = ad - intPart
    val intStr =
      if (intPart < 9.007199254740992e15) java.lang.Long.toString(intPart.toLong, radix)
      else new java.math.BigDecimal(intPart).toBigInteger.toString(radix)
    val sb = new java.lang.StringBuilder
    if (frac > 0) {
      // half-ulp of the ORIGINAL double bounds how many fraction digits
      // are faithful; below it the digits would be binary noise
      var delta = 0.5 * (Math.ulp(ad))
      if (delta <= 0) delta = java.lang.Double.MIN_VALUE
      sb.append('.')
      var continue = true
      while (continue && frac >= delta) {
        frac *= radix
        delta *= radix
        var digit = frac.toInt
        frac -= digit
        if (frac > 0.5 || (frac == 0.5 && (digit & 1) == 1)) {
          // round up, with carry back through the emitted digits
          if (frac + delta > 1) {
            digit += 1
            continue = false
            var carry = digit >= radix
            if (carry) digit -= radix
            sb.append(Character.forDigit(digit, radix))
            if (carry) {
              // propagate: bump prior digits; digits are after the '.'
              var i = sb.length - 2
              var carrying = true
              while (carrying && i > 0 && sb.charAt(i) != '.') {
                val v = Character.digit(sb.charAt(i), radix) + 1
                if (v >= radix) { sb.setCharAt(i, Character.forDigit(0, radix)); i -= 1 }
                else { sb.setCharAt(i, Character.forDigit(v, radix)); carrying = false }
              }
              if (carrying) {
                // carry crossed the point: integer part + 1 (rare)
                val bumped = new java.math.BigInteger(intStr, radix)
                  .add(java.math.BigInteger.ONE).toString(radix)
                val frDigits = sb.substring(1)
                return (if (neg) "-" else "") + bumped + "." + frDigits
              }
            }
          } else sb.append(Character.forDigit(digit, radix))
        } else sb.append(Character.forDigit(digit, radix))
      }
      // strip a trailing run of zeros the rounding may have produced
      while (sb.length > 1 && sb.charAt(sb.length - 1) == '0') sb.setLength(sb.length - 1)
      if (sb.length == 1) sb.setLength(0) // nothing faithful after all
    }
    (if (neg) "-" else "") + intStr + sb.toString
  }

  /** ECMA Number.prototype.toExponential layout: `d.dd…e±e` with an
    * UNPADDED exponent (`0e+0`, `1.2e+5` — never `e+05`); with
    * fractionDigits, exactly that many digits after the point, ties
    * half-up on the exact binary value (the toFixed rule); without,
    * the shortest digit string that round-trips (Double.toString's
    * shortest-repr digits). */
  private def toExponentialString(d: Double, fOpt: Option[Int]): String = {
    val neg = d < 0
    val ad = math.abs(d)
    val (digits, e) =
      if (ad == 0.0) ("0" * (fOpt.getOrElse(0) + 1), 0)
      else fOpt match {
        case Some(f) =>
          val bd = new java.math.BigDecimal(ad)
            .round(new java.math.MathContext(f + 1, java.math.RoundingMode.HALF_UP))
          digitsAndDecExp(bd, f + 1)
        case None =>
          val bd = new java.math.BigDecimal(java.lang.Double.toString(ad))
            .stripTrailingZeros
          digitsAndDecExp(bd, bd.precision)
      }
    val mant =
      if (digits.length == 1) digits
      else digits.substring(0, 1) + "." + digits.substring(1)
    val sign = if (e < 0) "-" else "+"
    (if (neg) "-" else "") + mant + "e" + sign + math.abs(e)
  }

  /** significant digits (zero-padded to `prec`) + decimal exponent of
    * the leading digit */
  private def digitsAndDecExp(bd: java.math.BigDecimal, prec: Int): (String, Int) = {
    val unscaled = bd.unscaledValue.toString
    val padded =
      if (unscaled.length < prec) unscaled + "0" * (prec - unscaled.length) else unscaled
    (padded, bd.precision - bd.scale - 1)
  }

  /** ECMA Number.prototype.toPrecision layout — NOT Java's
    * BigDecimal.toString (whose "1.2E+2" notation and exponent
    * thresholds differ): exactly `p` significant digits (zero-padded),
    * exponential form `d.dd…e±e` (lowercase, signed) only when the
    * decimal exponent e < −6 or e ≥ p; ties round half-up on the
    * magnitude of the exact binary value. */
  private def toPrecisionString(d: Double, p: Int): String = {
    if (java.lang.Double.isNaN(d)) return "NaN"
    if (java.lang.Double.isInfinite(d)) return if (d > 0) "Infinity" else "-Infinity"
    val neg = d < 0
    val (digits, e) =
      if (d == 0.0) ("0" * p, 0)
      else {
        val bd = new java.math.BigDecimal(math.abs(d))
          .round(new java.math.MathContext(p, java.math.RoundingMode.HALF_UP))
        val unscaled = bd.unscaledValue.toString
        val exp = (unscaled.length - 1) - bd.scale
        (unscaled.padTo(p, '0'), exp)
      }
    val s =
      if (e < -6 || e >= p) {
        val mant = if (p == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
        mant + "e" + (if (e >= 0) "+" else "") + e
      } else if (e >= 0) {
        if (p > e + 1) digits.substring(0, e + 1) + "." + digits.substring(e + 1)
        else digits
      } else "0." + "0" * (-e - 1) + digits
    if (neg) "-" + s else s
  }

  // ---- Boolean.prototype ----

  def booleanMethod(b: Boolean, name: String): Option[JsValue] = name match {
    case "toString" => Some(native("toString")((_, _) => JsStr(b.toString)))
    case "valueOf" => Some(native("valueOf")((_, _) => JsBool(b)))
    case _ => None
  }

  // ---- String.prototype ----

  def stringMethod(s: String, name: String, interp: Interp): Option[JsValue] = {
    def withStr(nm: String)(f: Vector[JsValue] => JsValue): Option[JsValue] = Some(native(nm)((_, as) => f(as)))
    name match {
      case "charAt" => withStr(name) { as =>
        val i = interp.toNumberI(arg(as, 0)).toInt
        JsStr(if (i >= 0 && i < s.length) s.charAt(i).toString else "")
      }
      case "charCodeAt" => withStr(name) { as =>
        val i = arg(as, 0) match { case JsUndefined => 0; case v => interp.toNumberI(v).toInt }
        if (i >= 0 && i < s.length) JsNum(s.charAt(i).toDouble) else JsNum(Double.NaN)
      }
      case "codePointAt" => withStr(name) { as =>
        val i = arg(as, 0) match { case JsUndefined => 0; case v => interp.toNumberI(v).toInt }
        if (i >= 0 && i < s.length) JsNum(s.codePointAt(i).toDouble) else JsUndefined
      }
      case "at" => withStr(name) { as =>
        val i0 = interp.toNumberI(arg(as, 0)).toInt
        val i = if (i0 < 0) s.length + i0 else i0
        if (i >= 0 && i < s.length) JsStr(s.charAt(i).toString) else JsUndefined
      }
      case "indexOf" => withStr(name)(as => JsNum(s.indexOf(interp.toStrI(arg(as, 0)),
        arg(as, 1) match { case JsUndefined => 0; case v => interp.toNumberI(v).toInt }).toDouble))
      case "lastIndexOf" => withStr(name)(as => JsNum(s.lastIndexOf(interp.toStrI(arg(as, 0)),
        arg(as, 1) match { case JsUndefined => s.length; case v =>
          // ES 22.1.3.9: NaN → +Inf, else clamp to [0, len] — a STRING's
          // negative position clamps to 0 (unlike Array#lastIndexOf,
          // which counts from the end)
          val d = interp.toNumberI(v); if (d.isNaN) s.length else math.max(0, d.toInt) }).toDouble))
      case "includes" => withStr(name)(as => JsBool(s.indexOf(interp.toStrI(arg(as, 0)),
        arg(as, 1) match { case JsUndefined => 0; case v => math.max(0, interp.toNumberI(v).toInt) }) >= 0))
      case "startsWith" => withStr(name)(as => JsBool(s.startsWith(interp.toStrI(arg(as, 0)),
        arg(as, 1) match { case JsUndefined => 0; case v => interp.toNumberI(v).toInt })))
      case "endsWith" => withStr(name) { as =>
        val end = arg(as, 1) match { case JsUndefined => s.length; case v => interp.toNumberI(v).toInt }
        JsBool(s.substring(0, math.min(math.max(end, 0), s.length)).endsWith(interp.toStrI(arg(as, 0))))
      }
      case "slice" => withStr(name) { as =>
        val len = s.length
        def clamp(v: Double, neg: Boolean): Int = {
          val i = if (v < 0) len + v.toInt else v.toInt
          math.max(0, math.min(len, i))
        }
        val start = arg(as, 0) match { case JsUndefined => 0; case v => clamp(interp.toNumberI(v), true) }
        val end = arg(as, 1) match { case JsUndefined => len; case v => clamp(interp.toNumberI(v), true) }
        JsStr(if (start >= end) "" else s.substring(start, end))
      }
      case "substring" => withStr(name) { as =>
        val len = s.length
        def clamp(v: Double): Int = math.max(0, math.min(len, if (java.lang.Double.isNaN(v)) 0 else v.toInt))
        val a = arg(as, 0) match { case JsUndefined => 0; case v => clamp(interp.toNumberI(v)) }
        val b = arg(as, 1) match { case JsUndefined => len; case v => clamp(interp.toNumberI(v)) }
        JsStr(s.substring(math.min(a, b), math.max(a, b)))
      }
      case "substr" => withStr(name) { as =>
        val len = s.length
        var start = interp.toNumberI(arg(as, 0)).toInt
        if (start < 0) start = math.max(0, len + start)
        if (start >= len) JsStr("")
        else {
          val count = arg(as, 1) match { case JsUndefined => len - start; case v => interp.toNumberI(v).toInt }
          JsStr(s.substring(start, math.min(len, start + math.max(0, count))))
        }
      }
      case "toLowerCase" | "toLocaleLowerCase" => withStr(name)(_ => JsStr(s.toLowerCase(java.util.Locale.ROOT)))
      case "toUpperCase" | "toLocaleUpperCase" => withStr(name)(_ => JsStr(s.toUpperCase(java.util.Locale.ROOT)))
      // the JS WhiteSpace∪LineTerminator set (NBSP, ZWNBSP, Zs, LS, PS)
      // — Java's String.trim (≤ U+0020) and regex \s ([ \t\n\x0B\f\r])
      // both under-strip; `'  '.trim()` must be '' (found by
      // V8-differential fuzzing, round 10)
      case "trim" => withStr(name)(_ => JsStr(Values.jsTrim(s)))
      case "trimStart" => withStr(name) { _ =>
        var i = 0
        while (i < s.length && Values.isJsWhitespace(s.charAt(i))) i += 1
        JsStr(s.substring(i))
      }
      case "trimEnd" => withStr(name) { _ =>
        var j = s.length
        while (j > 0 && Values.isJsWhitespace(s.charAt(j - 1))) j -= 1
        JsStr(s.substring(0, j))
      }
      case "split" => withStr(name) { as =>
        val limit = arg(as, 1) match { case JsUndefined => Int.MaxValue; case v => interp.toNumberI(v).toInt }
        val parts: Vector[JsValue] = arg(as, 0) match {
          case JsUndefined => Vector(JsStr(s))
          case r: JsRegExpV => splitByRegex(s, r)
          case sep =>
            val sepS = interp.toStrI(sep)
            if (sepS.isEmpty) s.map(c => JsStr(c.toString): JsValue).toVector
            else splitByLiteral(s, sepS).map(JsStr(_): JsValue)
        }
        JsArray.of(parts.take(math.max(0, limit)): _*)
      }
      case "replace" => withStr(name)(as => JsStr(replaceImpl(s, arg(as, 0), arg(as, 1), all = false, interp)))
      case "replaceAll" => withStr(name)(as => JsStr(replaceImpl(s, arg(as, 0), arg(as, 1), all = true, interp)))
      case "match" => withStr(name) { as =>
        arg(as, 0) match {
          case r: JsRegExpV =>
            if (r.global) {
              // Symbol.match resets lastIndex to 0 up front and leaves
              // it there (V8); a sticky+global regex collects the
              // anchored RUN and stops at the first gap
              r.lastIndex = 0
              val m = r.pattern.matcher(s)
              val out = JsArray.empty
              var q = 0
              while (findFrom(r, m, s, q)) {
                out.items += JsStr(m.group())
                q = if (m.end == m.start) m.end + 1 else m.end
              }
              if (out.items.isEmpty) JsNull else out
            } else {
              // non-global match IS RegExpExec — sticky anchors at
              // lastIndex and mutates it like exec (V8)
              regExpExec(r, s) match {
                case Some(m) => execResult(m, s, r)
                case None => JsNull
              }
            }
          case other =>
            // a string argument is coerced to a PATTERN (new RegExp(s)),
            // not a literal — '.'/'\\d' etc stay metacharacters; a
            // MISSING argument is RegExp(undefined) = the empty pattern,
            // not the literal string "undefined"
            val r = compileRegex(if (other == JsUndefined) "" else interp.toStrI(other), "", Pos(0))
            val m = r.pattern.matcher(s)
            if (m.find()) execResult(m, s, r) else JsNull
        }
      }
      case "search" => withStr(name) { as =>
        val r = arg(as, 0) match {
          case re: JsRegExpV => re
          case other => // same coercion as match, incl. the undefined case
            compileRegex(if (other == JsUndefined) "" else interp.toStrI(other), "", Pos(0))
        }
        // Symbol.search runs exec with a saved-and-restored lastIndex
        // of 0 (V8): a sticky regex therefore anchors at position 0
        // and the caller's lastIndex is untouched
        val m = r.pattern.matcher(s)
        JsNum(if (findFrom(r, m, s, 0)) m.start.toDouble else -1.0)
      }
      case "matchAll" => withStr(name) { as =>
        // a real LAZY protocol iterator since r16 (the previous ARRAY
        // shape was a documented subset boundary — manual .next() was
        // a loud TypeError): each pull runs one exec at .next() time
        val r = arg(as, 0) match {
          case re: JsRegExpV =>
            if (!re.global)
              throwType("String.prototype.matchAll called with a non-global RegExp argument")
            re
          case other =>
            compileRegex(if (other == JsUndefined) "" else interp.toStrI(other), "g", Pos(0))
        }
        val m = r.pattern.matcher(s)
        // V8 clones the regex PRESERVING lastIndex: a global regex with
        // lastIndex > 0 (e.g. after a prior exec) matchAlls from there,
        // and the ORIGINAL's lastIndex is never mutated (the clone's
        // advances). Non-regex args compile fresh (lastIndex 0).
        builtinIterator("RegExp String", new Iterator[JsValue] {
          private var q = math.min(r.lastIndex, s.length)
          private var buf: JsValue = null
          def hasNext: Boolean = {
            if (buf != null) return true
            if (!findFrom(r, m, s, q)) return false // sticky: run stops at the first gap
            interp.budget.allocate(4)
            buf = execResult(m, s, r)
            q = if (m.end == m.start) m.end + 1 else m.end // zero-width: advance
            true
          }
          def next(): JsValue = {
            if (!hasNext) throw new NoSuchElementException
            val v = buf; buf = null; v
          }
        })
      }
      case "repeat" => withStr(name) { as =>
        val n = interp.toNumberI(arg(as, 0)).toInt
        if (n < 0) throwRange("repeat count must be non-negative")
        if (n.toLong * s.length > 50000000L) throwRange("repeat result too large for lens code")
        interp.budget.allocate(n.toLong * s.length + 1)
        JsStr(s * n)
      }
      case "padStart" => withStr(name) { as =>
        val target = interp.toNumberI(arg(as, 0)).toInt
        val pad = arg(as, 1) match { case JsUndefined => " "; case v => interp.toStrI(v) }
        interp.budget.allocate(math.max(s.length, target).toLong + 1)
        JsStr(padTo(s, target, pad, start = true))
      }
      case "padEnd" => withStr(name) { as =>
        val target = interp.toNumberI(arg(as, 0)).toInt
        val pad = arg(as, 1) match { case JsUndefined => " "; case v => interp.toStrI(v) }
        interp.budget.allocate(math.max(s.length, target).toLong + 1)
        JsStr(padTo(s, target, pad, start = false))
      }
      case "concat" => withStr(name)(as => JsStr(s + as.map(toStr).mkString))
      case "localeCompare" => withStr(name)(as => JsNum(Integer.signum(s.compareTo(interp.toStrI(arg(as, 0)))).toDouble))
      case "normalize" => withStr(name) { as =>
        val form = arg(as, 0) match { case JsUndefined => "NFC"; case v => interp.toStrI(v) }
        JsStr(java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form)))
      }
      case "toString" | "valueOf" => withStr(name)(_ => JsStr(s))
      case _ => None
    }
  }

  private def padTo(s: String, target: Int, pad: String, start: Boolean): String = {
    if (target <= s.length || pad.isEmpty) s
    else {
      if (target > 10000000) throwRange("pad target too large for lens code")
      val sb = new java.lang.StringBuilder
      while (sb.length < target - s.length) sb.append(pad)
      sb.setLength(target - s.length)
      if (start) sb.toString + s else s + sb.toString
    }
  }

  /** JS String.prototype.split with literal separator (Java's split has
    * different trailing-empty semantics) */
  private def splitByLiteral(s: String, sep: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var from = 0
    var idx = s.indexOf(sep, from)
    while (idx >= 0) {
      out += s.substring(from, idx)
      from = idx + sep.length
      idx = s.indexOf(sep, from)
    }
    out += s.substring(from)
    out.result()
  }

  /** JS String.prototype.split(regex): keeps leading AND trailing empties
    * (unlike Java's default), includes capture groups in the output, and
    * advances one position past zero-width matches. Mirrors the spec's
    * SplitMatch loop with a find(q)-based scan. */
  private def splitByRegex(s: String, r: JsRegExpV): Vector[JsValue] = {
    val p = r.pattern
    if (s.isEmpty) {
      return if (p.matcher(s).find()) Vector.empty else Vector(JsStr(s))
    }
    val out = Vector.newBuilder[JsValue]
    val m = p.matcher(s)
    var last = 0 // start of the current un-emitted segment
    var q = 0    // scan position
    while (q < s.length) {
      if (m.find(q)) {
        if (m.end == last && m.start == last) q += 1 // zero-width at segment start: skip
        else if (m.start >= s.length) q = s.length
        else {
          out += JsStr(s.substring(last, m.start))
          // capture groups are part of the split result per spec;
          // an UNMATCHED group is undefined (V8), never "" — the two
          // are distinguishable in the output array
          jsGroupValues(r, m).foreach(v =>
            out += v.map(x => JsStr(x): JsValue).getOrElse(JsUndefined))
          last = m.end
          q = if (m.end == m.start) m.end + 1 else m.end
        }
      } else q = s.length
    }
    out += JsStr(s.substring(last))
    out.result()
  }

  private def replaceImpl(s: String, pat: JsValue, rep: JsValue, all: Boolean, interp: Interp): String = {
    def replacementFor(matched: String, groups: Vector[Option[String]], index: Int,
                       named: Vector[(String, Option[String])]): String = rep match {
      case f: JsFunc =>
        // when the pattern declares named groups, V8 appends the groups
        // object as one extra trailing argument (ES 22.1.3.19 step 16.j)
        val groupsObj: Vector[JsValue] =
          if (named.isEmpty) Vector.empty
          else {
            val g = JsObject.empty()
            named.foreach { case (nm, v) =>
              g.props.put(nm, v.map(x => JsStr(x): JsValue).getOrElse(JsUndefined))
            }
            Vector(g)
          }
        val args = Vector(JsStr(matched)) ++
          groups.map(g => g.map(JsStr(_): JsValue).getOrElse(JsUndefined)) ++
          Vector(JsNum(index.toDouble), JsStr(s)) ++ groupsObj
        interp.toStrI(interp.callFunction(f, JsUndefined, args, Pos(0), "replacer"))
      case other =>
        // $& = match, $` / $' = before/after context, $1..$99 groups
        // ($nn preferred over $n when both are valid groups, like V8),
        // $<name> named groups (literal when the pattern declares none,
        // "" for an unknown name — ES GetSubstitution), $$ literal;
        // anything else stays literal (ES 22.1.3.19.1)
        val template = interp.toStrI(other)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i < template.length) {
          val c = template.charAt(i)
          if (c == '$' && i + 1 < template.length) {
            template.charAt(i + 1) match {
              case '$' => sb.append('$'); i += 2
              case '&' => sb.append(matched); i += 2
              case '`' => sb.append(s, 0, index); i += 2
              case '\'' => sb.append(s, index + matched.length, s.length); i += 2
              case '<' if named.nonEmpty =>
                val close = template.indexOf('>', i + 2)
                if (close < 0) { sb.append(c); i += 1 }
                else {
                  val nm = template.substring(i + 2, close)
                  named.find(_._1 == nm).foreach(_._2.foreach(sb.append))
                  i = close + 1
                }
              case d if d.isDigit =>
                val two =
                  if (i + 2 < template.length && template.charAt(i + 2).isDigit)
                    (d - '0') * 10 + (template.charAt(i + 2) - '0')
                  else 0
                if (two >= 1 && two <= groups.length) {
                  sb.append(groups(two - 1).getOrElse("")); i += 3
                } else {
                  val g = d - '0'
                  if (g >= 1 && g <= groups.length) { sb.append(groups(g - 1).getOrElse("")); i += 2 }
                  else { sb.append(c); i += 1 }
                }
              case _ => sb.append(c); i += 1
            }
          } else { sb.append(c); i += 1 }
        }
        sb.toString
    }
    pat match {
      case r: JsRegExpV =>
        // replaceAll demands a GLOBAL regex (V8 TypeError) — silently
        // replacing once would drop occurrences
        if (all && !r.global)
          throwType("String.prototype.replaceAll called with a non-global RegExp argument")
        val doAll = all || r.global
        if (doAll) r.lastIndex = 0 // Symbol.replace zeroes it up front (V8)
        val m = r.pattern.matcher(s)
        val names = namedGroups(r.pattern.pattern)
        val sb = new java.lang.StringBuilder
        var last = 0 // end of last appended region
        // non-global sticky replace is ONE RegExpExec: it starts at the
        // regex's lastIndex and mutates it (hit → m.end, miss → 0), V8
        var q = if (!doAll && r.sticky) r.lastIndex else 0
        var matched = false
        var done = false
        while (!done && q <= s.length) {
          if (findFrom(r, m, s, q)) {
            matched = true
            sb.append(s, last, m.start)
            val groups = jsGroupValues(r, m)
            val named = jsNamedValues(r, m, names)
            sb.append(replacementFor(m.group(), groups, m.start, named))
            last = m.end
            q = if (m.end == m.start) m.end + 1 else m.end // zero-width: advance
            if (!doAll) done = true
          } else done = true
        }
        if (!doAll && r.sticky)
          r.lastIndex = if (matched) last else 0
        sb.append(s.substring(math.min(last, s.length)))
        sb.toString
      case other =>
        val lit = interp.toStrI(other)
        if (!all) {
          val idx = s.indexOf(lit)
          if (idx < 0) s
          else s.substring(0, idx) + replacementFor(lit, Vector.empty, idx, Vector.empty) + s.substring(idx + lit.length)
        } else {
          if (lit.isEmpty) return s
          val sb = new java.lang.StringBuilder
          var from = 0
          var idx = s.indexOf(lit, from)
          while (idx >= 0) {
            sb.append(s, from, idx)
            sb.append(replacementFor(lit, Vector.empty, idx, Vector.empty))
            from = idx + lit.length
            idx = s.indexOf(lit, from)
          }
          sb.append(s.substring(from))
          sb.toString
        }
    }
  }

  // ---- Array.prototype ----

  def arrayMethod(a: JsArray, name: String, interp: Interp): Option[JsValue] = {
    def nat(nm: String)(f: Vector[JsValue] => JsValue): Option[JsValue] = Some(native(nm)((_, as) => f(as)))
    def normIndex(v: Double, len: Int): Int = {
      val i = if (v < 0) len + v.toInt else v.toInt
      math.max(0, math.min(len, i))
    }
    // splice/toSpliced deleteCount: ES distinguishes ABSENT (arity)
    // from present-but-undefined (ToIntegerOrInfinity -> 0)
    def spliceDeleteCount(as: Vector[JsValue], len: Int, start: Int): Int =
      if (as.isEmpty) 0
      else if (as.length == 1) len - start
      else {
        val n = interp.toNumberI(arg(as, 1))
        math.max(0, math.min(len - start, if (n.isNaN) 0 else n.toInt))
      }
    name match {
      case "push" => nat(name) { as => a.items ++= as; JsNum(a.items.length.toDouble) }
      case "pop" => nat(name) { _ =>
        if (a.items.isEmpty) JsUndefined else Values.deHole(a.items.remove(a.items.length - 1))
      }
      case "shift" => nat(name) { _ =>
        if (a.items.isEmpty) JsUndefined else Values.deHole(a.items.remove(0))
      }
      case "unshift" => nat(name) { as => a.items.prependAll(as); JsNum(a.items.length.toDouble) }
      case "slice" => nat(name) { as =>
        val len = a.items.length
        val start = arg(as, 0) match { case JsUndefined => 0; case v => normIndex(interp.toNumberI(v), len) }
        val end = arg(as, 1) match { case JsUndefined => len; case v => normIndex(interp.toNumberI(v), len) }
        JsArray.of(a.items.slice(start, math.max(start, end)).toSeq: _*)
      }
      case "splice" => nat(name) { as =>
        val len = a.items.length
        val start = arg(as, 0) match { case JsUndefined => 0; case v => normIndex(interp.toNumberI(v), len) }
        // 23.1.3.31: deleteCount ABSENT -> "remove nothing" only when
        // start is also absent; present-but-undefined is
        // ToIntegerOrInfinity(undefined)=0 — arity, not value
        val deleteCount = spliceDeleteCount(as, len, start)
        val removed = JsArray.of(a.items.slice(start, start + deleteCount).toSeq: _*)
        a.items.remove(start, deleteCount)
        a.items.insertAll(start, as.drop(2))
        removed
      }
      // fromIndex normalization shared by indexOf/includes: negative
      // counts from the end, then clamps to 0 (ES 23.1.3)
      case "indexOf" => nat(name) { as =>
        val from = arg(as, 1) match {
          case JsUndefined => 0
          case v => val i = interp.toNumberI(v).toInt
            math.max(0, if (i < 0) a.items.length + i else i)
        }
        // holes are skipped (indexOf never matches undefined in a hole)
        JsNum(a.items.indexWhere(v => !(v eq JsHole) && strictEquals(v, arg(as, 0)), from).toDouble)
      }
      case "lastIndexOf" => nat(name) { as =>
        val end = arg(as, 1) match {
          case JsUndefined => a.items.length - 1
          case v => val i = interp.toNumberI(v).toInt
            math.min(a.items.length - 1, if (i < 0) a.items.length + i else i)
        }
        JsNum((if (end < 0) -1
               else a.items.lastIndexWhere(v => !(v eq JsHole) && strictEquals(v, arg(as, 0)), end)).toDouble)
      }
      case "includes" => nat(name) { as =>
        val target = arg(as, 0)
        val from = arg(as, 1) match {
          case JsUndefined => 0
          case v => val i = interp.toNumberI(v).toInt
            math.max(0, if (i < 0) a.items.length + i else i)
        }
        // includes uses SameValueZero (NaN found), unlike indexOf
        JsBool(a.items.indexWhere(v => new JsKey(v) == new JsKey(target), from) >= 0)
      }
      case "join" => nat(name) { as =>
        // separator AND elements coerce via interp-aware ToString
        // (user toString / proxy get traps honored — V8)
        val sep = arg(as, 0) match { case JsUndefined => ","; case v => interp.toStrI(v) }
        JsStr(a.items.map {
          case JsUndefined | JsNull => ""
          case v => interp.toStrI(v)
        }.mkString(sep))
      }
      case "concat" => nat(name) { as =>
        val out = JsArray.of(a.items.toSeq: _*)
        as.foreach {
          case arr: JsArray => out.items ++= arr.items
          case v => out.items += v
        }
        out
      }
      case "reverse" => nat(name) { _ =>
        val rev = a.items.reverse
        a.items.clear(); a.items ++= rev
        a
      }
      case "map" => nat(name) { as =>
        val fn = arg(as, 0)
        // holes: callback skipped, hole KEPT in the result (ES 23.1.3.21)
        JsArray.of(a.items.toVector.zipWithIndex.map { case (v, i) =>
          if (v eq JsHole) JsHole
          else interp.callCallback(fn, Vector(v, JsNum(i.toDouble), a))
        }: _*)
      }
      case "filter" => nat(name) { as =>
        val fn = arg(as, 0)
        JsArray.of(a.items.toVector.zipWithIndex.collect {
          case (v, i) if !(v eq JsHole) &&
            truthy(interp.callCallback(fn, Vector(v, JsNum(i.toDouble), a))) => v
        }: _*)
      }
      case "forEach" => nat(name) { as =>
        val fn = arg(as, 0)
        a.items.toVector.zipWithIndex.foreach { case (v, i) =>
          if (!(v eq JsHole)) interp.callCallback(fn, Vector(v, JsNum(i.toDouble), a))
        }
        JsUndefined
      }
      case "reduce" => nat(name) { as =>
        val fn = arg(as, 0)
        // holes are skipped entirely; the no-seed accumulator is the
        // first PRESENT element (its original index preserved)
        val present = a.items.toVector.zipWithIndex.filterNot(_._1 eq JsHole)
        if (present.isEmpty && as.length < 2)
          throw JsThrown(makeError("TypeError", "Reduce of empty array with no initial value"))
        var (acc, rest) =
          if (as.length >= 2) (as(1), present)
          else (present.head._1, present.tail)
        rest.foreach { case (v, i) =>
          acc = interp.callCallback(fn, Vector(acc, v, JsNum(i.toDouble), a))
        }
        acc
      }
      case "reduceRight" => nat(name) { as =>
        val fn = arg(as, 0)
        // holes are skipped; callbacks still see ORIGINAL indices
        val present = a.items.toVector.zipWithIndex.filterNot(_._1 eq JsHole)
        if (present.isEmpty && as.length < 2)
          throw JsThrown(makeError("TypeError", "Reduce of empty array with no initial value"))
        var (acc, rest) =
          if (as.length >= 2) (as(1), present.reverse)
          else (present.last._1, present.reverse.tail)
        rest.foreach { case (v, i) =>
          acc = interp.callCallback(fn, Vector(acc, v, JsNum(i.toDouble), a))
        }
        acc
      }
      case "find" => nat(name) { as =>
        val fn = arg(as, 0)
        // find (unlike forEach/map) VISITS holes, as undefined
        a.items.toVector.zipWithIndex
          .find { case (v, i) => truthy(interp.callCallback(fn, Vector(Values.deHole(v), JsNum(i.toDouble), a))) }
          .map(p => Values.deHole(p._1)).getOrElse(JsUndefined)
      }
      case "findIndex" => nat(name) { as =>
        val fn = arg(as, 0)
        JsNum(a.items.toVector.zipWithIndex
          .find { case (v, i) => truthy(interp.callCallback(fn, Vector(Values.deHole(v), JsNum(i.toDouble), a))) }
          .map(_._2).getOrElse(-1).toDouble)
      }
      case "findLast" => nat(name) { as =>
        val fn = arg(as, 0)
        a.items.toVector.zipWithIndex.reverseIterator
          .find { case (v, i) => truthy(interp.callCallback(fn, Vector(Values.deHole(v), JsNum(i.toDouble), a))) }
          .map(p => Values.deHole(p._1)).getOrElse(JsUndefined)
      }
      case "findLastIndex" => nat(name) { as =>
        val fn = arg(as, 0)
        JsNum(a.items.toVector.zipWithIndex.reverseIterator
          .find { case (v, i) => truthy(interp.callCallback(fn, Vector(Values.deHole(v), JsNum(i.toDouble), a))) }
          .map(_._2).getOrElse(-1).toDouble)
      }
      case "some" => nat(name) { as =>
        val fn = arg(as, 0)
        JsBool(a.items.toVector.zipWithIndex.exists { case (v, i) =>
          !(v eq JsHole) && truthy(interp.callCallback(fn, Vector(v, JsNum(i.toDouble), a)))
        })
      }
      case "every" => nat(name) { as =>
        val fn = arg(as, 0)
        JsBool(a.items.toVector.zipWithIndex.forall { case (v, i) =>
          (v eq JsHole) || truthy(interp.callCallback(fn, Vector(v, JsNum(i.toDouble), a)))
        })
      }
      case "sort" => nat(name) { as =>
        val cmp = arg(as, 0)
        // V8 order: sorted values, then undefineds, then holes at the end
        val (holes, nonHole) = a.items.toVector.partition(_ eq JsHole)
        val (defined, undef) = nonHole.partition(_ != JsUndefined)
        val sorted = cmp match {
          case JsUndefined =>
            // default sort: by ToString, code-unit order (stable) —
            // interp-aware so user toString participates (V8)
            defined.sortBy(interp.toStrI)
          case fn =>
            // an inconsistent comparator must not surface TimSort's
            // IllegalArgumentException as an uncatchable HOST error that
            // kills the map call — the spec makes the result order
            // implementation-defined, never a throw; fall back to the
            // original (deterministic) order. A comparator that itself
            // throws (JsThrown) still propagates, as in real JS.
            try defined.sortWith { (x, y) =>
              interp.toNumberI(interp.callCallback(fn, Vector(x, y))) < 0
            } catch { case _: IllegalArgumentException => defined }
        }
        a.items.clear()
        a.items ++= sorted
        a.items ++= undef
        a.items ++= holes
        a
      }
      // ---- ES2023 change-by-copy (never mutate, always DENSE: holes
      // read as undefined in the copy, per 23.1.3.30-34) ----
      case "toSorted" => nat(name) { as =>
        val cmp = arg(as, 0)
        val dense = a.items.toVector.map(Values.deHole)
        val (defined, undef) = dense.partition(_ != JsUndefined)
        val sorted = cmp match {
          case JsUndefined => defined.sortBy(toStr)
          case fn =>
            try defined.sortWith { (x, y) =>
              interp.toNumberI(interp.callCallback(fn, Vector(x, y))) < 0
            } catch { case _: IllegalArgumentException => defined }
        }
        interp.budget.allocate(dense.length.toLong + 1)
        JsArray.of(sorted ++ undef: _*)
      }
      case "toReversed" => nat(name) { _ =>
        interp.budget.allocate(a.items.length.toLong + 1)
        JsArray.of(a.items.toVector.reverse.map(Values.deHole): _*)
      }
      case "toSpliced" => nat(name) { as =>
        val len = a.items.length
        val start = arg(as, 0) match { case JsUndefined => 0; case v => normIndex(interp.toNumberI(v), len) }
        // same arity rule as splice (23.1.3.35 mirrors 23.1.3.31)
        val deleteCount = spliceDeleteCount(as, len, start)
        val dense = a.items.toVector.map(Values.deHole)
        interp.budget.allocate(len.toLong + as.length + 1)
        JsArray.of(dense.take(start) ++ as.drop(2) ++ dense.drop(start + deleteCount): _*)
      }
      case "with" => nat(name) { as =>
        val len = a.items.length
        val raw = interp.toNumberI(arg(as, 0)).toInt
        val idx = if (raw < 0) len + raw else raw
        if (idx < 0 || idx >= len) throwRange(s"Invalid index : $raw")
        interp.budget.allocate(len.toLong + 1)
        JsArray.of(a.items.toVector.map(Values.deHole).updated(idx, arg(as, 1)): _*)
      }
      case "flat" => nat(name) { as =>
        val depth = arg(as, 0) match { case JsUndefined => 1; case v => interp.toNumberI(v).toInt }
        def fl(items: Vector[JsValue], d: Int): Vector[JsValue] =
          items.flatMap {
            case h if h eq JsHole => Vector.empty // holes vanish at every depth
            case arr: JsArray if d > 0 => fl(arr.items.toVector, d - 1)
            case v => Vector(v)
          }
        JsArray.of(fl(a.items.toVector, depth): _*)
      }
      case "flatMap" => nat(name) { as =>
        val fn = arg(as, 0)
        JsArray.of(a.items.toVector.zipWithIndex.flatMap { case (v, i) =>
          if (v eq JsHole) Vector.empty // map skips + flat drops
          else interp.callCallback(fn, Vector(v, JsNum(i.toDouble), a)) match {
            case arr: JsArray => arr.items.toVector
            case other => Vector(other)
          }
        }: _*)
      }
      case "fill" => nat(name) { as =>
        val v = arg(as, 0)
        val len = a.items.length
        val start = arg(as, 1) match { case JsUndefined => 0; case x => normIndex(interp.toNumberI(x), len) }
        val end = arg(as, 2) match { case JsUndefined => len; case x => normIndex(interp.toNumberI(x), len) }
        (start until end).foreach(a.items(_) = v)
        a
      }
      case "copyWithin" => nat(name) { as =>
        val len = a.items.length
        val target = normIndex(interp.toNumberI(arg(as, 0)), len)
        val start = arg(as, 1) match { case JsUndefined => 0; case x => normIndex(interp.toNumberI(x), len) }
        val end = arg(as, 2) match { case JsUndefined => len; case x => normIndex(interp.toNumberI(x), len) }
        val count = math.min(end - start, len - target)
        if (count > 0) {
          // snapshot first: source and destination ranges may overlap
          val src = a.items.slice(start, start + count).toVector
          var k = 0
          while (k < count) { a.items(target + k) = src(k); k += 1 }
        }
        a
      }
      case "at" => nat(name) { as =>
        val i0 = interp.toNumberI(arg(as, 0)).toInt
        val i = if (i0 < 0) a.items.length + i0 else i0
        if (i >= 0 && i < a.items.length) Values.deHole(a.items(i)) else JsUndefined
      }
      case "keys" => nat(name)(_ => builtinIterator("Array",
        a.items.indices.iterator.map(i => JsNum(i.toDouble): JsValue)))
      case "values" => nat(name)(_ => builtinIterator("Array",
        a.items.toVector.iterator.map(Values.deHole)))
      case "entries" => nat(name)(_ => builtinIterator("Array",
        a.items.toVector.zipWithIndex.iterator.map { case (v, i) =>
          JsArray.of(JsNum(i.toDouble), Values.deHole(v)): JsValue }))
      case "toString" => nat(name)(_ => JsStr(interp.toStrI(a)))
      case _ => None
    }
  }

  // ---- parseInt / parseFloat ----

  def parseIntJs(s0: String, radixV: JsValue): Double = {
    var s = Values.jsTrim(s0) // JS whitespace set, not String.trim
    var sign = 1
    if (s.startsWith("-")) { sign = -1; s = s.substring(1) }
    else if (s.startsWith("+")) s = s.substring(1)
    var radix = radixV match {
      case JsUndefined => 0
      case v => toNumber(v).toInt
    }
    if (radix == 0) {
      if (s.startsWith("0x") || s.startsWith("0X")) { radix = 16; s = s.substring(2) }
      else radix = 10
    } else if (radix == 16 && (s.startsWith("0x") || s.startsWith("0X"))) s = s.substring(2)
    if (radix < 2 || radix > 36) return Double.NaN
    var end = 0
    while (end < s.length && Character.digit(s.charAt(end), radix) >= 0) end += 1
    if (end == 0) Double.NaN
    else {
      // accumulate as double to mirror JS precision behavior on long digit runs
      var acc = 0.0
      (0 until end).foreach(i => acc = acc * radix + Character.digit(s.charAt(i), radix))
      sign * acc
    }
  }

  def parseFloatJs(s0: String): Double = {
    val s = Values.jsTrim(s0) // JS whitespace set, not String.trim
    val m = java.util.regex.Pattern
      .compile("^[+-]?(Infinity|\\d+\\.?\\d*(?:[eE][+-]?\\d+)?|\\.\\d+(?:[eE][+-]?\\d+)?)")
      .matcher(s)
    if (!m.find()) Double.NaN
    else {
      val tok = m.group()
      if (tok.endsWith("Infinity")) { if (tok.startsWith("-")) Double.NegativeInfinity else Double.PositiveInfinity }
      else java.lang.Double.parseDouble(tok)
    }
  }
}
