package graft.lens

import graft.core._
import graft.js._
import graft.markup.Markup

/** A [[MapFn]] that executes USER JAVASCRIPT — the reference's primary
  * lens surface (`mapType: 'javascript'`,
  * reference: library/workers/javascript-lens-worker.js): the code is
  * the BODY of `function map (path, data) { ... }` (worker line 104),
  * with `output(id, value)`, a frozen `console`, the `Markup` library
  * and a self-referential `global` in scope (worker lines 85-95,
  * environment.js/index.js).
  *
  * Execution is the in-process [[graft.js.Interp]] — a deterministic
  * tree-walking interpreter over an ES subset, not an embedded engine
  * (this container has none). Determinism traps (`Math.random`,
  * wall-clock `Date`) throw; per-call step/allocation budgets plus the
  * MapContext deadline (checked every 2048 interpreter steps) stand in
  * for the reference's isolate memory/time caps, and CANNOT be caught
  * by lens `try`/`catch` (host exceptions, not [[JsThrown]]).
  *
  * Compile once at configuration time via [[JsMapFn.compile]] — syntax
  * errors surface as startup errors, matching the reference contract
  * (worker:102-111; test/test-workers-javascript-lens.js expects
  * `yield 5` to fail startup, not map). The instance carries only the
  * source string across the wire; each executor re-parses once (lazy,
  * deterministic — it cannot fail after a successful compile).
  *
  * The GLOBAL ENVIRONMENT is rebuilt per record, deliberately: lens
  * code may mutate any unfrozen global (`Math.floor = ...`,
  * `global.x = 1`), and Spark's record order within a partition is
  * not a contract — per-record environments make the build
  * deterministic where the reference's long-lived sequential isolate
  * merely tolerates cross-record state. The cost is ~a hundred small
  * closure allocations per record, negligible against the map body's
  * own interpretation (q49 benches equal to its Scala twin q9); the
  * frozen, context-free `Markup` bridge is built once per JVM and
  * shared (it is immutable by construction — `frozen` blocks every
  * user-reachable mutation path).
  */
final class JsMapFn(val code: String,
                    val strictRejections: Boolean = true) extends MapFn {

  @transient private lazy val program: Ast.Program = Parser.parse(code)

  def map(ctx: MapContext): Unit = {
    val prog = program // parse (or reuse) before building scopes

    var interpRef: Interp = null
    val consoleObj = {
      val o = JsObject.empty("console")
      def logger(kind: String, sink: Seq[String] => Unit): JsNative =
        new JsNative(kind, (_, args) => {
          sink(args.map(Values.toStr))
          JsUndefined
        })
      o.props.put("log", logger("log", a => ctx.log(a: _*)))
      o.props.put("info", logger("info", a => ctx.info(a: _*)))
      o.props.put("warn", logger("warn", a => ctx.warn(a: _*)))
      o.props.put("error", logger("error", a => ctx.error(a: _*)))
      o.frozen = true // the reference freezes console (worker:89)
      o
    }
    val outputFn = new JsNative("output", (_, args) => {
      val id = Values.toStr(args.headOption.getOrElse(JsUndefined))
      // interpRef: output-value conversion evaluates accessor getters
      val value = PoBridge.toPo(args.lift(1).getOrElse(JsUndefined), interpRef)
      ctx.output(id, value)
      JsUndefined
    })
    val pathObj = JsObject.of(
      "string" -> JsStr(ctx.path.string),
      "source" -> JsStr(ctx.path.source),
      "author" -> JsStr(ctx.path.author),
      "name" -> JsStr(ctx.path.name),
      "recordID" -> JsStr(ctx.path.recordID))

    val extras: Seq[(String, JsValue)] = Seq(
      "console" -> consoleObj,
      "output" -> outputFn,
      "Markup" -> JsMapFn.sharedMarkup)

    val (globalScope, _) = Builtins.makeGlobals(() => interpRef, extras)
    val budget = Budget.default(() => ctx.checkDeadline())
    interpRef = new Interp(globalScope, budget)

    // `function map (path, data) { <code> }` applied to this record
    val fnScope = new Scope(globalScope)
    fnScope.declare("this", JsUndefined)
    fnScope.declare("path", pathObj)
    fnScope.declare("data", PoBridge.toJs(ctx.data))
    // reap suspended generators AND parked async bodies on EVERY exit
    // path: an abandoned one parks a daemon thread, and a long lens
    // build maps millions of records through this method
    try {
      interpRef.runProgram(prog, fnScope)
      // promises/async (r14): run the microtask queue to quiescence
      // before outputs are collected — the reference worker `await`s
      // its map apply (worker:131), so V8's queue likewise drains
      // before the outputs return. A rejection nobody handled by
      // quiescence is THE map call's error (deliberate loud divergence
      // from V8's stderr warning: a lens that rejects unhandled almost
      // certainly lost outputs silently).
      interpRef.drainJobs()
      interpRef.unhandledRejection.foreach { v =>
        // strictRejections (default): the map call fails. Lenient mode
        // (ADVICE r14) restores reference-worker compatibility — V8
        // only warns on stderr — by routing the diagnosis to the
        // ctx.error log stream (errors-as-data) and keeping outputs.
        def rendered(other: JsValue): String =
          // message rendering must not itself throw (a SYMBOL
          // rejection value would turn the diagnosis into a
          // misleading conversion TypeError — review find r14)
          try Values.toStr(Values.toPrimitive(other))
          catch { case _: JsThrown => s"[${Values.typeOf(other)}]" }
        if (strictRejections)
          throw JsThrown(v match {
            case o: JsObject if o.className.endsWith("Error") => o
            case other =>
              Values.makeError("Error", s"Unhandled promise rejection: ${rendered(other)}")
          })
        else ctx.error(s"Unhandled promise rejection: ${rendered(v)}")
      }
    } finally interpRef.closeGenerators()
  }
}

object JsMapFn {

  /** Validate + build. Syntax errors come back as data — the reference's
    * startup `{ errors: [...] }` contract. `strictRejections = false` is
    * the reference-worker-compatible mode (V8 only warns on an unhandled
    * rejection and keeps outputs) — reachable from a lens config via
    * `rejections: "lenient"` ([[Lens.configured]]); default stays the
    * deliberate loud divergence. */
  def compile(code: String,
              strictRejections: Boolean = true): Either[CapturedError, JsMapFn] =
    try {
      Parser.parse(code)
      Right(new JsMapFn(code, strictRejections))
    } catch {
      case e: JsSyntaxError => Left(CapturedError("SyntaxError", e.getMessage))
    }

  /** The `Markup` global — bridges to the engine's PigeonMark library
    * ([[graft.markup.Markup]]), same surface as the reference's isolate
    * environment (environment.js/markup.js: select, get.*, set.*,
    * isPigeonMark, toHTML, toXML). Frozen and context-free, so ONE
    * instance is shared by every map call in the JVM (concurrent task
    * threads only ever read it). */
  private[lens] lazy val sharedMarkup: JsObject = markupGlobal

  private def markupGlobal: JsObject = {
    def native1(name: String)(f: Vector[JsValue] => JsValue): JsNative =
      new JsNative(name, (_, args) => f(args))
    def po(v: JsValue): PoValue = PoBridge.toPo(v)
    def js(v: PoValue): JsValue = PoBridge.toJs(v)
    def jsOpt(v: Option[String]): JsValue = v.map(JsStr(_): JsValue).getOrElse(JsUndefined)
    def wrapMarkupErrors[A](body: => A): A =
      try body
      catch {
        case e: JsThrown => throw e
        case e: IllegalArgumentException =>
          throw JsThrown(Values.makeError("Error", String.valueOf(e.getMessage)))
      }

    val get = JsObject.empty()
    get.props.put("type", native1("type")(as => jsOpt(Markup.getType(po(as.headOption.getOrElse(JsUndefined))))))
    get.props.put("name", native1("name")(as => jsOpt(Markup.name(po(as.headOption.getOrElse(JsUndefined))))))
    get.props.put("text", native1("text")(as => JsStr(Markup.text(po(as.headOption.getOrElse(JsUndefined))))))
    get.props.put("attribute", native1("attribute")(as =>
      jsOpt(Markup.attribute(po(as.headOption.getOrElse(JsUndefined)), Values.toStr(as.lift(1).getOrElse(JsUndefined))))))
    get.props.put("attributes", native1("attributes") { as =>
      val o = JsObject.empty()
      Markup.attributes(po(as.headOption.getOrElse(JsUndefined))).foreach { case (k, v) => o.props.put(k, JsStr(v)) }
      o
    })
    get.props.put("id", native1("id")(as => jsOpt(Markup.id(po(as.headOption.getOrElse(JsUndefined))))))
    get.props.put("classList", native1("classList")(as =>
      JsArray.of(Markup.classList(po(as.headOption.getOrElse(JsUndefined))).map(JsStr(_): JsValue): _*)))
    get.props.put("childNodes", native1("childNodes")(as =>
      JsArray.of(Markup.childNodes(po(as.headOption.getOrElse(JsUndefined))).map(js): _*)))
    get.props.put("children", native1("children")(as =>
      JsArray.of(Markup.children(po(as.headOption.getOrElse(JsUndefined))).map(js): _*)))
    get.frozen = true

    val set = JsObject.empty()
    set.props.put("name", native1("name")(as =>
      js(Markup.setName(po(as.headOption.getOrElse(JsUndefined)), Values.toStr(as.lift(1).getOrElse(JsUndefined))))))
    set.props.put("text", native1("text")(as =>
      js(Markup.setText(po(as.headOption.getOrElse(JsUndefined)), Values.toStr(as.lift(1).getOrElse(JsUndefined))))))
    set.props.put("attribute", native1("attribute")(as =>
      js(Markup.setAttribute(po(as.headOption.getOrElse(JsUndefined)), Values.toStr(as.lift(1).getOrElse(JsUndefined)),
        Values.toStr(as.lift(2).getOrElse(JsUndefined))))))
    set.props.put("id", native1("id")(as =>
      js(Markup.setId(po(as.headOption.getOrElse(JsUndefined)), Values.toStr(as.lift(1).getOrElse(JsUndefined))))))
    set.frozen = true

    val m = JsObject.empty("Markup")
    m.props.put("select", native1("select") { as =>
      wrapMarkupErrors {
        val sel = Values.toStr(as.lift(1).getOrElse(JsUndefined))
        Markup.validateSelector(sel) match {
          case Left(msg) => throw JsThrown(Values.makeError("Error", msg))
          case Right(()) => JsArray.of(Markup.select(po(as.headOption.getOrElse(JsUndefined)), sel).map(js): _*)
        }
      }
    })
    m.props.put("get", get)
    m.props.put("set", set)
    m.props.put("isPigeonMark", native1("isPigeonMark")(as => JsBool(Markup.isPigeonMark(po(as.headOption.getOrElse(JsUndefined))))))
    m.props.put("toXML", native1("toXML")(as => wrapMarkupErrors(JsStr(Markup.toXML(po(as.headOption.getOrElse(JsUndefined)))))))
    m.props.put("toHTML", native1("toHTML")(as => wrapMarkupErrors(JsStr(Markup.toHTML(po(as.headOption.getOrElse(JsUndefined)))))))
    m.frozen = true
    m
  }
}
