package graft.lens

import graft.core._
import graft.markup.Markup

/** Declarative map DSL — the HTTP-carriable subset of the map surface
  * (§2.4). The reference's ephemeral route ships a JavaScript FUNCTION
  * in the request body (`POST /lenses/ephemeral`,
  * lens-controller.js:191-218); with no JS engine in this runtime, the
  * equivalent wire form is a small JSON-carried expression tree compiled
  * to a [[MapFn]]. It deliberately covers the reference's golden
  * tag-index lens (test/test-models-lens.js:27-35: emit each `data.tags`
  * element keyed by itself with `Set(recordID)` as value, console-log
  * `data.log` when present, throw `data.error` when present) plus the
  * common text/markup projections — not arbitrary computation; the JS
  * seam (README) stays open for that.
  *
  * Spec shape (JSON):
  * {{{
  * {
  *   "emit": [ { "forEach": <expr>?,         // array expr; binds "item"
  *               "key": <expr>,              // output record id
  *               "value": <expr> } ],        // output record value
  *   "log":  <expr>?,   // evaluated per record; non-missing → console log
  *   "fail": <expr>?    // evaluated per record; non-missing → thrown
  * }
  * }}}
  * Expressions (one-key objects):
  *  - `{"lit": <json>}`               literal
  *  - `{"field": "a.b.c"}`            dot-path into the record value
  *  - `{"path": "recordID"}`          recordID|author|name|source|string
  *  - `{"item": true}`                current forEach element
  *  - `{"concat": [<expr>...]}`       string concatenation
  *  - `{"lower": <expr>}`             lowercase string
  *  - `{"split": {"of": <expr>, "on": "<regex>"}}`  non-empty pieces
  *  - `{"select": {"of": <expr>?, "css": "<sel>"}}` markup CSS select
  *                                    (of defaults to the whole record)
  *  - `{"text": <expr>}`              markup text content
  *  - `{"set": [<expr>...]}`          build a Set value
  *  - `{"arr": [<expr>...]}`          build an Array value
  * A missing field / path miss evaluates to "absent": an absent
  * `forEach` iterates zero times, an absent emit key/value emits
  * nothing, absent log/fail do nothing — so one spec serves
  * heterogeneous records, like the reference's duck-typed JS maps.
  */
object MapDsl {

  // ------------------------------------------------------------- AST
  sealed trait Expr extends Serializable
  final case class Lit(v: PoValue) extends Expr
  final case class Field(path: Vector[String]) extends Expr
  final case class PathPart(part: String) extends Expr
  case object Item extends Expr
  final case class Concat(parts: Vector[Expr]) extends Expr
  final case class Lower(of: Expr) extends Expr
  // carries the COMPILED pattern: the regex is compiled once at parse
  // time, not once per record in the map hot path (Pattern is
  // Serializable, so it ships to executors with the AST)
  final case class Split(of: Expr, on: java.util.regex.Pattern) extends Expr
  final case class Select(of: Option[Expr], css: String) extends Expr
  final case class Text(of: Expr) extends Expr
  final case class MkSet(items: Vector[Expr]) extends Expr
  final case class MkArr(items: Vector[Expr]) extends Expr

  final case class EmitRule(forEach: Option[Expr], key: Expr, value: Expr)
    extends Serializable
  final case class Spec(emits: Vector[EmitRule], log: Option[Expr],
                        fail: Option[Expr]) extends Serializable

  // ----------------------------------------------------------- parse

  /** Parse a JSON-decoded spec. Throws IllegalArgumentException (→ 400
    * at the HTTP layer) on anything outside the grammar — an unknown
    * primitive must fail the request, not silently no-op. */
  def parse(v: PoValue): Spec = v match {
    case PoObj(fields) =>
      val emits = fields.get("emit") match {
        case Some(PoArr(items)) => items.map(parseEmit).toVector
        case Some(_) => fail("'emit' must be an array of emit rules")
        case None => Vector.empty
      }
      val log = fields.get("log").map(parseExpr)
      val failE = fields.get("fail").map(parseExpr)
      if (emits.isEmpty && log.isEmpty && failE.isEmpty)
        fail("map spec needs at least one of: emit, log, fail")
      Spec(emits, log, failE)
    case _ => fail("map spec must be a JSON object")
  }

  /** Expression-nesting cap. The parser (and the evaluator mirroring
    * its shape) recurses per nesting level, and the route feeds it
    * request bodies: without a cap a ~3 MB body of nested one-key
    * objects is a crafted StackOverflowError. 64 is far beyond any
    * legitimate projection. */
  val MaxDepth = 64

  private def parseEmit(v: PoValue): EmitRule = v match {
    case PoObj(fields) =>
      EmitRule(
        fields.get("forEach").map(parseExpr(_, 0)),
        parseExpr(fields.getOrElse("key", fail("emit rule needs 'key'")), 0),
        parseExpr(fields.getOrElse("value", fail("emit rule needs 'value'")), 0))
    case _ => fail("emit rule must be an object")
  }

  private def parseExpr(v: PoValue): Expr = parseExpr(v, 0)

  private def parseExpr(v: PoValue, depth: Int): Expr = {
    if (depth > MaxDepth) fail(s"expression nesting exceeds $MaxDepth")
    val d = depth + 1
    v match {
      case PoObj(fields) if fields.size == 1 =>
        val (k, arg) = fields.head
        (k, arg) match {
          case ("lit", x) => Lit(x)
          case ("field", PoStr(p)) if p.nonEmpty =>
            Field(p.split("\\.", -1).toVector)
          case ("path", PoStr(p)) =>
            if (!Set("recordID", "author", "name", "source", "string")(p))
              fail(s"unknown path part '$p'")
            PathPart(p)
          case ("item", _) => Item
          case ("concat", PoArr(parts)) => Concat(parts.map(parseExpr(_, d)).toVector)
          case ("lower", x) => Lower(parseExpr(x, d))
          case ("split", PoObj(f)) =>
            val on = f.get("on") match {
              case Some(PoStr(re)) => re
              case _ => fail("'split' needs a string 'on' regex")
            }
            // an invalid regex is rejected here at parse time, and the
            // compiled pattern is what the AST carries
            val pat =
              try java.util.regex.Pattern.compile(on)
              catch { case e: Exception => fail(s"bad split regex: ${e.getMessage}") }
            Split(parseExpr(f.getOrElse("of", fail("'split' needs 'of'")), d), pat)
          case ("select", PoObj(f)) =>
            val css = f.get("css") match {
              case Some(PoStr(s)) if s.nonEmpty => s
              case _ => fail("'select' needs a string 'css' selector")
            }
            // same parse-time contract as 'split': garbage is a 400 at
            // the wire, never a silently-empty index (the match path
            // itself stays lenient)
            graft.markup.Markup.validateSelector(css)
              .left.foreach(m => fail(s"bad select css: $m"))
            Select(f.get("of").map(parseExpr(_, d)), css)
          case ("text", x) => Text(parseExpr(x, d))
          case ("set", PoArr(items)) => MkSet(items.map(parseExpr(_, d)).toVector)
          case ("arr", PoArr(items)) => MkArr(items.map(parseExpr(_, d)).toVector)
          case (other, _) => fail(s"unknown expression '$other'")
        }
      case _ => fail("expression must be a one-key object")
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"map DSL: $msg")

  /** CharSequence that makes regex execution PREEMPTIBLE on sandbox
    * threads: `java.util.regex` never polls interrupts, so an abandoned
    * sandbox worker caught in catastrophic backtracking (a wire-supplied
    * `(a|a)+$` bomb) would otherwise spin a core until the 2^n search
    * finishes. The engine reads input through charAt constantly; one
    * interrupt check per 4096 reads makes the abandoned worker die in
    * microseconds at negligible per-char cost. Cooperative (non-sandbox)
    * threads are exempt, same as MapContext.checkDeadline: a Spark task
    * interrupt must cancel the TASK, not become a per-record error. */
  private[lens] final class InterruptibleChars(s: String) extends CharSequence {
    private var reads = 0
    def length: Int = s.length
    def charAt(i: Int): Char = {
      reads += 1
      if ((reads & 0xfff) == 0 && MapRunner.onSandboxThread.get() &&
          Thread.currentThread().isInterrupted)
        throw new InterruptedException("regex preempted by sandbox")
      s.charAt(i)
    }
    def subSequence(a: Int, b: Int): CharSequence = s.subSequence(a, b)
    override def toString: String = s
  }

  /** Parse straight from JSON bytes (the HTTP body's `map` field is
    * already a decoded PoValue; this is the test/tooling convenience). */
  def compile(spec: PoValue): MapFn =
    new DslMapFn(parse(spec), graft.codec.JsonCodec.encodeString(spec))

  // ------------------------------------------------------------ eval

  /** The compiled function. Evaluation per record: emit rules in spec
    * order (forEach elements in array order), then log, then fail —
    * matching the golden lens's output-log-throw sequence, so outputs
    * emitted before the throw are kept (MapResult contract).
    * `rawSpecJson` keeps the author's spec for lens.json persistence —
    * as its JSON text, not the PoValue: the fn ships to executors and
    * PoObj's VectorMap is not Java-serializable. */
  final class DslMapFn(val spec: Spec, val rawSpecJson: String) extends MapFn {
    def map(ctx: MapContext): Unit = {
      spec.emits.foreach { rule =>
        rule.forEach match {
          case Some(fe) => elems(eval(fe, ctx, None)).foreach { item =>
            emit(rule, ctx, Some(item))
          }
          case None => emit(rule, ctx, None)
        }
      }
      spec.log.foreach(e => eval(e, ctx, None).foreach(v => ctx.log(str(v))))
      spec.fail.foreach(e => eval(e, ctx, None).foreach(v =>
        throw new RuntimeException(str(v))))
    }

    private def emit(rule: EmitRule, ctx: MapContext, item: Option[PoValue]): Unit =
      for {
        k <- eval(rule.key, ctx, item)
        v <- eval(rule.value, ctx, item)
      } ctx.output(str(k), v)

    private def elems(v: Option[PoValue]): Vector[PoValue] = v match {
      case Some(PoArr(items)) => items.toVector
      case Some(s: PoSet) => s.items
      case _ => Vector.empty
    }

    /** absent (None) propagates: concat/set/arr drop absent parts;
      * field misses and non-traversable steps are absent, not errors. */
    private def eval(e: Expr, ctx: MapContext, item: Option[PoValue]): Option[PoValue] = e match {
      case Lit(v) => Some(v)
      case Field(path) =>
        path.foldLeft(Option(ctx.data)) {
          case (Some(PoObj(fields)), seg) => fields.get(seg)
          case _ => None
        }
      case PathPart(p) => Some(PoStr(p match {
        case "recordID" => ctx.path.recordID
        case "author" => ctx.path.author
        case "name" => ctx.path.name
        case "source" => ctx.path.source
        case _ => ctx.path.string
      }))
      case Item => item
      case Concat(parts) =>
        val vs = parts.flatMap(eval(_, ctx, item))
        if (vs.isEmpty && parts.nonEmpty) None
        else Some(PoStr(vs.map(str).mkString))
      case Lower(of) => eval(of, ctx, item).map(v => PoStr(str(v).toLowerCase))
      case Split(of, on) => eval(of, ctx, item).map { v =>
        PoArr(on.split(new MapDsl.InterruptibleChars(str(v)), -1).iterator
          .filter(_.nonEmpty).map(PoStr.apply).toVector)
      }
      case Select(of, css) =>
        val root = of match {
          case Some(x) => eval(x, ctx, item)
          case None => Some(ctx.data)
        }
        root.map(r => PoArr(Markup.select(r, css)))
      case Text(of) => eval(of, ctx, item).map(v => PoStr(Markup.text(v)))
      case MkSet(items) => Some(PoSet.fromSeq(items.flatMap(eval(_, ctx, item))))
      case MkArr(items) => Some(PoArr(items.flatMap(eval(_, ctx, item))))
    }

    /** record-id / log / concat string form of a value: scalars print
      * bare (the reference's JS string coercion for ids), structures
      * print as canonical JSON. */
    private def str(v: PoValue): String = v match {
      case PoStr(s) => s
      case PoInt(i) => i.toString
      // whole doubles print bare ONLY below 2^63: past it, d.toLong
      // saturates at Long.MaxValue and distinct huge keys would
      // collapse onto one record id — those fall through to the
      // (distinct, if ugly) scientific notation instead. The bound is
      // exact: every whole double strictly below 2^63 converts
      // losslessly (Long.MaxValue.toDouble rounds up to 2^63, and < is
      // strict).
      case PoNum(d) =>
        if (d == d.floor && !d.isInfinite && math.abs(d) < Long.MaxValue.toDouble)
          d.toLong.toString
        else d.toString
      case PoBool(b) => b.toString
      case PoNull => "null"
      case other => graft.codec.JsonCodec.encodeString(other)
    }
  }
}
