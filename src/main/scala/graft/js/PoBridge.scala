package graft.js

import graft.core._
import scala.collection.immutable.VectorMap
import scala.collection.mutable

/** Bridge between the engine's value model ([[graft.core.PoValue]]) and
  * the interpreter's ([[JsValue]]) — the moral equivalent of the
  * reference's isolate boundary copy (`arguments: { copy: true }`,
  * reference: javascript-lens-worker.js:95,131: structured clone in,
  * structured clone out).
  *
  * Number policy matches the engine's codecs (JsonCodec: integral →
  * PoInt, fractional → PoNum): a JS number that is integral and inside
  * the signed-64 range bridges back as PoInt, so a lens that emits `1`
  * produces the same canonical bytes as a DSL lens emitting PoInt(1).
  */
object PoBridge {

  def toJs(v: PoValue): JsValue = v match {
    case PoNull => JsNull
    case PoUndefined => JsUndefined
    case PoBool(b) => JsBool(b)
    case PoInt(n) => JsNum(n.toDouble) // >2^53 loses precision — same as the reference's JS runtime, which has no other integer type
    case PoNum(d) => JsNum(d)
    case PoBigInt(b) => JsNum(b.toDouble) // BigInt syntax is rejected in lens code; value arrives as a (possibly lossy) double
    case PoStr(s) => JsStr(s)
    case b: PoBytes => new JsBytes(b.bytes)
    case PoArr(items) => new JsArray(mutable.ArrayBuffer(items.map(toJs): _*))
    case PoObj(fields) =>
      val o = JsObject.empty()
      fields.foreach { case (k, fv) => o.props.put(k, toJs(fv)) }
      o
    case s: PoSet =>
      val out = JsSetV.empty
      s.items.foreach { item => val jv = toJs(item); out.entries.put(new JsKey(jv), jv) }
      out
    case m: PoMap =>
      val out = JsMapV.empty
      m.entries.foreach { case (k, mv) =>
        val jk = toJs(k)
        out.entries.put(new JsKey(jk), (jk, toJs(mv)))
      }
      out
    case PoDate(ms) => JsDate(ms.toDouble)
    case PoURL(url) => JsStr(url) // subset: URL objects surface as strings
  }

  /** Bridge a lens output value back to the engine. Mirrors structured
    * clone's rules: functions are uncloneable (TypeError), cycles are
    * rejected (unlike structured clone — PoValue is a tree), Set/Map
    * round-trip to PoSet/PoMap (CBOR tags 258/259, same as the
    * reference's codec). */
  def toPo(v: JsValue, interp: Interp = null): PoValue = {
    val inFlight = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def go(v: JsValue): PoValue = v match {
      case _: JsAccessorProp | _: AwaitSignal => // loud invariant guards
        throw new IllegalStateException(
          "internal: engine-internal record leaked into output conversion")
      case JsUndefined => PoUndefined
      case JsNull => PoNull
      case JsBool(b) => PoBool(b)
      case JsNum(d) =>
        if (!java.lang.Double.isNaN(d) && !java.lang.Double.isInfinite(d) &&
            d == math.rint(d) && math.abs(d) <= 9.007199254740991e15)
          PoInt(d.toLong)
        else PoNum(d)
      case JsStr(s) => PoStr(s)
      case b: JsBytes => PoBytes(b.bytes)
      case a: JsArray => cycleGuard(a) {
        PoArr(a.items.toVector.map(go))
      }
      case o: JsObject => cycleGuard(o) {
        // V8 enumeration order (integer-like keys first) — output()
        // must serialize the same key order the lens observes via
        // Object.keys/JSON.stringify, and the same order the
        // reference's V8 isolate would emit
        // accessor getters evaluate at output time (the reference's V8
        // serialization of lens output does the same); without an
        // Interp a record falls through to the loud guard above
        PoObj((if (interp != null) interp.ownEvalEntries(o) else Values.ownEntries(o))
          .foldLeft(VectorMap.empty[String, PoValue]) {
            case (acc, (k, pv)) => acc.updated(k, go(pv))
          })
      }
      case s: JsSetV => cycleGuard(s) {
        PoSet.fromSeq(s.entries.values.toVector.map(go))
      }
      case m: JsMapV => cycleGuard(m) {
        PoMap(m.entries.values.toVector.map { case (k, pv) => (go(k), go(pv)) })
      }
      case JsDate(ms) => PoDate(ms.toLong)
      case r: JsRegExpV => PoStr(Values.toStr(r))
      case _: JsFunc =>
        Values.throwType("a function could not be cloned into a lens output")
      case _: JsGenerator =>
        Values.throwType("a generator could not be cloned into a lens output" +
          " (spread it into an array first)")
      case _: JsPromise =>
        Values.throwType("a promise could not be cloned into a lens output" +
          " (await it and output the settled value)")
      case _: JsAsyncGenerator =>
        Values.throwType("an async generator could not be cloned into a lens" +
          " output (collect it with 'for await' first)")
      case sym: JsSymbolV =>
        Values.throwType(s"a symbol (${sym.description}) could not be cloned into a lens output")
      case _: JsProxyV =>
        // the reference's worker would hit V8's DataCloneError here —
        // same loudness class (proxies are exotic, never serialized)
        Values.throwType("a proxy could not be cloned into a lens output" +
          " (copy it into a plain object first)")
    }
    def cycleGuard(ref: AnyRef)(body: => PoValue): PoValue = {
      if (!inFlight.add(ref))
        Values.throwType("circular structure in lens output value")
      try body finally inFlight.remove(ref)
    }
    go(v)
  }

  /** the JS error-"type" of a thrown value — the reference reports
    * `error.constructor.name` (javascript-lens-worker.js:44) */
  def errorTypeOf(v: JsValue): String = v match {
    case o: JsObject if o.className != "Object" => o.className
    case _: JsObject => "Object"
    case _: JsStr => "String"
    case _: JsNum => "Number"
    case _: JsBool => "Boolean"
    case _: JsArray => "Array"
    case JsNull | JsUndefined => "Error"
    case _ => "Error"
  }
}
