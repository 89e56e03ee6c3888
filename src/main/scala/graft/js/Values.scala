package graft.js

import scala.collection.mutable
import scala.util.control.NoStackTrace

/** Runtime values for the JS subset interpreter.
  *
  * Numbers are IEEE doubles (JS semantics); strings are UTF-16 Java
  * strings (same code-unit model as JS). Objects and arrays are mutable
  * with insertion-ordered properties. `Set`/`Map` use SameValueZero keys
  * in insertion order — the reference's golden lens emits `new
  * Set([path.recordID])` values whose canonical encoding depends on
  * insertion order (reference: test/test-models-lens.js:31-53).
  */
sealed trait JsValue

/** `undefined` — and its array-hole twin. `JsHole` marks an ABSENT
  * array slot (elision, `delete a[i]`, `Array(n)`, length extension):
  * it is `==` JsUndefined everywhere (every read of a hole observes
  * `undefined`, exactly V8), but `eq`-distinguishable so the array
  * enumeration methods can implement V8's hole-skipping (forEach/
  * filter/map/keys/indexOf skip holes; find/iteration/join do not).
  * INVARIANT: JsHole never escapes an array's `items` buffer — every
  * read that hands a slot to user code or stores it elsewhere converts
  * via [[JsValues.deHole]]. */
sealed class JsUndefinedKind extends JsValue {
  override def equals(o: Any): Boolean = o.isInstanceOf[JsUndefinedKind]
  override def hashCode: Int = 0x11d
  override def toString: String = "JsUndefined"
}
object JsUndefined extends JsUndefinedKind
object JsHole extends JsUndefinedKind { override def toString: String = "JsHole" }

case object JsNull extends JsValue
final case class JsBool(b: Boolean) extends JsValue
final case class JsNum(v: Double) extends JsValue
final case class JsStr(s: String) extends JsValue

final class JsObject(val props: mutable.LinkedHashMap[String, JsValue],
                     val className: String = "Object") extends JsValue {
  var frozen: Boolean = false
  /** prototype link for CLASS instances and class prototype objects —
    * null for plain objects (the overwhelmingly common case; object
    * literals stay proto-free, Object.create still flattens). Property
    * READS walk this chain (Interp.chainLookup); enumeration,
    * spread, JSON and output conversion stay OWN-ONLY, which matches
    * V8 because class methods are non-enumerable there. */
  var protoV: JsObject = null
  /** defining class of an instance (instanceof + `.constructor`). */
  var klass: JsClassV = null
  /** private FIELDS, keyed by (declaring class identity, '#name') —
    * separate from `props` by construction: a computed public key
    * '#x' and the private name #x are different properties, privates
    * never enumerate / JSON / spread, and each class's #x is distinct
    * from every other class's #x. Lazily allocated (most objects have
    * none). */
  var privs: mutable.HashMap[(AnyRef, String), JsValue] = null
  /** private-member BRANDS: the classes whose private METHODS this
    * instance carries (stamped at that class's field-init point during
    * construction — ES2022 PrivateBrandAdd). */
  var privBrands: mutable.HashSet[AnyRef] = null
  /** SYMBOL-keyed properties (well-known slots like @@iterator, unique
    * @@u<n> slots since r15), stored OUTSIDE `props` so they can never
    * collide with a user string key ("@@iterator" as record data stays
    * an ordinary property) and never enumerate — V8's symbol-vs-string
    * key split. Lazily allocated; resolution walks protoV like string
    * props. INSERTION-ORDERED (LinkedHashMap, re-put keeps the original
    * position) so getOwnPropertySymbols / Reflect.ownKeys report V8's
    * symbol ordering. */
  var symProps: mutable.LinkedHashMap[String, JsValue] = null
  def symPut(slot: String, v: JsValue): Unit = {
    if (symProps == null) symProps = mutable.LinkedHashMap.empty
    symProps.put(slot, v)
  }
}

/** ACCESSOR property record (`{ get x() {...}, set x(v) {...} }`),
  * stored directly in a [[JsObject]]'s `props` table so V8's single
  * ordered property table — and with it Object.keys / JSON / for-in
  * enumeration order — is preserved without a parallel map.
  *
  * INVARIANT (the round-7 leak concern, inverted): this record is an
  * engine-internal slot, NEVER a user-visible value. Every legitimate
  * read path evaluates it through the interpreter (getMember,
  * Object.values/entries/assign, spread, JSON.stringify, PoBridge
  * output with an Interp in hand); any path that would hand the raw
  * record to user code or serialization throws an internal error
  * LOUDLY ([[Values.toStr]], PoBridge without an Interp) instead of
  * silently emitting a corrupt value. Key-only operations (keys,
  * for-in, `in`, delete, hasOwnProperty) see the entry like V8 does —
  * without invoking the getter. */
final class JsAccessorProp(var getter: Option[JsFunc],
                           var setter: Option[JsFunc]) extends JsValue
object JsObject {
  def empty(className: String = "Object"): JsObject =
    new JsObject(mutable.LinkedHashMap.empty, className)
  def of(entries: (String, JsValue)*): JsObject = {
    val o = empty()
    entries.foreach { case (k, v) => o.props.put(k, v) }
    o
  }
}

final class JsArray(val items: mutable.ArrayBuffer[JsValue]) extends JsValue {
  /** Non-index own properties. V8 arrays accept named props, and
    * match/exec results carry `index`/`input` this way. Null until
    * first use — almost no array ever has any, and the hot paths
    * (indexing, iteration, methods) never touch it. */
  var extra: mutable.Map[String, JsValue] = null
  def extraGet(k: String): Option[JsValue] =
    if (extra == null) None else extra.get(k)
  def extraPut(k: String, v: JsValue): Unit = {
    if (extra == null) extra = mutable.Map.empty
    extra.put(k, v)
  }
}
object JsArray {
  def empty: JsArray = new JsArray(mutable.ArrayBuffer.empty)
  def of(vs: JsValue*): JsArray = new JsArray(mutable.ArrayBuffer(vs: _*))
}

/** SameValueZero key wrapper: primitives by value (NaN == NaN),
  * objects/arrays/functions by reference identity. */
final class JsKey(val v: JsValue) {
  override def hashCode: Int = v match {
    case JsUndefined => 0
    case JsNull => 1
    case JsBool(b) => if (b) 2 else 3
    case JsNum(d) => if (d == 0.0) 4 else java.lang.Double.hashCode(d) // +0 and -0 same bucket
    case JsStr(s) => s.hashCode
    case other => System.identityHashCode(other)
  }
  override def equals(o: Any): Boolean = o match {
    case k: JsKey => (v, k.v) match {
      case (JsUndefined, JsUndefined) | (JsNull, JsNull) => true
      case (JsBool(a), JsBool(b)) => a == b
      case (JsNum(a), JsNum(b)) =>
        (a == b) || (java.lang.Double.isNaN(a) && java.lang.Double.isNaN(b))
      case (JsStr(a), JsStr(b)) => a == b
      case (a, b) => a.asInstanceOf[AnyRef] eq b.asInstanceOf[AnyRef]
    }
    case _ => false
  }
}

final class JsSetV(val entries: mutable.LinkedHashMap[JsKey, JsValue]) extends JsValue
object JsSetV { def empty: JsSetV = new JsSetV(mutable.LinkedHashMap.empty) }

final class JsMapV(val entries: mutable.LinkedHashMap[JsKey, (JsValue, JsValue)]) extends JsValue
object JsMapV { def empty: JsMapV = new JsMapV(mutable.LinkedHashMap.empty) }

/** ES Proxy (round 13 subset): traps get/set/has/deleteProperty/
  * ownKeys over an OBJECT, ARRAY, or nested-proxy target, plus
  * Proxy.revocable. Calling/constructing through a proxy (apply/
  * construct traps — function targets), defineProperty/
  * getOwnPropertyDescriptor traps, and the spec's invariant checks
  * against non-configurable target slots are OUT (this engine's
  * objects have no property descriptors) — all loud TypeErrors, never
  * silent. Trap dispatch lives in [[Interp]] (proxyGet etc.); every
  * member read/write/has/delete/enumeration path routes through it. */
final class JsProxyV(val target: JsValue, val handler: JsObject) extends JsValue {
  var revoked: Boolean = false
}

/** SYMBOL (well-known since r13; UNIQUE `Symbol(desc)` since r15). As
  * a PROPERTY KEY a symbol addresses the object's separate `symProps`
  * table by its `slot` — well-known instances use V8's own `@@iterator`
  * notation, unique instances get a fresh per-Interp `@@u<n>` slot at
  * creation (identity IS the slot; `===` is reference equality and two
  * `Symbol('x')` never share a slot) — so symbol props can never
  * collide with user STRING keys and never enumerate (Object.keys /
  * for-in / JSON.stringify / spread-to-strings): V8's symbol-vs-string
  * split by construction. `descIsUndefined` distinguishes `Symbol()`
  * (description === undefined) from `Symbol('')` — both print as
  * "Symbol()". Implicit string/number coercion throws (V8); the
  * EXPLICIT `String(sym)` returns the descriptive string; typeof →
  * "symbol". */
final class JsSymbolV(val slot: String, val description: String,
                      val descIsUndefined: Boolean = false) extends JsValue

/** the canonical well-known symbol instances — ONE each per JVM so
  * `Symbol.iterator === Symbol.iterator` holds across every read path
  * (globals, proxy trap arguments, engine-internal lookups); immutable,
  * so the JVM-global sharing carries no cross-call state */
object JsSymbols {
  val iterator = new JsSymbolV("@@iterator", "Symbol.iterator")
  val asyncIterator = new JsSymbolV("@@asyncIterator", "Symbol.asyncIterator")
}

/** Raw bytes (attachments / binary record fields ride through untouched). */
final class JsBytes(val bytes: Array[Byte]) extends JsValue

/** An instant with an explicit epoch-millis origin (argless `new Date()`
  * is rejected — lens determinism, same policy as the environment's
  * Math.random trap). */
final case class JsDate(epochMillis: Double) extends JsValue

final class JsRegExpV(val source: String, val flags: String,
                      val pattern: java.util.regex.Pattern,
                      /** capture indices lexically inside a NEGATIVE
                        * lookaround: JS resets them when the assertion
                        * succeeds-by-failing, Java retains the attempt's
                        * partial captures — result builders force these
                        * to undefined (V8-differential fuzz finding) */
                      val negGroups: Set[Int] = Set.empty,
                      /** same, by declared capture NAME */
                      val negNames: Set[String] = Set.empty,
                      /** 1-based JS group index → java group index in
                        * `pattern` (null = identity). Differs only when
                        * sentinel groups were injected — see
                        * [[laSentinels]]. */
                      val jsToJava: Array[Int] = null,
                      /** JS-visible capture count (java count minus
                        * injected sentinels); -1 = same as the pattern */
                      val jsGroups: Int = -1,
                      /** one (sentinelJavaIdx, containedJsGroups,
                        * containedNames) per POSITIVE lookaround that
                        * lexically contains captures: Java keeps a
                        * completed lookaround's inner captures when its
                        * branch is later abandoned, where ES's immutable
                        * match states discard them — result builders
                        * treat those captures as undefined whenever the
                        * sentinel (an empty group planted right after
                        * the assertion) did not participate (r16,
                        * closes the r14 capstone-sweep divergence) */
                      val laSentinels: Vector[(Int, Set[Int], Set[String])] = Vector.empty)
    extends JsValue {
  var lastIndex: Int = 0
  def global: Boolean = flags.contains('g')
  /** sticky 'y' (r16): matches must start EXACTLY at lastIndex */
  def sticky: Boolean = flags.contains('y')
  /** 'd' (r16): exec results carry per-group [start, end] indices */
  def hasIndices: Boolean = flags.contains('d')
  /** the .flags GETTER recomputes canonical V8 order (d g i m s u y),
    * independent of the literal's spelling */
  def canonicalFlags: String = "dgimsuy".filter(flags.contains(_))
  /** java group index of 1-based JS group `g` */
  def javaIdx(g: Int): Int = if (jsToJava == null) g else jsToJava(g)
  lazy val jsGroupCount: Int =
    if (jsGroups >= 0) jsGroups else pattern.matcher("").groupCount()
}

sealed trait JsFunc extends JsValue { def name: String }
/** user-defined function/closure */
final class JsClosure(val fnName: Option[String], val params: Vector[Ast.Pattern],
                      val restParam: Option[String], val body: Vector[Ast.Stmt],
                      val exprBody: Option[Ast.Expr], val isArrow: Boolean,
                      val env: Scope, val capturedThis: JsValue,
                      /** `function*` — calling it returns a [[JsGenerator]] */
                      val isGenerator: Boolean = false,
                      /** `async function` — calling it returns a [[JsPromise]];
                        * the body runs as a suspendable frame (r14) */
                      val isAsync: Boolean = false) extends JsFunc {
  def name: String = fnName.getOrElse("")
}

/** INTERNAL await marker (r14): the value an async body hands through
  * its suspension rendezvous to say "this is an `await`, not a
  * `yield`". Plain async functions suspend ONLY this way; async
  * GENERATOR frames suspend both ways and the driver needs the tag to
  * tell them apart. Never user-visible: the driver consumes it at the
  * very next handoff — reaching any value-surface is an invariant
  * break (toStr guards loudly). */
private[js] final class AwaitSignal(val v: JsValue) extends JsValue

/** INTERNAL pre-awaited-yield marker (r15): an async generator's
  * `yield*` hands each delegated value through the suspension
  * rendezvous under this tag so the request driver settles it
  * WITHOUT the plain-yield re-await — the tc39 normative change
  * removing the redundant await in async `yield*` (observable in V8
  * as the delegated value arriving one tick earlier than a re-awaited
  * one; pinned by the asyncgen.js interleave templates). Never
  * user-visible, same invariant as [[AwaitSignal]]. */
private[js] final class PreAwaitedYield(val v: JsValue) extends JsValue

/** An ASYNC GENERATOR object (r14) — the result of calling an
  * `async function*`. `next`/`return`/`throw` each return a
  * [[JsPromise]]; concurrent calls queue per the spec's
  * AsyncGeneratorRequest list and are served strictly in order
  * ([[Promises.asyncGenRequest]]). The body runs on the same pooled
  * frame machinery as sync generators (reaped per map call); yielded
  * and returned values are AWAITED before delivery, exactly V8. */
final class JsAsyncGenerator(val frame: JsGenerator) extends JsValue {
  private[js] val requests =
    mutable.Queue.empty[(Generators.GenCmd, JsPromise)]
  /** a request is mid-flight (its step chain has not settled yet) */
  private[js] var running: Boolean = false
  /** body completed (returned, threw, or was returned into) */
  private[js] var finished: Boolean = false
}

/** A PROMISE (r14) — the result of calling an async function, `new
  * Promise(executor)`, or a Promise static. States and reactions per
  * ES 27.2; every reaction runs as a job on the owning [[Interp]]'s
  * MICROTASK QUEUE, drained to quiescence by the host (the lens worker
  * after each map body, the top of [[Interp.drainJobs]] callers) — the
  * sandbox has no timers or IO, so job order is fully deterministic.
  * `typeof` → "object"; implicit ToString → "[object Promise]". */
final class JsPromise extends JsValue {
  /** 0 = pending, 1 = fulfilled, 2 = rejected */
  private[js] var state: Int = 0
  private[js] var value: JsValue = JsUndefined
  /** registered reactions, FIFO (null after settle — late `then`s
    * enqueue their job immediately instead) */
  private[js] var reactions: mutable.ArrayBuffer[Promises.Reaction] =
    mutable.ArrayBuffer.empty
  /** a rejection with at least one reaction registered (the unhandled-
    * rejection scan skips these) */
  private[js] var handled: Boolean = false
}

/** A generator OBJECT — the result of calling a `function*` closure.
  * `typeof` → "object", iterable (for-of / spread / destructuring /
  * Array.from / new Set / new Map), with `next`/`return`/`throw`
  * methods per the ES iteration protocol.
  *
  * Execution model: the body runs on a pooled daemon worker with
  * STRICT synchronous handoff through two rendezvous queues — at any
  * instant exactly one of (caller, generator body) runs, so the shared
  * [[Budget]] and all user objects keep single-threaded semantics, and
  * every resume/yield pair is a happens-before edge. Suspended-forever
  * generators are reaped by [[Interp.closeGenerators]] at the end of
  * each map call (the lens worker's contract); see
  * [[Generators]] for the protocol and the pool rationale. */
final class JsGenerator(val closure: JsClosure, val genThis: JsValue,
                        val genArgs: Vector[JsValue]) extends JsValue {
  /** 0 = not started, 1 = suspended at a yield, 2 = running (re-entrant
    * next() is a TypeError, like V8), 3 = done */
  private[js] var state: Int = 0
  private[js] val cmdQ = new java.util.concurrent.SynchronousQueue[Generators.GenCmd]
  private[js] val outQ = new java.util.concurrent.SynchronousQueue[Generators.GenOut]
  /** set by closeGenerators: the body must unwind WITHOUT blocking on
    * the queues again (its finally blocks still run, but any yield
    * inside them re-throws the kill signal) */
  @volatile private[js] var closed: Boolean = false
  /** whether a worker ever picked the body up (close() only awaits
    * `finished` when one did) */
  @volatile private[js] var bodyStarted: Boolean = false
  /** counted down when the body's worker finishes unwinding — close()
    * awaits it so teardown-run finally blocks stay INSIDE the map call */
  private[js] val finished = new java.util.concurrent.CountDownLatch(1)
  def name: String = closure.name
}
/** user-defined CLASS. typeof → "function" (via JsFunc), but CALLING
  * it without `new` is a TypeError like V8 (Interp.callFunction).
  * `protoObj` holds instance methods and accessor slots; instances
  * link to it via JsObject.protoV, and it chains to the parent's
  * protoObj for `extends`. `statics` likewise chains for static
  * inheritance. `ctor` is the constructor body if declared; an
  * undeclared constructor forwards all args to the parent (the
  * implicit `constructor(...args){ super(...args) }`). */
final class JsClassV(val clsName: String,
                     var ctor: Option[JsClosure],
                     val protoObj: JsObject,
                     val statics: JsObject,
                     val parent: Option[JsClassV]) extends JsFunc {
  def name: String = clsName
  /** instance FIELD initializers in declaration order — zero-param
    * closures run with `this` = the new instance at V8's
    * initialization points (Interp.runConstructor/superConstruct);
    * results land as OWN props with [[Define]] semantics. The flag
    * marks PRIVATE fields ('#'-named), which land in the instance's
    * `privs` table instead. */
  var fields: Vector[(String, JsClosure, Boolean)] = Vector.empty
  /** private instance methods/accessors ('#name' → JsClosure or
    * JsAccessorProp) — resolved via brand check, never on the proto
    * chain; null when the class declares none. */
  var privMethods: mutable.HashMap[String, JsValue] = null
  /** private STATIC methods/accessors — the brand is the class itself. */
  var privStaticMethods: mutable.HashMap[String, JsValue] = null
  /** private STATIC field slots ('#name' → value), written by the
    * class-definition static initializers and by later assignment. */
  var privStaticVals: mutable.HashMap[String, JsValue] = null
  /** names declared `static #x` (fields) — placement check for
    * reads/writes before consulting privStaticVals. */
  var privStaticFieldNames: Set[String] = Set.empty
  /** whether ANY private member is declared (brand stamping guard). */
  var hasPrivates: Boolean = false
  def pm(isStatic: Boolean): mutable.HashMap[String, JsValue] =
    if (isStatic) privStaticMethods else privMethods
  def setPm(isStatic: Boolean, h: mutable.HashMap[String, JsValue]): Unit =
    if (isStatic) privStaticMethods = h else privMethods = h
}

/** host-provided function; `statics` (nullable) carries constructor
  * properties (Array.isArray, Object.keys, …) on the instance itself —
  * NOT in a shared registry, so per-call environments cannot leak or
  * race through JVM-global state */
final class JsNative(val name: String,
                     val fn: (JsValue, Vector[JsValue]) => JsValue,
                     val statics: JsObject = null) extends JsFunc

/** a JS `throw` in flight; only THESE are catchable by user try/catch —
  * budget violations (timeout/memory/steps) are host exceptions that
  * escape the interpreter, matching the reference isolate where a
  * timeout/OOM kills the map call even inside user try blocks. */
final case class JsThrown(value: JsValue)
  extends RuntimeException(Values.errorMessageOf(value)) with NoStackTrace

/** lexical scope for bindings */
final class Scope(val parent: Scope) {
  val vars: mutable.HashMap[String, JsValue] = mutable.HashMap.empty
  val consts: mutable.HashSet[String] = mutable.HashSet.empty

  def declare(name: String, v: JsValue, const: Boolean = false): Unit = {
    vars.put(name, v)
    if (const) consts.add(name) else consts.remove(name)
  }
  def lookup(name: String): Option[JsValue] = {
    var s: Scope = this
    while (s != null) {
      val got = s.vars.get(name)
      if (got.isDefined) return got
      s = s.parent
    }
    None
  }
  /** returns false if the name is not declared anywhere */
  def assign(name: String, v: JsValue): Boolean = {
    var s: Scope = this
    while (s != null) {
      if (s.vars.contains(name)) {
        if (s.consts.contains(name))
          throw JsThrown(Values.makeError("TypeError", s"Assignment to constant variable '$name'"))
        s.vars.put(name, v)
        return true
      }
      s = s.parent
    }
    false
  }
}

object Values {

  /** the one sanctioned exit for array holes: reads observe undefined */
  @inline def deHole(v: JsValue): JsValue = if (v eq JsHole) JsUndefined else v

  def truthy(v: JsValue): Boolean = v match {
    case JsUndefined | JsNull => false
    case JsBool(b) => b
    case JsNum(d) => d != 0.0 && !java.lang.Double.isNaN(d)
    case JsStr(s) => s.nonEmpty
    case _ => true
  }

  def typeOf(v: JsValue): String = v match {
    case JsUndefined => "undefined"
    case JsNull => "object"
    case _: JsBool => "boolean"
    case _: JsNum => "number"
    case _: JsStr => "string"
    case _: JsFunc => "function"
    case _: JsSymbolV => "symbol"
    case p: JsProxyV => typeOf(p.target) // typeof pierces: proxy of a function is "function" (V8)
    case _ => "object"
  }

  /** ECMA-262 Number::toString(10) — JS formatting, not Java's
    * (integral values print without ".0"; scientific only outside
    * [1e-6, 1e21)). */
  /** Shortest decimal digits that round-trip to `abs` exactly, as
    * (digits, n) with value = 0.digits × 10^n. JDK 17's
    * Double.toString is NOT always shortest (JDK-4511638, fixed only
    * in JDK 19's Ryū rewrite): e.g. 3.1e22 prints
    * "3.1000000000000002E22" where V8's shortest form is "3.1e+22" —
    * found by the round-8 differential sweep. So: round the double's
    * EXACT decimal expansion to L significant digits for growing L
    * until a candidate parses back bit-identically; nearest-ties try
    * both directions. */
  private def shortestDigits(abs: Double): (String, Int) = {
    val exact = new java.math.BigDecimal(abs)
    var L = 1
    while (L <= 17) {
      var rmIdx = 0
      while (rmIdx < 2) {
        val rm = if (rmIdx == 0) java.math.RoundingMode.HALF_EVEN
                 else java.math.RoundingMode.HALF_UP
        val r = exact.round(new java.math.MathContext(L, rm))
        if (r.doubleValue() == abs) {
          val unscaled = r.unscaledValue.toString
          val n = unscaled.length - r.scale
          var end = unscaled.length
          while (end > 1 && unscaled.charAt(end - 1) == '0') end -= 1
          return (unscaled.substring(0, end), n)
        }
        rmIdx += 1
      }
      L += 1
    }
    // unreachable (17 significant digits always round-trip), but keep
    // a defensive exact fallback
    val unscaled = exact.unscaledValue.toString
    (unscaled, unscaled.length - exact.scale)
  }

  def numToString(d: Double): String = {
    if (java.lang.Double.isNaN(d)) return "NaN"
    if (d == 0.0) return "0"
    if (java.lang.Double.isInfinite(d)) return if (d > 0) "Infinity" else "-Infinity"
    val neg = d < 0
    val abs = math.abs(d)
    val (digits, n) = shortestDigits(abs)
    val k = digits.length
    val s =
      if (k <= n && n <= 21) digits + "0" * (n - k)
      else if (0 < n && n <= 21) digits.substring(0, n) + "." + digits.substring(n)
      else if (-6 < n && n <= 0) "0." + "0" * (-n) + digits
      else {
        val mant = if (k == 1) digits else digits.substring(0, 1) + "." + digits.substring(1)
        val e = n - 1
        mant + "e" + (if (e >= 0) "+" else "") + e
      }
    if (neg) "-" + s else s
  }

  /** ToNumber */
  def toNumber(v: JsValue): Double = v match {
    case JsUndefined => Double.NaN
    case _: JsSymbolV =>
      throw JsThrown(makeError("TypeError", "Cannot convert a Symbol value to a number"))
    case JsNull => 0.0
    case JsBool(b) => if (b) 1.0 else 0.0
    case JsNum(d) => d
    case JsStr(s) => stringToNumber(s)
    case JsDate(ms) => ms
    case a: JsArray =>
      if (a.items.isEmpty) 0.0
      else if (a.items.length == 1) toNumber(a.items(0))
      else Double.NaN
    case _ => Double.NaN
  }

  /** ECMA StrWhiteSpaceChar = WhiteSpace ∪ LineTerminator: the JS set
    * includes NBSP, ZWNBSP/BOM, and every Zs char — Java's
    * `String.trim` (≤ U+0020) and `Character.isWhitespace` (excludes
    * NBSP/FEFF) both differ, which made `Number(' ')` NaN
    * instead of 0 (found by V8-differential fuzzing). */
  def isJsWhitespace(c: Char): Boolean = c match {
    case '\t' | '\n' | '\u000B' | '\f' | '\r' | ' ' | '\u00A0' |
         '\uFEFF' | '\u2028' | '\u2029' => true
    case _ => Character.getType(c) == Character.SPACE_SEPARATOR
  }

  /** trim with the JS whitespace set — the ToNumber/parseInt/parseFloat
    * leading/trailing strip */
  def jsTrim(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isJsWhitespace(s.charAt(i))) i += 1
    while (j > i && isJsWhitespace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  def stringToNumber(s0: String): Double = {
    val s = jsTrim(s0)
    if (s.isEmpty) return 0.0
    // BigInteger accepts a leading '+'/'-' in the digits, but JS radix
    // strings admit none: Number("0x-5") is NaN, not -5
    def radix(body: String, r: Int): Double =
      if (body.isEmpty || body.charAt(0) == '+' || body.charAt(0) == '-') Double.NaN
      else new java.math.BigInteger(body, r).doubleValue
    try {
      // BigInteger, not Long: JS admits radix literals past 2^63 (they
      // round to the nearest double, same as BigInteger.doubleValue)
      if (s.startsWith("0x") || s.startsWith("0X")) radix(s.substring(2), 16)
      else if (s.startsWith("0b") || s.startsWith("0B")) radix(s.substring(2), 2)
      else if (s.startsWith("0o") || s.startsWith("0O")) radix(s.substring(2), 8)
      else if (s == "Infinity" || s == "+Infinity") Double.PositiveInfinity
      else if (s == "-Infinity") Double.NegativeInfinity
      else {
        // reject Java-isms JS does not accept: trailing 'd'/'f', leading '.''s ok
        if (s.exists(c => !(c.isDigit || c == '.' || c == 'e' || c == 'E' || c == '+' || c == '-'))) Double.NaN
        else java.lang.Double.parseDouble(s)
      }
    } catch { case _: NumberFormatException => Double.NaN }
  }

  def toInt32(d: Double): Int = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) 0
    else {
      // ECMA ToInt32 wraps modulo 2^32 — `.toLong` SATURATES at ±2^63,
      // so (2**63)|0 would come out -1 instead of 0; reduce in double
      // space first (truncation is exact: every |d| ≥ 2^53 is integral)
      val t = if (d < 0) math.ceil(d) else math.floor(d)
      (t % 4294967296.0).toLong.toInt
    }
  }
  def toUint32(d: Double): Long = toInt32(d).toLong & 0xffffffffL

  /** OrdinaryOwnPropertyKeys enumeration order: integer-like keys
    * (canonical array indices, 0..2^32-2, no leading zeros) ascending
    * FIRST, then string keys in insertion order. V8-observable through
    * Object.keys/values/entries, for-in, spread and JSON.stringify —
    * the reference's lenses run on real V8, so output bytes depend on
    * this order whenever a map emits objects with numeric keys. */
  def arrayIndexKey(k: String): Boolean =
    // ASCII digits ONLY: Char.isDigit accepts Unicode digits ('٣'),
    // which V8 treats as plain string keys, not indices
    k.nonEmpty && k.length <= 10 && k.forall(c => c >= '0' && c <= '9') &&
      (k.length == 1 || k.charAt(0) != '0') && k.toLong < 4294967295L

  def ownEntries(o: JsObject): Vector[(String, JsValue)] = {
    val all = o.props.toVector
    if (!all.exists(e => arrayIndexKey(e._1))) all // common case: no re-sort
    else {
      val (idx, rest) = all.partition(e => arrayIndexKey(e._1))
      idx.sortBy(_._1.toLong) ++ rest
    }
  }

  /** ToString */
  def toStr(v: JsValue): String = v match {
    // loud invariant guard (see JsAccessorProp): a raw accessor record
    // reaching ToString means a read path skipped getter evaluation
    case _: JsAccessorProp =>
      throw new IllegalStateException(
        "internal: accessor property record leaked past getter evaluation")
    case _: JsUndefinedKind => "undefined"
    case JsNull => "null"
    case JsBool(b) => b.toString
    case JsNum(d) => numToString(d)
    case JsStr(s) => s
    case a: JsArray => a.items.map {
      // holes, undefined and null all join as empty ([1,,3] + '' is
      // "1,,3" in V8 — JsHole must not fall through to "undefined")
      case JsNull | _: JsUndefinedKind => ""
      case x => toStr(x)
    }.mkString(",")
    case o: JsObject if o.className.endsWith("Error") =>
      val name = o.props.get("name").map(toStr).getOrElse(o.className)
      val msg = o.props.get("message").map(toStr).getOrElse("")
      if (msg.isEmpty) name else s"$name: $msg"
    case _: JsObject => "[object Object]"
    case c: JsClassV => s"class ${c.clsName} { [code] }"
    case f: JsFunc => s"function ${f.name}() { [code] }"
    case _: JsSetV => "[object Set]"
    case _: JsMapV => "[object Map]"
    case _: JsGenerator => "[object Generator]"
    case _: JsPromise => "[object Promise]"
    case _: JsAsyncGenerator => "[object AsyncGenerator]"
    case _: AwaitSignal | _: PreAwaitedYield =>
      throw new IllegalStateException(
        "internal: await marker leaked past the async driver")
    case _: JsSymbolV =>
      throw JsThrown(makeError("TypeError", "Cannot convert a Symbol value to a string"))
    case p: JsProxyV =>
      // the static path cannot run traps; Interp.toStrI handles the
      // interpreter-reachable conversions (it runs OrdinaryToPrimitive
      // through the get trap). A get-trapped proxy reaching THIS path
      // (a builtin's raw coercion) errs loudly rather than silently
      // bypassing the trap.
      if (proxyHasGetTrap(p)) Values.throwType(
        "cannot convert a proxy with a get trap to a string in this position")
      else toStr(p.target)
    case b: JsBytes => s"[bytes ${b.bytes.length}]"
    case JsDate(ms) => java.time.Instant.ofEpochMilli(ms.toLong).toString
    case r: JsRegExpV => s"/${r.source}/${r.canonicalFlags}"
  }

  /** === */
  def strictEquals(a: JsValue, b: JsValue): Boolean = (a, b) match {
    case (JsUndefined, JsUndefined) | (JsNull, JsNull) => true
    case (JsBool(x), JsBool(y)) => x == y
    case (JsNum(x), JsNum(y)) => x == y // NaN !== NaN, +0 === -0
    case (JsStr(x), JsStr(y)) => x == y
    case (x: AnyRef, y: AnyRef) => x eq y
  }

  /** == with spec coercions */
  def looseEquals(a: JsValue, b: JsValue): Boolean = (a, b) match {
    case (JsUndefined | JsNull, JsUndefined | JsNull) => true
    case (JsNum(x), JsNum(y)) => x == y
    case (JsStr(x), JsStr(y)) => x == y
    case (JsBool(x), JsBool(y)) => x == y
    case (JsNum(x), JsStr(s)) => x == stringToNumber(s)
    case (JsStr(s), JsNum(y)) => stringToNumber(s) == y
    case (JsBool(_), _) => looseEquals(JsNum(toNumber(a)), b)
    case (_, JsBool(_)) => looseEquals(a, JsNum(toNumber(b)))
    case (JsNum(_) | JsStr(_), _: JsObject | _: JsArray) => looseEquals(a, toPrimitive(b))
    case (_: JsObject | _: JsArray, JsNum(_) | JsStr(_)) => looseEquals(toPrimitive(a), b)
    case (x: AnyRef, y: AnyRef) => x eq y
  }

  /** a `get` trap anywhere on the handler's chain — the guard for
    * trap-blind static conversions (raw own-prop walk; accessor-stored
    * traps are not visible here, which only widens the loud path) */
  private[js] def proxyHasGetTrap(p: JsProxyV): Boolean = {
    var cur = p.handler
    while (cur != null) {
      if (cur.props.contains("get")) return true
      cur = cur.protoV
    }
    false
  }

  /** ToPrimitive with default hint (objects → toString for our subset) */
  def toPrimitive(v: JsValue): JsValue = v match {
    case _: JsObject | _: JsArray | _: JsSetV | _: JsMapV | _: JsFunc |
         _: JsRegExpV | _: JsBytes | _: JsGenerator | _: JsProxyV |
         _: JsPromise | _: JsAsyncGenerator => JsStr(toStr(v))
    case JsDate(ms) => JsNum(ms)
    case prim => prim
  }

  def makeError(errType: String, message: String): JsObject = {
    val o = JsObject.empty(errType)
    o.props.put("name", JsStr(errType))
    o.props.put("message", JsStr(message))
    o.props.put("stack", JsStr(s"$errType: $message"))
    o
  }

  def errorMessageOf(v: JsValue): String = v match {
    case o: JsObject => o.props.get("message").map(toStr).getOrElse(toStr(v))
    case other => toStr(other)
  }

  def throwType(msg: String): Nothing = throw JsThrown(makeError("TypeError", msg))
  def throwRange(msg: String): Nothing = throw JsThrown(makeError("RangeError", msg))
  def throwRef(msg: String): Nothing = throw JsThrown(makeError("ReferenceError", msg))
}
