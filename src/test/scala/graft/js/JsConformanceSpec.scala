package graft.js

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.core._
import graft.lens._

/** Conformance battery: pins the interpreter's observable behavior to
  * real-JS (V8) semantics on the coercion/stdlib corners where a
  * from-scratch engine most plausibly diverges. Every expectation here
  * is the value stock V8 produces — the reference executes its lenses
  * on V8 (`library/workers/javascript-lens-worker.js`), so each
  * divergence would be a byte-level difference in lens output between
  * the reference and this engine.
  *
  * Kept separate from [[JsInterpSpec]] (language features / sandbox):
  * this file is a table of tiny expression facts, organized by spec
  * area, each `expect` row one observable. */
class JsConformanceSpec extends AnyFunSuite with Matchers {

  private def run(code: String, data: PoValue = PoObj.empty): MapResult = {
    val fn = JsMapFn.compile(code) match {
      case Right(f) => f
      case Left(err) => fail(s"startup error: ${err.errType}: ${err.message}")
    }
    MapRunner.run(fn, MapPath("/datasets/author:name/records/recordID",
      "datasets", "author", "name", "recordID"), data)
  }

  /** expression → its `'' + (expr)` string under the engine */
  private def str(expr: String): String = {
    val res = run(s"output('r', '' + ($expr))")
    res.error.foreach(e => fail(s"$expr → unexpected ${e.errType}: ${e.message}"))
    res.outputs.headOption match {
      case Some((_, PoStr(s))) => s
      case other => fail(s"$expr → no string output: $other")
    }
  }

  private def expect(rows: (String, String)*): Unit =
    rows.foreach { case (expr, want) =>
      withClue(s"JS: $expr\n") { str(expr) shouldBe want }
    }

  test("loose equality coercion table (==)") {
    expect(
      "null == undefined" -> "true",
      "null == 0" -> "false",
      "null == false" -> "false",
      "undefined == 0" -> "false",
      "'' == 0" -> "true",
      "'0' == 0" -> "true",
      "'' == '0'" -> "false",
      "false == '0'" -> "true",
      "true == '1'" -> "true",
      "true == 2" -> "false",
      "[] == ''" -> "true",
      "[] == 0" -> "true",
      "[0] == false" -> "true",
      "[1] == 1" -> "true",
      "[null] == ''" -> "true",
      "[undefined] == 0" -> "true",
      "NaN == NaN" -> "false",
      "NaN != NaN" -> "true",
      "({}) == '[object Object]'" -> "true",
    )
  }

  test("strict equality (===): value for primitives, identity for objects") {
    expect(
      "0 === -0" -> "true",
      "NaN === NaN" -> "false",
      "[] === []" -> "false",
      "(() => { const a = []; return a === a })()" -> "true",
      "'1' === 1" -> "false",
    )
  }

  test("relational operators: string-vs-numeric comparison modes") {
    expect(
      "'10' < '9'" -> "true",   // both strings: code-unit compare
      "'2' < '12'" -> "false",
      "2 < '12'" -> "true",     // mixed: numeric
      "null >= 0" -> "true",    // null → +0 for relational, not for ==
      "null > 0" -> "false",
      "undefined >= 0" -> "false", // NaN comparison
      "'a' < 'b'" -> "true",
    )
  }

  test("typeof") {
    expect(
      "typeof null" -> "object",
      "typeof undefined" -> "undefined",
      "typeof NaN" -> "number",
      "typeof ''" -> "string",
      "typeof []" -> "object",
      "typeof (() => 1)" -> "function",
      "typeof true" -> "boolean",
      "typeof notDeclaredAnywhere" -> "undefined", // typeof never throws ReferenceError
    )
  }

  test("ToInt32/ToUint32: wrap modulo 2^32, truncate toward zero") {
    expect(
      "-1 >>> 0" -> "4294967295",
      "(2**32) | 0" -> "0",
      "(2**32 + 5) | 0" -> "5",
      "(2**31) | 0" -> "-2147483648",
      "(2**53 + 2) | 0" -> "2",
      "(2**63) | 0" -> "0",     // .toLong would saturate to -1
      "(-(2**63)) | 0" -> "0",
      "1 << 32" -> "1",         // shift count mod 32
      "1 << 33" -> "2",
      "~5" -> "-6",
      "-9 >> 1" -> "-5",
      "-9 >>> 28" -> "15",
      "3.7 | 0" -> "3",
      "-3.7 | 0" -> "-3",
      "NaN | 0" -> "0",
      "Infinity | 0" -> "0",
    )
  }

  test("number → string layout (beyond the basics in JsInterpSpec)") {
    expect(
      "1e-6" -> "0.000001",   // boundary: fixed notation down to 1e-6
      "2**31" -> "2147483648",
      "123.125" -> "123.125",
      "-0.5" -> "-0.5",
      "1e300 * 1e300" -> "Infinity",
      // JDK-17 Double.toString is not shortest-roundtrip; V8 is. The
      // shortest-digits search must find 2 digits here, not Java's 17
      // (round-8 differential find)
      "1e21 * 31" -> "3.1e+22",
      "4.35" -> "4.35",
      "0.3000000000000004" -> "0.3000000000000004", // needs all 16 digits
    )
  }

  test("toFixed: exact binary value, half-up on magnitude, 1e21 fallback") {
    expect(
      "(1.005).toFixed(2)" -> "1.00", // 1.005 is really 1.00499…; naive decimal rounding says "1.01"
      "(2.5).toFixed(0)" -> "3",
      "(-2.5).toFixed(0)" -> "-3",    // sign stripped first, so away from zero
      "(0.1).toFixed(20)" -> "0.10000000000000000555",
      "(1e21).toFixed(2)" -> "1e+21", // ≥ 10^21 → ToString, never plain digits
      "(1234.5678).toFixed(2)" -> "1234.57",
      "(0).toFixed(2)" -> "0.00",
    )
  }

  test("toPrecision: JS layout, not BigDecimal.toString's E-notation") {
    expect(
      "(123.456).toPrecision(2)" -> "1.2e+2",
      "(123.456).toPrecision(4)" -> "123.5",
      "(0.000123).toPrecision(2)" -> "0.00012",
      "(123456).toPrecision(10)" -> "123456.0000", // pads to p significant digits
      "(0).toPrecision(3)" -> "0.00",
      "(9.99).toPrecision(2)" -> "10",
      "(1234.5).toPrecision(2)" -> "1.2e+3",
      "(0.0000001234).toPrecision(2)" -> "1.2e-7",
      "(-123.456).toPrecision(2)" -> "-1.2e+2",
    )
  }

  test("radix toString") {
    expect(
      "(255).toString(16)" -> "ff",
      "(255).toString(2)" -> "11111111",
      "(-255).toString(16)" -> "-ff",
      "(35).toString(36)" -> "z",
    )
  }

  test("parseInt / parseFloat / Number()") {
    expect(
      "parseInt('12ab')" -> "12",
      "parseInt('')" -> "NaN",
      "parseInt('0x1A')" -> "26",
      "parseInt('10', 2)" -> "2",
      "parseInt('  42  ')" -> "42",
      "parseInt('08')" -> "8",     // never legacy-octal
      "parseInt('0.9')" -> "0",
      "parseFloat('3.5e2x')" -> "350",
      "parseFloat('.5')" -> "0.5",
      "Number('')" -> "0",
      "Number('  ')" -> "0",
      "Number('12a')" -> "NaN",
      "Number('0x10')" -> "16",
      "Number(null)" -> "0",
      "Number(undefined)" -> "NaN",
      "Number([])" -> "0",
      "Number([7])" -> "7",
      "Number([1,2])" -> "NaN",
      "Number(true)" -> "1",
    )
  }

  test("String.prototype index/slice semantics") {
    expect(
      "'abc'.slice(-2)" -> "bc",
      "'abc'.slice(1, -1)" -> "b",
      "'abc'.substring(2, 0)" -> "ab",  // substring SWAPS out-of-order args
      "'abc'.substring(-3, 1)" -> "a",  // and clamps negatives to 0
      "'abc'.indexOf('')" -> "0",
      "'abc'.lastIndexOf('')" -> "3",
      "'abc'.charAt(5)" -> "",          // charAt: empty string
      "'abc'[5]" -> "undefined",        // index access: undefined
      "'abc'.at(-1)" -> "c",
      "'a'.charCodeAt(0)" -> "97",
      "'a'.charCodeAt(5)" -> "NaN",
      "'abc'.startsWith('b', 1)" -> "true",
    )
  }

  test("split / replace / replaceAll") {
    expect(
      "'a,b,,c'.split(',').length" -> "4",  // empty segment survives
      "''.split(',').length" -> "1",        // [''], not []
      "'abc'.split('').join('-')" -> "a-b-c",
      "'a1b2c'.split(/[0-9]/).join('')" -> "abc",
      "'ab'.split('', 1).join('')" -> "a",  // limit
      "'aaa'.replace('a', 'b')" -> "baa",   // string pattern: FIRST only
      "'aaa'.replaceAll('a', 'b')" -> "bbb",
      "'a.b.c'.replaceAll('.', '-')" -> "a-b-c", // string pattern is literal, not a regex
      "'xay'.replace(/a/, '$&$&')" -> "xaay",
      "'a-b'.replace(/(\\w)-(\\w)/, '$2$1')" -> "ba",
    )
  }

  test("pad / repeat / trim") {
    expect(
      "'abc'.padStart(5, '0')" -> "00abc",
      "'abc'.padStart(2)" -> "abc",       // target shorter than input: unchanged
      "'ab'.repeat(3)" -> "ababab",
      "'ab'.repeat(0)" -> "",
      "'  x\\t'.trim()" -> "x",
      "String.fromCharCode(104, 105)" -> "hi",
    )
  }

  test("Array.prototype behaviors") {
    expect(
      "[3,1,10].sort().join(',')" -> "1,10,3",  // default sort is STRING sort
      "[10,1,5].sort((a,b) => a-b).join(',')" -> "1,5,10",
      "[1,2,3].slice(-2).join(',')" -> "2,3",
      "(() => { const a=[1,2,3]; const r=a.splice(1,1); return a.join(',') + '|' + r.join(',') })()" -> "1,3|2",
      "(() => { const a=[1,2,3]; a.splice(1,0,9); return a.join(',') })()" -> "1,9,2,3",
      "[1,2,3].reduce((a,b) => a+b)" -> "6",
      "[1,2,3].reduce((a,b) => a+b, 10)" -> "16",
      "[NaN].includes(NaN)" -> "true",   // SameValueZero
      "[NaN].indexOf(NaN)" -> "-1",      // strict equality
      "[1,[2,[3]]].flat().length" -> "3",
      "[1,[2,[3]]].flat(Infinity).join(',')" -> "1,2,3",
      "[1,2,3,4].filter(x => x % 2).join(',')" -> "1,3",
      "[1,2].concat([3],[4,5]).join(',')" -> "1,2,3,4,5",
      "[1,2,3].findIndex(x => x > 1)" -> "1",
      "[1,2,3].find(x => x > 5)" -> "undefined",
      "[1,2,3].reverse().join(',')" -> "3,2,1",
      "Array.isArray([])" -> "true",
      "Array.isArray('a')" -> "false",
      "[...'ab'].join(',')" -> "a,b",
      "Math.max(...[1,5,3])" -> "5",
      "[...new Set([1,2,2,3])].join(',')" -> "1,2,3",
      "[1,2] + [3]" -> "1,23",           // toPrimitive of arrays under +
    )
  }

  test("array length assignment: truncate, extend with holes, reject invalid (ES 10.4.2.1)") {
    expect(
      "(() => { const a=[1,2,3]; a.length = 1; return a.join(',') + '|' + a.length })()" -> "1|1",
      "(() => { const a=[1,2,3]; a.length = 0; return a.length + '|' + (a[0] === undefined) })()" -> "0|true",
      "(() => { const a=[1]; a.length = 3; return a.length + '|' + (a[2] === undefined) })()" -> "3|true",
      // truncation then re-read: no stale shadowed 'length' prop survives
      "(() => { const a=[1,2,3,4]; a.length = 2; a.push(9); return a.join(',') })()" -> "1,2,9",
      "(() => { try { const a=[1]; a.length = -1; return 'no' } catch (e) { return e.name } })()" -> "RangeError",
      "(() => { try { const a=[1]; a.length = 1.5; return 'no' } catch (e) { return e.name } })()" -> "RangeError",
    )
  }

  test("accessor properties: get/set evaluate with V8 semantics") {
    expect(
      // basic get, `this` binding, set through this
      "({ get x() { return 1 } }).x" -> "1",
      "({ a: 2, get x() { return this.a * 3 } }).x" -> "6",
      "(() => { const o = { v: 0, set x(n) { this.v = n + 1 } }; o.x = 4; return o.v })()" -> "5",
      // paired accessors share one slot
      "(() => { const o = { _x: 1, get x() { return this._x }, set x(v) { this._x = v * 2 } }; o.x = 10; return o.x })()" -> "20",
      // sloppy-mode silent no-op on getter-only write; setter-only read
      "(() => { const o = { get x() { return 7 } }; o.x = 99; return o.x })()" -> "7",
      "'' + ({ set x(v) {} }).x" -> "undefined",
      // computed accessor key
      "({ get ['k' + 1]() { return 3 } }).k1" -> "3",
      // non-accessor uses of the words get/set are untouched
      "({ get: 1 }).get" -> "1",
      "({ get() { return 2 } }).get()" -> "2",
      // destructuring reads through the getter
      "(() => { const { x } = { get x() { return 9 } }; return x })()" -> "9",
      // getter throw is catchable
      "(() => { try { return ({ get x() { throw new TypeError('boom') } }).x } catch (e) { return e.name } })()" -> "TypeError",
    )
  }

  test("accessor properties: enumeration order kept, getters only invoke on value reads") {
    expect(
      // keys/for-in/in/delete see the property WITHOUT invoking it
      "Object.keys({ get x() { throw 1 }, y: 1 }).join(',')" -> "x,y",
      "(() => { let k = ''; for (const p in { get x() { throw 1 } }) k += p; return k })()" -> "x",
      "'x' in { get x() { throw 1 } }" -> "true",
      "(() => { const o = { get x() { return 1 } }; delete o.x; return 'x' in o })()" -> "false",
      // single ordered table: accessors keep literal position, and a
      // late get over an early set merges INTO the early slot
      "Object.keys({ a: 1, get b() { return 2 }, c: 3 }).join(',')" -> "a,b,c",
      "Object.keys({ a: 1, set b(v) {}, c: 2, get b() { return 5 } }).join(',')" -> "a,b,c",
      // value-observing enumeration evaluates
      "Object.values({ get x() { return 5 }, y: 6 }).join(',')" -> "5,6",
      "Object.entries({ get x() { return 5 } })[0].join(':')" -> "x:5",
      // JSON.stringify invokes getters
      "JSON.stringify({ get x() { return 3 }, y: 4 })" -> "{\"x\":3,\"y\":4}",
      // spread / rest copy DATA (getter evaluated once, accessor-ness gone)
      "JSON.stringify({ ...{ get x() { return 4 } } })" -> "{\"x\":4}",
      "(() => { const s = { ...{ get x() { return 4 } } }; s.x = 5; return s.x })()" -> "5",
      "(() => { const { a, ...r } = { a: 1, get b() { return 2 } }; return r.b })()" -> "2",
      // Object.assign: src getter evaluates, TARGET setter receives it
      "(() => { const t = { v: 0, set x(n) { this.v = n } }; Object.assign(t, { get x() { return 8 } }); return t.v })()" -> "8",
    )
    // accessor values reach lens output through getter evaluation
    val res = run("output('r', { get x() { return 42 }, y: 1 })")
    res.error shouldBe None
    res.outputs.head._2 match {
      case PoObj(fields) =>
        fields.get("x") shouldBe Some(PoInt(42L))
        fields.get("y") shouldBe Some(PoInt(1L))
      case other => fail(s"expected PoObj, got $other")
    }
  }

  test("accessor arity violations are startup syntax errors (literals AND classes)") {
    // V8 early errors: getter with params, setter without exactly one
    for (src <- Seq(
      "const o = { get x(a) { return 1 } }; output('r', 'no')",
      "const o = { set x() {} }; output('r', 'no')",
      "const o = { set x(a, b) {} }; output('r', 'no')",
      "class A { get x(a) { return 1 } }; output('r', 'no')",
      "class A { set x() {} }; output('r', 'no')",
    )) {
      JsMapFn.compile(src) match {
        case Left(err) => err.errType shouldBe "SyntaxError"
        case Right(_) => fail(s"source must be rejected at startup: $src")
      }
    }
  }

  test("quantified lookbehind is a SyntaxError (Annex B: only lookaheads quantify)") {
    // java.util.regex accepts /(?<=a)*/ with quantified-lookbehind
    // semantics; V8 throws 'nothing to repeat'. Lookaheads stay legal.
    for (bad <- Seq("/(?<=a)*/", "/(?<!a)+/", "/x(?<=a){2}/")) {
      str(s"(() => { try { $bad.test('a'); return 'no-throw' } catch (e) { return e.name } })()") shouldBe "SyntaxError"
    }
    expect(
      "/(?=a)*/.test('')" -> "true",    // quantified lookAHEAD: legal
      "/(?<=a)b/.test('ab')" -> "true", // unquantified lookbehind: legal
      "/(a)*/.test('')" -> "true",      // quantified plain group: legal
    )
  }

  test("invalid date: toISOString throws RangeError, toJSON/stringify emit null") {
    // NaN.toLong is 0 — without the guard these would silently print
    // the epoch where V8 throws / emits null.
    str("(() => { try { new Date('garbage').toISOString(); return 'no-throw' } catch (e) { return e.name } })()") shouldBe "RangeError"
    expect(
      "new Date('garbage').toJSON()" -> "null",
      "JSON.stringify(new Date('garbage'))" -> "null",
      "JSON.stringify({d: new Date('garbage')})" -> "{\"d\":null}",
      // valid dates unchanged
      "new Date(0).toISOString()" -> "1970-01-01T00:00:00.000Z",
    )
  }

  test("matchAll starts at the regex's lastIndex, without mutating it") {
    expect(
      // after exec, lastIndex = 3; matchAll resumes there (V8 clones
      // the regex PRESERVING lastIndex)…
      "(() => { const r = /a/g; r.exec('aba'); return [...'aba'.matchAll(r)].length })()" -> "1",
      // …and the ORIGINAL regex's lastIndex is untouched by the scan
      "(() => { const r = /a/g; r.exec('aba'); 'aba'.matchAll(r); return r.lastIndex })()" -> "1",
      "(() => { const r = /a/g; r.lastIndex = 99; return [...'aaa'.matchAll(r)].length })()" -> "0",
      // fresh regex / string arg: full scan
      "[...'aaa'.matchAll(/a/g)].length" -> "3",
      "[...'aaa'.matchAll('a')].length" -> "3",
    )
  }

  test("builtin lazy iterators: matchAll + Map/Set/Array keys·values·entries (r16; V8-verified)") {
    expect(
      // protocol shape: next is callable, results are {value, done},
      // the iterator is its own Symbol.iterator, and it is NOT an array
      "typeof 'aba'.matchAll(/a/g).next" -> "function",
      """(() => { const it = 'aba'.matchAll(/a/g); const r = it.next();
        | return [r.done, r.value[0], r.value.index].join(',') })()""".stripMargin
        -> "false,a,0",
      "(() => { const it = 'aba'.matchAll(/a/g); return it[Symbol.iterator]() === it })()" -> "true",
      // half-drained: spread consumes only the remainder
      """(() => { const it = 'aba'.matchAll(/a/g); it.next();
        | return JSON.stringify([...it].map(m => m.index)) })()""".stripMargin -> "[2]",
      // exhausted: {value: undefined, done: true}
      "(() => { const r = 'x'.matchAll(/q/g).next(); return [r.done, String(r.value)].join(',') })()"
        -> "true,undefined",
      // Map/Set/Array iterator methods follow the same protocol
      "typeof new Map([['a',1]]).entries().next" -> "function",
      "JSON.stringify(new Map([['a',1],['b',2]]).entries().next().value)" -> """["a",1]""",
      "String(new Map([['a',1]]).keys().length)" -> "undefined",
      "String(Array.isArray(new Map([['a',1]]).values()))" -> "false",
      "JSON.stringify([...new Map([['a',1],['b',2]]).values()])" -> "[1,2]",
      "(() => { const si = new Set([3,4]).values(); si.next(); return JSON.stringify([...si]) })()" -> "[4]",
      "JSON.stringify([1,9].entries().next().value)" -> "[0,1]",
      "JSON.stringify([...[5,6].keys()])" -> "[0,1]",
      // iterators JSON-stringify as plain objects (functions skipped)
      "JSON.stringify(new Map([['a',1]]).entries())" -> "{}",
    )
  }

  test("sticky flag 'y': anchored exec/test/match/replace/search semantics (r16; V8-verified)") {
    expect(
      // exec anchors EXACTLY at lastIndex; a miss resets it to 0
      "String(/b/y.exec('ab'))" -> "null",
      "(() => { const r = /b/y; r.exec('ab'); return r.lastIndex })()" -> "0",
      "(() => { const r = /b/y; r.lastIndex = 1; return [r.exec('ab')[0], r.lastIndex].join(',') })()" -> "b,2",
      // test tracks lastIndex the same way (2nd anchored test misses)
      "(() => { const r = /a/y; return [r.test('ab'), r.lastIndex, r.test('ab'), r.lastIndex].join(',') })()"
        -> "true,1,false,0",
      // ^ keeps its TRUE-INPUT anchor under sticky; lookbehind can see
      // BEFORE lastIndex
      "(() => { const r = /^b/y; r.lastIndex = 1; return String(r.exec('ab')) })()" -> "null",
      "(() => { const r = /(?<=a)b/y; r.lastIndex = 1; return r.exec('ab')[0] })()" -> "b",
      // match: non-global y = one exec; gy collects the anchored RUN
      "JSON.stringify('aab'.match(/a/y))" -> """["a"]""",
      "JSON.stringify('aab'.match(/a/gy))" -> """["a","a"]""",
      "JSON.stringify('aba'.match(/a/gy))" -> """["a"]""",
      // search: anchored at 0, lastIndex saved/untouched
      "(() => { const r = /b/y; r.lastIndex = 1; return ['ab'.search(r), r.lastIndex].join(',') })()" -> "-1,1",
      "'ba'.search(/b/y)" -> "0",
      // replace: non-global sticky starts at lastIndex and mutates it;
      // gy replaces the anchored run and stops at the gap
      "(() => { const r = /a/y; r.lastIndex = 1; return ['aa'.replace(r, 'X'), r.lastIndex].join('|') })()" -> "aX|2",
      "(() => { const r = /a/y; return ['ba'.replace(r, 'X'), r.lastIndex].join('|') })()" -> "ba|0",
      "'aaba'.replace(/a/gy, 'X')" -> "XXba",
      // split ignores stickiness (ES clones with an internal y anyway)
      "JSON.stringify('a1b2'.split(/\\d/y))" -> """["a","b",""]""",
      // matchAll with gy: anchored run from lastIndex, stops at the gap
      "JSON.stringify([...'aab'.matchAll(/a/gy)].map(m => m.index))" -> "[0,1]",
      "JSON.stringify([...'aba'.matchAll(/a/gy)].map(m => m.index))" -> "[0]",
      // flags getter canonicalizes; sticky prop reads the flag
      "/x/ydg.flags" -> "dgy",
      "String(/x/y.sticky) + ',' + String(/x/g.sticky)" -> "true,false",
      "'' + /x/ydg" -> "/x/dgy",
    )
  }

  test("'d' flag: per-group match indices (r16; V8-verified)") {
    expect(
      "JSON.stringify(/(a)(?:(x)|b)/d.exec('ab').indices)" -> """[[0,2],[0,1],null]""",
      // indices.groups mirrors result.groups: absent without named groups
      "String(/(a)/d.exec('a').indices.groups)" -> "undefined",
      "JSON.stringify(/(?<L>a)/d.exec('za').indices.groups)" -> """{"L":[1,2]}""",
      "String(/x/d.hasIndices) + ',' + String(/x/.hasIndices)" -> "true,false",
      // no 'd': no indices property at all
      "String(/(a)/.exec('a').indices)" -> "undefined",
      // abandoned-lookahead discipline applies to indices too
      "JSON.stringify(/((?=([a-c]|b))x|[a-c])/d.exec('c').indices)" -> """[[0,1],[0,1],null]""",
      // replaceAll with a non-global regex is a TypeError (V8)
      "(() => { try { 'x'.replaceAll(/x/, 'y'); return 'NO' } catch (e) { return e.name } })()" -> "TypeError",
    )
  }

  test("matchAll spread/for-of behavior (pre-r16 shape rows, still V8-equal)") {
    expect(
      "[...'aba'.matchAll(/a/g)].length" -> "2",
      "(() => { let n = 0; for (const m of 'aba'.matchAll(/a/g)) n++; return n })()" -> "2",
    )
  }

  test("documented corner: stale captures in emptily-re-iterated quantified groups") {
    // ES RepeatMatcher CLEARS the captures inside a quantified atom at
    // each iteration; java.util.regex RETAINS the last successful
    // capture. For /(?:(a)|b)+/ on 'ab', V8 reports group 1 undefined
    // (cleared by the final 'b' iteration) — the Java layer reports the
    // stale 'a'. Engine-internal repetition-capture state, not
    // translatable syntax (translateRegex scaladoc); pinned HERE as the
    // known divergence so any change to it is visible.
    expect(
      "/(?:(a)|b)+/.exec('ab')[1]" -> "a", // V8: undefined — documented divergence
      // Java records the final EMPTY a* iteration; V8 keeps 'aa' (the
      // spec abandons the empty repetition) — the second documented shape
      "/((a*)b?)+/.exec('aab')[2]" -> "",
      // the same mechanism through split's separator captures (r14
      // capstone find, same class): a bounded quantifier whose last
      // iteration matches empty overwrites the capture in Java where
      // the spec abandons the empty iteration (V8: ["","?","a","?",""])
      """JSON.stringify('?a?'.split(/((?!1)[^ab]|0?){1,2}/))""" -> """["","","a","",""]""",
      // the overall match and non-repeated captures agree with V8
      "/(?:(a)|b)+/.exec('ab')[0]" -> "ab",
      "/(a)(b)/.exec('ab').slice(1).join(',')" -> "a,b",
    )
  }

  test("lookahead captures in an abandoned alternation branch are discarded (r16; V8-verified)") {
    // Java treats a completed lookahead atomically: backtracking PAST
    // it (the branch fails after the assertion succeeded) keeps its
    // inner captures, where the spec's immutable match states discard
    // them. Found by the round-14 capstone regexgen sweep (1 divergence
    // in 16k fresh probes), pinned as a documented corner through r15;
    // CLOSED in r16 by sentinel injection: each positive lookaround
    // containing captures compiles as `(?:LA())` — the empty group
    // right after the assertion unwinds like any normal group when the
    // branch is abandoned, making "did the lookaround participate"
    // observable, and the result builders reset its captures when it
    // did not (Builtins.planLookaroundSentinels).
    expect(
      "JSON.stringify('abc'.split(/((?=([a-c]|b))x\\s|[a-c]$)/))" ->
        """["ab","c",null,""]""", // the r14 capstone divergence, now V8-equal
      // the committed path through a SUCCESSFUL lookahead agrees with V8
      "/(?=(a))a/.exec('a').slice(0).join(',')" -> "a,a",
      "JSON.stringify('xa'.split(/((?=(a))a)/))" -> """["x","a","a",""]""",
      // exec shape: abandoned-lookahead group undefined, match/g1 kept
      "JSON.stringify(/((?=([a-c]|b))x|[a-c])/.exec('c'))" -> """["c","c",null]""",
      // named capture inside the abandoned lookahead resets too
      // (JSON hides an undefined prop — V8 prints {})
      "JSON.stringify(/((?=(?<L>[a-c]))x|[a-c])/.exec('c').groups)" -> "{}",
      "String(/((?=(?<L>[a-c]))x|[a-c])/.exec('c').groups.L)" -> "undefined",
      // backrefs still point at the right group after sentinel injection
      "/(?=(a))\\1x/.exec('ax')[0]" -> "ax",
      // quantified lookahead (Annex B): the wrapper keeps the quantifier
      // on the assertion, zero iterations leave the capture undefined
      "String(/(?=(a))*b/.exec('b')[1])" -> "undefined",
      // adjacent lookaheads with a trailing quantifier: the quantifier
      // must bind the SECOND assertion only (edit-ordering regression)
      "/(?=(a))(?=(ab))?a/.exec('a')[0]" -> "a",
      // sentinel participation is per match attempt: a global scan
      // resets between matches
      "JSON.stringify('ca'.match(/(?=(a))a|c/g))" -> """["c","a"]""",
    )
  }

  test("classes: construction, methods, this, chaining") {
    expect(
      "new (class { constructor(x) { this.x = x } getX() { return this.x } })(5).getX()" -> "5",
      "(() => { class C { constructor() { this.n = 1 } inc() { this.n++; return this } } return new C().inc().inc().n })()" -> "3",
      // class binding is lexical and the class value is a function
      "(() => { class A {} return typeof A })()" -> "function",
      // methods live on the prototype: not own-enumerable, but reachable
      // via `in` and shadowable per-instance
      "(() => { class A { m() { return 1 } } const a = new A(); return Object.keys(a).length + '|' + ('m' in a) + '|' + a.hasOwnProperty('m') })()" -> "0|true|false",
      "(() => { class A { m() { return 1 } } const a = new A(); a.m = () => 9; return a.m() + ',' + new A().m() })()" -> "9,1",
      // JSON/spread see own props only (methods are non-enumerable in V8)
      "JSON.stringify(new (class { constructor() { this.k = 1 } m() {} })())" -> "{\"k\":1}",
      // constructor returning an object overrides the instance
      "JSON.stringify(new (class { constructor() { return { custom: 1 } } })())" -> "{\"custom\":1}",
      // named class expression: inner binding sees the class
      "(() => { const f = class Named { who() { return Named.name } }; return new f().who() })()" -> "Named",
      // calling a class without new is a TypeError
      "(() => { class A {} try { A(); return 'no-throw' } catch (e) { return e.name } })()" -> "TypeError",
      // class accessors ride the instance chain with instance `this`
      "(() => { class A { get v() { return this.b * 2 } set v(n) { this.b = n + 1 } } const a = new A(); a.v = 4; return a.v })()" -> "10",
      "'' + (class A {})" -> "class A { [code] }",
    )
  }

  test("classes: extends, super, instanceof, statics") {
    expect(
      "(() => { class A { m() { return 1 } } class B extends A { m() { return super.m() + 10 } } return new B().m() })()" -> "11",
      // implicit derived constructor forwards args; explicit super()
      "(() => { class A { constructor(x) { this.x = x } } class B extends A {} return new B(3).x })()" -> "3",
      "(() => { class A { constructor(x) { this.x = x } } class B extends A { constructor() { super(4); this.y = 9 } } const b = new B(); return b.x + ',' + b.y })()" -> "4,9",
      // inherited methods resolve through the chain
      "(() => { class A { hello() { return 'hi' } } class B extends A {} return new B().hello() })()" -> "hi",
      // super through an accessor, receiver stays the instance
      "(() => { class A { get v() { return this.base * 2 } } class B extends A { get v() { return super.v + 1 } } const b = new B(); b.base = 10; return b.v })()" -> "21",
      // instanceof walks the class chain; constructor identity
      "(() => { class A {} class B extends A {} const b = new B(); return [b instanceof B, b instanceof A, ({}) instanceof A, b.constructor === B].join(',') })()" -> "true,true,false,true",
      // statics incl. inheritance; static accessor `this` is the class
      "(() => { class A { static make() { return new A() } } return A.make() instanceof A })()" -> "true",
      "(() => { class A { static greet() { return 'hi ' + this.name } } class B extends A {} return B.greet() })()" -> "hi B",
      "(() => { class A { static get tag() { return this.name + '!' } } return A.tag })()" -> "A!",
      // toJSON (incl. inherited) is honored by JSON.stringify
      "(() => { class A { toJSON() { return { t: 1 } } } class B extends A {} return JSON.stringify({ a: new B() }) })()" -> "{\"a\":{\"t\":1}}",
      // a toJSON stored behind a GETTER is read exactly once (V8's
      // single Get) — even if later reads would not return a function
      "(() => { let n = 0; const o = { get toJSON() { n++; return () => ({ v: 1 }) } }; return JSON.stringify(o) + '|' + n })()" -> "{\"v\":1}|1",
      "(() => { let n = 0; const o = { get toJSON() { n++; return n === 1 ? (() => ({ v: 1 })) : undefined } }; return JSON.stringify(o) + '|' + n })()" -> "{\"v\":1}|1",
      // arrow inside a method keeps the method's this and super binding
      "(() => { class A { m() { return 1 } } class B extends A { m() { const f = () => super.m() + this.k; return f() } } const b = new B(); b.k = 5; return b.m() })()" -> "6",
      // --- derived-ctor super() discipline (V8 ReferenceErrors) ---
      // returning without calling super()
      "(() => { class A { constructor() { this.x = 1 } } class B extends A { constructor() {} } try { new B(); return 'no-throw' } catch (e) { return e.name } })()" -> "ReferenceError",
      // even when the skipped super() is syntactically present
      "(() => { class A { constructor() { this.x = 1 } } class B extends A { constructor() { if (false) super(); this.y = 2 } } try { new B(); return 'no-throw' } catch (e) { return e.name } })()" -> "ReferenceError",
      // calling super() twice
      "(() => { class A {} class B extends A { constructor() { super(); try { super(); return } catch (e) { this.err = e.name } } } return new B().err })()" -> "ReferenceError",
      // `this` access BEFORE super() (the ES this-TDZ) — via an arrow,
      // so the binding is the ctor's own
      "(() => { class A {} class B extends A { constructor() { const peek = () => this; try { peek(); var saw = 'no-throw' } catch (e) { saw = e.name } super(); this.saw = saw } } return new B().saw })()" -> "ReferenceError",
      // an explicit object return skips the this-initialized check
      "(() => { class A {} class B extends A { constructor() { return { ok: 1 } } } return JSON.stringify(new B()) })()" -> "{\"ok\":1}",
      // super() in a class without extends is a startup error
    )
    JsMapFn.compile("class A { constructor() { super() } }") match {
      case Left(err) => err.errType shouldBe "SyntaxError"
      case Right(_) => fail("super() without extends must be a startup error")
    }
  }

  test("classes: public fields — V8 initialization points and [[Define]] semantics") {
    expect(
      // fields are own, enumerable, in declaration order
      "(() => { class A { x = 1; y = 2; m() {} } return JSON.stringify(new A()) })()" -> "{\"x\":1,\"y\":2}",
      "(() => { class A { bare; x = 3 } const a = new A(); return Object.keys(a).join(',') + '|' + ('' + a.bare) })()" -> "bare,x|undefined",
      // later initializers see earlier fields via this
      "(() => { class A { x = 4; y = this.x * 10 } return new A().y })()" -> "40",
      // base-class fields exist BEFORE the ctor body runs
      "(() => { class A { x = 7; constructor() { this.seen = this.x } } return new A().seen })()" -> "7",
      // derived fields initialize when super() returns — after the
      // parent ctor assigned, before the rest of the derived ctor
      "(() => { class A { constructor() { this.base = 1 } } class B extends A { d = this.base + 10; constructor() { super(); this.after = this.d * 2 } } const b = new B(); return b.d + ',' + b.after })()" -> "11,22",
      // [[Define]]: a field named like a base SETTER does not invoke it
      "(() => { class A { set v(n) { this.hit = n } } class B extends A { v = 5 } const b = new B(); return b.v + ',' + ('' + b.hit) })()" -> "5,undefined",
      // arrow field captures the instance `this`
      "(() => { class A { x = 9; get = () => this.x } const a = new A(); const f = a.get; return f() })()" -> "9",
      // static fields evaluate once, after methods, with this = class
      "(() => { class A { static tag = 'T' + A.mk(); static mk() { return 1 } } return A.tag })()" -> "T1",
      "(() => { class A { static n = 5 } class B extends A {} return B.n })()" -> "5", // static inheritance
    )
  }

  test("classes: static initialization blocks — this, source order, scoping") {
    expect(
      // block runs once at class definition with this = the class
      "(() => { class A { static { this.x = 7 } } return A.x })()" -> "7",
      // blocks and static fields interleave in SOURCE order
      "(() => { class A { static log = 'f1'; static { this.log += ',b1' } static log2 = A.log + ',f2'; static { this.log2 += ',b2' } } return A.log2 })()" -> "f1,b1,f2,b2",
      // a block sees methods (statics install before initializers run)
      "(() => { class A { static { this.v = this.mk() } static mk() { return 41 + 1 } } return A.v })()" -> "42",
      // class-name self-reference works inside the block
      "(() => { class A { static { A.tag = A.name + '!' } } return A.tag })()" -> "A!",
      // let inside the block stays block-scoped
      "(() => { let t = 'outer'; class A { static { let t = 'inner'; this.seen = t } } return t + '|' + A.seen })()" -> "outer|inner",
      // multiple blocks all run, in order
      "(() => { class A { static acc = ''; static { this.acc += 'a' } static { this.acc += 'b' } } return A.acc })()" -> "ab",
      // return is legal in a FUNCTION nested in the block
      "(() => { class A { static { this.f = () => { return 5 } } } return A.f() })()" -> "5",
      // static WRITES from outside (the setMember class path, V8-checked):
      // plain own property on the constructor...
      "(() => { class A {} A.count = 0; A.count++; return A.count })()" -> "1",
      // ...a parent static SETTER receives the write with this = class...
      "(() => { class A { static set v(n) { this.hit = n * 2 } } class B extends A {} B.v = 21; return B.hit })()" -> "42",
      // ...getter-only assignment is the sloppy silent no-op...
      "(() => { class A { static get g() { return 1 } } A.g = 9; return A.g })()" -> "1",
      // ...and a parent DATA static shadows into an own slot
      "(() => { class A { static n = 1 } class B extends A {} B.n = 5; return A.n + ',' + B.n })()" -> "1,5",
    )
  }

  test("classes: private members — fields, methods, accessors (V8-checked)") {
    expect(
      // field read/write through this
      "(() => { class A { #x = 5; getX() { return this.#x } } return new A().getX() })()" -> "5",
      "(() => { class A { #x = 1; bump() { this.#x += 4; return this.#x } } return new A().bump() })()" -> "5",
      // postfix update through the private ref
      "(() => { class A { #n = 7; inc() { return this.#n++ } peek() { return this.#n } } const a = new A(); return a.inc() + ',' + a.peek() })()" -> "7,8",
      // private methods: this binding, value extraction
      "(() => { class A { #m() { return 10 } call() { return this.#m() } } return new A().call() })()" -> "10",
      "(() => { class A { #v = 3; #m() { return this.#v * 2 } call() { return this.#m() } } return new A().call() })()" -> "6",
      "(() => { class A { #v = 6; getm() { return this.#m } #m() { return this.#v } } const a = new A(); const f = a.getm(); return f.call(a) })()" -> "6",
      // private accessors share a slot
      "(() => { class A { #x = 1; get #v() { return this.#x * 100 } set #v(n) { this.#x = n } run() { this.#v = 7; return this.#v } } return new A().run() })()" -> "700",
      // static private field + method, accessed via the class
      "(() => { class A { static #c = 0; static next() { return ++A.#c } } A.next(); return A.next() })()" -> "2",
      "(() => { class A { static #mk() { return 9 } static get() { return A.#mk() } } return A.get() })()" -> "9",
      // inherited method reads the BASE class's private field
      "(() => { class A { #x = 1; rd() { return this.#x } } class B extends A {} return new B().rd() })()" -> "1",
      // lexical shadowing: inner class's #x wins inside it
      "(() => { class A { #x = 'outer'; test() { class Inner { #x = 'inner'; rd() { return this.#x } } return new Inner().rd() + ',' + this.#x } } return new A().test() })()" -> "inner,outer",
      // an inner class reaches the OUTER class's private through closure
      "(() => { class A { #secret = 42; test() { const self = this; class Inner { rd() { return self.#secret } } return new Inner().rd() } } return new A().test() })()" -> "42",
      // privates never enumerate / stringify; '#x' STRING key is distinct
      "(() => { class A { #h = 1; pub = 2 } return JSON.stringify(new A()) })()" -> "{\"pub\":2}",
      "(() => { class A { #h = 1; pub = 2 } return Object.keys(new A()).join(',') })()" -> "pub",
      "(() => { class A { #x = 1; both() { this['#x'] = 'pub'; return this.#x + ',' + this['#x'] + ',' + Object.keys(this).join('') } } return new A().both() })()" -> "1,pub,#x",
      // declaration-order interleaving with public fields
      "(() => { class A { a = 1; #b = this.a + 1; c = this.rd() + 1; rd() { return this.#b } } const x = new A(); return x.a + ',' + x.c })()" -> "1,3",
      // optional chain short-circuits
      "(() => { class A { #x = 3; static rd(o) { return o?.#x } } return A.rd(new A()) + ',' + A.rd(null) })()" -> "3,undefined",
      // private-method TAG on a tagged template binds the receiver
      "(() => { class A { n = 9; #tag(s, ...v) { return s[0] + '|' + this.n + '|' + v.join(',') } m() { return this.#tag`hi${1}x${2}` } } return new A().m() })()" -> "hi|9|1,2",
    )
  }

  test("classes: private brand checks and TypeErrors (V8-checked)") {
    expect(
      // #x in obj: field brand, method brand, class object, plain object
      "(() => { class A { #x = 1; static has(o) { return #x in o } } return A.has(new A()) + ',' + A.has({}) + ',' + A.has(A) })()" -> "true,false,false",
      "(() => { class A { #m() {} static has(o) { return #m in o } } return A.has(new A()) + ',' + A.has({}) })()" -> "true,false",
      // same NAME, different class: distinct private names → TypeError
      "(() => { class A { #x = 1; static rd(o) { return o.#x } } class B { #x = 2 } try { return A.rd(new B()) } catch (e) { return e.name } })()" -> "TypeError",
      // static privates do NOT flow to subclasses
      "(() => { class A { static #s = 5; static rd(o) { return o.#s } } class B extends A {} try { return A.rd(B) } catch (e) { return e.name } })()" -> "TypeError",
      // static private read through an INSTANCE → TypeError
      "(() => { class A { static #f = 1; static rd(o) { return o.#f } } try { return A.rd(new A()) } catch (e) { return e.name } })()" -> "TypeError",
      // private methods are not writable; getter-only not assignable
      "(() => { class A { #m() {} w() { try { this.#m = 1 } catch (e) { return e.name } } } return new A().w() })()" -> "TypeError",
      "(() => { class A { get #g() { return 1 } w() { try { this.#g = 2 } catch (e) { return e.name } } } return new A().w() })()" -> "TypeError",
      // setter-only read → TypeError
      "(() => { class A { set #s(v) {} r() { try { return this.#s } catch (e) { return e.name } } } return new A().r() })()" -> "TypeError",
      // primitive receiver → TypeError
      "(() => { class A { #x = 1; static rd(o) { try { return o.#x } catch (e) { return e.name } } } return A.rd(5) })()" -> "TypeError",
      // `#x in primitive` is the ordinary in-operator TypeError
      "(() => { class A { #x; static t(o) { try { return String(#x in o) } catch (e) { return e.name } } } return A.t(5) + '|' + A.t(null) })()" -> "TypeError|TypeError",
    )
  }

  test("classes: computed keys evaluate in the class environment (V8-checked)") {
    // r13 advice fix: computed member keys used to evaluate in the
    // OUTER scope, so a private name inside one — legal per V8's
    // ClassDefinitionEvaluation, where the private environment is set
    // up before element evaluation — escaped as a JVM InternalError.
    expect(
      // the exact advice shape: a brand check inside a method key
      "(() => { class A { #x; [(#x in {}) ? 'a' : 'b']() { return 7 } } return new A().b() })()" -> "7",
      // same for a STATIC method key
      "(() => { class C { #p; static [(#p in {}) ? 'x' : 'y']() { return 3 } } return C.y() })()" -> "3",
      // ordinary computed keys still work alongside private reads
      "(() => { class D { #v = 1; ['m' + 1]() { return this.#v + 10 } } return new D().m1() })()" -> "11",
      // outer variables that happen to collide with the interpreter's
      // internal class bindings must resolve to the USER binding — the
      // key environment carries only the private names (V8-checked)
      "(() => { const __own_class__ = 'm'; class A { [__own_class__]() { return 1 } } return new A().m() })()" -> "1",
      "(() => { const __super_proto__ = 'p'; class B { #x; [(#x in {}) ? 'q' : __super_proto__]() { return 2 } } return new B().p() })()" -> "2",
    )
  }

  test("classes: private-name early errors (V8-checked SyntaxErrors)") {
    Seq(
      "class A {} const a = new A(); a.#x",          // never declared
      "class A { #x; #x }",                          // duplicate
      "class A { m() { return this.#y } }",          // undeclared use
      "class A { #x; m() { delete this.#x } }",      // delete private
      "class A { #constructor() {} }",               // reserved name
      "class A { get #p() { return 1 } get #p() { return 2 } }", // dup getter
      "class A { #x() {} static #x() {} }",          // static/instance mix
    ).foreach { code =>
      assert(JsMapFn.compile(s"function map(p, d) { $code }").isLeft,
        s"must reject at startup: $code")
    }
    // legal: complementary get/set pair; brand check via `in`
    assert(JsMapFn.compile(
      "function map(p, d) { class A { get #p() { return 1 } set #p(v) {} } }").isRight)
    assert(JsMapFn.compile(
      "function map(p, d) { class A { #q; m() { return #q in this } } }").isRight)
  }

  test("classes: static block early errors stay loud") {
    // top-level return in a static block is a V8 SyntaxError
    assert(JsMapFn.compile(
      "function map(path, data) { class A { static { return } } }").isLeft)
    // super() stays illegal inside the block (method super-context)
    assert(JsMapFn.compile(
      "function map(path, data) { class B extends Object { static { super() } } }").isLeft)
  }

  test("[].reduce with no seed throws a catchable TypeError") {
    run("output('r', [].reduce((a,b) => a+b))").error.get.errType shouldBe "TypeError"
    str("(() => { try { return [].reduce((a,b) => a+b) } catch (e) { return e.name } })()") shouldBe "TypeError"
  }

  test("own-property order: integer-like keys ascending first, then insertion") {
    expect(
      "Object.keys({2:'a', 1:'b', x:'c', 0:'d'}).join(',')" -> "0,1,2,x",
      "Object.keys({b:1, a:2}).join(',')" -> "b,a", // plain strings: insertion order
      "Object.keys({'10':0, '02':0, '1':0}).join(',')" -> "1,10,02", // '02' is NOT an index (leading zero)
      "JSON.stringify({2:'a', 1:'b', x:'c'})" -> "{\"1\":\"b\",\"2\":\"a\",\"x\":\"c\"}",
      "(() => { const ks=[]; const o={z:0, 3:0, 1:0}; for (const k in o) ks.push(k); return ks.join(',') })()" -> "1,3,z",
      "Object.entries({1:'a', x:'b'}).map(e => e.join(':')).join(',')" -> "1:a,x:b",
    )
  }

  test("object surgery: spread override, delete, in") {
    expect(
      "({...{a:1}, a:2}).a" -> "2",
      "(() => { const o={a:1}; delete o.a; return 'a' in o })()" -> "false",
      "'a' in {a: undefined}" -> "true", // `in` sees the key even when value is undefined
    )
  }

  test("JSON round-trip corners") {
    expect(
      "JSON.stringify([undefined, 1])" -> "[null,1]",   // in arrays: null
      "JSON.stringify({a: undefined, b: 1})" -> "{\"b\":1}", // in objects: dropped
      "JSON.parse('{\"a\":[1,2]}').a[1]" -> "2",
      "JSON.stringify('a\\nb')" -> "\"a\\nb\"",
      "JSON.stringify(1e21)" -> "1e+21",
    )
  }

  test("default/rest parameters: only undefined triggers defaults") {
    expect(
      "((a = 5) => a)()" -> "5",
      "((a = 5) => a)(undefined)" -> "5",
      "((a = 5) => a)(null)" -> "null",
      "((...xs) => xs.length)(1, 2, 3)" -> "3",
    )
  }

  test("ES2023 change-by-copy array methods: dense copies, never mutation") {
    expect(
      "[3,1].toSorted().join(',')" -> "1,3",
      "(() => { const a = [3,1]; a.toSorted(); return a.join(',') })()" -> "3,1", // original untouched
      "[3,1,2].toSorted((a,b) => b - a).join(',')" -> "3,2,1",
      "[1,,3].toReversed().map(x => '' + x).join(',')" -> "3,undefined,1", // holes densify
      "[3,1,2].toSpliced(1, 1, 'x', 'y').join(',')" -> "3,x,y,2",
      // skipCount arity: ABSENT -> full copy; present-but-undefined ->
      // ToIntegerOrInfinity(undefined)=0; one arg -> skip to end
      "[1,2,3].toSpliced().join(',')" -> "1,2,3",
      "[1,2,3].toSpliced(0, undefined).join(',')" -> "1,2,3",
      "[1,2,3].toSpliced(1).join(',')" -> "1",
      // splice shares the arity rule (23.1.3.31)
      "(() => { const a = [1,2,3]; const r = a.splice(0, undefined); return r.length + '|' + a.join(',') })()" -> "0|1,2,3",
      "(() => { const a = [1,2,3]; const r = a.splice(); return r.length + '|' + a.join(',') })()" -> "0|1,2,3",
      "(() => { const a = [1,2,3]; const r = a.splice(1); return r.join(',') + '|' + a.join(',') })()" -> "2,3|1",
      "[1,2,3].with(1, 9).join(',')" -> "1,9,3",
      "[1,2,3].with(-1, 9).join(',')" -> "1,2,9",
      "[1,,3].with(0, 9).map(x => '' + x).join(',')" -> "9,undefined,3",
      "(() => { try { return [1,2].with(-3, 0).join(',') } catch (e) { return e.name } })()" -> "RangeError",
    )
  }

  test("rejected words are legal as PROPERTY names, loud elsewhere") {
    expect(
      // `.with` the method vs `with` the statement; reserved words as keys
      "typeof [1].with" -> "function",
      "({ import: 1, yield: 2 }).import + ({ async: 3 }).async" -> "4",
      "(() => { const o = {}; o.await = 7; return o.await })()" -> "7",
    )
    for (bad <- Seq("with({a:1}) output('r', a)", "yield 5", "await 1",
                    "const x = import('m')")) {
      assert(JsMapFn.compile(bad).isLeft, s"must stay a startup error: $bad")
    }
  }

  test("structuredClone: deep copy, cycles, holes, getters, clone errors — node-verified") {
    expect(
      // deep, independent copy
      "(() => { const o = { a: [1, { b: 2 }] }; const c = structuredClone(o); c.a[1].b = 9; return o.a[1].b + ',' + c.a[1].b })()" -> "2,9",
      // cycle identity preserved
      "(() => { const o = {}; o.self = o; const c = structuredClone(o); return c.self === c })()" -> "true",
      // sparse holes preserved
      "(() => { const c = structuredClone([1,,3]); return (1 in c) + ',' + c.length })()" -> "false,3",
      // getters evaluate into data; class instances flatten to plain objects
      "JSON.stringify(structuredClone({ get x() { return 42 } }))" -> "{\"x\":42}",
      "(() => { class K { f = 1; m() {} } const c = structuredClone(new K()); return JSON.stringify(c) + ',' + (c.constructor === Object) })()" -> "{\"f\":1},true",
      // RegExp clones with lastIndex reset; Map/Set deep
      "(() => { const r = /ab/g; r.lastIndex = 1; const c = structuredClone(r); return c.source + c.flags + c.lastIndex })()" -> "abg0",
      "structuredClone(new Map([[1, 'a']])).get(1)" -> "a",
      "[...structuredClone(new Set([1, 2]))].join(',')" -> "1,2",
      "structuredClone(new Date(5)).getTime()" -> "5",
      // functions are not cloneable — the DataCloneError contract
      "(() => { try { structuredClone(() => 1); return 'no-throw' } catch (e) { return e.name } })()" -> "DataCloneError",
    )
  }

  test("labeled non-loop statements: break exits the labeled block") {
    expect(
      "(() => { let s = ''; foo: { s += 'a'; if (s) break foo; s += 'b' } s += 'c'; return s })()" -> "ac",
      "(() => { let s = ''; out: for (let i = 0; i < 3; i++) { bar: { s += i; if (i === 1) break out; if (i === 0) break bar; s += 'x' } s += '.' } return s })()" -> "0.1",
    )
  }

  test("control-flow corners: finally override, hoisting, switch") {
    expect(
      "(() => { try { return 1 } finally { return 2 } })()" -> "2",
      "(() => { try { throw new Error('x') } catch (e) { return 'c' } finally { } })()" -> "c",
      "(() => { return typeof f; function f() {} })()" -> "function", // fn declarations hoist
      "(() => { let r = ''; switch (2) { case 1: r += '1'; case 2: r += '2'; case 3: r += '3'; break; default: r += 'd' } return r })()" -> "23", // fallthrough
      "(() => { switch ('1') { case 1: return 'number'; default: return 'default' } })()" -> "default", // switch is STRICT
      "void 0" -> "undefined",
      "(1, 2)" -> "2", // comma operator
    )
  }

  test("Math corners") {
    expect(
      "Math.max()" -> "-Infinity",
      "Math.min()" -> "Infinity",
      "Math.round(2.5)" -> "3",   // half-up, not banker's
      "Math.round(-2.5)" -> "-2", // toward +Infinity on the tie
      "Math.round(NaN)" -> "NaN", // java.lang.Math.round would say 0
      "Math.trunc(-3.7)" -> "-3",
      "Math.sign(-3)" -> "-1",
      "Math.floor(-0.5)" -> "-1",
      "2 ** 10" -> "1024",
      "(-2) ** 2" -> "4",
    )
  }

  test("regex: JS semantics through the Java translation layer") {
    expect(
      // JS \s includes Unicode whitespace; Java's bare \s is ASCII-only
      "/\\s/.test('\\u00A0')" -> "true",
      "/\\S/.test('\\u00A0')" -> "false",
      "'a\\u00A0b'.split(/\\s+/).join(',')" -> "a,b",
      "/[\\s,]/.test('\\u3000')" -> "true",
      // bare $ anchors the TRUE end in JS; Java's $ accepts a trailing \n
      "/x$/.test('x\\n')" -> "false",
      "/x$/m.test('x\\ny')" -> "true",
      "/a$/.test('a')" -> "true",
      "/\\$/.test('$')" -> "true",   // escaped dollar stays literal
      "/[$]/.test('$')" -> "true",   // dollar in a class stays literal
      // Java rejects empty classes; JS [^] = anything, [] = nothing
      "/[^]/.test('\\n')" -> "true",
      "'a'.replace(/[^]/, 'z')" -> "z",
      "/a[]b/.test('ab')" -> "false",
      // literal [ inside a class (Java would open a nested class)
      "/[[]/.test('[')" -> "true",
      "/a[[\\]]b/.test('a[b')" -> "true",
      // code-point escapes
      "/\\u{48}/u.test('H')" -> "true",
      // zero-width global matches advance (no hang, JS match count)
      "'abc'.match(/(?:)/g).length" -> "4",
      "'aaa'.replace(/a*/g, '-')" -> "--", // full match, then the zero-width match at the end
    )
  }

  test("review regressions: signed escapes, radix signs, unicode digit keys, argless match") {
    // signed hex in escapes is a SyntaxError, never a sign-parsed char
    for (bad <- Seq("const s = '\\x-1'", "const s = '\\u-123'", "const s = '\\u{-1}'")) {
      assert(JsMapFn.compile(bad).isLeft, s"expected startup error for: $bad")
    }
    expect(
      "Number('0x-5')" -> "NaN",
      "Number('0b+1')" -> "NaN",
      "Number('-0x5')" -> "NaN", // sign BEFORE the prefix is NaN in JS too
      // Unicode digits are plain string keys, not array indices
      "Object.keys({'\\u0663': 1, a: 2, 1: 3}).join(',')" -> "1,٣,a",
      // argless match/search = RegExp(undefined) = empty pattern
      "'abc'.match().length" -> "1",
      "'abc'.match()[0]" -> "",
      "'abc'.search()" -> "0",
    )
    // output() serializes object keys in V8 enumeration order, matching
    // what the lens itself observes through Object.keys/JSON.stringify
    val res = run("output('r', {b: 1, 0: 2})")
    res.error shouldBe None
    res.outputs.head._2 match {
      case PoObj(fields) => fields.keys.toVector shouldBe Vector("0", "b")
      case other => fail(s"expected PoObj, got $other")
    }
  }

  test("string/number + operator precedence of coercion") {
    expect(
      "1 + 2 + '3'" -> "33",
      "'1' + 2 + 3" -> "123",
      "'5' - 3" -> "2",
      "'5' * '4'" -> "20",
      "+'6'" -> "6",
      "-'6'" -> "-6",
      "+''" -> "0",
      "+[]" -> "0",
      "+{}" -> "NaN",
    )
  }

  test("sort is stable (TimSort contract V8 ships)") {
    expect(
      "[[1,'a'],[0,'b'],[1,'c'],[0,'d']].sort((x,y)=>x[0]-y[0]).map(p=>p[1]).join('')" -> "bdac",
      "['b','a','c'].sort(() => 0).join('')" -> "bac",
      "[2,1].sort(() => NaN).join(',')" -> "2,1", // NaN comparator acts as 0
      "[1,10,2].sort((a,b)=>b-a).join(',')" -> "10,2,1",
      "[undefined,1,undefined,0].sort().join(',')" -> "0,1,,", // undefined always LAST
    )
  }

  test("surrogate pairs: length in code units, iteration in code points") {
    expect(
      "'\\u{1F600}'.length" -> "2",
      "[...'\\u{1F600}'].length" -> "1",
      "'\\u{1F600}'.codePointAt(0)" -> "128512",
      "'\\u{1F600}'.charCodeAt(0)" -> "55357",
      "String.fromCodePoint(128512).length" -> "2",
      "'\\u{1F600}' === '\\uD83D\\uDE00'" -> "true",
      "'ab\\u{1F600}'.slice(-2).codePointAt(0)" -> "128512", // slice is code-unit based
    )
  }

  test("string search/pad/trim second tier") {
    expect(
      "'abcdef'.includes('cd', 3)" -> "false",
      "'abcdef'.includes('cd', 2)" -> "true",
      "'abc'.endsWith('b', 2)" -> "true",
      "'  x  '.trimStart()" -> "x  ",
      "'  x  '.trimEnd()" -> "  x",
      "'ab'.padEnd(5, 'xy')" -> "abxyx",
      "'a-b-c'.split('-', 2).join(',')" -> "a,b",
      "'b'.concat('c', 'd')" -> "bcd",
      "'abc'.at(-4)" -> "undefined",
      "'abc'.search(/b/)" -> "1",
    )
  }

  test("Number statics: no-coercion predicates vs global coercers") {
    expect(
      "Number.isInteger(5.0)" -> "true",  // 5.0 IS the integer 5
      "Number.isInteger('5')" -> "false", // no coercion
      "Number.isNaN('x')" -> "false",     // no coercion
      "isNaN('x')" -> "true",             // global DOES coerce
      "Number.isSafeInteger(2**53)" -> "false",
      "Number.isSafeInteger(2**53 - 1)" -> "true",
      "Number.MAX_SAFE_INTEGER" -> "9007199254740991",
    )
  }

  test("float arithmetic identities") {
    expect(
      "0.1 + 0.2" -> "0.30000000000000004",
      "(0.1 + 0.2).toFixed(1)" -> "0.3",
      "1/0" -> "Infinity",
      "-1/0" -> "-Infinity",
      "0/0" -> "NaN",
      "1/-0" -> "-Infinity", // -0 exists even though '' + -0 is '0'
      "'' + -0" -> "0",
      "5 % -3" -> "2",   // JS remainder keeps the DIVIDEND sign
      "-5 % 3" -> "-2",
      "5.5 % 2" -> "1.5",
    )
  }

  test("Math second tier") {
    expect(
      "Math.hypot(3, 4)" -> "5",
      "Math.cbrt(27)" -> "3",
      "Math.log2(8)" -> "3",
      "Math.log10(1000)" -> "3",
      "Math.abs(-0)" -> "0",
      "Math.pow(2, -1)" -> "0.5",
      "Math.sign(-0)" -> "0",
    )
  }

  test("array mutators return values, not the array") {
    expect(
      "(() => { const a=[1]; return a.push(2,3) })()" -> "3",      // new length
      "(() => { const a=[1,2]; return a.pop() + ',' + a.length })()" -> "2,1",
      "(() => { const a=[1,2]; return a.shift() + ',' + a.join('') })()" -> "1,2",
      "(() => { const a=[2]; return a.unshift(1) + ',' + a.join(',') })()" -> "2,1,2",
      "[1,2,3].fill(0, 1).join(',')" -> "1,0,0",
    )
  }

  test("array second tier: flatMap, every/some, from/of, fromIndex") {
    expect(
      "[1,2,3,4].flatMap(x => [x, x*2]).length" -> "8",
      "[1,2,3].every(x => x > 0)" -> "true",
      "[1,2].some(x => x > 1)" -> "true",
      "[].every(x => false)" -> "true",   // vacuous truth
      "[].some(x => true)" -> "false",
      "Array.from('ab').join(',')" -> "a,b",
      "Array.from([1,2], x => x * 2).join(',')" -> "2,4",
      "Array.of(7).length" -> "1",
      "Array(3).length" -> "3",
      "Array(3).join(',')" -> ",,",
      "[1,2,3].indexOf(2, 2)" -> "-1",
      "[1,2,3].indexOf(2, -2)" -> "1",   // negative fromIndex counts from end
      "[1,2,1].lastIndexOf(1)" -> "2",
      "[1,2,1].lastIndexOf(1, 1)" -> "0",
      "[1,2,3].includes(1, 1)" -> "false",
      "'aXa'.lastIndexOf('a', 1)" -> "0",
      "'abab'.lastIndexOf('a', -1)" -> "0",  // STRING position clamps to 0...
      "[1,2,1].lastIndexOf(1, -1)" -> "2",   // ...ARRAY fromIndex counts from end
      "(() => { const a = [1,2]; a[-1] = 'x'; return a[-1] + ',' + a.length })()" -> "x,2",
      "[1,2,3].join()" -> "1,2,3",        // default separator is comma
      "[null, undefined, 1].join(',')" -> ",,1", // null/undefined join as ''
      "[...[10,20].entries()][1].join(',')" -> "1,20",
    )
  }

  test("Set/Map: insertion order, identity keys, SameValueZero") {
    expect(
      "new Set(['a','a','b']).size" -> "2",
      "(() => { const s = new Set([1]); return s.has(1) + ',' + s.has(2) })()" -> "true,false",
      "(() => { const s = new Set([3,1,3,2]); return [...s].join(',') })()" -> "3,1,2",
      "(() => { const m = new Map([['a',1]]); m.set('b',2); return m.get('b') + ',' + m.size })()" -> "2,2",
      "(() => { const m = new Map(); const k={}; m.set(k,1); return (m.get({}) === undefined) + ',' + m.get(k) })()" -> "true,1",
      "(() => { const m = new Map([[NaN, 'x']]); return m.get(NaN) })()" -> "x", // SameValueZero
    )
  }

  test("let is per-iteration in for loops; var is function-scoped") {
    expect(
      "(() => { const fs=[]; for (let i=0;i<3;i++) fs.push(() => i); return fs.map(f=>f()).join(',') })()" -> "0,1,2",
      "(() => { const fs=[]; for (var i=0;i<3;i++) fs.push(() => i); return fs.map(f=>f()).join(',') })()" -> "3,3,3",
      "(() => { let x=1; { let x=2; } return x })()" -> "1",
      "(() => { return y; var y })()" -> "undefined", // var hoists as undefined
    )
  }

  test("nullish coalescing and optional chaining short-circuit") {
    expect(
      "null ?? 'd'" -> "d",
      "undefined ?? 'd'" -> "d",
      "0 ?? 'd'" -> "0",       // ?? only on null/undefined
      "'' ?? 'd'" -> "",
      "0 || 'd'" -> "d",       // || on any falsy — the contrast
      "({a:{b:1}}).a?.b" -> "1",
      "({}).x?.y" -> "undefined",
      "null?.f()" -> "undefined", // call after ?. short-circuits too
      "(() => { let n = 0; const o = {}; o.x?.[n++]; return n })()" -> "0",
    )
  }

  test("destructuring: holes, defaults, rest, nested, params") {
    expect(
      "(() => { const [a,,b=5, ...r] = [1,2,undefined,4,5]; return [a,b,r.join('')].join('|') })()" -> "1|5|45",
      "(() => { const {a, c = 3, ...rest} = {a: 7, d: 1}; return [a,c,rest.d].join(',') })()" -> "7,3,1",
      "(([a, b]) => a + b)([1, 2])" -> "3",
      "(({x: {y}}) => y)({x: {y: 9}})" -> "9",
    )
  }

  test("throw/catch: non-Error values, builtin error classes, instanceof") {
    expect(
      "(() => { try { throw 42 } catch (e) { return typeof e } })()" -> "number",
      "(() => { try { null.x } catch (e) { return e instanceof TypeError } })()" -> "true",
      "(() => { try { undef_var } catch (e) { return e.name } })()" -> "ReferenceError",
      "(() => { try { JSON.parse('{bad') } catch (e) { return e.name } })()" -> "SyntaxError",
      "new Error('m').message" -> "m",
      "new TypeError('t').name" -> "TypeError",
      "[] instanceof Array" -> "true",
      "new Error('x') instanceof Error" -> "true",
    )
  }

  test("JSON.stringify: non-finite, undefined root, functions, control chars, indent") {
    expect(
      "JSON.stringify(NaN)" -> "null",
      "JSON.stringify(Infinity)" -> "null",
      "typeof JSON.stringify(undefined)" -> "undefined",
      "JSON.stringify({a: (() => 1), b: 2})" -> "{\"b\":2}", // functions dropped like undefined
      "JSON.stringify('\\u001f')" -> "\"\\u001f\"",
      "JSON.stringify({a:1}, null, 2)" -> "{\n  \"a\": 1\n}",
      "JSON.stringify([1], null, 2)" -> "[\n  1\n]",
    )
  }

  test("increment/compound assignment evaluation order") {
    expect(
      "(() => { let x = 5; return x++ + ++x })()" -> "12", // 5 + 7
      "(() => { let x = 5; return x-- - --x })()" -> "2",  // 5 - 3
      "(() => { const o = {n: 1}; o.n += 2; return o.n })()" -> "3",
      "(() => { let s = 'a'; s += 1; return s })()" -> "a1",
      "(() => { let x = 10; x **= 2; return x })()" -> "100",
      "(() => { let a = null; a ??= 7; let b = 0; b ??= 9; return '' + a + b })()" -> "70",
      "(() => { let a = 0; a ||= 5; let b = 1; b &&= 6; return '' + a + b })()" -> "56",
    )
  }

  test("for-of over entries/strings; for-in over array indices") {
    expect(
      "(() => { let t=''; for (const [k,v] of Object.entries({x:1,y:2})) t += k+v; return t })()" -> "x1y2",
      "(() => { let t=0; for (const c of 'abc') t++; return t })()" -> "3",
      "(() => { let t=''; for (const k in [7,8]) t += k; return t })()" -> "01", // index STRINGS
      "(() => { let t=''; for (const c of '\\u{1F600}x') t += '|'; return t })()" -> "||", // code points
    )
  }

  test("template literals: interpolation, nesting, escapes") {
    expect(
      "`a${1+1}b${'c'}`" -> "a2bc",
      "`${`x${2}`}`" -> "x2",
      "`line1\\nline2`.split('\\n').length" -> "2",
      "`${undefined}|${null}`" -> "undefined|null",
    )
  }

  test("regex application: global match, exec groups, backreference replace") {
    expect(
      "'a1b22c'.match(/\\d+/g).join(',')" -> "1,22",
      "'abc'.match(/x/) === null" -> "true",
      "/(\\d+)/.exec('a42')[1]" -> "42",
      "'2026-08-13'.replace(/(\\d+)-(\\d+)-(\\d+)/, '$3/$2/$1')" -> "13/08/2026",
      "'aAbB'.replace(/[a-z]/gi, '-')" -> "----",
    )
  }

  test("short-circuit operators evaluate the right number of times") {
    expect(
      "(() => { let n=0; const f=() => { n++; return true }; f() || f(); f() && f(); return n })()" -> "3",
      "(() => { let n=0; false && n++; true || n++; return n })()" -> "0",
    )
  }

  test("encodeURIComponent / decodeURIComponent") {
    expect(
      "encodeURIComponent('a b&c=d')" -> "a%20b%26c%3Dd",
      "encodeURIComponent(\"-_.!~*'()\")" -> "-_.!~*'()", // unreserved marks pass through
      "decodeURIComponent('a%20b')" -> "a b",
      "encodeURIComponent('\\u00e9')" -> "%C3%A9", // UTF-8 percent encoding
    )
  }

  test("Object.assign returns the mutated target; values follow key order") {
    expect(
      "(() => { const t={a:1}; const r=Object.assign(t, {b:2}); return (r===t) + ',' + JSON.stringify(t) })()" -> "true,{\"a\":1,\"b\":2}",
      "Object.assign({a:1}, {a:2}, {a:3}).a" -> "3", // later sources win
      "Object.values({b:1, 2:2, 1:3}).join(',')" -> "3,2,1", // integer keys first
      "Object.fromEntries([['a',1],['b',2]]).b" -> "2",
    )
  }

  test("boolean coercion: the seven falsy values and nothing else") {
    expect(
      "!!''" -> "false",
      "!!'0'" -> "true",   // non-empty string is truthy, even '0'
      "!!0" -> "false",
      "!!NaN" -> "false",
      "!![]" -> "true",    // objects always truthy
      "!!{}" -> "true",
      "Boolean(' ')" -> "true",
    )
  }

  test("in operator: indices, length, inherited-free objects") {
    expect(
      "0 in [5]" -> "true",
      "1 in [5]" -> "false",
      "'length' in []" -> "true",
      "'x' in {x: 0}" -> "true",
      "(() => { try { return 'a' in 'abc' } catch (e) { return e.name } })()" -> "TypeError", // in needs an object
    )
  }

  test("reduceRight and NaN propagation in min/max") {
    expect(
      "['a','b','c'].reduceRight((a,b) => a + b)" -> "cba",
      "[1,2,3].reduceRight((a,b) => a + b, 10)" -> "16",
      "Math.max(1, NaN)" -> "NaN",
      "Math.min(NaN, 1)" -> "NaN",
    )
  }

  test("optional call and match result anatomy") {
    expect(
      "({f: () => 3}).f?.()" -> "3",
      "({}).f?.()" -> "undefined",
      "'a1'.match(/(\\d)/)[1]" -> "1",
      "'xa'.match(/a/).index" -> "1",
      "'xyz'.match(/y/).input" -> "xyz",
    )
  }

  test("ternary right-associativity and typeof chains") {
    expect(
      "true ? 1 : true ? 2 : 3" -> "1",
      "false ? 1 : true ? 2 : 3" -> "2",
      "false ? 1 : false ? 2 : 3" -> "3",
      "typeof typeof 1" -> "string",
      "`${[1,2]}`" -> "1,2",
      "`${({})}`" -> "[object Object]",
    )
  }

  test("replacement patterns: $$, $`, $' and unknown $x") {
    expect(
      "'a'.replace(/a/, '$$')" -> "$",
      "'abc'.replace(/b/, '$`')" -> "aac",  // $` = text BEFORE the match
      "'abc'.replace(/b/, \"$'\")" -> "acc", // $' = text AFTER the match
      "'a'.replace(/a/, '$x')" -> "$x",      // unknown pattern stays literal
    )
  }

  test("global isFinite coerces; Number.isFinite does not") {
    expect(
      "isFinite('5')" -> "true",
      "Number.isFinite('5')" -> "false",
      "isFinite(Infinity)" -> "false",
      "Number.isFinite(2**53)" -> "true",
    )
  }

  // ---- round-7 V8-validated additions (every expectation below was
  //      produced by running the expression in node v20 / V8) ----

  test("sparse arrays: holes skip in enumeration, read as undefined") {
    expect(
      "[1,,3].map(x => x * 2).join(',')" -> "2,,6", // hole KEPT, callback skipped
      "[1,,3].filter(() => true).length" -> "2",
      "(()=>{ let n=0; [1,,3].forEach(()=>n++); return n })()" -> "2",
      "[1,,3].indexOf(undefined)" -> "-1",          // holes never match
      "[1,,3].includes(undefined)" -> "true",       // includes treats as undefined
      "Object.keys([1,,3]).join(',')" -> "0,2",
      "[1,,3].find(x => x === undefined) === undefined" -> "true", // find VISITS holes
      "[,1].reduce((a,b)=>a+b)" -> "1",             // no-seed acc = first PRESENT
      "[1,,3].flat().length" -> "2",                // flat drops holes
      "[...[1,,3]].length" -> "3",                  // iteration does NOT skip
      "[...[1,,3]][1] === undefined" -> "true",
      "1 in [1,,3]" -> "false",                     // a hole is an absent property
      "0 in [1,,3]" -> "true",
      "[1,,3].join('-')" -> "1--3",
      "JSON.stringify([1,,3])" -> "[1,null,3]",
      "[,,].length" -> "2",                         // trailing comma is not a slot
      "[3,,1,undefined,2].sort().join(',')" -> "1,2,3,,", // undefineds, THEN holes
      "(()=>{ const [x,y]=[1,,3]; return ''+y })()" -> "undefined",
      // skipped holes never compact the callback's index argument
      "[1,,3].reduce((a,v,i)=>a+':'+v+'@'+i, 's')" -> "s:1@0:3@2",
      "[1,,3].reduceRight((a,v,i)=>a+':'+v+'@'+i, 's')" -> "s:3@2:1@0",
    )
  }

  test("holes from delete / Array(n) / length extension / index gaps") {
    expect(
      "(()=>{ const a=[1,2,3]; delete a[1]; return JSON.stringify([a.length, 1 in a, a.indexOf(undefined)]) })()" -> "[3,false,-1]",
      "Array(3).map(x=>1).length" -> "3",           // all-holes: map keeps them
      "Array(3).filter(()=>true).length" -> "0",
      "Array(3).fill(7).join(',')" -> "7,7,7",      // fill densifies
      "JSON.stringify(Array(2))" -> "[null,null]",
      "(()=>{ const a=[1]; a[3]=9; return Object.keys(a).join(',') })()" -> "0,3",
      "(()=>{ const a=[1]; a.length=3; return a.filter(()=>true).length })()" -> "1",
      "Array.from([1,,3]).filter(()=>true).length" -> "3", // from() densifies
      "Object.hasOwn([1,,3], 1)" -> "false",
      "[1,,3].slice(1).filter(()=>true).length" -> "1",    // slice preserves holes
    )
  }

  test("toExponential: unpadded exponent, half-up on the binary value") {
    expect(
      "(8.765).toExponential(2)" -> "8.77e+0",  // binary 8.765000…5 rounds UP
      "(0).toExponential()" -> "0e+0",
      "(123456).toExponential(1)" -> "1.2e+5",
      "(123456).toExponential()" -> "1.23456e+5",
      "(100).toExponential()" -> "1e+2",
      "(1).toExponential(2)" -> "1.00e+0",
      "(99.9).toExponential(1)" -> "1.0e+2",    // carry into the exponent
      "(0.000001234).toExponential()" -> "1.234e-6",
      "(-8.5).toExponential(0)" -> "-9e+0",
    )
  }

  test("findLast / findLastIndex / copyWithin") {
    expect(
      "[1,2,3].findLast(x => x < 3)" -> "2",
      "[1,2,3].findLastIndex(x => x < 3)" -> "1",
      "[1,2,3].findLast(x => x > 9) === undefined" -> "true",
      "[1,2,3,4,5].copyWithin(0, 3).join(',')" -> "4,5,3,4,5",
      "[1,2,3,4,5].copyWithin(1, 2, 4).join(',')" -> "1,3,4,4,5",
    )
  }

  test("named capture groups: .groups, $<name> replacement, callback arg") {
    expect(
      "'abc'.match(/(?<first>a)/).groups.first" -> "a",
      "'abc'.match(/(?<first>a)/).groups.missing === undefined" -> "true",
      "'' + /(?<d>\\d+)/.exec('id 42').groups.d" -> "42",
      "'abc'.replace(/(?<x>b)/, '[$<x>]')" -> "a[b]c",
      "'abc'.replace(/(?<x>b)/, '[$<nope>]')" -> "a[]c",   // unknown name → ''
      "'abc'.replace(/b/, '[$<x>]')" -> "a[$<x>]c",        // no named groups → literal
      "'ab'.replace(/(?<c>a)/, (m, g1, i, s, groups) => groups.c + '!')" -> "a!b",
      "'a1b2'.matchAll ? [...'a1b2'.matchAll(/\\d/g)].length : 'missing'" -> "2",
      "[...'xaxa'.matchAll(/a/g)].map(m => m.index).join(',')" -> "1,3",
    )
  }

  test("Object.is, constructor identity, fractional radix toString") {
    expect(
      "Object.is(NaN, NaN)" -> "true",
      "Object.is(0, -0)" -> "false",
      "Object.is('a', 'a')" -> "true",
      "(()=>{ try { null.x } catch (e) { return e.constructor === TypeError } })()" -> "true",
      "({}).constructor === Object" -> "true",
      "(0.5).toString(2)" -> "0.1",
      "(0.25).toString(16)" -> "0.4",
      "(10.5).toString(16)" -> "a.8",
      "(-2.5).toString(2)" -> "-10.1",
    )
  }

  test("wave-3 probe pins: coercion, JSON, number layout, regex anchors") {
    expect(
      // ToPrimitive / ToNumber chains
      "+[]" -> "0",
      "+[7]" -> "7",
      "'' + +[1,2]" -> "NaN",
      "'' + +{}" -> "NaN",
      "1 + null" -> "1",
      "'' + (1 + undefined)" -> "NaN",
      "'' + [null, undefined]" -> ",",
      "[null] == 0" -> "true",
      "[] == ![]" -> "true",
      "null >= 0" -> "true", // relational coerces null→0...
      "null > 0" -> "false", // ...but == does not
      // JSON corners
      "JSON.stringify({a: undefined, b: 1})" -> "{\"b\":1}",
      "JSON.stringify([undefined])" -> "[null]",
      "JSON.stringify(1e21)" -> "1e+21",
      "JSON.stringify(-0)" -> "0",
      "'' + JSON.stringify(NaN)" -> "null",
      // number → string thresholds (ES 6.1.6.1.20)
      "String(1e21)" -> "1e+21",
      "String(1e-7)" -> "1e-7",
      "String(0.000001)" -> "0.000001",
      "String(-0)" -> "0",
      "(0.1 + 0.2).toString()" -> "0.30000000000000004",
      "(4.35).toFixed(1)" -> "4.3", // binary 4.349999… — NOT school rounding
      // regex anchors + classes through the java.util.regex translation
      "/a$/.test('a\\n')" -> "false",   // JS $ is true-end without m
      "/a$/m.test('a\\nb')" -> "true",
      "/[^]/.test('\\n')" -> "true",
      "'aaa'.replace(/(?=a)/g, '-')" -> "-a-a-a",
      "/\\s/.test('\\u00a0')" -> "true",  // JS \\s includes NBSP, Java's doesn't
      "/\\d/.test('٣')" -> "false",       // JS \\d is ASCII-only
      "'' + (/(a)|(b)/.exec('b')[1] === undefined)" -> "true",
      // scoping
      "(()=>{ var x = 1; { var x = 2; } return x })()" -> "2",
      "(()=>{ let x = 1; { let x = 2; } return x })()" -> "1",
    )
  }

  test("ToNumber trims the JS whitespace set (NBSP et al), not Java's") {
    expect(
      "Number('\\u00a0')" -> "0",          // NBSP is StrWhiteSpaceChar
      "Number('\\u00a0 42 \\u00a0')" -> "42",
      "Number('\\ufeff')" -> "0",          // ZWNBSP/BOM too
      "Number('\\u2028')" -> "0",          // LineTerminator
      "isNaN('\\u00a0')" -> "false",
      "'\\u00a0' >= 0" -> "true",
      "parseInt('\\u00a07')" -> "7",
      "'' + parseFloat('\\u00a0')" -> "NaN", // parseFloat: empty after trim → NaN
      "Math.floor('\\u00a0')" -> "0",
    )
  }

  test("regex: JS-only quantifier errors, empty-input m-flag ^, split undefineds") {
    // java.util.regex ACCEPTS all of these with different semantics
    // (possessive +, quantified anchors, stacked quantifiers) — they
    // must throw like V8, never silently run Java semantics
    Seq("'aa'.match(/a++/)", "'a'.match(/$*/)", "'ab'.match(/\\b{2}/)",
        "'a'.match(/a?{2}/)", "'a'.match(/a*+/)").foreach { expr =>
      val res = run(s"output('r', $expr)")
      assert(res.error.exists(_.errType == "SyntaxError"), s"$expr → ${res.error}")
    }
    expect(
      "/a*?/.test('')" -> "true",           // lazy ? after * stays legal
      "'aab'.match(/a{1,2}?/)[0]" -> "a",   // lazy {n,m}? too
      "''.replace(/^x*/gm, '<$&>')" -> "<>", // Java m-flag ^ misses empty input
      "'a\\nb'.replace(/^/gm, '>')" -> ">a\n>b",
      // split: unmatched capture is undefined, never ''
      "JSON.stringify('aA bB'.split(/(a)*/))" -> "[\"\",\"a\",\"A\",null,\" \",null,\"b\",null,\"B\"]",
      "JSON.stringify('ab'.split(/(?!(x))b/))" -> "[\"a\",null,\"\"]",
    )
  }

  test("negative-lookaround captures never participate, like V8") {
    expect(
      "JSON.stringify('ab'.match(/(?!(x))(a)(b)/))" -> "[\"ab\",null,\"a\",\"b\"]",
      "JSON.stringify('a'.match(/(?!(?!(a)))a/))" -> "[\"a\",null]", // any nesting depth
      "JSON.stringify('ab'.match(/(?=(a))(a)b/))" -> "[\"ab\",\"a\",\"a\"]", // positive DOES
      "'ab'.replace(/(?!(x))a/, '[$1]')" -> "[]b",
      "'' + 'ab'.match(/(?!(?<no>x))(?<yes>a)/).groups.no" -> "undefined",
      "'ab'.match(/(?!(?<no>x))(?<yes>a)/).groups.yes" -> "a",
    )
  }

  test("toISOString always prints milliseconds (ES 21.4.4.36)") {
    expect(
      "new Date(0).toISOString()" -> "1970-01-01T00:00:00.000Z", // never bare :00Z
      "new Date(1700000000000).toISOString()" -> "2023-11-14T22:13:20.000Z",
      "JSON.stringify({d: new Date(0)})" -> "{\"d\":\"1970-01-01T00:00:00.000Z\"}",
      "new Date(-1).toISOString()" -> "1969-12-31T23:59:59.999Z",
      "new Date(253402300799999).toISOString()" -> "9999-12-31T23:59:59.999Z",
    )
  }

  test("lexical redeclaration is a startup error (ES early error 13.2.1)") {
    // silent redeclare would quietly change which binding later code
    // reads — V8 rejects all of these at parse
    Seq(
      "let a = 1; let a = 2",
      "const a = 1; const { a } = {}",
      "let a = 1; var a = 2",
      "let f = 1; function f() {}",
      "function g(a) { let a = 2 }",
      "try { } catch (e) { let e = 1 }",
      "switch (1) { case 0: let x = 1; break; case 1: let x = 2 }",
    ).foreach(code => assert(JsMapFn.compile(code).isLeft, s"must reject: $code"))
    expect(
      // still legal, like V8: var+var, sloppy duplicate functions,
      // shadowing in a NESTED scope, sibling for-loop heads
      "(()=>{ var a = 1; var a = 2; return a })()" -> "2",
      "(()=>{ let a = 1; { let a = 2; } return a })()" -> "1",
      "(()=>{ let s = ''; for (let i = 0; i < 2; i++) s += i; for (let i = 0; i < 2; i++) s += i; return s })()" -> "0101",
      "(()=>{ function f() { return 1 }; function f() { return 2 }; return f() })()" -> "2",
    )
  }

  test("unary base of ** is a startup error, exactly V8's parse rule") {
    // -(2**2) or (-2)**2 would both be silently-wrong readings
    Seq("const x = -2 ** 2", "const x = !1 ** 2", "const x = typeof 1 ** 2")
      .foreach(code => assert(JsMapFn.compile(code).isLeft, s"must reject: $code"))
    expect(
      "(-2) ** 2" -> "4",      // parenthesized base is legal
      "2 ** -2" -> "0.25",     // unary on the EXPONENT is legal
      "(()=>{ let x = 2; return --x ** 2 })()" -> "1", // UpdateExpression base is legal
    )
  }

  test("out-of-subset constructs are LOUD — startup or runtime error, never silent") {
    // parse-time rejections (classes landed in r8, static blocks and
    // private members in r12, generators AND a Proxy subset in r13,
    // async/await + Promises AND async generators + `for await` in
    // r14, async-generator `yield*` in r15; the residual out-of-subset
    // corners — `for await` outside async bodies, `with`, proxy
    // apply/construct traps — stay loud):
    Seq("for await (const x of []) {}",
        "function f(){ for await (const x of []) {} }",
        "with({a:1}) output('r', a)").foreach { code =>
      assert(JsMapFn.compile(code).isLeft, s"must reject at startup: $code")
    }
    // proxy apply traps: runtime boundary (see JsProxySpec for the
    // supported trap surface)
    locally {
      val res = run("const p = new Proxy(function(){}, { apply(){ return 1 } }); p()")
      assert(res.error.exists(_.errType == "TypeError"), s"apply trap → ${res.error}")
    }
    // runtime rejections (dynamic code loading is blocked for the
    // sandbox — both identifiers are simply absent):
    Seq("eval('1+1')", "new Function('return 1')()").foreach { expr =>
      val res = run(s"output('r', $expr)")
      assert(res.error.exists(_.errType == "ReferenceError"), s"$expr → ${res.error}")
    }
  }

  test("trim family strips the JS whitespace set, not Java's (r10 fuzz find)") {
    // V8: trim removes WhiteSpace ∪ LineTerminator — NBSP, ZWNBSP, Zs,
    // LS, PS included. Java String.trim stops at U+0020 and regex \s
    // is [ \t\n\x0B\f\r]; both leave ' ' behind.
    expect(
      "'\\u00a0'.trim()" -> "",
      "'\\ufeff x \\u2028'.trim()" -> "x",
      "'\\u00a0a\\u00a0'.trimStart()" -> "a ",
      "'\\u00a0a\\u00a0'.trimEnd()" -> " a",
      "'\\u3000\\u2000tight\\u205f'.trim()" -> "tight",
    )
  }

  test("transcendentals match V8 bit-for-bit via StrictMath (r10 fuzz find)") {
    // java.lang.Math.pow(2, -2.5) is 1 ulp off V8's fdlibm-derived
    // pow; StrictMath (JDK fdlibm) reproduces V8 exactly here and on
    // every exp/log/log10/sin/cos/tan sample of a 20k-point sweep.
    expect(
      "2 ** -2.5" -> "0.17677669529663687",
      "Math.pow(2, -2.5)" -> "0.17677669529663687",
      "Math.exp(0.1)" -> "1.1051709180756477",
      "Math.log(7.389056098930651)" -> "2",
      "Math.sin(1e10)" -> "-0.4875060250875107",
      "Math.tan(100)" -> "-0.5872139151569291",
    )
  }

  test("cbrt/log2 match V8 via the repo's fdlibm ports (r10)") {
    // V8's Math.cbrt/log2 are its FreeBSD s_cbrt/e_log2 ports; the JDK
    // ships neither (StrictMath.cbrt is 1 ulp off on ~8-10% of inputs,
    // log(x)/LN2 on ~31%). graft.js.Ieee754 transliterates the public
    // algorithms — 0 bit-mismatches on a 60k-sample node sweep incl.
    // subnormals/near-1/specials (MathPortProbe).
    expect(
      "Math.cbrt(-8)" -> "-2",
      "Math.cbrt(27)" -> "3",
      "Math.cbrt(3)" -> "1.4422495703074083",
      "Math.cbrt(1e-310)" -> "4.641588833612774e-104", // subnormal path
      "Math.log2(3)" -> "1.584962500721156",
      "Math.log2(5)" -> "2.321928094887362",
      "Math.log2(0.7)" -> "-0.5145731728297583",
      "Math.log2(1e300)" -> "996.5784284662087",
      "Math.log2(0)" -> "-Infinity",
      "Math.log2(-1)" -> "NaN",
    )
  }

  test("nested user conversion methods run through array join (ADVICE r13)") {
    // V8's Array.prototype.toString → join runs ToString on EACH
    // element, so a user toString/valueOf on an element (or one level
    // deeper, inside a nested array) participates in `+`/template
    // coercion of the array itself.
    expect(
      "'' + [{toString(){return 'X'}}]" -> "X",
      "'' + [{valueOf(){return 7}}]" -> "[object Object]", // string hint: toString wins
      "`${[[{toString(){return 'Y'}}]]}`" -> "Y",
      "'' + [1, {toString(){return 'm'}}, 3]" -> "1,m,3",
      "[{toString(){return '2'}}] == 2" -> "true",
      "'' + [null, undefined, [,]]" -> ",,", // holes/null/undefined join empty at every level
      "[1,,3] + ''" -> "1,,3",
      // NUMERIC coercion routes the same join (review find r14: these
      // were inconsistent with the == / relational paths)
      "[{toString(){return '2'}}] * 1" -> "2",
      "[true] - 0" -> "NaN", // "true" join, never an element shortcut
      "[2] - 0" -> "2",
      "-[[3]]" -> "-3",
      // cyclic arrays join the re-entry as empty (V8's JoinStack) —
      // catchable-error contract, never a JVM stack overflow
      "(() => { const a = []; a.push(a, 1); return '' + a })()" -> ",1",
      "(() => { const b = []; b.push(0, [b, 2]); return '' + b })()" -> "0,,2",
      "(() => { const a = []; a.push({toString(){ return '' + a }}); return '<' + a + '>' })()" -> "<>",
    )
  }

  test("Reflect.ownKeys on arrays excludes holes; String(symbol) descriptive (ADVICE r13)") {
    expect(
      "JSON.stringify(Reflect.ownKeys([1,,3]))" -> """["0","2","length"]""",
      "JSON.stringify(Reflect.ownKeys([]))" -> """["length"]""",
      "String(Symbol.iterator)" -> "Symbol(Symbol.iterator)",
    )
    // implicit ToString of a symbol still throws (only EXPLICIT String() converts)
    val res = run("output('r', '' + Symbol.iterator)")
    assert(res.error.exists(_.errType == "TypeError"), s"got ${res.error}")
  }

  test("unique Symbol(): creation, identity, description, coercion (r15; V8-verified)") {
    expect(
      "typeof Symbol()" -> "symbol",
      "String(Symbol('a') === Symbol('a'))" -> "false",
      "(() => { const s = Symbol('a'); return String(s === s) })()" -> "true",
      "String(Symbol().description)" -> "undefined",
      "String(Symbol('').description)" -> "",
      "Symbol('tag').toString()" -> "Symbol(tag)",
      "String(Symbol())" -> "Symbol()",
      "String(Symbol(42).description)" -> "42",
      // a symbol ARGUMENT to Symbol() throws (ToString step, V8)
      "(() => { try { Symbol(Symbol('x')); return 'NO' } catch (e) { return e.name } })()" -> "TypeError",
      "(() => { try { new Symbol(); return 'NO' } catch (e) { return e.name } })()" -> "TypeError",
      "(() => { try { return Symbol() + 1 } catch (e) { return 'T' + e.name } })()" -> "TTypeError",
    )
  }

  test("unique symbols as property keys: hiding, surfaces, carry (r15; V8-verified)") {
    expect(
      // enumeration HIDING: keys/values/entries/for-in/JSON never see them
      """(() => { const s = Symbol('h'); const o = { a: 1, [s]: 'x' };
        | let fi = ''; for (const k in o) fi += k;
        | return JSON.stringify(o) + '|' + Object.keys(o).join(',') + '|' + fi })()""".stripMargin
        -> """{"a":1}|a|a""",
      // surfaces that DO see them, with canonical identity
      """(() => { const s = Symbol('v'); const o = { [s]: 1, k: 2 };
        | return Object.getOwnPropertySymbols(o).length + '|' +
        |   String(Object.getOwnPropertySymbols(o)[0] === s) + '|' +
        |   Reflect.ownKeys(o).length + '|' + Object.hasOwn(o, s) })()""".stripMargin
        -> "1|true|2|true",
      // spread/assign/fromEntries carry symbol props
      """(() => { const s = Symbol('c'); const src = { [s]: 'v' };
        | const a = { ...src }; const b = Object.assign({}, src);
        | const c = Object.fromEntries([[s, 'fe']]);
        | return a[s] + '|' + b[s] + '|' + c[s] })()""".stripMargin
        -> "v|v|fe",
      // delete / in / two same-description symbols never collide
      """(() => { const s1 = Symbol('d'), s2 = Symbol('d');
        | const o = { [s1]: 1, [s2]: 2 };
        | delete o[s2];
        | return o[s1] + '|' + (s1 in o) + '|' + (s2 in o) })()""".stripMargin
        -> "1|true|false",
      // accessors (object literal + class, incl. static) and Map/Set keys
      """(() => { const s = Symbol('a');
        | const o = { get [s](){ return 'g' + (this.n || 0) }, set [s](v){ this.n = v } };
        | o[s] = 7;
        | class K { static [s](){ return 'S' } get [s](){ return 'ig' } }
        | const m = new Map([[s, 1]]); m.set(Symbol('a'), 2);
        | return o[s] + '|' + K[s]() + '|' + new K()[s] + '|' + m.size + '|' + m.get(s) })()""".stripMargin
        -> "g7|S|ig|2|1",
    )
  }

  test("computed keys in object destructuring patterns (r15; V8-verified)") {
    expect(
      "(() => { const { ['k']: v } = { k: 'plain' }; return v })()" -> "plain",
      "(() => { const key = 'a' + 'b'; const { [key]: v = 'dflt' } = { ab: 7 }; return v })()" -> "7",
      "(() => { const { ['missing']: v = 'dflt' } = {}; return v })()" -> "dflt",
      // symbol keys bind AND exclude their slot from rest (spec
      // CopyDataProperties excludedItems)
      """(() => { const s = Symbol('x'); const { [s]: v, ...r } = { [s]: 1, a: 2 };
        | return v + '|' + JSON.stringify(r) + '|' + Object.getOwnPropertySymbols(r).length })()""".stripMargin
        -> """1|{"a":2}|0""",
      // number keys are ToString property names
      "(() => { const { 0: first, 1: second } = ['A', 'B']; return first + second })()" -> "AB",
      // key expressions evaluate in entry order, interleaved with reads
      """(() => { const log = []; const o = { get a(){ log.push('ga'); return 1 } };
        | const { [ (log.push('k1'), 'a') ]: x, [ (log.push('k2'), 'b') ]: y } = o;
        | return log.join(',') + '|' + x + '|' + String(y) })()""".stripMargin
        -> "k1,ga,k2|1|undefined",
      // nested patterns, params and for-of targets
      "(() => { const { ['nested']: { deep } } = { nested: { deep: 'D' } }; return deep })()" -> "D",
      "(() => { function f({ ['p']: q }) { return q } return f({ p: 'param' }) })()" -> "param",
      "(() => { let out = ''; for (const { ['v']: x } of [{ v: 1 }, { v: 2 }]) out += x; return out })()" -> "12",
    )
  }

  test("Symbol.for registry: key identity, keyFor round-trip, boundaries (r15; V8-verified)") {
    expect(
      "String(Symbol.for('a') === Symbol.for('a'))" -> "true",
      "String(Symbol.for('a') === Symbol('a'))" -> "false",
      "String(Symbol.keyFor(Symbol.for('reg')))" -> "reg",
      "String(Symbol.keyFor(Symbol('unreg')))" -> "undefined",
      "String(Symbol.keyFor(Symbol.iterator))" -> "undefined",
      "String(Symbol.for(42).description)" -> "42",
      "(() => { const s = Symbol.for('k'); const o = { [s]: 'v' }; return o[Symbol.for('k')] })()" -> "v",
      "(() => { try { Symbol.for(Symbol('x')); return 'NO' } catch (e) { return e.name } })()" -> "TypeError",
      "(() => { try { Symbol.keyFor('str'); return 'NO' } catch (e) { return e.name } })()" -> "TypeError",
    )
  }

  test("CopyDataProperties evaluates symbol-keyed GETTERS on the source (ADVICE r15; V8-verified)") {
    expect(
      // spread: the getter runs ONCE at copy time; the copy holds a
      // plain value, so re-reads never re-invoke it
      """(() => { const s = Symbol('k'); let n = 0;
        | const src = { get [s]() { n++; return n * 10 } };
        | const c = { ...src };
        | return [c[s], c[s], n].join(',') })()""".stripMargin -> "10,10,1",
      // destructuring rest is the same CopyDataProperties step
      """(() => { const s = Symbol('k'); let n = 0;
        | const src = { a: 1, get [s]() { n++; return 7 } };
        | const { a, ...rest } = src;
        | return [rest[s], rest[s], n].join(',') })()""".stripMargin -> "7,7,1",
      // the getter's receiver is the SOURCE, never the copy
      """(() => { const s = Symbol('k');
        | const src = { v: 5, get [s]() { return this.v } };
        | const c = { ...src, v: 99 };
        | return c[s] })()""".stripMargin -> "5",
      // Object.assign: source symbol getter evaluates; a TARGET symbol
      // SETTER receives the value through [[Set]]; the target keeps its
      // accessor, so a read afterwards is getter-less undefined
      """(() => { const s = Symbol('k');
        | const src = { get [s]() { return 7 } };
        | const seen = [];
        | const tgt = { set [s](v) { seen.push(v) } };
        | Object.assign(tgt, src);
        | return [seen.join('|'), String(tgt[s])].join(',') })()""".stripMargin
        -> "7,undefined",
    )
  }

  test("Object.getOwnPropertySymbols applies ToObject to primitives (ADVICE r15; V8-verified)") {
    expect(
      "Object.getOwnPropertySymbols('xy').length" -> "0",
      "Object.getOwnPropertySymbols(42).length" -> "0",
      "Object.getOwnPropertySymbols(true).length" -> "0",
      "(() => { try { Object.getOwnPropertySymbols(null); return 'NO' } catch (e) { return e.name } })()" -> "TypeError",
      "(() => { try { Object.getOwnPropertySymbols(undefined); return 'NO' } catch (e) { return e.name } })()" -> "TypeError",
    )
  }

  test("detached-method `this`: LOUD TypeError, not sloppy-mode globalThis") {
    // V8 in sloppy mode silently binds `this` to globalThis, so
    // `const f = o.m; f()` reads this.x as undefined. Binding the
    // sandbox's global object would let lens code mutate shared global
    // state through `this.x = …`; the engine keeps `this` undefined and
    // THROWS on the read — a deliberate, documented, loud divergence
    // (the same policy as Math.random/Date: never silent).
    val res = run("const o = { x: 5, m() { return this.x } }; const f = o.m; output('r', f())")
    assert(res.error.exists(_.errType == "TypeError"), s"got ${res.error}")
  }}
