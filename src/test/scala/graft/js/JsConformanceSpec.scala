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
}
