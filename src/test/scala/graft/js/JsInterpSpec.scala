package graft.js

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.core._
import graft.lens._

/** Semantics battery for the JS-subset interpreter, driven through the
  * lens surface ([[JsMapFn]]) the way real code reaches it. Each snippet
  * is a map body; assertions read the outputs/logs/errors of one call. */
class JsInterpSpec extends AnyFunSuite with Matchers {

  private def run(code: String, data: PoValue = PoObj.empty): MapResult = {
    val fn = JsMapFn.compile(code) match {
      case Right(f) => f
      case Left(err) => fail(s"startup error: ${err.errType}: ${err.message}")
    }
    MapRunner.run(fn, MapPath("/datasets/author:name/records/recordID",
      "datasets", "author", "name", "recordID"), data)
  }

  /** run `expr`, output its value under id "r", return the PoValue */
  private def evalExpr(expr: String, data: PoValue = PoObj.empty): PoValue = {
    val res = run(s"output('r', ($expr))", data)
    res.error.foreach(e => fail(s"unexpected error: ${e.errType}: ${e.message}"))
    res.outputs.headOption.map(_._2).getOrElse(fail("no output"))
  }

  // ---------------- literals, arithmetic, coercion ----------------

  test("number formatting matches JS, not Java") {
    evalExpr("1") shouldBe PoInt(1)
    evalExpr("'' + 1") shouldBe PoStr("1")           // not "1.0"
    evalExpr("'' + 1.5") shouldBe PoStr("1.5")
    evalExpr("'' + 0.1") shouldBe PoStr("0.1")
    evalExpr("'' + 1e21") shouldBe PoStr("1e+21")
    evalExpr("'' + 1e-7") shouldBe PoStr("1e-7")
    evalExpr("'' + 123456789012345680000") shouldBe PoStr("123456789012345680000")
    evalExpr("'' + (0.1 + 0.2)") shouldBe PoStr("0.30000000000000004")
    evalExpr("'' + (-0)") shouldBe PoStr("0")
    evalExpr("'' + (1/0)") shouldBe PoStr("Infinity")
    evalExpr("'' + (0/0)") shouldBe PoStr("NaN")
  }

  test("integral doubles bridge to PoInt, fractional to PoNum") {
    evalExpr("2 + 3") shouldBe PoInt(5)
    evalExpr("1 / 2") shouldBe PoNum(0.5)
    evalExpr("9007199254740991") shouldBe PoInt(9007199254740991L)
  }

  test("arithmetic + string coercion follow the spec") {
    evalExpr("1 + '2'") shouldBe PoStr("12")
    evalExpr("'3' * '4'") shouldBe PoInt(12)
    evalExpr("'5' - 2") shouldBe PoInt(3)
    evalExpr("[] + 1") shouldBe PoStr("1")
    evalExpr("null + 1") shouldBe PoInt(1)
    evalExpr("undefined + 1", PoObj.empty) match {
      case PoNum(d) => assert(d.isNaN)
      case other => fail(s"expected NaN, got $other")
    }
    evalExpr("true + true") shouldBe PoInt(2)
    evalExpr("10 % 3") shouldBe PoInt(1)
    evalExpr("-10 % 3") shouldBe PoInt(-1) // JS sign-of-dividend, same as Scala
    evalExpr("2 ** 10") shouldBe PoInt(1024)
  }

  test("equality: loose vs strict") {
    evalExpr("1 == '1'") shouldBe PoBool(true)
    evalExpr("1 === '1'") shouldBe PoBool(false)
    evalExpr("null == undefined") shouldBe PoBool(true)
    evalExpr("null === undefined") shouldBe PoBool(false)
    evalExpr("null == 0") shouldBe PoBool(false)
    evalExpr("NaN === NaN") shouldBe PoBool(false)
    evalExpr("'' == 0") shouldBe PoBool(true)
    evalExpr("[1] == 1") shouldBe PoBool(true)
    evalExpr("({}) === ({})") shouldBe PoBool(false)
    evalExpr("(function(){ const a = {}; const b = a; return a === b })()") shouldBe PoBool(true)
  }

  test("bitwise ops use int32 semantics") {
    evalExpr("5 & 3") shouldBe PoInt(1)
    evalExpr("5 | 3") shouldBe PoInt(7)
    evalExpr("5 ^ 3") shouldBe PoInt(6)
    evalExpr("~5") shouldBe PoInt(-6)
    evalExpr("1 << 31") shouldBe PoInt(-2147483648L)
    evalExpr("-1 >>> 0") shouldBe PoInt(4294967295L)
    evalExpr("-8 >> 1") shouldBe PoInt(-4)
  }

  test("truthiness and logical operators return operands") {
    evalExpr("'' || 'fallback'") shouldBe PoStr("fallback")
    evalExpr("'x' || 'fallback'") shouldBe PoStr("x")
    evalExpr("0 && 'never'") shouldBe PoInt(0)
    evalExpr("null ?? 'dflt'") shouldBe PoStr("dflt")
    evalExpr("0 ?? 'dflt'") shouldBe PoInt(0)
    evalExpr("!0") shouldBe PoBool(true)
    evalExpr("typeof undefinedVariable") shouldBe PoStr("undefined")
    evalExpr("typeof 'x'") shouldBe PoStr("string")
    evalExpr("typeof null") shouldBe PoStr("object")
    evalExpr("typeof (() => 1)") shouldBe PoStr("function")
  }

  // ---------------- statements, control flow, closures ----------------

  test("var hoisting, let block scoping, const protection") {
    evalExpr("(function(){ x = 5; var x; return x })()") shouldBe PoInt(5)
    val r = run("let a = 1; { let a = 2; } output('r', a)")
    r.outputs.head._2 shouldBe PoInt(1)
    val err = run("const c = 1; c = 2")
    err.error.get.errType shouldBe "TypeError"
  }

  test("closures capture by reference; counters work") {
    evalExpr(
      """(function(){
        |  function counter() { let n = 0; return () => { n += 1; return n } }
        |  const c = counter(); c(); c();
        |  return c()
        |})()""".stripMargin) shouldBe PoInt(3)
  }

  test("for / while / do-while / break / continue / labels") {
    evalExpr("(function(){ let s = 0; for (let i = 0; i < 5; i++) s += i; return s })()") shouldBe PoInt(10)
    evalExpr("(function(){ let s = 0, i = 0; while (i < 4) { i++; if (i === 2) continue; s += i } return s })()") shouldBe PoInt(8)
    evalExpr("(function(){ let i = 0; do { i++ } while (i < 3); return i })()") shouldBe PoInt(3)
    evalExpr("(function(){ let s = 0; for (let i = 0; i < 10; i++) { if (i === 3) break; s += i } return s })()") shouldBe PoInt(3)
    evalExpr(
      """(function(){
        |  let hits = 0
        |  outer: for (let i = 0; i < 3; i++) {
        |    for (let j = 0; j < 3; j++) {
        |      if (j === 1) continue outer
        |      hits += 1
        |    }
        |  }
        |  return hits
        |})()""".stripMargin) shouldBe PoInt(3)
  }

  test("for-of over arrays, strings, sets, maps; for-in over object keys") {
    evalExpr("(function(){ let s = 0; for (const x of [1,2,3]) s += x; return s })()") shouldBe PoInt(6)
    evalExpr("(function(){ let s = ''; for (const c of 'abc') s = c + s; return s })()") shouldBe PoStr("cba")
    evalExpr("(function(){ let s = 0; for (const x of new Set([1,2,2,3])) s += x; return s })()") shouldBe PoInt(6)
    evalExpr("(function(){ let s = ''; for (const [k,v] of new Map([['a',1],['b',2]])) s += k + v; return s })()") shouldBe PoStr("a1b2")
    evalExpr("(function(){ let s = ''; for (const k in {x:1, y:2}) s += k; return s })()") shouldBe PoStr("xy")
  }

  test("switch with fallthrough and default") {
    evalExpr(
      """(function(v){
        |  switch (v) {
        |    case 1: return 'one'
        |    case 2:
        |    case 3: return 'few'
        |    default: return 'many'
        |  }
        |})(3)""".stripMargin) shouldBe PoStr("few")
    evalExpr("(function(v){ switch(v) { case 9: return 'no'; default: return 'dflt' } })(4)") shouldBe PoStr("dflt")
  }

  test("try/catch/finally ordering; throw of non-errors") {
    evalExpr(
      """(function(){
        |  let trace = ''
        |  try { trace += 'a'; throw new Error('boom'); }
        |  catch (e) { trace += 'b' + e.message }
        |  finally { trace += 'c' }
        |  return trace
        |})()""".stripMargin) shouldBe PoStr("abboomc")
    val r = run("throw 'plain string'")
    r.error.get.errType shouldBe "String"
    r.error.get.message shouldBe "plain string"
  }

  test("destructuring: array, object, defaults, rest") {
    evalExpr("(function(){ const [a, , b = 9, ...rest] = [1, 2, undefined, 4, 5]; return a + b + rest.length })()") shouldBe PoInt(12)
    evalExpr("(function(){ const {x, y: z = 7, ...others} = {x: 1, w: 2, q: 3}; return x + z + Object.keys(others).length })()") shouldBe PoInt(10)
    evalExpr("(function({a, b}){ return a + b })({a: 2, b: 3})") shouldBe PoInt(5)
  }

  test("spread in calls and arrays; rest params; arguments") {
    evalExpr("Math.max(...[1, 9, 3])") shouldBe PoInt(9)
    evalExpr("[0, ...[1, 2], 3].length") shouldBe PoInt(4)
    evalExpr("(function(...xs){ return xs.length })(1, 2, 3)") shouldBe PoInt(3)
    evalExpr("(function(){ return arguments.length })(7, 8)") shouldBe PoInt(2)
  }

  test("template literals with holes") {
    evalExpr("`a${1 + 1}b${'c'.toUpperCase()}`") shouldBe PoStr("a2bC")
    evalExpr("`nested ${`in${'ner'}`}`") shouldBe PoStr("nested inner")
  }

  test("tagged templates: strings array, interleaved values, expression order") {
    evalExpr("""(function tag(s, ...v) {
      return s.join('|') + '#' + v.join(',')
    })`a${1}b${2}c`""") shouldBe PoStr("a|b|c#1,2")
    // tag receives N+1 string chunks for N holes, empty chunks included
    evalExpr("((s, ...v) => s.length + ':' + v.length)`${1}${2}`") shouldBe PoStr("3:2")
    // method tag binds its receiver like a call
    evalExpr("""(function(){
      const o = { sep: '-', tag(s, ...v) { return v.join(this.sep) } }
      return o.tag`${'x'}${'y'}`
    })()""") shouldBe PoStr("x-y")
  }

  test("tagged templates: raw vs cooked, invalid escape = undefined cooked slot") {
    evalExpr("(s => s.raw[0])`a\\nb`") shouldBe PoStr("a\\nb") // raw keeps the backslash
    evalExpr("(s => s[0])`a\\nb`") shouldBe PoStr("a\nb")      // cooked interprets it
    // ES2018: invalid escape makes the COOKED slot undefined; raw survives
    evalExpr("(s => '' + s[0])`\\unicode${0}ok`") shouldBe PoStr("undefined")
    evalExpr("(s => s.raw[0])`\\unicode${0}ok`") shouldBe PoStr("\\unicode")
    evalExpr("(s => s[1])`\\unicode${0}ok`") shouldBe PoStr("ok")
  }

  test("String.raw is the canonical tag (ES 22.1.2.4)") {
    evalExpr("String.raw`a\\n${1 + 1}b\\t`") shouldBe PoStr("a\\n2b\\t")
    evalExpr("String.raw`plain`") shouldBe PoStr("plain")
    // the spec's array-like {raw} calling convention, without a literal
    evalExpr("String.raw({raw: ['x', 'y', 'z']}, 1, 2)") shouldBe PoStr("x1y2z")
    evalExpr("String.raw({raw: 'xy'}, 9)") shouldBe PoStr("x9y")
    // extra substitutions beyond the chunks are dropped, missing = ''
    evalExpr("String.raw({raw: ['a', 'b']}, 1, 2, 3)") shouldBe PoStr("a1b")
    evalExpr("String.raw({raw: ['a', 'b', 'c']}, 1)") shouldBe PoStr("a1bc")
  }

  test("tagged templates: optional chain position is a syntax error; untagged invalid escape too") {
    JsMapFn.compile("const f = null; f?.tag`x`").isLeft shouldBe true
    JsMapFn.compile("output('r', `\\unicode`)").isLeft shouldBe true
  }

  test("optional chaining and ternary") {
    evalExpr("({a: {b: 2}}).a?.b") shouldBe PoInt(2)
    evalExpr("({}).missing?.b") shouldBe PoUndefined
    evalExpr("null?.anything") shouldBe PoUndefined
    evalExpr("true ? 'y' : 'n'") shouldBe PoStr("y")
  }

  // ---------------- stdlib ----------------

  test("string methods") {
    evalExpr("'Hello World'.toLowerCase()") shouldBe PoStr("hello world")
    evalExpr("'a,b,,c'.split(',').length") shouldBe PoInt(4)
    evalExpr("'a b  c'.split(/\\s+/).join('|')") shouldBe PoStr("a|b|c")
    evalExpr("'xyx'.replace('x', 'o')") shouldBe PoStr("oyx")
    evalExpr("'xyx'.replace(/x/g, 'o')") shouldBe PoStr("oyo")
    evalExpr("'a1b22c'.replace(/\\d+/g, m => '[' + m + ']')") shouldBe PoStr("a[1]b[22]c")
    evalExpr("'dog cat'.replace(/(\\w+) (\\w+)/, '$2 $1')") shouldBe PoStr("cat dog")
    evalExpr("'  pad  '.trim()") shouldBe PoStr("pad")
    evalExpr("'abc'.slice(-2)") shouldBe PoStr("bc")
    evalExpr("'abcdef'.substring(4, 1)") shouldBe PoStr("bcd")
    evalExpr("'ab'.repeat(3)") shouldBe PoStr("ababab")
    evalExpr("'7'.padStart(3, '0')") shouldBe PoStr("007")
    evalExpr("'abc'.includes('b')") shouldBe PoBool(true)
    evalExpr("'abc'.charCodeAt(0)") shouldBe PoInt(97)
    evalExpr("String.fromCharCode(104, 105)") shouldBe PoStr("hi")
    evalExpr("'a-b-c'.split('-', 2).join(',')") shouldBe PoStr("a,b")
    evalExpr("'match me'.match(/m(\\w+)/)[1]") shouldBe PoStr("atch")
    evalExpr("'no'.match(/xyz/)") shouldBe PoNull
  }

  test("array methods") {
    evalExpr("[3, 1, 2].sort().join('')") shouldBe PoStr("123")
    evalExpr("[10, 9, 30].sort().join(',')") shouldBe PoStr("10,30,9") // default sort is lexicographic
    evalExpr("[10, 9, 30].sort((a, b) => a - b).join(',')") shouldBe PoStr("9,10,30")
    evalExpr("[1, 2, 3].map(x => x * 2).join(',')") shouldBe PoStr("2,4,6")
    evalExpr("[1, 2, 3, 4].filter(x => x % 2 === 0).length") shouldBe PoInt(2)
    evalExpr("[1, 2, 3].reduce((a, b) => a + b)") shouldBe PoInt(6)
    evalExpr("[1, 2, 3].reduce((a, b) => a + b, 10)") shouldBe PoInt(16)
    evalExpr("[[1, 2], [3]].flat().length") shouldBe PoInt(3)
    evalExpr("[1, 2].flatMap(x => [x, x]).join('')") shouldBe PoStr("1122")
    evalExpr("[5, 6, 7].indexOf(6)") shouldBe PoInt(1)
    evalExpr("[5, 6].includes(9)") shouldBe PoBool(false)
    evalExpr("[1, 2, 3].slice(1).join('')") shouldBe PoStr("23")
    evalExpr("(function(){ const a = [1]; a.push(2, 3); return a.join('') })()") shouldBe PoStr("123")
    evalExpr("(function(){ const a = [1, 2, 3]; a.splice(1, 1); return a.join('') })()") shouldBe PoStr("13")
    evalExpr("[1, 2, 3].find(x => x > 1)") shouldBe PoInt(2)
    evalExpr("[1, 2, 3].some(x => x > 2)") shouldBe PoBool(true)
    evalExpr("[1, 2, 3].every(x => x > 0)") shouldBe PoBool(true)
    evalExpr("Array.isArray([])") shouldBe PoBool(true)
    evalExpr("Array.from('ab').join('-')") shouldBe PoStr("a-b")
    evalExpr("Array.from({length: 3}, (_, i) => i).join('')") shouldBe PoStr("012")
    evalExpr("[...new Set([1, 1, 2])].length") shouldBe PoInt(2)
  }

  test("object statics") {
    evalExpr("Object.keys({a: 1, b: 2}).join(',')") shouldBe PoStr("a,b")
    evalExpr("Object.values({a: 1, b: 2}).reduce((x, y) => x + y)") shouldBe PoInt(3)
    evalExpr("Object.entries({a: 1}).length") shouldBe PoInt(1)
    evalExpr("Object.entries({a: 1})[0][0]") shouldBe PoStr("a")
    evalExpr("Object.assign({}, {a: 1}, {b: 2}).b") shouldBe PoInt(2)
    evalExpr("Object.fromEntries([['k', 'v']]).k") shouldBe PoStr("v")
    evalExpr("({a: 1}).hasOwnProperty('a')") shouldBe PoBool(true)
    evalExpr("'a' in {a: 1}") shouldBe PoBool(true)
    evalExpr("(function(){ const o = Object.freeze({a: 1}); o.a = 2; return o.a })()") shouldBe PoInt(1)
  }

  test("Set and Map") {
    evalExpr("(function(){ const s = new Set(); s.add('x').add('x').add('y'); return s.size })()") shouldBe PoInt(2)
    evalExpr("new Set(['a']).has('a')") shouldBe PoBool(true)
    evalExpr("(function(){ const m = new Map(); m.set('k', 9); return m.get('k') })()") shouldBe PoInt(9)
    evalExpr("new Map([['a', 1], ['b', 2]]).size") shouldBe PoInt(2)
    // NaN is SameValueZero-equal to itself in sets
    evalExpr("(function(){ const s = new Set([NaN, NaN]); return s.size })()") shouldBe PoInt(1)
  }

  test("JSON round-trips through the interpreter") {
    evalExpr("JSON.stringify({b: [1, 2], a: 'x'})") shouldBe PoStr("""{"b":[1,2],"a":"x"}""")
    evalExpr("JSON.parse('{\"n\": 1.5, \"s\": \"t\", \"a\": [true, null]}').a[0]") shouldBe PoBool(true)
    evalExpr("JSON.stringify(JSON.parse('[1,\"two\",{\"three\":3}]'))") shouldBe PoStr("""[1,"two",{"three":3}]""")
    evalExpr("JSON.stringify({u: undefined, f: () => 1, n: 1})") shouldBe PoStr("""{"n":1}""")
  }

  test("Math is available but Math.random throws the reference message") {
    evalExpr("Math.max(1, 5, 3)") shouldBe PoInt(5)
    evalExpr("Math.floor(1.9)") shouldBe PoInt(1)
    evalExpr("Math.round(2.5)") shouldBe PoInt(3)
    evalExpr("Math.round(-2.5)") shouldBe PoInt(-2) // JS half-up, not half-away
    evalExpr("Math.abs(-4)") shouldBe PoInt(4)
    val r = run("Math.random()")
    r.error.get.errType shouldBe "Error"
    r.error.get.message shouldBe "Math.random() is unavailable. Lenses must be deterministic, not random"
  }

  test("wall-clock reads are rejected; explicit dates work") {
    run("Date.now()").error.get.message should include("deterministic")
    run("new Date()").error.get.message should include("deterministic")
    evalExpr("new Date(86400000).toISOString()") shouldBe PoStr("1970-01-02T00:00:00.000Z")
    evalExpr("new Date(1000).getTime()") shouldBe PoInt(1000)
  }

  test("number methods") {
    evalExpr("(3.14159).toFixed(2)") shouldBe PoStr("3.14")
    evalExpr("(255).toString(16)") shouldBe PoStr("ff")
    evalExpr("parseInt('42px')") shouldBe PoInt(42)
    evalExpr("parseInt('ff', 16)") shouldBe PoInt(255)
    evalExpr("parseFloat('2.5rem')") shouldBe PoNum(2.5)
    evalExpr("Number.isInteger(4)") shouldBe PoBool(true)
    evalExpr("Number.isInteger(4.5)") shouldBe PoBool(false)
    evalExpr("Number('12')") shouldBe PoInt(12)
    evalExpr("isNaN('abc')") shouldBe PoBool(true)
  }

  test("regex literals, test/exec, lastIndex on /g/") {
    evalExpr("/ab+c/.test('xabbc')") shouldBe PoBool(true)
    evalExpr("/(\\d+)-(\\d+)/.exec('a 12-34 b')[2]") shouldBe PoStr("34")
    evalExpr("'a1b2c3'.match(/\\d/g).length") shouldBe PoInt(3)
    evalExpr("new RegExp('^x').test('xy')") shouldBe PoBool(true)
    evalExpr("/CASE/i.test('case')") shouldBe PoBool(true)
  }

  test("functions: call/apply/bind, higher-order, recursion") {
    evalExpr("(function(a, b){ return a + b }).apply(null, [3, 4])") shouldBe PoInt(7)
    evalExpr("(function(a, b){ return a + b }).call(null, 3, 4)") shouldBe PoInt(7)
    evalExpr("((a, b) => a * b).bind(null, 6)(7)") shouldBe PoInt(42)
    evalExpr("(function fact(n){ return n <= 1 ? 1 : n * fact(n - 1) })(10)") shouldBe PoInt(3628800)
    evalExpr("(f => f(f))(f => x => x)(5)") shouldBe PoInt(5)
  }

  test("method `this` binding in object literals") {
    evalExpr("(function(){ const o = {v: 7, read() { return this.v }}; return o.read() })()") shouldBe PoInt(7)
  }

  test("user constructor functions via new") {
    evalExpr(
      """(function(){
        |  function Point(x, y) { this.x = x; this.y = y }
        |  const p = new Point(3, 4)
        |  return p.x + p.y
        |})()""".stripMargin) shouldBe PoInt(7)
  }

  // ---------------- budgets / sandbox ----------------

  test("runaway loop is stopped by the step budget and is NOT catchable") {
    val r = run("try { while (true) {} } catch (e) { output('caught', '' + e) }")
    r.outputs shouldBe empty
    r.error.get.errType shouldBe "JsBudgetExceeded"
  }

  test("allocation bomb is stopped by the allocation budget") {
    val r = run("let s = 'x'; while (true) { s = s + s }")
    r.error.get.errType shouldBe "JsBudgetExceeded"
  }

  test("nesting bombs are SYNTAX errors, not a blown JVM stack") {
    // wire-supplied code compiles on an HTTP thread — `((((…` must 400
    for (bomb <- Seq(
      "(" * 5000 + "1" + ")" * 5000,
      "[" * 5000 + "]" * 5000,
      "!" * 5000 + "true",
      "{" * 5000 + "}" * 5000)) {
      JsMapFn.compile(bomb) match {
        case Left(err) => err.errType shouldBe "SyntaxError"
        case Right(_) => fail("expected nesting-depth syntax error")
      }
    }
    // …while legitimately deep-but-sane code still parses
    JsMapFn.compile("(".repeat(50) + "1" + ")".repeat(50)).isRight shouldBe true
  }

  test("unbounded recursion throws a CATCHABLE RangeError, like real engines") {
    val r = run(
      """function f (n) { return f(n + 1) }
        |try { f(0) } catch (e) {
        |  output('name', e.name); output('caught', true)
        |}""".stripMargin)
    r.error shouldBe None
    r.outputs.toMap.apply("name") shouldBe PoStr("RangeError")
    // bounded recursion is untouched (also exercised in the
    // functions test above)
    evalExpr("(function f (n) { return n === 0 ? 0 : f(n - 1) })(400)") shouldBe PoInt(0)
  }

  test("syntax errors are startup errors, not map errors") {
    JsMapFn.compile("output('a', 1)\nyield 5").isLeft shouldBe true
    JsMapFn.compile("function (") match {
      case Left(err) => err.errType shouldBe "SyntaxError"
      case Right(_) => fail("expected syntax error")
    }
    JsMapFn.compile("class X { #x = 1 }").isRight shouldBe true // private members landed r12
    JsMapFn.compile("async function f() {}").isRight shouldBe true // async landed r14
    JsMapFn.compile("async function* f() {}").isRight shouldBe true // async generators landed r14 wave 2
    JsMapFn.compile("async function* f() { yield* [1] }").isRight shouldBe true // async yield* landed r15
  }

  test("ASI: the golden-lens style of semicolon-free code parses") {
    val r = run(
      """const items = [1, 2, 3]
        |let total = 0
        |for (const x of items) total += x
        |output('total', total)
        |""".stripMargin)
    r.error shouldBe None
    r.outputs shouldBe Vector("total" -> PoInt(6))
  }

  // ---------------- value bridge ----------------

  test("PoValue bridge round-trips sets, maps, dates, bytes, nesting") {
    val data = PoObj(
      "set" -> PoSet(PoStr("a"), PoStr("b")),
      "map" -> PoMap.of(PoInt(1) -> PoStr("one")),
      "date" -> PoDate(1234L),
      "bytes" -> PoBytes(Array[Byte](1, 2, 250.toByte)),
      "nested" -> PoArr(Vector(PoObj("k" -> PoNull))))
    val r = run(
      """output('setSize', data.set.size)
        |output('setHasA', data.set.has('a'))
        |output('mapVal', data.map.get(1))
        |output('dateMs', data.date.getTime())
        |output('byteLen', data.bytes.length)
        |output('byte2', data.bytes[2])
        |output('nestedK', data.nested[0].k === null)
        |output('echo', data)
        |""".stripMargin, data)
    r.error shouldBe None
    val out = r.outputs.toMap
    out("setSize") shouldBe PoInt(2)
    out("setHasA") shouldBe PoBool(true)
    out("mapVal") shouldBe PoStr("one")
    out("dateMs") shouldBe PoInt(1234)
    out("byteLen") shouldBe PoInt(3)
    out("byte2") shouldBe PoInt(250)
    out("nestedK") shouldBe PoBool(true)
    out("echo") shouldBe data // full round-trip, including set order and map keys
  }

  test("functions cannot be emitted; cycles are rejected") {
    run("output('f', () => 1)").error.get.errType shouldBe "TypeError"
    run("const a = []; a.push(a); output('a', a)").error.get.errType shouldBe "TypeError"
  }

  // ---------------- review-hardening regressions ----------------

  test("bare for-in parses (the relational 'in' operator must not eat it)") {
    val data = PoObj("b" -> PoInt(1), "a" -> PoInt(2))
    evalExpr("(() => { let ks = []; let k; for (k in data) ks.push(k); return ks.join(',') })()",
      data) shouldBe PoStr("b,a")
    // and `x in y` as a plain EXPRESSION still works everywhere else
    evalExpr("'a' in data ? 1 : 0", data) shouldBe PoInt(1)
    evalExpr("(() => { for (let i = 'a' in data ? 0 : 9; i < 1; i++) {} return 'done' })()",
      data) shouldBe PoStr("done")
  }

  test("optional chaining short-circuits the WHOLE chain, calls included") {
    evalExpr("data.meta?.author.name") shouldBe PoUndefined
    evalExpr("data.meta?.a.b.c[0].d") shouldBe PoUndefined
    evalExpr("data.meta?.frob().deeper") shouldBe PoUndefined
    // a short-circuited call must not evaluate its arguments
    evalExpr("(() => { let called = 0; const f = () => called++; data.meta?.m(f()); return called })()") shouldBe PoInt(0)
    // non-nullish bases still evaluate normally through ?.
    evalExpr("({a: {b: 7}}).a?.b") shouldBe PoInt(7)
    // and a non-optional read of undefined still throws
    run("output('r', data.meta.author)").error.get.errType shouldBe "TypeError"
  }

  test("for-let closures capture per-iteration bindings (ES2015)") {
    evalExpr("(() => { const fns = []; for (let i = 0; i < 3; i++) fns.push(() => i); return fns.map(f => f()).join(',') })()") shouldBe PoStr("0,1,2")
    // body assignments to the let binding must be seen by test/update
    evalExpr("(() => { let log = []; for (let i = 0; i < 10; i++) { i += 2; log.push(i) } return log.join(',') })()") shouldBe PoStr("2,5,8,11")
  }

  test("radix literals past 2^63 round to doubles; empty digits are startup errors") {
    evalExpr("'' + 0xFFFFFFFFFFFFFFFF") shouldBe PoStr("18446744073709552000")
    evalExpr("'' + Number('0xFFFFFFFFFFFFFFFF')") shouldBe PoStr("18446744073709552000")
    evalExpr("0b1111") shouldBe PoInt(15)
    for (bad <- Seq("const x = 0x", "const x = 0b2", "const x = 0o")) {
      assert(JsMapFn.compile(bad).isLeft, s"expected startup error for: $bad")
    }
  }

  test("malformed unicode escapes are startup errors, not host exceptions") {
    assert(JsMapFn.compile("const s = '\\u{FFFFFFFF}'").isLeft)
    assert(JsMapFn.compile("const s = '\\u{}'").isLeft)
    assert(JsMapFn.compile("const s = '\\xzz'").isLeft)
    evalExpr("'\\u{1F600}'.length") shouldBe PoInt(2) // valid astral escape still works
  }

  test("match/search coerce a string argument to a PATTERN, not a literal") {
    evalExpr("'abc'.match('a.c')[0]") shouldBe PoStr("abc")
    evalExpr("'xa1b'.search('\\\\d')") shouldBe PoInt(2)
    evalExpr("'a+b'.match('a\\\\+b')[0]") shouldBe PoStr("a+b")
    evalExpr("'' + 'abc'.match('a[z]')") shouldBe PoStr("null")
  }

  test("JSON.stringify: DAG reuse is fine, true cycles throw") {
    evalExpr("(() => { const o = {x: 1}; return JSON.stringify({a: o, b: o}) })()") shouldBe
      PoStr("""{"a":{"x":1},"b":{"x":1}}""")
    run("const o = {}; o.self = o; output('r', JSON.stringify(o))")
      .error.get.errType shouldBe "TypeError"
  }

  test("new Array(n) is charged against the allocation budget") {
    val r = run("const a = new Array(100000000); output('r', a.length)")
    r.error.get.errType shouldBe "JsBudgetExceeded"
    // Array.from({length: n}) rides the same gate
    run("output('r', Array.from({length: 99999999}).length)")
      .error.get.errType shouldBe "JsBudgetExceeded"
    evalExpr("new Array(3).length") shouldBe PoInt(3)
  }

  test("template holes are string-aware: '}' inside a quoted string") {
    evalExpr("`${'}'}ok`") shouldBe PoStr("}ok")
    evalExpr("`${data.x === '}' ? 'close' : 'other'}`",
      PoObj("x" -> PoStr("}"))) shouldBe PoStr("close")
    evalExpr("`a${`b${'}'}c`}d`") shouldBe PoStr("ab}cd")
  }

  test("compound assignment / update on computed members evaluates obj+key ONCE, in spec order") {
    evalExpr("(() => { let n = 0; const f = () => { n++; return 0 }; const a = [5]; a[f()] += 1; return n + ':' + a[0] })()") shouldBe PoStr("1:6")
    evalExpr("(() => { let n = 0; const f = () => { n++; return 0 }; const a = [5]; a[f()]++; return n + ':' + a[0] })()") shouldBe PoStr("1:6")
    // target reference resolves BEFORE the right-hand side
    evalExpr("(() => { const calls = []; const f = () => { calls.push('f'); return 0 }; const g = () => { calls.push('g'); return 1 }; const a = [0]; a[f()] = g(); return calls.join(',') })()") shouldBe PoStr("f,g")
  }

  test("an inconsistent sort comparator never surfaces a host error") {
    val r = run("const a = Array.from({length: 64}, (x, i) => 63 - i); a.sort(() => 1); output('r', a.length)")
    r.error shouldBe None
    r.outputs.head._2 shouldBe PoInt(64)
    // a comparator that THROWS still propagates as a catchable JS error
    run("[3,1,2].sort(() => { throw new Error('boom') })").error.get.message shouldBe "boom"
  }

  test("boolean primitives carry toString/valueOf") {
    evalExpr("true.toString()") shouldBe PoStr("true")
    evalExpr("(1 === 2).toString()") shouldBe PoStr("false")
  }
}
