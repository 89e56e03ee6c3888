package graft.js

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.core._
import graft.lens._

/** async/await + Promises (r14): ordering tables pinned against stock
  * V8 (node 20) — every `expectSeq` row's expected string is the
  * output of the SAME program under node, collected by the session's
  * probe harness; the asyncgen.js fuzz sweep covers the space between
  * these points. The engine's contract: the microtask queue drains to
  * quiescence after the map body returns, THEN outputs are collected
  * (the reference worker awaits its map apply — worker:131), so
  * outputs emitted from reactions land in deterministic order. */
class JsAsyncSpec extends AnyFunSuite with Matchers {

  private def run(code: String): MapResult = {
    val fn = JsMapFn.compile(code) match {
      case Right(f) => f
      case Left(err) => fail(s"startup error: ${err.errType}: ${err.message}")
    }
    MapRunner.run(fn, MapPath("/datasets/a:n/records/r",
      "datasets", "a", "n", "r"), PoObj.empty)
  }

  /** run `body` with a `log(v)` helper that emits one output per call;
    * assert the emission sequence (= V8's console order). */
  private def expectSeq(body: String, want: String): Unit = {
    val res = run(s"let __i = 0;\nconst log = v => output('o' + (++__i), String(v));\n$body")
    res.error.foreach(e => fail(s"unexpected ${e.errType}: ${e.message}\n$body"))
    val got = res.outputs.map { case (_, PoStr(s)) => s; case (_, other) => other.toString }
    got.mkString(",") shouldBe want
  }

  test("async body runs synchronously to the first await; resumption beats later thens (V8 p1)") {
    expectSeq(
      """async function f(){ log(1); await null; log(3); }
        |f(); log(2);
        |Promise.resolve().then(() => log(4));""".stripMargin,
      "1,2,3,4")
  }

  test("await of a native promise costs exactly one tick (ES2019 change; V8 p2)") {
    expectSeq(
      """async function f(){ await Promise.resolve('a'); log('A'); }
        |f();
        |Promise.resolve().then(() => log('B')).then(() => log('C'));""".stripMargin,
      "A,B,C")
  }

  test("resolving WITH a native promise costs the thenable job + reaction (V8 p3)") {
    expectSeq(
      """new Promise(r => r(Promise.resolve('x'))).then(v => log('got' + v));
        |Promise.resolve().then(() => log(1)).then(() => log(2)).then(() => log(3));""".stripMargin,
      "1,2,gotx,3")
  }

  test("then chains, throw-to-catch, and reject-catch interleave FIFO (V8 p4)") {
    expectSeq(
      """Promise.resolve(1).then(v => { log('a' + v); return v + 1 })
        |  .then(v => { log('b' + v); throw 'e' }).catch(e => log('c' + e));
        |Promise.reject('r').catch(e => log('d' + e));""".stripMargin,
      "a1,dr,b2,ce")
  }

  test("finally passes outcomes through, callback value discarded (V8 p5)") {
    expectSeq(
      """Promise.resolve(7).finally(() => { log('f1'); return 99 }).then(v => log('v' + v));
        |Promise.reject('x').finally(() => log('f2')).catch(e => log('e' + e));""".stripMargin,
      "f1,f2,v7,ex")
  }

  test("combinators: all / allSettled / race / any (V8 p6)") {
    expectSeq(
      """Promise.all([1, Promise.resolve(2), 3]).then(v => log('all:' + v.join('|')));
        |Promise.allSettled([Promise.reject('r'), 'v']).then(v =>
        |  log('as:' + v.map(x => x.status + (x.value ?? x.reason)).join('|')));
        |Promise.race([new Promise(() => {}), Promise.resolve('w')]).then(v => log('race:' + v));
        |Promise.any([Promise.reject('a'), Promise.resolve('b')]).then(v => log('any:' + v));""".stripMargin,
      "all:1|2|3,as:rejectedr|fulfilledv,race:w,any:b")
  }

  test("async return of a promise assimilates (two extra ticks; V8 p7)") {
    expectSeq(
      """async function f(){ return Promise.resolve('R'); }
        |f().then(v => log('f' + v));
        |Promise.resolve().then(() => log(1)).then(() => log(2))
        |  .then(() => log(3)).then(() => log(4));""".stripMargin,
      "1,2,fR,3,4")
  }

  test("await of a user thenable routes the thenable job (V8 p8)") {
    expectSeq(
      """async function f(){ const v = await { then(res){ res('T') } }; log('v' + v); }
        |f();
        |Promise.resolve().then(() => log(1)).then(() => log(2)).then(() => log(3));""".stripMargin,
      "1,vT,2,3")
  }

  test("try/catch around await catches the rejection inside the body (V8 p9)") {
    expectSeq(
      """async function f(){
        |  try { await Promise.reject('boom') }
        |  catch (e) { log('caught' + e); return 'ok' }
        |}
        |f().then(v => log(v));""".stripMargin,
      "caughtboom,ok")
  }

  test("executor runs synchronously; settled value delivers on a tick (V8 p10)") {
    expectSeq(
      """log('s');
        |const p = new Promise((res) => { log('exec'); res('v'); });
        |p.then(v => log(v));
        |log('e');""".stripMargin,
      "s,exec,e,v")
  }

  test("combinators over custom iterables; non-iterables reject, never throw (review r14)") {
    expectSeq(
      """Promise.all({ [Symbol.iterator]: function*(){ yield 1; yield Promise.resolve(2) } })
        |  .then(v => log('all:' + v.join('|')));
        |Promise.all(5).then(() => log('NO'), e => log('rej' + e.name));
        |Promise.race({ [Symbol.iterator]: function*(){ yield 'w' } }).then(v => log('race:' + v));""".stripMargin,
      "rejTypeError,all:1|2,race:w")
  }

  test("Promise.any aggregate error carries name + errors in order (V8 p11)") {
    expectSeq(
      """Promise.any([Promise.reject('a'), Promise.reject('b')])
        |  .catch(e => log(e.name + ':' + e.errors.join('|')));""".stripMargin,
      "AggregateError:a|b")
  }

  test("queueMicrotask interleaves FIFO with promise reactions (V8 p12)") {
    expectSeq(
      """queueMicrotask(() => log('m1'));
        |Promise.resolve().then(() => log('t'));
        |queueMicrotask(() => log('m2'));""".stripMargin,
      "m1,t,m2")
  }

  test("async arrows, methods (object + class + static), typeof, instanceof-free surface") {
    expectSeq(
      """const f = async x => x * 2;
        |const g = async (a, b) => { return a + b; };
        |const o = { async m(v){ return v + 1 } };
        |class C { async inst(){ return 'i' } static async st(){ return 's' } }
        |log(typeof f);
        |f(21).then(v => log(v));
        |g(1, 2).then(v => log(v));
        |o.m(9).then(v => log(v));
        |new C().inst().then(v => log(v));
        |C.st().then(v => log(v));""".stripMargin,
      "function,42,3,10,i,s")
  }

  test("sequential awaits keep single-threaded state; String(promise)") {
    expectSeq(
      """let state = 0;
        |async function f(){
        |  state += 1; await null;
        |  state += 10; await Promise.resolve();
        |  state += 100; return state;
        |}
        |const p = f();
        |log(String(p));
        |p.then(v => log(v + ':' + state));""".stripMargin,
      "[object Promise],111:111")
  }

  test("unhandled rejection at quiescence is the map call's error (loud, documented)") {
    val res = run("Promise.reject(new TypeError('nobody home'))")
    assert(res.error.exists(e => e.errType == "TypeError" && e.message.contains("nobody home")),
      s"got ${res.error}")
    // a LATE catch (registered before quiescence) counts as handled
    val ok = run("const p = Promise.reject('x'); Promise.resolve().then(() => p.catch(e => output('r', e)))")
    assert(ok.error.isEmpty, s"got ${ok.error}")
    assert(ok.outputs == Vector(("r", PoStr("x"))))
  }

  test("early errors: await/async placement (V8 parse rules; loud startup contract)") {
    def startupErr(code: String): String =
      JsMapFn.compile(code) match {
        case Left(e) => e.message
        case Right(_) => fail(s"expected startup error for: $code")
      }
    assert(startupErr("await 1").contains("only valid in async"))
    assert(startupErr("function f(){ await 1 }").contains("only valid in async"))
    assert(startupErr("async function f(){ const g = () => await 1; }")
      .contains("not allowed in an arrow"))
    assert(startupErr("async function f(a = await 1){}").contains("not allowed"))
    assert(JsMapFn.compile("async function* f(){ yield* [1] }").isRight) // async-gen yield* landed r15
    assert(startupErr("class C { async constructor(){} }").contains("constructor"))
    // new (async fn) is a runtime TypeError, not a parse error
    val res = run("async function f(){}; new f()")
    assert(res.error.exists(_.errType == "TypeError"), s"got ${res.error}")
  }

  test("abandoned awaiting body is reaped; its finally runs inside the map call") {
    // the promise never settles → the body parks at the await; end-of-map
    // teardown unwinds it and the finally's output is captured
    val res = run(
      """async function f(){
        |  try { await new Promise(() => {}); output('never', 1) }
        |  finally { output('cleanup', 'ran') }
        |}
        |f();
        |output('main', 'done')""".stripMargin)
    assert(res.error.isEmpty, s"got ${res.error}")
    assert(res.outputs.toMap.get("main").contains(PoStr("done")))
    assert(res.outputs.toMap.get("cleanup").contains(PoStr("ran")))
    assert(!res.outputs.toMap.contains("never"))
  }

  test("await inside a generator body's async helper composes with yields") {
    expectSeq(
      """async function doubled(v){ await null; return v * 2; }
        |function* gen(){ yield 1; yield 2; yield 3; }
        |async function main(){
        |  let total = 0;
        |  for (const v of gen()) total += await doubled(v);
        |  log('total' + total);
        |}
        |main();""".stripMargin,
      "total12")
  }
}
