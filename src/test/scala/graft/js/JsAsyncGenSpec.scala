package graft.js

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.core._
import graft.lens._

/** Async generators + `for await` (r14 wave 2) — every expectation is
  * the output of the same program under node 20 (the session's probe
  * harness); asyncgen.js's async-generator templates sweep the space
  * between these points. Request-queue ordering, awaited yields and
  * returns, rejection delivery INTO the body, early-exit return()
  * through finally, and the for-await protocol (async-gen and
  * sync-iterable sources) are all pinned. */
class JsAsyncGenSpec extends AnyFunSuite with Matchers {

  private def run(code: String): MapResult = {
    val fn = JsMapFn.compile(code) match {
      case Right(f) => f
      case Left(err) => fail(s"startup error: ${err.errType}: ${err.message}")
    }
    MapRunner.run(fn, MapPath("/datasets/a:n/records/r",
      "datasets", "a", "n", "r"), PoObj.empty)
  }

  private def expectSeq(body: String, want: String): Unit = {
    val res = run(s"let __i = 0;\nconst log = v => output('o' + (++__i), String(v));\n$body")
    res.error.foreach(e => fail(s"unexpected ${e.errType}: ${e.message}\n$body"))
    val got = res.outputs.map { case (_, PoStr(s)) => s; case (_, other) => other.toString }
    got.mkString(",") shouldBe want
  }

  test("yielded values are awaited; done result carries undefined (V8 g1)") {
    expectSeq(
      """async function* g(){ yield Promise.resolve(1); yield 2; }
        |(async () => {
        |  const it = g();
        |  const a = await it.next(); const b = await it.next(); const c = await it.next();
        |  log(a.value + '|' + a.done); log(b.value + '|' + b.done); log(c.value + '|' + c.done);
        |})();""".stripMargin,
      "1|false,2|false,undefined|true")
  }

  test("the return value is awaited too (V8 g2)") {
    expectSeq(
      """async function* g(){ return Promise.resolve(3); }
        |g().next().then(r => log(r.value + '|' + r.done));""".stripMargin,
      "3|true")
  }

  test("a rejecting awaited yield throws INTO the body at the yield (V8 g3)") {
    expectSeq(
      """async function* g(){ try { yield Promise.reject('r'); } catch(e) { yield 'caught' + e; } }
        |(async () => {
        |  const it = g();
        |  log((await it.next()).value);
        |  log(JSON.stringify(await it.next()));
        |})();""".stripMargin,
      """caughtr,{"done":true}""")
  }

  test("queued requests pump before their reactions drain (V8 g4)") {
    expectSeq(
      """async function* g(){ log('a'); yield 1; log('b'); yield 2; log('c'); }
        |const it = g();
        |it.next().then(r => log('r1:' + r.value));
        |it.next().then(r => log('r2:' + r.value));""".stripMargin,
      "a,b,r1:1,r2:2")
  }

  test("for await over async gens and over sync iterables of promises (V8 g5/sg)") {
    expectSeq(
      """async function* g(){ yield 'x'; yield 'y'; }
        |function* sg(){ yield Promise.resolve('p1'); yield 'p2'; }
        |(async () => {
        |  for await (const v of g()) log(v);
        |  for await (const v of [Promise.resolve(1), 2]) log(v);
        |  for await (const v of sg()) log(v);
        |})();""".stripMargin,
      "x,y,1,2,p1,p2")
  }

  test("return() mid-stream runs finally (which may await) (V8 g6)") {
    expectSeq(
      """let fin = '';
        |async function* g(){ try { yield 1; yield 2; } finally { fin += 'F' + (await Promise.resolve('!')); } }
        |(async () => {
        |  const it = g();
        |  log(JSON.stringify(await it.next()));
        |  log(JSON.stringify(await it.return('z')));
        |  log(JSON.stringify(await it.next()));
        |  log(fin);
        |})();""".stripMargin,
      """{"value":1,"done":false},{"value":"z","done":true},{"done":true},F!""")
  }

  test("throw() into a suspended yield is catchable in the body (V8 g7)") {
    expectSeq(
      """async function* g(){ try { yield 1; } catch(e){ yield 'c' + e; } }
        |(async () => {
        |  const it = g();
        |  log((await it.next()).value); log((await it.throw('T')).value);
        |  log(JSON.stringify(await it.next()));
        |})();""".stripMargin,
      """1,cT,{"done":true}""")
  }

  test("return() before start completes without running the body (V8 g8)") {
    expectSeq(
      """async function* g(){ log('NO'); yield 9; }
        |(async () => {
        |  const it = g();
        |  log(JSON.stringify(await it.return('early')));
        |  log(JSON.stringify(await it.next()));
        |})();""".stripMargin,
      """{"value":"early","done":true},{"done":true}""")
  }

  test("an uncaught body throw rejects the request and completes the machine (V8 g9)") {
    expectSeq(
      """async function* g(){ throw new TypeError('boom'); }
        |(async () => {
        |  log(await g().next().then(r => 'ok', e => 'E' + e.name));
        |  const it = g();
        |  log(await it.next().catch(e => 'first'));
        |  log(JSON.stringify(await it.next())); // completed after the throw
        |})();""".stripMargin,
      """ETypeError,first,{"done":true}""")
  }

  test("typeof / new / Symbol.asyncIterator / sync for-of rejection (V8 g10)") {
    expectSeq(
      """async function* g(){ yield 1; }
        |log(typeof g);
        |log((() => { try { new g(); return 'NO' } catch(e){ return e.name } })());
        |const it = g();
        |log(it[Symbol.asyncIterator]() === it);
        |log(String(it));
        |log((() => { try { for (const v of g()) {} return 'NO' } catch(e){ return e.name } })());""".stripMargin,
      "function,TypeError,true,[object AsyncGenerator],TypeError")
  }

  test("for await break closes the async source (finally runs, awaited)") {
    expectSeq(
      """let fin = '';
        |async function* g(){ try { yield 1; yield 2; yield 3; } finally { fin += 'closed'; } }
        |(async () => {
        |  for await (const v of g()) { log(v); if (v >= 2) break; }
        |  log(fin);
        |})();""".stripMargin,
      "1,2,closed")
  }

  test("abandoned awaiting async generator is reaped; finally runs inside the map call") {
    val res = run(
      """async function* g(){
        |  try { yield 1; await new Promise(() => {}); output('never', 1) }
        |  finally { output('cleanup', 'ran') }
        |}
        |const it = g();
        |it.next().then(r => output('first', r.value));
        |it.next(); // parks the body at the never-settling await
        |output('main', 'done')""".stripMargin)
    assert(res.error.isEmpty, s"got ${res.error}")
    val m = res.outputs.toMap
    assert(m.get("main").contains(PoStr("done")))
    assert(m.get("first").contains(PoInt(1)))
    assert(m.get("cleanup").contains(PoStr("ran")))
    assert(!m.contains("never"))
  }

  test("early errors: async-gen placement rules (loud startup contract)") {
    def startupErr(code: String): String =
      JsMapFn.compile(code) match {
        case Left(e) => e.message
        case Right(_) => fail(s"expected startup error for: $code")
      }
    assert(startupErr("for await (const x of []) {}").contains("only valid in async"))
    assert(startupErr("async function f(){ for await (const x in {}) {} }")
      .contains("of-loop"))
    assert(startupErr("class C { async *constructor(){} }").contains("constructor"))
    // async-gen methods parse in object literals and classes
    assert(JsMapFn.compile("const o = { async *m(){ yield 1 } };").isRight)
    assert(JsMapFn.compile("class C { async *m(){ yield 1 } static async *s(){ yield 2 } }").isRight)
    // yield* inside async generators parses since r15
    assert(JsMapFn.compile("async function* g(){ yield* [1, 2]; }").isRight)
  }

  // ---- yield* inside async generators (r15, Generators.delegateAsync) ----
  // every expectation below is node 20 output via the asyncgen.js
  // yield*-template probe run (806/806 + 4016/4016 fresh-seed sweeps)

  test("async-over-async delegation: values, awaits, completion threading (V8 d1)") {
    expectSeq(
      """async function* inner(){ yield 1; yield await Promise.resolve(2); return 'R'; }
        |async function* outer(){ yield 's'; const r = yield* inner(); yield 'got' + r; }
        |(async () => { for await (const v of outer()) log(v); })();""".stripMargin,
      "s,1,2,gotR")
  }

  test("async-over-sync: AsyncFromSyncIterator unwraps values AND the promise return (V8 d2)") {
    expectSeq(
      """function* inner(){ yield 1; yield Promise.resolve('p'); return Promise.resolve('pr'); }
        |async function* outer(){ const r = yield* inner(); yield 'r:' + r; }
        |(async () => { for await (const v of outer()) log(v); })();""".stripMargin,
      "1,p,r:pr")
  }

  test("async yield* over builtin iterables: promise elements awaited (V8 d3)") {
    expectSeq(
      """async function* outer(){ yield* [1, Promise.resolve(2), 3]; yield* 'ab'; yield* new Set(['x']); yield 'tail'; }
        |(async () => { for await (const v of outer()) log(v); })();""".stripMargin,
      "1,2,3,a,b,x,tail")
  }

  test("throw() forwards through yield* into the inner's catch (V8 d4)") {
    expectSeq(
      """async function* inner(){ try { yield 'a'; yield 'NO'; } catch (e) { yield 'c' + e; } }
        |async function* outer(){ try { yield* inner(); } catch (e) { yield 'o' + e; } yield 'end'; }
        |(async () => {
        |  const it = outer();
        |  log((await it.next()).value);
        |  log((await it.throw('T')).value);
        |  for await (const v of it) log(v);
        |})();""".stripMargin,
      "a,cT,end")
  }

  test("uncaught throw() propagates out of yield* to the outer's catch (V8 d5)") {
    expectSeq(
      """async function* inner(){ yield 'a'; }
        |async function* outer(){ try { yield* inner(); } catch (e) { yield 'o' + e; } }
        |(async () => {
        |  const it = outer();
        |  log((await it.next()).value);
        |  log((await it.throw('T')).value);
        |  log(JSON.stringify(await it.next()));
        |})();""".stripMargin,
      """a,oT,{"done":true}""")
  }

  test("return() unwinds BOTH layers' finally blocks, awaited (V8 d6)") {
    expectSeq(
      """let fin = '';
        |async function* inner(){ try { yield 1; yield 2; } finally { fin += 'fi' + (await Promise.resolve('!')); } }
        |async function* outer(){ try { yield* inner(); } finally { fin += 'fo'; } }
        |(async () => {
        |  const it = outer();
        |  log((await it.next()).value);
        |  const r = await it.return('RV');
        |  log(r.value + '|' + r.done + '|' + fin);
        |})();""".stripMargin,
      "1,RV|true|fi!fo")
  }

  test("inner yielding from finally during return keeps delegating (V8 d7)") {
    expectSeq(
      """async function* inner(){ try { yield 1; } finally { yield 'fy'; } }
        |async function* outer(){ yield* inner(); }
        |(async () => {
        |  const it = outer();
        |  log((await it.next()).value);
        |  const r1 = await it.return('RV');
        |  log(r1.value + '|' + r1.done);
        |  const r2 = await it.next();
        |  log(r2.value + '|' + r2.done);
        |})();""".stripMargin,
      // the finally-yield DOWNGRADES the forwarded return to a normal
      // completion of the yield*: the outer body continues past it and
      // completes with undefined — RV is dropped (V8-verified)
      "1,fy|false,undefined|true")
  }

  test("nested delegation: async outer → async mid → sync leaf (V8 d8)") {
    expectSeq(
      """function* leaf(){ yield 'L1'; yield 'L2'; return 'lr'; }
        |async function* mid(){ const r = yield* leaf(); yield 'm' + r; return 'mr'; }
        |async function* outer(){ const r = yield* mid(); yield 'o' + r; }
        |(async () => { for await (const v of outer()) log(v); })();""".stripMargin,
      "L1,L2,mlr,omr")
  }

  test("tick parity: delegated async value is NOT re-awaited (tc39 redundant-await removal; V8 d9)") {
    expectSeq(
      """const logs = [];
        |async function* inner(){ yield 'i1'; yield 'i2'; }
        |async function* outer(){ yield* inner(); }
        |(async () => { for await (const v of outer()) logs.push(v); logs.push('done'); })();
        |Promise.resolve().then(() => logs.push('t1')).then(() => logs.push('t2')).then(() => logs.push('t3')).then(() => logs.push('t4'));
        |(async () => { for (let i = 0; i < 16; i++) await null; log(logs.join(',')); })();""".stripMargin,
      "t1,t2,i1,t3,t4,i2,done")
  }

  test("tick parity: sync inner rides the two-tick AsyncFromSyncIterator pipeline (V8 d10)") {
    expectSeq(
      """const logs = [];
        |function* inner(){ yield 'i1'; yield 'i2'; }
        |async function* outer(){ yield* inner(); }
        |(async () => { for await (const v of outer()) logs.push(v); logs.push('done'); })();
        |Promise.resolve().then(() => logs.push('t1')).then(() => logs.push('t2')).then(() => logs.push('t3')).then(() => logs.push('t4')).then(() => logs.push('t5')).then(() => logs.push('t6'));
        |(async () => { for (let i = 0; i < 20; i++) await null; log(logs.join(',')); })();""".stripMargin,
      "t1,t2,i1,t3,t4,t5,i2,t6,done")
  }

  test("rejecting element inside a delegated iterable throws into the outer (V8 d11)") {
    expectSeq(
      """async function* outer(){ try { yield* [1, Promise.reject('bad'), 3]; } catch (e) { yield 'c' + e; } }
        |(async () => { for await (const v of outer()) log(v); })();""".stripMargin,
      "1,cbad")
  }

  test("yield* over a custom [Symbol.iterator] object (V8 d12)") {
    expectSeq(
      """async function* outer(){
        |  yield* { [Symbol.iterator]() { let i = 0;
        |    return { next: () => i < 3 ? { value: 'c' + (i++), done: false } : { value: undefined, done: true } }; } };
        |}
        |(async () => { for await (const v of outer()) log(v); })();""".stripMargin,
      "c0,c1,c2")
  }

  test("yield* over a non-iterable / a sync-only async generator misuse is a loud TypeError (V8 d13)") {
    expectSeq(
      """async function* outer(){ yield* 5; }
        |function* syncOuter(){ yield* asyncInner(); }
        |async function* asyncInner(){ yield 1; }
        |(async () => {
        |  await outer().next().then(v => log('NO'), e => log(e.name));
        |  try { for (const v of syncOuter()) {} log('NO2') } catch (e) { log('sync' + e.name) }
        |})();""".stripMargin,
      "TypeError,syncTypeError")
  }
}
