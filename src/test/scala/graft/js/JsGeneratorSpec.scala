package graft.js

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.core._
import graft.lens._

/** Generator semantics (round 13 — `function*`/`yield`/`yield*`).
  * Every expectation is the value stock V8 (node 20) produces for the
  * same program; the discovery sweep was `tools/jsfuzz/gengen.js`
  * (6,018 random programs + fixed early-error probes, zero
  * divergences), and these rows pin the load-bearing behaviors as the
  * regression net.
  *
  * The execution model under test is thread-per-generator with strict
  * synchronous handoff ([[Generators]]): the last two tests pin the
  * host-side contracts that model adds — budget kills crossing a
  * suspension uncatchably, and abandoned suspended bodies reaped by
  * [[Interp.closeGenerators]] (the lens worker calls it per record). */
class JsGeneratorSpec extends AnyFunSuite with Matchers {

  private def run(code: String, data: PoValue = PoObj.empty): MapResult = {
    val fn = JsMapFn.compile(code) match {
      case Right(f) => f
      case Left(err) => fail(s"startup error: ${err.errType}: ${err.message}")
    }
    MapRunner.run(fn, MapPath("/datasets/author:name/records/recordID",
      "datasets", "author", "name", "recordID"), data)
  }

  private def str(body: String): String = {
    val res = run(s"output('r', '' + ((function(){ $body })()))")
    res.error.foreach(e => fail(s"unexpected ${e.errType}: ${e.message}"))
    res.outputs.headOption match {
      case Some((_, PoStr(s))) => s
      case other => fail(s"no string output: $other")
    }
  }

  private def startupError(code: String): Unit =
    JsMapFn.compile(code) match {
      case Left(err) => err.errType shouldBe "SyntaxError"
      case Right(_) => fail(s"expected a startup error for: $code")
    }

  test("basic drive: yields, return value, past-done nexts") {
    str(
      """function* g(){ yield 1; yield 2; return 'R'; }
        |const it = g(); const out = [];
        |for (let k = 0; k < 4; k++) { const r = it.next(); out.push(r.value, r.done); }
        |return JSON.stringify(out);""".stripMargin
    ) shouldBe """[1,false,2,false,"R",true,null,true]"""
  }

  test("yield is an expression: next(v) resumes with v; first next's arg drops") {
    str(
      """function* g(){ const a = yield 10; const b = yield a + 1; return a + '|' + b; }
        |const it = g();
        |return [it.next('drop').value, it.next('A').value, it.next('B').value].join(';');""".stripMargin
    ) shouldBe "10;A1;A|B"
  }

  test("gen.return runs finally and completes; done generators stay done") {
    str(
      """let s = '';
        |function* g(){ try { yield 1; yield 2; } finally { s += 'F'; } }
        |const it = g(); s += it.next().value;
        |const r = it.return('z'); s += '|' + r.value + r.done;
        |const r2 = it.next(); s += '|' + r2.value + r2.done;
        |return s;""".stripMargin
    ) shouldBe "1F|ztrue|undefinedtrue"
  }

  test("yield inside finally during return(): generator suspends again (V8)") {
    str(
      """function* g(){ try { yield 1; } finally { yield 'fin'; } return 9; }
        |const it = g(); const out = [];
        |out.push(it.next().value);
        |const r = it.return('rv'); out.push(r.value, r.done);
        |const r2 = it.next(); out.push(r2.value, r2.done);
        |return JSON.stringify(out);""".stripMargin
    ) shouldBe """[1,"fin",false,"rv",true]"""
  }

  test("gen.throw lands at the yield: catchable inside, else propagates; pre-start completes") {
    str(
      """let s = '';
        |function* g(){ try { yield 'a'; } catch (e) { s += 'c' + e; yield 'b'; } yield 'd'; }
        |const it = g(); s += it.next().value;
        |s += it.throw('T').value; s += it.next().value;
        |const h = g();
        |try { h.throw('pre'); } catch (e) { s += '|' + e; }
        |s += h.next().done;
        |return s;""".stripMargin
    ) shouldBe "abd|pretrue" // the catch's `s +=` is overwritten: JS reads `s` BEFORE evaluating the RHS
  }

  test("yield* delegates to a generator: elements, resume values, and the inner RETURN value") {
    str(
      """let s = '';
        |function* inner(){ const a = yield 'i1'; yield a + '!'; return 'IR'; }
        |function* outer(){ const r = yield* inner(); s += '=' + r; yield 'o'; }
        |const it = outer();
        |s += it.next().value + ',' + it.next('X').value + ',' + it.next().value;
        |return s;""".stripMargin
    ) shouldBe "i1,X!,o" // same read-before-RHS: the '=IR' append is overwritten by the outer `s +=`
  }

  test("yield* over builtin iterables; throw at a builtin delegation is the V8 TypeError") {
    str(
      """function* g(){ yield* [1, 2]; yield* 'ab'; yield* new Set([7, 7, 8]); }
        |let s = [...g()].join('|');
        |function* h(){ try { yield* [1, 2, 3]; } catch (e) { s += '#' + e.constructor.name; } }
        |const it = h(); it.next();
        |try { it.throw('x'); } catch (e) { s += '!' + e; }
        |return s;""".stripMargin
    ) shouldBe "1|2|a|b|7|8#TypeError"
  }

  test("for-of break closes the generator (finally at the break point)") {
    str(
      """let s = '';
        |function* g(){ try { let i = 0; while (true) yield i++; } finally { s += 'CLOSED'; } }
        |for (const v of g()) { s += v; if (v >= 2) break; }
        |return s;""".stripMargin
    ) shouldBe "012CLOSED"
  }

  test("destructuring pulls exactly the bound count and closes — infinite generator terminates") {
    str(
      """let s = '';
        |function* nat(){ let i = 0; try { while (true) yield i++; } finally { s += 'X'; } }
        |const [a, b] = nat();
        |return s + '|' + a + b;""".stripMargin
    ) shouldBe "X|01"
  }

  test("spread, Array.from, new Set, new Map all drive generators") {
    str(
      """function* g(){ yield 'a'; yield 'b'; yield 'a'; }
        |function* pairs(){ let i = 0; for (const c of g()) yield [c, i++]; }
        |return [...g()].join('') + '|' + Array.from(g()).length + '|' +
        |  [...new Set(g())].join('') + '|' + JSON.stringify([...new Map(pairs())]);""".stripMargin
    ) shouldBe """aba|3|ab|[["a",2],["b",1]]"""
  }

  test("generator methods: object literal, class instance, class static, `this` binding") {
    str(
      """const o = { base: 3, *steps(n){ for (let i = 1; i <= n; i++) yield this.base * i; } };
        |let s = [...o.steps(3)].join(',');
        |class C { constructor(k){ this.k = k; } *walk(){ yield this.k; yield this.k + 1; } static *tag(){ yield 'S'; } }
        |return s + '|' + [...new C(7).walk()].join(',') + '|' + [...C.tag()].join('');""".stripMargin
    ) shouldBe "3,6,9|7,8|S"
  }

  test("instances are independent; closures see mutations across suspensions") {
    str(
      """function* g(start){ yield start; yield start + 1; }
        |const a = g(0), b = g(10);
        |let s = [a.next().value, b.next().value, a.next().value, b.next().value].join(',');
        |let shared = 1;
        |function* h(){ yield shared; yield shared; }
        |const it = h(); s += '|' + it.next().value; shared = 99; s += ',' + it.next().value;
        |return s;""".stripMargin
    ) shouldBe "0,10,1,11|1,99"
  }

  test("re-entrant next() is a TypeError; new on a generator function is a TypeError") {
    str(
      """let it; let s = '';
        |function* g(){ try { yield it.next(); } catch (e) { s += 'RE' + e.constructor.name; } yield 'after'; }
        |it = g(); it.next(); s += '|' + it.next().value;
        |function* h(){ yield 1; }
        |try { new h(); s += 'NO'; } catch (e) { s += '|' + e.constructor.name; }
        |return s;""".stripMargin
    ) shouldBe "RETypeError|undefined|TypeError" // first next() already consumed 'after' (the argument's re-entrant call threw before its yield)
  }

  test("typeof/toString/JSON surfaces match V8") {
    str(
      """function* g(){ yield 1; }
        |const it = g();
        |return [typeof g, typeof it, '' + it, JSON.stringify(it), JSON.stringify({g: it})].join('|');""".stripMargin
    ) shouldBe """function|object|[object Generator]|{}|{"g":{}}"""
  }

  test("body exceptions surface at the resuming next(); generator completes") {
    str(
      """function* g(){ yield 1; throw new RangeError('boom'); }
        |const it = g(); let s = '' + it.next().value;
        |try { it.next(); s += 'NO'; } catch (e) { s += '|' + e.constructor.name + ':' + e.message; }
        |const r = it.next(); s += '|' + r.value + r.done;
        |return s;""".stripMargin
    ) shouldBe "1|RangeError:boom|undefinedtrue"
  }

  test("custom iterables via Symbol.iterator: generator methods, classes, manual protocol") {
    str(
      """const o = { base: 3, *[Symbol.iterator](){ for (let i = 0; i < 3; i++) yield this.base + i; } };
        |let s = JSON.stringify([[...o], Array.from(o), Object.keys(o)]);
        |const m = { [Symbol.iterator](){ let i = 0; return { next(){ return i < 2 ? { value: i++, done: false } : { done: true }; } }; } };
        |return s + '|' + JSON.stringify([...m]);""".stripMargin
    ) shouldBe """[[3,4,5],[3,4,5],["base"]]|[0,1]"""
  }

  test("IteratorClose reaches THROUGH custom iterables: break and destructuring close the source") {
    str(
      """let s = '';
        |class R { constructor(a, b){ this.a = a; this.b = b; }
        |  *[Symbol.iterator](){ try { for (let i = this.a; i < this.b; i++) yield i; } finally { s += 'C'; } } }
        |const r = new R(2, 9);
        |for (const v of r) { s += v; if (v >= 4) break; }
        |const [first] = r;
        |return s + '|' + first;""".stripMargin
    ) shouldBe "234CC|2"
  }

  // implicit string conversion of a symbol is V8's own TypeError;
  // `Symbol('mine')` creates a UNIQUE symbol since r15 (JsSymbolV)
  test("symbols: typeof, identity, enumeration hiding, JSON drop, loud conversions") {
    str(
      """const o = { a: 1, [Symbol.iterator]: function*(){ yield 9; } };
        |let s = JSON.stringify([typeof Symbol.iterator, Symbol.iterator === Symbol.iterator,
        |  Object.keys(o), JSON.stringify(o), JSON.stringify({ x: Symbol.iterator, n: 2 })]);
        |try { '' + Symbol.iterator; s += 'NO'; } catch (e) { s += '|' + e.constructor.name; }
        |s += '|' + typeof Symbol('mine') + '|' + (Symbol('mine') === Symbol('mine'));
        |return s;""".stripMargin
    ) shouldBe """["symbol",true,["a"],"{\"a\":1}","{\"n\":2}"]|TypeError|symbol|false"""
  }

  test("early errors: yield outside generators, in arrows, params, field inits; bad members") {
    startupError("function f(){ yield 1; }")
    startupError("function* g(){ const f = () => yield 1; }")
    startupError("function* g(a = yield 1){}")
    startupError("function* g(){ class C { x = yield 1; } }")
    startupError("class C { get *x(){} }")
    startupError("class C { *constructor(){} }")
    startupError("const o = { *m: 1 };")
  }

  test("generator output values are rejected loudly (structured clone contract)") {
    val res = run("function* g(){ yield 1; } output('r', g())")
    res.error.map(_.errType) shouldBe Some("TypeError")
  }

  test("step budget kills a runaway generator body across a suspension — uncatchable") {
    // the infinite body spins INSIDE the generator's thread after the
    // first resume; the shared Budget must kill it and the failure must
    // surface on the caller as the host exception (not a JS throw)
    val res = run(
      """function* g(){ yield 1; let x = 0; while (true) x++; }
        |const it = g(); it.next();
        |try { it.next(); } catch (e) { output('caught', 'NO'); }
        |output('r', 'unreachable');""".stripMargin)
    res.error.map(_.errType) shouldBe Some("JsBudgetExceeded")
    res.outputs shouldBe empty
  }

  test("teardown-run finally blocks complete INSIDE the map call — their outputs are deterministic") {
    // close() waits for the unwinding body, so a finally that calls
    // output() lands in the record's result every time, never racing
    // the caller (V8 would skip the finally entirely on GC — the
    // documented divergence toward predictability)
    (1 to 10).foreach { _ =>
      val res = run(
        """function* g(){ try { yield 1; } finally { output('late', 'ran'); } }
          |g().next();
          |output('main', 'done');""".stripMargin)
      res.error shouldBe None
      res.outputs.map(_._1).sorted shouldBe Vector("late", "main")
    }
  }

  test("suspended generators do not eat the caller's call-depth budget") {
    // depth is per-thread: each suspended body holds frames on its OWN
    // worker's stack, so 600 of them must not break an unrelated call
    // on the main thread (a shared counter did, at 500)
    str(
      """const gs = [];
        |for (let i = 0; i < 600; i++) { const g = (function*(){ yield 1; })(); g.next(); gs.push(g); }
        |function f(){ return 'ok'; }
        |return f() + gs.length;""".stripMargin
    ) shouldBe "ok600"
  }

  test("user string keys that LOOK like symbol slots stay ordinary properties") {
    str(
      """const o = { '@@iterator': 1, '@@type': 'x', a: 2 };
        |return JSON.stringify([Object.keys(o), JSON.stringify(o), o['@@iterator'], '@@iterator' in o]);""".stripMargin
    ) shouldBe """[["@@iterator","@@type","a"],"{\"@@iterator\":1,\"@@type\":\"x\",\"a\":2}",1,true]"""
  }

  test("yield* over a custom iterable closes the inner generator at outer return") {
    str(
      """let s = '';
        |function* inner(){ try { yield 1; yield 2; } finally { s += 'IF'; } }
        |const it = { [Symbol.iterator](){ return inner(); } };
        |function* outer(){ yield* it; }
        |const o = outer(); s += o.next().value; o.return(5);
        |return s;""".stripMargin
    ) shouldBe "1IF"
  }

  test("abandoned suspended generators are reaped: their bodies release workers after the map call") {
    // pooled workers outlive bodies by design, so the leak observable
    // is the LIVE-BODY gauge (a body holds a worker; a released body
    // returns it), not a thread count
    (1 to 25).foreach { _ =>
      val res = run(
        """function* g(){ try { let i = 0; while (true) yield i++; } finally { /* suspended here */ } }
          |const it = g(); it.next(); it.next();
          |output('r', 'left suspended');""".stripMargin)
      res.error shouldBe None
    }
    // closeGenerators sent GenKill to each suspended body at map-call
    // end; give the unwinding workers a beat to decrement the gauge
    val deadline = System.nanoTime() + 5000000000L
    while (Generators.liveBodies.get() > 0 && System.nanoTime() < deadline) Thread.sleep(20)
    Generators.liveBodies.get() shouldBe 0
  }
}
