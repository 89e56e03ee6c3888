package graft.js

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import graft.core._
import graft.lens._

/** Proxy subset + interp-aware ToPrimitive (round 13). Every
  * expectation is the value stock V8 (node 20) produces; the discovery
  * sweep was `tools/jsfuzz/proxygen.js` (1,208 dedicated probes +
  * 7,210 all-generator regression sweep, zero divergences), and these
  * rows pin the load-bearing behaviors.
  *
  * Supported: get/set/has/deleteProperty/ownKeys traps (with V8's
  * target-existence filter on ownKeys results), Proxy.revocable,
  * Reflect.{get,set,has,deleteProperty,ownKeys}, enumeration surfaces
  * (keys/values/entries/assign/hasOwn/for-in/spread/rest), JSON
  * (object, pierced array, toJSON-through-trap), Array.isArray and
  * typeof piercing, call-forwarding through no-apply-trap function
  * proxies. Out (loud TypeErrors): apply/construct traps,
  * defineProperty/getOwnPropertyDescriptor traps, proxy output values.
  *
  * The ToPrimitive half pins the coercion fix the proxy work surfaced:
  * user valueOf/toString now run in +/relational/==/template/String()
  * coercion — on plain objects, class instances (prototype chain), and
  * proxies (through the get trap). */
class JsProxySpec extends AnyFunSuite with Matchers {

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

  test("no-trap proxy forwards get/set/delete/in/keys/JSON to the target") {
    str(
      """const t = { a: 7, b: 'x' };
        |const p = new Proxy(t, {});
        |p.c = 3; delete p.a;
        |return JSON.stringify([p.b, p.c, t.c, 'b' in p, 'a' in p, Object.keys(p), JSON.stringify(p)]);""".stripMargin
    ) shouldBe """["x",3,3,true,false,["b","c"],"{\"b\":\"x\",\"c\":3}"]"""
  }

  test("get/set traps intercept; absent keys hit the trap too") {
    str(
      """const log = [];
        |const t = { a: 4 };
        |const p = new Proxy(t, {
        |  get(tt, k){ return typeof tt[k] === 'undefined' ? 'G' + k : tt[k] * 10; },
        |  set(tt, k, v){ log.push(k + '=' + v); tt[k] = v + 1; return true; }
        |});
        |p.b = 5;
        |return JSON.stringify([p.a, p.b, p.zz, t.b, log]);""".stripMargin
    ) shouldBe """[40,60,"Gzz",6,["b=5"]]"""
  }

  test("ownKeys trap: phantom keys the target lacks are filtered (V8 descriptor check)") {
    str(
      """const t = { a: 1, b: 2, c: 3 };
        |const p = new Proxy(t, { ownKeys(tt){ return ['a', 'c', 'zz']; } });
        |let s = '';
        |for (const k in p) s += k + ';';
        |const { a, ...rest } = p;
        |return JSON.stringify([Object.keys(p), Object.values(p), s, { ...p }, a, rest]);""".stripMargin
    ) shouldBe """[["a","c"],[1,3],"a;c;",{"a":1,"c":3},1,{"c":3}]"""
  }

  test("proxy of array: isArray and typeof pierce, for-of/spread/JSON serialize as array") {
    str(
      """const p = new Proxy([1, 2, 3], { get(t, k){ return k === '1' ? 77 : t[k]; } });
        |let s = '';
        |for (const v of p) s += v + ',';
        |return JSON.stringify([Array.isArray(p), typeof p, JSON.stringify(p), s, [...p], p.length]);""".stripMargin
    ) shouldBe """[true,"object","[1,77,3]","1,77,3,",[1,77,3],3]"""
  }

  test("Reflect forwards through the interpreter's own member paths") {
    str(
      """const t = { x: 2 };
        |const p = new Proxy(t, {
        |  get(tt, k, r){ return Reflect.get(tt, k); },
        |  set(tt, k, v){ return Reflect.set(tt, k, v * 2); },
        |  has(tt, k){ return Reflect.has(tt, k); }
        |});
        |p.y = 5;
        |return JSON.stringify([p.x, p.y, 'x' in p, 'zz' in p, Reflect.ownKeys({ q: 1 })]);""".stripMargin
    ) shouldBe """[2,10,true,false,["q"]]"""
  }

  test("revocable: every trapped op is a TypeError after revoke") {
    str(
      """const { proxy, revoke } = Proxy.revocable({ a: 9 }, {});
        |let s = '' + proxy.a;
        |revoke();
        |try { proxy.a; } catch (e) { s += '|' + e.constructor.name; }
        |try { 'a' in proxy; } catch (e) { s += '|' + e.constructor.name; }
        |return s;""".stripMargin
    ) shouldBe "9|TypeError|TypeError"
  }

  test("function targets: creation legal, calls forward without an apply trap; apply trap is loud") {
    str(
      """const p = new Proxy(function(){ return 'F'; }, {});
        |let s = typeof p + '|' + p();
        |const q = new Proxy(function(){}, { apply(){ return 1; } });
        |try { q(); s += 'NO'; } catch (e) { s += '|' + e.constructor.name; }
        |return s;""".stripMargin
    ) shouldBe "function|F|TypeError"
  }

  test("constructor errors match V8: non-object target/handler, call without new") {
    str(
      """let s = '';
        |try { new Proxy(5, {}); } catch (e) { s += e.constructor.name; }
        |try { new Proxy({}, null); } catch (e) { s += '|' + e.constructor.name; }
        |try { Proxy({}, {}); } catch (e) { s += '|' + e.constructor.name; }
        |return s;""".stripMargin
    ) shouldBe "TypeError|TypeError|TypeError"
  }

  test("proxies never reach lens output or structuredClone silently") {
    run("output('r', new Proxy({}, {}))").error.map(_.errType) shouldBe Some("TypeError")
    str(
      """try { structuredClone(new Proxy({}, {})); return 'NO'; }
        |catch (e) { return e.name; }""".stripMargin
    ) shouldBe "DataCloneError"
  }

  test("ToPrimitive: user valueOf/toString honored in +, relational, ==, templates, String()") {
    str(
      """const o = { valueOf(){ return 4; }, toString(){ return 'T'; } };
        |return JSON.stringify(['' + o, `${o}`, o + 1, o > 1, o == 4, String(o), o * 3, -o]);""".stripMargin
    ) shouldBe """["4","T",5,true,true,"T",12,-4]"""
  }

  test("ToPrimitive: non-primitive valueOf falls to toString; both failing is a TypeError") {
    str(
      """const o = { valueOf(){ return {}; }, toString(){ return '42'; } };
        |let s = JSON.stringify([o + 1, o * 2]);
        |const bad = { valueOf(){ return {}; }, toString(){ return []; } };
        |try { bad + 1; s += 'NO'; } catch (e) { s += '|' + e.constructor.name; }
        |return s;""".stripMargin
    ) shouldBe """["421",84]|TypeError""" // '42' + 1 concatenates: the fallback toString result is a STRING
  }

  test("JSON.stringify replacer function: holder-aware, root key '', undefined drops") {
    str(
      """const keys = [];
        |const out = JSON.stringify({ a: 2, b: { c: 'x' }, drop: 1 },
        |  function (k, v) { keys.push(k); return k === 'drop' ? undefined : (typeof v === 'number' ? v * 10 : v); });
        |return out + '|' + keys.join(';');""".stripMargin
    ) shouldBe """{"a":20,"b":{"c":"x"}}|;a;b;c;drop"""
  }

  test("JSON.stringify PropertyList: list order, dupes dropped, arrays unaffected") {
    str(
      """const o = { a: 1, b: 2, c: { a: 9, z: 8 }, arr: [{ a: 1, q: 2 }] };
        |return JSON.stringify(o, ['c', 'a', 'a']) + '|' +
        |  JSON.stringify(o, ['arr', 'a', 'q']);""".stripMargin
    ) shouldBe """{"c":{"a":9},"a":1}|{"arr":[{"a":1,"q":2}],"a":1}"""
  }

  test("JSON.parse reviver: bottom-up, undefined deletes, numbers transformed") {
    str(
      """const seen = [];
        |const v = JSON.parse('{"a":1,"b":[2,3],"c":{"d":4}}', function (k, val) {
        |  seen.push(k);
        |  if (k === 'd') return undefined;
        |  return typeof val === 'number' ? val + 1 : val;
        |});
        |return JSON.stringify(v) + '|' + seen.join(';');""".stripMargin
    ) shouldBe """{"a":2,"b":[3,4],"c":{}}|a;0;1;b;d;c;"""
  }

  test("string/array method ARGUMENTS coerce through valueOf/toString") {
    str(
      """const i = { valueOf(){ return 1; } };
        |const pat = { toString(){ return 'll' } };
        |return JSON.stringify(['abcdef'.slice(i, 4), 'hello'.indexOf(pat),
        |  'abc'.repeat({ valueOf(){ return 2 } }), 'abc'.padStart(6, { toString(){ return '-' } }),
        |  [1, 2, 3, 4].slice(i, 3).join(''), [5, 6, 7].at({ valueOf(){ return -1 } })]);""".stripMargin
    ) shouldBe """["bcd",2,"abcabc","---abc","23",7]"""
  }

  test("builtin argument coercion honors valueOf/toString: Math, parseInt, join, sort") {
    str(
      """const n = { valueOf(){ return -7; } };
        |const st = { toString(){ return '42'; } };
        |const sep = { toString(){ return '-'; } };
        |return JSON.stringify([Math.abs(n), Math.max(n, 1), parseInt(st), parseFloat(st),
        |  isNaN(n), Number(st), ['b', { toString(){ return 'E'; } }, 'a'].join(sep)]);""".stripMargin
    ) shouldBe """[7,1,42,42,false,42,"b-E-a"]"""
  }

  test("ToPrimitive: class instances via the prototype chain, proxies via the get trap") {
    str(
      """class Money { constructor(v){ this.v = v; } valueOf(){ return this.v; } toString(){ return '$' + this.v; } }
        |const m = new Money(5);
        |let s = JSON.stringify([m + 1, `${m}`, m < 9]);
        |const p = new Proxy({}, { get(t, k){
        |  if (k === 'valueOf') return () => 7;
        |  if (k === 'toString') return () => 'PT';
        |  return undefined; } });
        |return s + '|' + JSON.stringify([p + 1, '' + p, `${p}`]);""".stripMargin
    ) shouldBe """[6,"$5",true]|[8,"7","PT"]"""
  }
}
