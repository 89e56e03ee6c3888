// Proxy + ToPrimitive-coercion probe generator (round 13).
// Same protocol as the sibling generators: JSON ["program", "v8 result"]
// lines, program = IIFE under `'' + (expr)`, exceptions as THROW:<ctor>.
//
// Covers the supported Proxy subset: get/set/has/deleteProperty/ownKeys
// traps (data-returning, forwarding via Reflect, counting, throwing),
// no-trap forwarding, revocable proxies, enumeration surfaces
// (Object.keys/values/entries/assign/hasOwn, for-in, spread, rest),
// JSON.stringify (object + pierced array + toJSON-through-trap),
// Array.isArray piercing, in/delete operators, proxy-of-array for-of —
// and the round's OrdinaryToPrimitive fix: user valueOf/toString in
// +/-/*/==/relational/template coercion, on plain objects, class
// instances, and proxies.
//
// Out-of-subset (NOT generated — loud TypeErrors by design): function
// targets (apply/construct traps), defineProperty/getOwnPropertyDescriptor
// traps, descriptor invariant checks.
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "300", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

const templates = [
  // no-trap proxy forwards everything to the target
  () => `const t = { a: ${int(9)}, b: 'x${int(9)}' };
    const p = new Proxy(t, {});
    p.c = ${int(9)}; delete p.a;
    return JSON.stringify([p.a, p.b, p.c, t.c, 'b' in p, Object.keys(p), JSON.stringify(p)]);`,

  // data-returning get trap; set trap journals writes
  () => `const log = [];
    const t = { a: 1 };
    const p = new Proxy(t, {
      get(tt, k){ return typeof tt[k] === 'undefined' ? 'G' + k : tt[k] * ${2+int(3)}; },
      set(tt, k, v){ log.push(k + '=' + v); tt[k] = v + ${int(5)}; return true; }
    });
    p.b = ${int(9)};
    return JSON.stringify([p.a, p.b, p.zzz, t.b, log]);`,

  // has trap drives `in`; deleteProperty trap journals
  () => `const dels = [];
    const p = new Proxy({ a: 1, b: 2 }, {
      has(t, k){ return k.length === ${1+int(2)}; },
      deleteProperty(t, k){ dels.push(k); delete t[k]; return true; }
    });
    delete p.a;
    return JSON.stringify(['a' in p, 'ab' in p, 'abc' in p, dels, Object.keys(p)]);`,

  // ownKeys trap reshapes enumeration: keys/values/entries/spread/rest/for-in
  () => `const t = { a: 1, b: 2, c: 3 };
    const p = new Proxy(t, { ownKeys(tt){ return ['${pick(["a","b"])}', 'c', 'zz']; } });
    let s = '';
    for (const k in p) s += k + ';';
    const { a, ...rest } = p;
    return JSON.stringify([Object.keys(p), Object.values(p), s, { ...p }, a, rest]);`,

  // get trap + ownKeys combine for JSON.stringify and Object.entries
  () => `const p = new Proxy({ a: ${int(9)}, b: ${int(9)} }, {
      get(t, k){ return k === 'a' ? 99 : t[k]; },
      ownKeys(t){ return ['b', 'a']; }
    });
    return JSON.stringify([JSON.stringify(p), Object.entries(p)]);`,

  // proxy of ARRAY: isArray pierces, JSON serializes as array, for-of works
  () => `const arr = [${int(5)}, ${int(5)}, ${int(5)}];
    const p = new Proxy(arr, ${pick([
      "{}",
      "{ get(t, k){ return k === '1' ? 77 : t[k]; } }",
    ])});
    let s = '';
    for (const v of p) s += v + ',';
    return JSON.stringify([Array.isArray(p), JSON.stringify(p), s, [...p], p.length]);`,

  // Reflect forwarding inside traps (the idiomatic handler)
  () => `const t = { x: ${int(9)} };
    const p = new Proxy(t, {
      get(tt, k, r){ return Reflect.get(tt, k); },
      set(tt, k, v){ return Reflect.set(tt, k, v * 2); },
      has(tt, k){ return Reflect.has(tt, k); }
    });
    p.y = ${1+int(5)};
    return JSON.stringify([p.x, p.y, 'x' in p, 'zz' in p, Reflect.ownKeys({ q: 1 })]);`,

  // revocable: works, then every op throws TypeError after revoke
  () => `const { proxy, revoke } = Proxy.revocable({ a: ${int(9)} }, {});
    let s = '' + proxy.a;
    revoke();
    try { s += proxy.a; } catch (e) { s += '|' + e.constructor.name; }
    try { 'a' in proxy; } catch (e) { s += '|' + e.constructor.name; }
    return s;`,

  // throwing trap propagates to the operation site
  () => `const p = new Proxy({}, { get(t, k){ if (k === 'boom') throw new RangeError('R'); return 'ok'; } });
    let s = '' + p.fine;
    try { p.boom; s += 'NO'; } catch (e) { s += '|' + e.constructor.name; }
    return s;`,

  // constructor errors: non-object target/handler, Proxy without new
  () => `let s = '';
    try { new Proxy(${pick(["5", "'x'", "null", "undefined"])}, {}); } catch (e) { s += e.constructor.name; }
    try { new Proxy({}, ${pick(["5", "null"])}); } catch (e) { s += '|' + e.constructor.name; }
    try { Proxy({}, {}); } catch (e) { s += '|' + e.constructor.name; }
    return s;`,

  // Object.assign through proxies (source getters via trap, proxy target setters)
  () => `const src = new Proxy({ a: 1, b: 2 }, { get(t, k){ return t[k] * 10; } });
    const t2 = {};
    const dst = new Proxy(t2, { set(t, k, v){ t[k] = v + 1; return true; } });
    Object.assign(dst, src);
    return JSON.stringify(t2);`,

  // --- the OrdinaryToPrimitive wave (user valueOf/toString honored) ---
  () => `const o = { toString(){ return 'S${int(9)}'; } };
    return '' + o + '|' + \`t\${o}\` + '|' + (o + '!');`,

  () => `const o = { valueOf(){ return ${1+int(9)}; } };
    return JSON.stringify([o + ${int(9)}, o * 2, o - 1, -o, +o, o < ${int(9)}, o == ${1+int(9)}, '' + o]);`,

  () => `const o = { valueOf(){ return ${int(5)}; }, toString(){ return 'T'; } };
    return JSON.stringify(['' + o, \`\${o}\`, o + 1, o > 1, String(o)]);`,

  // valueOf returning a NON-primitive falls through to toString (ES 7.1.1.1)
  () => `const o = { valueOf(){ return {}; }, toString(){ return '${int(99)}'; } };
    return JSON.stringify([o + 1, o * 3, '' + o]);`,

  // neither converts -> TypeError
  () => `const o = { valueOf(){ return {}; }, toString(){ return []; } };
    try { return '' + (o + 1); } catch (e) { return 'c' + e.constructor.name; }`,

  // class instances: conversion methods found on the prototype chain
  () => `class Money { constructor(v){ this.v = v; } valueOf(){ return this.v; } toString(){ return '$' + this.v; } }
    const m = new Money(${1+int(50)});
    return JSON.stringify([m + 1, m * 2, \`\${m}\`, '' + m, m < ${int(99)}, m == ${1+int(50)}]);`,

  // inherited via extends; subclass overrides one of the pair
  () => `class A { valueOf(){ return ${1+int(9)}; } }
    class B extends A { toString(){ return 'B!'; } }
    const b = new B();
    return JSON.stringify([b + 1, '' + b, \`\${b}\`, b * 2]);`,

  // proxies + coercion: conversion methods resolve through the get trap
  () => `const p = new Proxy({}, { get(t, k){
      if (k === 'valueOf') return () => ${1+int(9)};
      if (k === 'toString') return () => 'PT';
      return undefined; } });
    return JSON.stringify([p + 1, '' + p, \`\${p}\`, p * 3]);`,

  // no-trap proxy of an object WITH user conversion methods
  () => `const p = new Proxy({ valueOf(){ return ${1+int(9)}; } }, {});
    return JSON.stringify([p + 1, p * 2, p == ${1+int(9)}]);`,

  // update/compound operators through valueOf
  () => `let o = { n: ${int(5)}, valueOf(){ return this.n; } };
    const a = o++; // o becomes a NUMBER after this
    let s = JSON.stringify([a, o]);
    let x = { valueOf(){ return 10; } };
    x += 5;
    return s + '|' + x;`,

  // JSON.stringify replacer FUNCTION (holder-aware, root key '')
  () => `const keys = [];
    const out = JSON.stringify({ a: ${int(9)}, b: { c: 'x${int(9)}', d: [1, ${int(9)}] } },
      function (k, v) { keys.push(k); return typeof v === 'number' ? v * ${2+int(3)} : v; }${pick(["", ", 2"])});
    return out + '|' + keys.join(';');`,

  // JSON.stringify PropertyList array (order, dupes, numbers, arrays unaffected)
  () => `const o = { a: 1, b: 2, c: { a: 9, z: 8 }, 3: 'n', arr: [{ a: 1, q: 2 }] };
    return JSON.stringify(o, ${pick([
      "['c', 'a', 'a']", "['a', 3]", "['arr', 'a', 'q']", "['z', 'b']",
    ])});`,

  // replacer returning undefined drops members; dates pass through toJSON first
  () => `const o = { keep: 1, drop: 2, d: new Date(${int(1e6)}) };
    return '' + JSON.stringify(o, (k, v) => k === 'drop' ? undefined : v);`,

  // JSON.parse reviver (bottom-up, undefined deletes, holder binding)
  () => `const seen = [];
    const v = JSON.parse('{"a":1,"b":[2,3],"c":{"d":4}}', function (k, val) {
      seen.push(k);
      if (k === '${pick(["a","d"])}') return undefined;
      return typeof val === 'number' ? val + ${1+int(5)} : val;
    });
    return JSON.stringify(v) + '|' + seen.join(';');`,

  // builtin coercion: Math/parseInt/parseFloat/isNaN honor valueOf/toString
  () => `const n = { valueOf(){ return ${pick(["-7", "2.5", "9"])}; } };
    const st = { toString(){ return '${pick(["42", "3.5", "0x10"])}'; } };
    return JSON.stringify([Math.abs(n), Math.max(n, 1), Math.min(n, 1),
      Math.floor(n), Math.pow(n, 2), parseInt(st), parseFloat(st), isNaN(n), Number(st)]);`,

  // join/sort coercion: elements and separators with user toString
  () => `const e = { toString(){ return 'E${int(9)}'; } };
    const sep = { toString(){ return '${pick(["-", "+"])}'; } };
    const arr = ['b', e, 'a'];
    return arr.join(sep) + '|' + [${int(9)}, e, 'c'].sort().join(',');`,

  // string/array METHOD ARGUMENTS coerce through valueOf/toString
  () => `const i = { valueOf(){ return ${1+int(3)}; } };
    const pat = { toString(){ return '${pick(["b", "c", "l"])}'; } };
    return JSON.stringify(['abcdefl'.slice(i, ${4+int(3)}), 'abcl'.indexOf(pat),
      'abc'.repeat(i), 'ab'.padStart(${4+int(3)}, pat), [1, 2, 3, 4, 5].slice(i).join(''),
      'xbyl'.replace(pat, '${pick(["Z", ""])}'), [7, 8, 9].at(i)]);`,
];

const fixed = [
  // creating over a function target is legal; calls forward when no
  // apply trap (typeof pierces to "function")
  `(function(){ const p = new Proxy(function(){ return 'F'; }, {}); return typeof p + '|' + p(); })()`,
  // structured clone of a proxy: compared via e.name (node's ctor is
  // DOMException with name DataCloneError; this engine reports the
  // same name)
  `(function(){ const p = new Proxy({}, {}); try { return structuredClone(p); } catch (e) { return 'sc' + e.name; } })()`,
  `(function(){ const p = new Proxy({ a: 1 }, { get(t, k){ return 'G'; } }); return JSON.stringify({ x: p }); })()`,
  `(function(){ const inner = new Proxy([1, 2], {}); const outer = new Proxy(inner, {}); return JSON.stringify([Array.isArray(outer), JSON.stringify(outer)]); })()`,
];

for (const prog of fixed) {
  let out;
  try { out = "" + eval(prog); } catch (e) { out = "THROW:" + e.constructor.name; }
  console.log(JSON.stringify([prog, out]));
}

for (let n = 0; n < count; n++) {
  const body = templates[Math.floor(rnd()*templates.length)]();
  const prog = `(function(){ ${body.replace(/\n\s*/g, " ")} })()`;
  let out;
  try { out = "" + eval(prog); } catch (e) { out = "THROW:" + e.constructor.name; }
  console.log(JSON.stringify([prog, out]));
}
