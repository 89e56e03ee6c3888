// Unique-Symbol probe generator (round 15 — `Symbol(desc)` landed).
// Same protocol as exprgen.js: ["expr","v8"] JSON lines, node ground
// truth via `'' + eval(expr)`, exceptions as THROW:<ctor>.
// Coverage: creation + identity (===), typeof, description (undefined
// vs ''), String() explicit vs implicit-coercion TypeErrors, symbol
// property KEYS on object literals / classes / computed members,
// enumeration hiding (Object.keys/values/entries, for-in, JSON
// .stringify, spread-to-strings) vs enumeration surfaces that DO see
// symbols (getOwnPropertySymbols, Reflect.ownKeys tail, spread/assign
// carrying symbol props), delete / `in`, symbols through Proxy
// get/set/has traps (key passes RAW), symbols as Map keys / Set
// members (SameValueZero identity), and well-known canonicals.
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "300", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

const descs = () => pick(["'tag'", "'x'", "''", "", "42", "null", "undefined", "true"]);

const templates = [
  // creation, identity, typeof, description
  () => `(() => {
    const a = Symbol(${descs()}), b = Symbol(${descs()});
    return typeof a + '|' + (a === b) + '|' + (a === a) + '|' + String(a.description) + '|' + a.toString();
  })()`,

  // explicit String() vs implicit coercion
  () => `(() => {
    const s = Symbol(${descs()});
    try { return ${pick(["'' + s", "s + 1", "`t${s}`", "s * 2", "+s", "s.toUpperCase"])} }
    catch (e) { return 'T' + e.name + '/' + String(s) }
  })()`,

  // keying: object literal computed keys, get/set/delete/in
  () => `(() => {
    const s1 = Symbol('a'), s2 = Symbol('a');
    const o = { [s1]: 1, x: 'str', [s2]: 2 };
    o[s1] = o[s1] + 10;
    const had = s2 in o;
    delete o[s2];
    return o[s1] + '|' + had + '|' + (s2 in o) + '|' + String(o[s2]) + '|' + JSON.stringify(Object.keys(o));
  })()`,

  // enumeration hiding: keys/values/entries/for-in/JSON vs symbol surfaces
  () => `(() => {
    const s = Symbol('hidden');
    const o = { a: 1, [s]: 'secret', b: ${int(9)} };
    let forin = '';
    for (const k in o) forin += k;
    return JSON.stringify(o) + '|' + Object.keys(o).join(',') + '|' +
      Object.values(o).join(',') + '|' + forin + '|' +
      Object.getOwnPropertySymbols(o).length + '|' +
      String(Object.getOwnPropertySymbols(o)[0] === s) + '|' +
      Reflect.ownKeys(o).length;
  })()`,

  // spread / Object.assign carry symbol props
  () => `(() => {
    const s = Symbol('s');
    const src = { [s]: 'v', k: 1 };
    const viaSpread = { ...src };
    const viaAssign = Object.assign({ other: 2 }, src);
    return viaSpread[s] + '|' + viaAssign[s] + '|' + Object.keys(viaSpread).join(',') + '|' +
      (Object.getOwnPropertySymbols(viaAssign)[0] === s);
  })()`,

  // classes: computed symbol method / instance symbol props
  () => `(() => {
    const s = Symbol('m');
    class C { [s](v){ return 'got' + v } tag(){ return this[s]('T') } }
    const c = new C();
    c[Symbol('own')] = 'inst';
    return c[s](1) + '|' + c.tag() + '|' + Object.getOwnPropertySymbols(c).length;
  })()`,

  // proxies: symbol key passes RAW to get/set/has traps
  () => `(() => {
    const s = Symbol('p');
    const log = [];
    const p = new Proxy({}, {
      get(t, k){ log.push('g' + (typeof k === 'symbol' ? String(k.description) : k)); return 7 },
      set(t, k, v){ log.push('s' + (typeof k === 'symbol' ? String(k.description) : k)); t[k] = v; return true },
      has(t, k){ log.push('h'); return typeof k === 'symbol' }
    });
    p[s] = 1;
    const got = p[s];
    return got + '|' + (s in p) + '|' + log.join(',');
  })()`,

  // Map keys / Set members: SameValueZero reference identity
  () => `(() => {
    const s1 = Symbol('k'), s2 = Symbol('k');
    const m = new Map([[s1, 'a']]);
    m.set(s2, 'b'); m.set(s1, 'a2');
    const set = new Set([s1, s2, s1]);
    return m.size + '|' + m.get(s1) + '|' + m.get(s2) + '|' + set.size + '|' + set.has(s1) + '|' + set.has(Symbol('k'));
  })()`,

  // JSON.stringify: symbol VALUES under string keys vanish; arrays → null
  () => `(() => {
    const s = Symbol('v');
    return JSON.stringify({ a: s, b: 1 }) + '|' + JSON.stringify([1, s, 2]) + '|' + String(JSON.stringify(s));
  })()`,

  // well-known canonicals coexist with uniques; registry identity
  () => `(() => {
    const s = Symbol('iterator');
    const o = { [Symbol.iterator]: function*(){ yield 1; yield 2; }, [s]: 'shadow' };
    const syms = Object.getOwnPropertySymbols(o);
    return [...o].join(',') + '|' + syms.length + '|' + (syms[0] === Symbol.iterator) + '|' + (syms[1] === s) + '|' + o[s];
  })()`,

  // symbol-keyed accessor-ish patterns: method shorthand + arrow capture
  () => `(() => {
    const s = Symbol(${descs()});
    const o = { [s](){ return 'm' + ${int(9)} } };
    const f = () => o[s]();
    return f() + '|' + (typeof o[s]);
  })()`,

  // symbol-keyed ACCESSORS: object literal + class, get/set slot merge
  () => `(() => {
    const s = Symbol('acc');
    const o = { get [s](){ return 'g' + (this.n || 0) }, set [s](v){ this.n = v } };
    o[s] = ${1+int(9)};
    class C { get [s](){ return 'cg' } set [s](v){ this.cv = 'c' + v } static get [s](){ return 'sg' } }
    const c = new C(); c[s] = 'X';
    return o[s] + '|' + c[s] + '|' + c.cv + '|' + C[s];
  })()`,

  // static symbol methods + class-static symbol writes
  () => `(() => {
    const s = Symbol('st');
    class K { static [s](){ return 'S${int(9)}' } [s](){ return 'i' } }
    const t = Symbol('t');
    K[t] = 'written';
    return K[s]() + '|' + new K()[s]() + '|' + K[t] + '|' + (typeof K[Symbol('other')]);
  })()`,

  // fromEntries + hasOwn with symbol keys
  () => `(() => {
    const s = Symbol('fe');
    const o = Object.fromEntries([[s, 'v'], ['k', ${int(9)}]]);
    const m = Object.fromEntries(new Map([[s, 'mv']]));
    return o[s] + '|' + o.k + '|' + m[s] + '|' + Object.hasOwn(o, s) + '|' + Object.hasOwn({}, s) + '|' + Object.keys(o).join(',');
  })()`,

  // getter-only symbol assignment: sloppy silent no-op
  () => `(() => {
    const s = Symbol('ro');
    const o = { get [s](){ return 'frozen' } };
    o[s] = 'new';
    return o[s];
  })()`,

  // Symbol(symbol) throws; new Symbol() throws
  () => `(() => {
    const outs = [];
    try { Symbol(Symbol('x')); outs.push('NO') } catch (e) { outs.push('c' + e.name) }
    try { new Symbol(); outs.push('NO2') } catch (e) { outs.push('n' + e.name) }
    outs.push(String(Symbol(${pick(["{ toString(){ return 'obj' } }", "[1,2]", "9.5"])}).description));
    return outs.join('|');
  })()`,
];

const symForTemplates = [
  // computed keys in destructuring patterns (r15): strings, numbers,
  // symbols, defaults, rest exclusion, nested, order
  () => `(() => {
    const s = Symbol('d');
    const src = { [s]: 's${int(9)}', a: 1, b: 2, ['c' + ${int(3)}]: 9 };
    const k = 'c' + ${int(3)};
    const { [s]: sv, [k]: kv = 'dflt', ...rest } = src;
    return sv + '|' + kv + '|' + JSON.stringify(rest) + '|' +
      Object.getOwnPropertySymbols(rest).length;
  })()`,
  () => `(() => {
    const { ${pick(["0: x, 1: y", "['0']: x, [1]: y", "[0]: x, ['1']: y"])} } = ['p', 'q', 'r'];
    const { ['n' + 'est']: { inner = 'di' } = {} } = ${pick(["{ nest: { inner: 'I' } }", "{ nest: {} }", "{}"])};
    return x + y + '|' + inner;
  })()`,

  // Symbol.for registry: identity by key, keyFor round-trip
  () => `(() => {
    const a = Symbol.for('k${int(3)}'), b = Symbol.for('k${int(3)}');
    const u = Symbol('k0');
    return (a === Symbol.for(Symbol.keyFor(a))) + '|' + (typeof a) + '|' +
      String(Symbol.keyFor(u)) + '|' + String(Symbol.keyFor(Symbol.iterator)) + '|' +
      (a === b) + '|' + String(a.description) + '|' + a.toString();
  })()`,
  // registry symbols as keys; ToString of the key argument
  () => `(() => {
    const s = Symbol.for(${pick(["42", "null", "undefined", "'x'", "true"])});
    const o = { [s]: 'v' };
    let r;
    try { r = String(Symbol.for(Symbol('bad'))); } catch (e) { r = 'T' + e.name; }
    let k;
    try { k = String(Symbol.keyFor('not-a-symbol')); } catch (e) { k = 'K' + e.name; }
    return o[s] + '|' + String(Symbol.keyFor(s)) + '|' + r + '|' + k;
  })()`,
];
templates.push(...symForTemplates);

const fixed = [
  `typeof Symbol()`,
  `String(Symbol().description)`,
  `String(Symbol('').description)`,
  `Symbol('a').toString()`,
  `String(Symbol())`,
  `(() => { try { return Number(Symbol()) } catch (e) { return 'T' + e.name } })()`,
  `(() => { const s = Symbol('d'); const o = {}; o[s] = 5; return o[s] + '|' + Object.keys(o).length })()`,
  `Reflect.ownKeys({ a: 1, [Symbol('z')]: 2, b: 3 }).length`,
  `Object.getOwnPropertySymbols({}).length`,
  `(() => { const s = Symbol.iterator; return (s === Symbol.iterator) + '|' + String(s.description) })()`,
];

async function evalOne(prog) {
  try { return "" + await eval(prog); }
  catch (e) { return "THROW:" + ((e && e.name) || ("" + e)); }
}

(async () => {
  for (const prog of fixed) console.log(JSON.stringify([prog, await evalOne(prog)]));
  for (let n = 0; n < count; n++) {
    const body = templates[Math.floor(rnd()*templates.length)]();
    const prog = body.replace(/\n\s*/g, " ");
    console.log(JSON.stringify([prog, await evalOne(prog)]));
  }
})();
