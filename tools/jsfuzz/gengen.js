// Generator-semantics probe generator (round 13 — `function*` landed).
// Same protocol as the sibling generators: each line is a JSON pair
// ["program", "v8 result"], where the program is an IIFE evaluated as
// `'' + (expr)` and exceptions stringify as THROW:<ctor>. Coverage:
// plain yield/resume values, return values, gen.next/return/throw in
// every state, try/catch/finally interaction (incl. yield-in-finally
// during return), yield* delegation (generator and builtin iterables,
// incl. the inner return value), for-of with break (IteratorClose
// ordering), spread / Array.from / new Set / destructuring (incl.
// infinite-generator termination), generator methods in classes and
// object literals, interleaved instances, re-entrancy, and `new` on a
// generator function.
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "300", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

// each template returns a full IIFE body ending in `return <string>`
const templates = [
  // basic drive: loop yields, manual next() past done
  () => `function* g(){ for (let i = 0; i < ${1+int(4)}; i++) yield i * ${1+int(3)}; return 'R${int(9)}'; }
    const it = g(); const out = [];
    for (let k = 0; k < ${3+int(5)}; k++) { const r = it.next(); out.push(r.value, r.done); }
    return JSON.stringify(out);`,

  // resume values: yield is an expression
  () => `function* g(){ const a = yield ${int(9)}; const b = yield a + ${int(9)}; return a + '|' + b; }
    const it = g(); const out = [it.next(${int(9)}).value, it.next('x${int(9)}').value, it.next('y${int(9)}')];
    return JSON.stringify(out);`,

  // gen.return mid-stream; finally observes it
  () => `let s = '';
    function* g(){ try { yield 1; yield 2; yield 3; } finally { s += 'F'; } }
    const it = g(); s += it.next().value;
    const r = it.return('z${int(9)}'); s += '|' + r.value + r.done;
    const r2 = it.next(); s += '|' + r2.value + r2.done;
    return s;`,

  // gen.throw: caught inside → keeps going; uncaught → propagates
  () => `let s = '';
    function* g(){ try { yield 'a'; } catch (e) { s += 'c' + e; yield 'b'; } yield 'd'; }
    const it = g(); s += it.next().value;
    ${pick([
      `s += it.throw('T${int(9)}').value; s += it.next().value;`,
      `try { it.next(); it.throw(new RangeError('r')); s += 'NO'; } catch (e) { s += 'u' + e.constructor.name; }`,
    ])}
    return s;`,

  // throw before start / after done
  () => `function* g(){ yield 1; }
    const it = g(); let s = '';
    ${pick([
      `try { it.throw(new TypeError('t')); } catch (e) { s += 'pre' + e.constructor.name; }
       const r = it.next(); s += '|' + r.value + r.done;`,
      `it.next(); it.next();
       try { it.throw('late'); } catch (e) { s += 'post' + e; }`,
    ])}
    return s;`,

  // yield INSIDE finally during return(): generator is NOT done yet
  () => `function* g(){ try { yield 1; } finally { yield 'fin${int(9)}'; } return 9; }
    const it = g(); const out = [];
    out.push(it.next().value);
    const r = it.return('rv${int(9)}'); out.push(r.value, r.done);
    const r2 = it.next(); out.push(r2.value, r2.done);
    return JSON.stringify(out);`,

  // yield* delegation: inner return value is the yield* result
  () => `let s = '';
    function* inner(){ yield 'i1'; yield 'i2'; return 'IR${int(9)}'; }
    function* outer(){ s += 'b'; const r = yield* inner(); s += '=' + r; yield 'o'; }
    for (const v of outer()) s += v + ',';
    return s;`,

  // yield* forwards next() resume values and throw() into the inner
  () => `function* inner(){ const a = yield 'x'; yield a + '!'; }
    function* outer(){ yield* inner(); yield 'end'; }
    const it = outer(); const out = [];
    out.push(it.next().value); out.push(it.next('R${int(9)}').value);
    ${pick([
      `out.push(it.next().value);`,
      `try { out.push(it.throw('T').value); } catch (e) { out.push('thrown' + e); }`,
    ])}
    return JSON.stringify(out);`,

  // yield* over builtin iterables
  () => `function* g(){ yield* [${int(5)}, ${int(5)}]; yield* 'ab'; yield* new Set(['s${int(3)}', 's${int(3)}']); }
    return [...g()].join('|');`,

  // for-of with break: IteratorClose runs the finally at the break point
  () => `let s = '';
    function* g(){ try { let i = 0; while (true) yield i++; } finally { s += 'CLOSED'; } }
    for (const v of g()) { s += v; if (v >= ${2+int(4)}) break; }
    return s;`,

  // spread / Array.from / new Set / new Map over finite generators
  () => `function* g(){ for (const c of '${"abcde".slice(0, 2+int(3))}') yield c; }
    ${pick([
      `return [...g(), 'T'].join('');`,
      `return Array.from(g()).join('-');`,
      `return [...new Set([...g(), ...g()])].join('');`,
      `function* p(){ let i = 0; for (const c of g()) yield [c, i++]; }
       return JSON.stringify([...new Map(p())]);`,
    ])}`,

  // destructuring pulls exactly the bound count (infinite generator terminates)
  () => `let s = '';
    function* nat(){ let i = 0; try { while (true) yield i++; } finally { s += 'X'; } }
    const [a${int(3)+1 > 1 ? ', b' : ''}] = nat();
    s += '|' + a${int(2) ? "" : ""};
    return s;`,

  // generator METHOD in an object literal and a class; `this` binding
  () => `const o = { base: ${1+int(5)}, *steps(n){ for (let i = 1; i <= n; i++) yield this.base * i; } };
    let s = [...o.steps(${1+int(4)})].join(',');
    class C { constructor(k){ this.k = k; } *walk(){ yield this.k; yield this.k + 1; } static *tag(){ yield 'S'; } }
    s += '|' + [...new C(${int(9)}).walk()].join(',') + '|' + [...C.tag()].join('');
    return s;`,

  // interleaved instances of one generator share code, not state
  () => `function* g(start){ yield start; yield start + 1; yield start + 2; }
    const a = g(${int(5)}), b = g(${10+int(5)});
    return [a.next().value, b.next().value, a.next().value, b.next().value, a.next().value].join(',');`,

  // closure capture + mutation visible across suspensions
  () => `let shared = ${int(5)};
    function* g(){ yield shared; shared += 10; yield shared; }
    const it = g(); const v1 = it.next().value; shared += 100;
    return [v1, it.next().value, shared].join(',');`,

  // re-entrancy: next() during the body's own run is a TypeError
  () => `let it; let s = '';
    function* g(){ try { yield it.next(); } catch (e) { s += 'RE' + e.constructor.name; } yield 'after'; }
    it = g(); it.next(); s += '|' + it.next().value;
    return s;`,

  // `new` on a generator function throws
  () => `function* g(){ yield 1; }
    try { new g(); return 'NO'; } catch (e) { return 'ctor' + e.constructor.name; }`,

  // typeof / stringify surfaces
  () => `function* g(){ yield 1; }
    const it = g();
    return [typeof g, typeof it, '' + it, JSON.stringify(it), JSON.stringify({g: it, n: ${int(9)}})].join('|');`,

  // return() with no finally; return() before start
  () => `function* g(){ yield 1; yield 2; }
    const a = g(); const out = [];
    ${pick([
      `out.push(a.next().value); const r = a.return(${int(9)}); out.push(r.value, r.done); out.push(a.next().done);`,
      `const r = a.return('${int(9)}'); out.push(r.value, r.done); out.push(a.next().done);`,
    ])}
    return JSON.stringify(out);`,

  // generators feeding reduce/map pipelines (arrays from spreads)
  () => `function* g(n){ for (let i = 1; i <= n; i++) yield i * i; }
    const xs = [...g(${2+int(5)})];
    return xs.reduce((a, x) => a + x, 0) + '|' + xs.map(x => x % ${2+int(3)}).join('');`,

  // nested generators: a generator iterating another one
  () => `function* inner(){ yield* [1, 2, ${int(9)}]; }
    function* outer(){ for (const v of inner()) yield v * ${1+int(3)}; return 'D'; }
    const out = []; let r;
    const it = outer();
    while (!(r = it.next()).done) out.push(r.value);
    out.push(r.value);
    return JSON.stringify(out);`,

  // exception from the BODY propagates to the caller at next()
  () => `function* g(){ yield 1; throw new RangeError('boom${int(9)}'); }
    const it = g(); let s = '' + it.next().value;
    try { it.next(); s += 'NO'; } catch (e) { s += '|' + e.constructor.name + ':' + e.message; }
    const r = it.next(); s += '|' + r.value + r.done;
    return s;`,

  // yield with no operand; yield in expression positions
  () => `function* g(){ const a = yield; yield (yield a) + '!'; }
    const it = g(); const out = [it.next().value, it.next('A${int(9)}').value, it.next('B').value, it.next('C').value];
    return JSON.stringify(out);`,

  // custom iterables via Symbol.iterator (generator method form)
  () => `const o = { base: ${int(5)}, *[Symbol.iterator](){ for (let i = 0; i < ${2+int(3)}; i++) yield this.base + i; } };
    return JSON.stringify([[...o], Array.from(o), [...new Set(o)].length, Object.keys(o)]);`,

  // custom iterable CLASS; for-of with break still closes
  () => `let s = '';
    class R { constructor(a, b){ this.a = a; this.b = b; }
      *[Symbol.iterator](){ try { for (let i = this.a; i < this.b; i++) yield i; } finally { s += 'C'; } } }
    const r = new R(${int(3)}, ${5+int(4)});
    for (const v of r) { s += v; if (v >= ${3+int(3)}) break; }
    const [first] = r;
    return s + '|' + first;`,

  // manual iterator-protocol object (plain next(), no generator)
  () => `const o = { [Symbol.iterator](){ let i = ${int(3)}; return { next(){ return i < ${4+int(3)} ? { value: i++, done: false } : { value: undefined, done: true }; } }; } };
    return JSON.stringify([[...o], [...o].length]);`,

  // Symbol surfaces: typeof, identity, enumeration hiding, JSON drop
  () => `const o = { a: ${int(9)}, [Symbol.iterator]: function*(){ yield 1; } };
    return JSON.stringify([typeof Symbol.iterator, Symbol.iterator === Symbol.iterator,
      Object.keys(o), JSON.stringify(o), JSON.stringify({ s: Symbol.iterator, n: ${int(9)} })]);`,

  // yield* over a custom iterable; spread into calls
  () => `const src = { *[Symbol.iterator](){ yield* [${int(5)}, ${int(5)}]; yield 'x'; } };
    function* g(){ yield* src; yield 'end'; }
    return [...g()].join('|') + '/' + Math.max(...({ *[Symbol.iterator](){ yield ${int(9)}; yield ${int(9)}; } }));`,
];

// fixed early-error probes (syntax: THROW:SyntaxError ≡ STARTUP_ERR)
const fixed = [
  `(function(){ function* g(){ const f = () => yield 1; } return 'NO'; })()`,
  `(function(){ function* g(a = yield 1){} return 'NO'; })()`,
  `(function(){ yield 1; return 'NO'; })()`,
  `(function(){ function* g(){ class C { x = yield 1; } } return 'NO'; })()`,
  `(function(){ class C { get *x(){} } return 'NO'; })()`,
  `(function(){ class C { *constructor(){} } return 'NO'; })()`,
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
