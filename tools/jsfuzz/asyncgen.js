// Async/await + Promise probe generator (round 14 — `async` landed).
// Protocol variant for async programs: each line is ["program","v8"]
// where program is an ASYNC IIFE (always starts with "(async"); node
// AWAITS its value (`"" + await eval(prog)`), rejections stringify as
// THROW:<e.name || String(e)>. The graft runner detects the "(async"
// prefix and replays through `.then(v => output(...), e => output(
// 'THROW:'...))` + the worker's drain-to-quiescence, so both engines
// observe the settled value after their microtask queues empty.
// Coverage: microtask ORDERING (the log-array discipline — every
// template that can interleave records event order, not just final
// values), await of values/natives/thenables, try/catch/finally
// around await, then/catch/finally chains, executor timing, resolve-
// with-promise ticks, async return of promises, all/allSettled/race/
// any (incl. over generator iterables), queueMicrotask, async arrows/
// methods/classes, awaits in loops, and generator × async composition.
// Discipline: every promise a template creates is eventually handled
// (unhandled rejections are a LOUD map error in graft by design).
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "300", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

// each template returns an async IIFE BODY: it may await, and must
// `return` a string/JSONable value after all its promises settle
const templates = [
  // ordering: sync prefix, await resumption vs then chain
  () => `const log = [];
    async function f(){ log.push('s${int(9)}'); await ${pick(['null', 'undefined', String(int(99)), "'v'", 'Promise.resolve(7)'])}; log.push('r'); }
    const p = f(); log.push('m');
    Promise.resolve().then(() => log.push('t1')).then(() => log.push('t2'));
    await p; await null; await null; await null;
    return log.join(',');`,

  // await value threading through expressions
  () => `async function f(a){ return (await a) + ${1+int(9)}; }
    const x = await f(${int(9)}); const y = await f(Promise.resolve(${int(9)}));
    const z = await f({ then(res){ res(${int(9)}) } });
    return x + '|' + y + '|' + z;`,

  // try/catch/finally around await; rejection paths
  () => `const log = [];
    async function f(){
      try { await Promise.reject(${pick(["'boom'", "new TypeError('t')", "new RangeError('r')"])}); log.push('NO'); }
      catch (e) { log.push('c' + ((e && e.name) || e)); ${pick(['', "throw 'again';", "return 'early';"])} }
      finally { log.push('f'); }
      return 'end';
    }
    const r = await f().then(v => 'v' + v, e => 'e' + e);
    return log.join(',') + '/' + r;`,

  // then/catch/finally chain permutations with interleaving
  () => `const log = [];
    Promise.resolve(${int(9)}).then(v => { log.push('a' + v); return v + 1 })
      .${pick(['then(v => { log.push("b" + v); throw "x" })', 'then(v => { log.push("b" + v); return v * 2 })'])}
      .catch(e => { log.push('c' + e); return 'rec'; })
      .finally(() => log.push('fin'))
      .then(v => log.push('d' + v));
    Promise.reject('${pick(['r1','r2'])}').catch(e => log.push('e' + e));
    for (let i = 0; i < 12; i++) await null;
    return log.join(',');`,

  // resolve-with-promise / thenable tick counts (pure ordering probe)
  () => `const log = [];
    new Promise(r => r(${pick(['Promise.resolve("P")', '{ then(res){ res("T") } }', '"V"'])})).then(v => log.push('got' + v));
    Promise.resolve().then(() => log.push(1)).then(() => log.push(2)).then(() => log.push(3)).then(() => log.push(4));
    for (let i = 0; i < 10; i++) await null;
    return log.join(',');`,

  // async return of a promise / thenable (assimilation ticks)
  () => `const log = [];
    async function f(){ return ${pick(['Promise.resolve("R")', '{ then(res){ res("T") } }', '"plain"'])}; }
    f().then(v => log.push('f' + v));
    Promise.resolve().then(() => log.push(1)).then(() => log.push(2)).then(() => log.push(3)).then(() => log.push(4)).then(() => log.push(5));
    for (let i = 0; i < 12; i++) await null;
    return log.join(',');`,

  // combinators over arrays (mixed values/promises/rejections handled)
  () => `const mk = v => ${pick(['v', 'Promise.resolve(v)'])};
    const r1 = await Promise.all([mk(1), mk('a'), mk(${int(9)})]).then(v => v.join('|'), e => 'E' + e);
    const r2 = await Promise.allSettled([Promise.reject('x'), mk(2)]).then(v => v.map(s => s.status[0] + (s.value ?? s.reason)).join('|'));
    const r3 = await Promise.race([new Promise(() => {}), mk('w${int(9)}')]);
    const r4 = await Promise.any([Promise.reject('a'), mk('b${int(9)}')]).catch(e => 'AGG:' + e.errors.join());
    return [r1, r2, r3, r4].join('/');`,

  // all with a rejection (first rejection wins), any aggregate
  () => `const a = await Promise.all([1, Promise.reject('r${int(9)}'), Promise.resolve(3)]).then(v => 'ok' + v, e => 'err' + e);
    const b = await Promise.any([Promise.reject('x${int(9)}'), Promise.reject('y')]).then(v => v, e => e.name + ':' + e.errors.join('|'));
    return a + '/' + b;`,

  // combinators over generator iterables
  () => `function* src(){ for (let i = 0; i < ${2+int(4)}; i++) yield ${pick(['i', 'Promise.resolve(i * 2)'])}; }
    const v = await Promise.all(src());
    return JSON.stringify(v);`,

  // sequential awaits in a loop (state stays single-threaded)
  () => `let s = 0;
    async function inc(v){ await null; return v * ${1+int(4)}; }
    for (const v of [${int(5)}, ${int(5)}, ${int(5)}]) s += await inc(v);
    return 'S' + s;`,

  // async arrows + object/class methods, typeof surfaces
  () => `const f = async x => x + ${int(9)};
    const o = { async m(v){ return v * 2 }, async ['c' + 'omp'](v){ return v - 1 } };
    class K { async inst(v){ return 'i' + (await f(v)); } static async st(){ return 'st'; } }
    return [typeof f, await f(1), await o.m(${int(9)}), await o.comp(5), await new K().inst(${int(9)}), await K.st()].join(',');`,

  // nested async calls; await inside template/arith positions
  () => `async function a(){ await null; return ${int(9)}; }
    async function b(){ return (await a()) + (await a()) * 2; }
    return 'v' + (await b()) + ':' + ((await a()) > 4 ? 'big' : 'small');`,

  // queueMicrotask interleave with reactions and async resumption
  () => `const log = [];
    queueMicrotask(() => log.push('q1'));
    (async () => { log.push('a'); await null; log.push('b'); })();
    Promise.resolve().then(() => log.push('t'));
    queueMicrotask(() => log.push('q2'));
    for (let i = 0; i < 8; i++) await null;
    return log.join(',');`,

  // executor timing: sync body, later settle via stored resolver
  () => `const log = [];
    let kick;
    const p = new Promise(res => { log.push('exec'); kick = res; });
    p.then(v => log.push('got' + v));
    log.push('mid');
    Promise.resolve().then(() => { log.push('k'); kick('${int(9)}'); });
    for (let i = 0; i < 8; i++) await null;
    return log.join(',');`,

  // double-settle latch: first settle wins, later calls ignored
  () => `const p = new Promise((res, rej) => { ${pick(['res(1); rej("no"); res(2);', 'rej("r"); res("no");'])} });
    return await p.then(v => 'F' + v, e => 'R' + e);`,

  // executor throws (before/after resolving)
  () => `const p = new Promise((res) => { ${pick(['throw new TypeError("t")', 'res("ok"); throw "late"'])} });
    return await p.then(v => 'v' + v, e => 'e' + ((e && e.name) || e));`,

  // chaining cycle / self resolution
  () => `let r; const p = new Promise(res => { r = res; }); r(p);
    return await p.then(v => 'v' + v, e => 'E' + ((e && e.name) || e));`,

  // generator × async composition: for-of over gen with awaited work
  () => `async function work(v){ await Promise.resolve(); return v + ${int(5)}; }
    function* gen(){ yield ${int(5)}; yield ${int(5)}; yield ${int(5)}; }
    let total = 0;
    for (const v of gen()) total += await work(v);
    return 'T' + total;`,

  // await non-thenable objects / arrays pass through as values
  () => `const o = { a: ${int(9)} }; const arr = [${int(9)}, ${int(9)}];
    const x = await o; const y = await arr;
    return JSON.stringify([x.a, y, (await 'str') + '!', await true]);`,

  // finally callback THROW replaces the outcome; return value ignored
  () => `const a = await Promise.resolve(1).finally(() => ${pick(['42', '"x"'])}).then(v => 'v' + v);
    const b = await Promise.resolve(2).finally(() => { throw 'boom' }).then(v => 'v' + v, e => 'e' + e);
    const c = await Promise.reject('r').finally(() => ${int(9)}).then(v => 'v' + v, e => 'e' + e);
    return [a, b, c].join('|');`,

  // late then on an already-settled promise still runs async (a tick)
  () => `const log = [];
    const p = Promise.resolve('x${int(9)}');
    await null;
    log.push('pre'); p.then(v => log.push('late' + v)); log.push('post');
    for (let i = 0; i < 4; i++) await null;
    return log.join(',');`,

  // ---- async generators (r14 wave 2) ----

  // basic drive: awaited yields of values/promises/thenables
  () => `async function* g(){
      yield ${pick(['1', 'Promise.resolve(2)', '{ then(res){ res(3) } }'])};
      yield 'v${int(9)}';
      return ${pick(["'R'", "Promise.resolve('RP')"])};
    }
    const it = g(); const out = [];
    for (let k = 0; k < 4; k++) { const r = await it.next(); out.push(r.value, r.done); }
    return JSON.stringify(out);`,

  // ordering: queued nexts, body progress vs reaction drain
  () => `const log = [];
    async function* g(){ log.push('a'); yield ${int(9)}; log.push('b'); ${pick(['await null;', ''])} yield ${int(9)}; log.push('c'); }
    const it = g();
    it.next().then(r => log.push('r1:' + r.value));
    it.next().then(r => log.push('r2:' + r.value));
    it.next().then(r => log.push('r3:' + r.done));
    for (let i = 0; i < 15; i++) await null;
    return log.join(',');`,

  // rejecting awaited yield → thrown into the body
  () => `const log = [];
    async function* g(){
      try { yield Promise.reject('${pick(['e1','e2'])}'); log.push('NO'); }
      catch (e) { log.push('c' + e); yield 'after'; }
      finally { log.push('f'); }
    }
    const it = g();
    log.push(JSON.stringify(await it.next().then(r => r.value, e => 'REJ' + e)));
    log.push(JSON.stringify(await it.next()));
    log.push(JSON.stringify(await it.next()));
    return log.join('|');`,

  // return()/throw() in every state
  () => `let s = '';
    async function* g(){ try { yield 1; yield 2; } ${pick(['finally { s += "F"; }', 'catch (e) { s += "C" + e; yield "ce"; }'])} }
    const it = g();
    ${pick([
      `s += JSON.stringify(await it.return('pre'));`,
      `s += (await it.next()).value; s += JSON.stringify(await it.return('mid')); s += JSON.stringify(await it.next());`,
      `s += (await it.next()).value; s += JSON.stringify(await it.throw('T').then(r => r, e => 'up' + e));`,
    ])}
    return s;`,

  // for await over async gens, incl. break closing the source
  () => `let fin = '';
    async function* g(){ try { for (let i = 0; i < ${3+int(4)}; i++) yield i * ${1+int(3)}; } finally { fin += 'X'; } }
    const out = [];
    for await (const v of g()) { out.push(v); ${pick(['', 'if (v >= 3) break;'])} }
    return JSON.stringify(out) + fin;`,

  // for await over sync sources (arrays of promises, sync gens, strings)
  () => `const out = [];
    function* sg(){ yield Promise.resolve('a'); yield 'b${int(9)}'; }
    for await (const v of ${pick(['[Promise.resolve(1), 2, { then(res){ res(3) } }]', 'sg()', "'xy'"])}) out.push(v);
    return JSON.stringify(out);`,

  // async-gen methods on object literals and classes
  () => `const o = { async *m(n){ for (let i = 0; i < n; i++) yield i + ${int(5)}; } };
    class K { async *inst(){ yield 'i'; yield await Promise.resolve('j'); } static async *st(){ yield 'S'; } }
    const out = [];
    for await (const v of o.m(${1+int(3)})) out.push(v);
    for await (const v of new K().inst()) out.push(v);
    for await (const v of K.st()) out.push(v);
    return out.join(',') + '/' + typeof o.m;`,

  // composition: async gen pulling a sync gen; manual asyncIterator identity
  () => `function* src(){ for (let i = 0; i < ${2+int(3)}; i++) yield i; }
    async function* g(){ for (const v of src()) yield (await Promise.resolve(v)) * 2; }
    const it = g();
    const idok = it[Symbol.asyncIterator]() === it;
    const out = []; for await (const v of it) out.push(v);
    return JSON.stringify(out) + idok;`,

  // ---- yield* inside async generators (round 15) ----

  // async-over-async delegation: values, awaits, completion threading
  () => `async function* inner(){ yield ${int(5)}; yield await Promise.resolve(${int(5)}); return '${pick(['R','Q'])}'; }
    async function* outer(){ yield 's'; const r = yield* inner(); yield 'got' + r; }
    const out = []; for await (const v of outer()) out.push(v);
    return out.join(',');`,

  // async-over-sync: AsyncFromSyncIterator unwrap incl. a promise RETURN
  () => `function* inner(){ yield ${int(5)}; yield Promise.resolve('p${int(5)}'); return ${pick(['Promise.resolve("pr")', "'plain'"])}; }
    async function* outer(){ const r = yield* inner(); yield 'r:' + r; }
    const out = []; for await (const v of outer()) out.push(v);
    return out.join(',');`,

  // async-over-iterable: arrays (promise elements awaited), strings, Sets
  () => `async function* outer(){ yield* ${pick([
      "[1, Promise.resolve(2), 3]",
      "'abc'",
      "new Set(['x', 'y'])",
      "[Promise.resolve('only')]",
    ])}; yield 'tail'; }
    const out = []; for await (const v of outer()) out.push(v);
    return out.join(',');`,

  // throw() forwarding through yield* — inner catches (or doesn't)
  () => `async function* inner(){ try { yield 'a'; yield 'NO'; } ${pick([
      "catch (e) { yield 'c' + e; }",
      "finally { /* propagates */ }",
    ])} }
    async function* outer(){ try { yield* inner(); } catch (e) { yield 'o' + e; } yield 'end'; }
    const it = outer(); const out = [];
    out.push((await it.next()).value);
    try { out.push(JSON.stringify(await it.throw('T'))); } catch (e) { out.push('up' + e); }
    for await (const v of it) out.push(v);
    return out.join(',');`,

  // return() through yield*: finally blocks in BOTH layers, awaited
  () => `const log = [];
    async function* inner(){ try { yield 1; yield 2; } finally { log.push('fi' + (await Promise.resolve('!'))); ${pick(['', "yield 'fy';"])} } }
    async function* outer(){ try { yield* inner(); } finally { log.push('fo'); } }
    const it = outer(); const out = [];
    out.push((await it.next()).value);
    out.push(JSON.stringify(await it.return('RV')));
    ${pick(['', "out.push(JSON.stringify(await it.next()));"])}
    return out.join(',') + '/' + log.join(',');`,

  // for-await break over a delegating outer (early-exit unwind chain)
  () => `const log = [];
    async function* inner(){ try { for (let i = 0; i < 9; i++) yield i; } finally { log.push('fi'); } }
    async function* outer(){ try { yield* inner(); } finally { log.push('fo'); } }
    const out = [];
    for await (const v of outer()) { out.push(v); if (v >= ${1+int(3)}) break; }
    return out.join(',') + '/' + log.join(',');`,

  // nested delegation: async outer -> async mid -> sync leaf
  () => `function* leaf(){ yield 'L1'; yield 'L2'; return 'lr'; }
    async function* mid(){ const r = yield* leaf(); yield 'm' + r; return 'mr'; }
    async function* outer(){ const r = yield* mid(); yield 'o' + r; }
    const out = []; for await (const v of outer()) out.push(v);
    return out.join(',');`,

  // ordering probe: yield* steps interleaved with a then-chain
  () => `const log = [];
    async function* inner(){ yield 'i1'; yield ${pick(["Promise.resolve('i2')", "'i2'"])}; }
    async function* outer(){ yield* inner(); }
    (async () => { for await (const v of outer()) log.push(v); log.push('done'); })();
    Promise.resolve().then(() => log.push('t1')).then(() => log.push('t2')).then(() => log.push('t3')).then(() => log.push('t4'));
    for (let i = 0; i < 16; i++) await null;
    return log.join(',');`,

  // ordering probe: SYNC-inner yield* interleaved with a then-chain
  // (AsyncFromSyncIterator tick parity)
  () => `const log = [];
    ${pick([
      "function* inner(){ yield 'i1'; yield 'i2'; }",
      "const inner = () => ['i1', 'i2'];",
      "const inner = () => ['i1', Promise.resolve('i2')];",
    ])}
    async function* outer(){ yield* inner(); }
    (async () => { for await (const v of outer()) log.push(v); log.push('done'); })();
    Promise.resolve().then(() => log.push('t1')).then(() => log.push('t2')).then(() => log.push('t3')).then(() => log.push('t4')).then(() => log.push('t5')).then(() => log.push('t6'));
    for (let i = 0; i < 20; i++) await null;
    return log.join(',');`,

  // ordering probe: yield* COMPLETION (inner return) vs a then-chain
  () => `const log = [];
    ${pick([
      "async function* inner(){ yield 'i1'; return 'R'; }",
      "function* inner(){ yield 'i1'; return 'R'; }",
    ])}
    async function* outer(){ const r = yield* inner(); log.push('comp' + r); yield 'after'; }
    (async () => { for await (const v of outer()) log.push(v); log.push('done'); })();
    Promise.resolve().then(() => log.push('t1')).then(() => log.push('t2')).then(() => log.push('t3')).then(() => log.push('t4')).then(() => log.push('t5')).then(() => log.push('t6'));
    for (let i = 0; i < 20; i++) await null;
    return log.join(',');`,

  // yield* over a custom [Symbol.iterator] object / a rejecting element
  () => `${pick([
      `async function* outer(){ yield* { [Symbol.iterator](){ let i = 0; return { next: () => i < 3 ? { value: 'c' + (i++), done: false } : { value: undefined, done: true } }; } }; }
       const out = []; for await (const v of outer()) out.push(v); return out.join(',');`,
      `async function* outer(){ try { yield* [1, Promise.reject('bad'), 3]; } catch (e) { yield 'c' + e; } }
       const out = []; for await (const v of outer()) out.push(v); return out.join(',');`,
    ])}`,
];

// fixed early-error / boundary probes
const fixed = [
  `(async function(){ return typeof (async function n(){}) })()`,
  `(async function(){ const f = async () => 1; return '' + (f() instanceof Promise ? 'p' : typeof f()) })()`,
  `(async function(){ return String(Promise.resolve(1)) })()`,
  `(async function(){ return JSON.stringify({ p: Promise.resolve(1), n: 2 }) })()`,
  `(async function(){ try { await Promise.reject(); return 'NO' } catch (e) { return 'u' + e } })()`,
  `(async function(){ let s = ''; try { new (async function(){})(); s = 'NO' } catch (e) { s = 'ctor' + e.name } return s })()`,
];

async function evalOne(prog) {
  try { return "" + await eval(prog); }
  catch (e) { return "THROW:" + ((e && e.name) || ("" + e)); }
}

(async () => {
  for (const prog of fixed) console.log(JSON.stringify([prog, await evalOne(prog)]));
  for (let n = 0; n < count; n++) {
    const body = templates[Math.floor(rnd()*templates.length)]();
    const prog = `(async function(){ ${body.replace(/\n\s*/g, " ")} })()`;
    console.log(JSON.stringify([prog, await evalOne(prog)]));
  }
})();
