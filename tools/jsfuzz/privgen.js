// Private-member + static-block differential fuzz (round 12): random
// classes exercising private fields/methods/accessors (instance and
// static), brand checks (#x in o), cross-class TypeErrors, static
// initialization blocks interleaved with static fields, and the
// no-enumeration / distinct-from-string-key boundaries.
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "500", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

function member(){
  const r = rnd(), i = int(2);
  if (r < 0.14) return `#f${i} = ${int(9)};`;
  if (r < 0.20) return `#g${i} = (this.#f0 === undefined ? -1 : 0) + ${int(5)};`;
  if (r < 0.26) return `pub${i} = ${int(9)};`;
  if (r < 0.36) return `#m${i}() { return ${int(9)} + (this.pub${i} || 0) }`;
  if (r < 0.44) return `get #a${i}() { return (this.pub0 || 0) * ${1+int(4)} } set #a${i}(v) { this.pub0 = v + ${int(3)} }`;
  if (r < 0.52) return `static #sf${i} = ${int(9)};`;
  if (r < 0.60) return `static #sm${i}() { return 's' + ${int(9)} }`;
  if (r < 0.68) return `static { this.init${i} = (this.blk === undefined ? 0 : this.blk) + ${int(5)} }`;
  if (r < 0.74) return `static blk = ${int(9)};`;
  // public probes of the privates
  if (r < 0.80) return `rdF${i}() { try { return '' + this.#f${i} } catch (e) { return 'E:' + e.name } }`;
  if (r < 0.85) return `rdM${i}() { try { return '' + this.#m${i}() } catch (e) { return 'E:' + e.name } }`;
  if (r < 0.90) return `rdA${i}() { try { this.#a${i} = ${int(9)}; return '' + this.#a${i} } catch (e) { return 'E:' + e.name } }`;
  if (r < 0.95) return `static rdS${i}(o) { try { return '' + o.#sf${i} } catch (e) { return 'E:' + e.name } }`;
  return `static has${i}(o) { try { return '' + (#f${i} in o) } catch (e) { return 'E:' + e.name } }`;
}

function op(){
  const r = rnd(), i = int(2);
  if (r < 0.12) return `try { log.push(o.rdF${i}()) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.24) return `try { log.push(o.rdM${i}()) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.34) return `try { log.push(o.rdA${i}()) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.46) return `try { log.push(A.rdS${i}(A)) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.56) return `try { log.push(A.rdS${i}(o)) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.68) return `try { log.push(A.has${i}(o), A.has${i}({}), A.has${i}(A)) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.76) return `try { log.push(A.has${i}(x)) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.84) return `log.push(Object.keys(o).join('|'));`;
  if (r < 0.92) return `try { log.push(JSON.stringify(o)) } catch (e) { log.push('E:' + e.name) }`;
  return `log.push('' + A.init${i}, '' + A.blk);`;
}

for (let n = 0; n < count; n++) {
  const members = Array.from({length: 2 + int(5)}, member).join(" ");
  // a second class with same-named privates: cross-brand TypeErrors
  const xMembers = rnd() < 0.5 ? `#f0 = 99; #f1 = 98;` : `#m0() { return -1 }`;
  const ops = Array.from({length: 3 + int(5)}, op).join(" ");
  const prog = `(function(){ let log = [];` +
    ` class A { ${members} }` +
    ` class X { ${xMembers} }` +
    ` let o, x;` +
    ` try { o = new A(); } catch (e) { return 'CTOR:' + e.constructor.name }` +
    ` x = new X();` +
    ` ${ops} return JSON.stringify(log); })()`;
  let out;
  try { out = "" + eval(prog); } catch (e) { out = "THROW:" + e.constructor.name; }
  console.log(JSON.stringify([prog, out]));
}
