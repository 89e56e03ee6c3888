// Accessor-property differential fuzz (round 8): object literals with
// getters/setters driven through reads, writes, enumeration, spread,
// rest-destructuring, JSON, delete, for-in and Object.assign. An
// invocation counter rides along so single-vs-double getter evaluation
// (spread, values, stringify) diverges observably, not silently.
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "500", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

function member(){
  const r = rnd();
  const i = int(3);
  if (r < 0.18) return `k${i}: ${int(50)}`;
  if (r < 0.34) return `get g${i}() { return this.k0 === undefined ? ${int(9)} : this.k0 + ${int(9)} }`;
  if (r < 0.46) return `get h${i}() { c += 1; return c }`;
  if (r < 0.60) return `_v${i}: ${int(20)}, get p${i}() { return this._v${i} }, set p${i}(x) { this._v${i} = x * 2 }`;
  if (r < 0.72) return `set s${i}(x) { this.w${i} = x + 1 }`;
  if (r < 0.78) return `get t${i}() { throw new RangeError('t${i}') }`;
  if (r < 0.84) return `get ['c' + ${int(3)}]() { return ${int(30)} }`;
  if (r < 0.88) return `d${i}: ${int(9)}, get d${i}() { return ${int(9)} + 100 }`; // accessor replaces data, keeps slot
  if (r < 0.94) return `get e${i}() { return ${int(9)} }, e${i}: ${int(9)}`;       // data replaces accessor
  return `get a${i}() { return [${int(5)}, ${int(5)}].map(x => x + (this.k0 || 0)).join('-') }`;
}

function op(){
  const r = rnd();
  const i = int(3);
  if (r < 0.10) return `log.push('' + o.g${i}, '' + o.p${i});`;
  if (r < 0.18) return `o.p${i} = ${int(25)}; log.push(o._v${i}, o.p${i});`;
  if (r < 0.25) return `o.g${i} = ${int(25)}; log.push('' + o.g${i});`; // getter-only write: sloppy no-op
  if (r < 0.32) return `log.push(Object.keys(o).join(','));`;
  if (r < 0.39) return `try { log.push(Object.values(o).join('|')) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.47) return `try { log.push(JSON.stringify(o)) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.55) return `try { const q = { ...o }; log.push(JSON.stringify(q)) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.62) return `try { const { k0, ...rest } = o; log.push(Object.keys(rest).join('+')) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.69) return `for (const k in o) log.push(k);`;
  if (r < 0.76) return `delete o.g${i}; delete o.p${i}; log.push('g${i}' in o, 'p${i}' in o);`;
  if (r < 0.83) return `o.s${i} = ${int(25)}; log.push('' + o.w${i});`;
  if (r < 0.87) return `try { const t2 = { seen: 0, set z(v) { this.seen = v } }; Object.assign(t2, o); log.push(Object.keys(t2).join('.')) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.93) return `try { const { g${i}: gx = -7, p${i}: px = -8 } = o; log.push('' + gx, '' + px) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.97) return `o.k0 = ${int(40)}; log.push('' + o.g${i}, '' + o.a${i});`;
  return `log.push(c);`;
}

for (let n = 0; n < count; n++) {
  const members = Array.from({length: 2 + int(4)}, member).join(", ");
  const ops = Array.from({length: 3 + int(5)}, op).join(" ");
  const prog = `(function(){ let log = []; let c = 0; let o = { ${members} }; ${ops} return JSON.stringify(log); })()`;
  let out;
  try { out = "" + eval(prog); } catch (e) { out = "THROW:" + e.constructor.name; }
  console.log(JSON.stringify([prog, out]));
}
