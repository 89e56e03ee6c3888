// Class-subset differential fuzz (round 8): random 1-2 level class
// hierarchies exercising constructors, methods, get/set accessors,
// statics, super calls/members, instanceof, method shadowing, and the
// own-vs-prototype enumeration boundary (Object.keys / JSON / in).
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "500", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

function baseMember(){
  const r = rnd(), i = int(3);
  if (r < 0.10) return `p${i} = ${int(9)}`;                                    // public field
  if (r < 0.16) return `q${i} = (this.p0 === undefined ? -1 : this.p0) + ${int(5)}`; // field reading earlier field
  if (r < 0.20) return `h${i} = () => 'arrow' + (this.p0 === undefined ? '?' : this.p0)`; // arrow field captures instance
  if (r < 0.24) return `static S${i} = '${pick(["u","v"])}' + ${int(9)}`;       // static field
  if (r < 0.27) return `bare${i};`;                                            // bare field → undefined
  if (r < 0.35) return `m${i}() { return ${int(9)} + (this.f${i} || 0) }`;
  if (r < 0.40) return `get g${i}() { return (this.f0 || 0) * ${1+int(4)} }`;
  if (r < 0.55) return `set s${i}(v) { this.w${i} = v + ${int(5)} }`;
  if (r < 0.70) return `static t${i}() { return '${pick(["x","y"])}' + this.name }`;
  if (r < 0.80) return `static get u${i}() { return this.name + ${int(9)} }`;
  if (r < 0.90) return `toJSON() { return { tag: this.f0 === undefined ? -1 : this.f0 } }`;
  return `m${i}() { return 'b${i}' }`;
}
function derivedMember(){
  const r = rnd(), i = int(3);
  if (r < 0.10) return `p${i} = ${100+int(9)}`; // derived field shadows base's
  if (r < 0.15) return `d${i} = (this.f0 === undefined ? -5 : this.f0) * 2`; // sees ctor-set state post-super
  if (r < 0.35) return `m${i}() { return (super.m${i} ? super.m${i}() : -1) + 100 }`;
  if (r < 0.45) return `get g${i}() { return (super.g${i} === undefined ? -2 : super.g${i}) + 1000 }`;
  if (r < 0.60) return `m${i}() { return ${int(9)} }`;
  if (r < 0.75) return `peek${i}() { const f = () => (super.m${i} ? super.m${i}() : -3); return f() }`;
  return `static t${i}() { return 'd' + this.name }`;
}
function op(){
  const r = rnd(), i = int(3);
  if (r < 0.15) return `try { log.push('' + o.m${i}()) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.28) return `log.push('' + o.g${i}); o.s${i} = ${int(20)}; log.push('' + o.w${i});`;
  if (r < 0.40) return `log.push(Object.keys(o).join(','), 'm${i}' in o, o.hasOwnProperty('m${i}'));`;
  if (r < 0.52) return `try { log.push(JSON.stringify(o)) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.62) return `log.push(o instanceof B, o instanceof A, o.constructor === B);`;
  if (r < 0.72) return `try { log.push('' + B.t${i}()) } catch (e) { log.push('E:' + e.name) } log.push('' + B.u${i});`;
  if (r < 0.80) return `o.m${i} = () => 'own${i}'; log.push('' + o.m${i}());`;
  if (r < 0.88) return `try { log.push('' + o.peek${i}()) } catch (e) { log.push('E:' + e.name) }`;
  if (r < 0.94) return `log.push('' + o.p${i}, '' + o.q${i}, '' + (o.h${i} ? o.h${i}() : 'nf'), '' + B.S${i}, 'bare${i}' in o);`;
  return `o.f${i} = ${int(30)}; log.push('' + o.g${i});`;
}

for (let n = 0; n < count; n++) {
  const baseMembers = Array.from({length: 1 + int(3)}, baseMember).join(" ");
  const derivedMembers = Array.from({length: 1 + int(3)}, derivedMember).join(" ");
  const ctorA = rnd() < 0.5 ? `constructor(x) { this.f0 = x }` : "";
  const ctorB = rnd() < 0.4 ? `constructor() { super(${int(9)}); this.f1 = ${int(9)} }` : "";
  const ops = Array.from({length: 3 + int(5)}, op).join(" ");
  const prog = `(function(){ let log = [];` +
    ` class A { ${ctorA} ${baseMembers} }` +
    ` class B extends A { ${ctorB} ${derivedMembers} }` +
    ` const o = new B(${int(9)});` +
    ` ${ops} return JSON.stringify(log); })()`;
  let out;
  try { out = "" + eval(prog); } catch (e) { out = "THROW:" + e.constructor.name; }
  console.log(JSON.stringify([prog, out]));
}
