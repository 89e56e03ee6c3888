function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "300", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

function stmt(){
  const r = rnd();
  if (r < 0.08) return `fns.push(() => i${int(3)});`;
  if (r < 0.16) return `for (let j = 0; j < ${1+int(3)}; j++) fns.push(() => j);`;
  if (r < 0.22) return `set.add(${int(5)}); set.add('${int(5)}');`;
  if (r < 0.28) return `map.set('k${int(4)}', (map.get('k${int(4)}') || 0) + 1);`;
  if (r < 0.34) return `s = s.replace(/${pick(["a","b","[0-9]","\\\\s"])}/g, '${pick(["X","",".","$&$&"])}');`;
  if (r < 0.40) return `s += [...set].join('') + [...map.keys()].join('');`;
  if (r < 0.46) return `s = s.split('${pick(["a","X","0"])}').join('${pick(["-","+",""])}');`;
  if (r < 0.52) return `i${int(3)} += ${1+int(4)};`;
  if (r < 0.58) return `if (i${int(3)} % ${2+int(3)} === 0) { s += 'e'; } else { s += 'o'; }`;
  if (r < 0.64) return `try { if (i${int(3)} > ${int(8)}) throw new RangeError('r' + i${int(3)}); s += 'n'; } catch (e) { s += e.message; } finally { s += 'f'; }`;
  if (r < 0.70) return `switch (i${int(3)} % 3) { case 0: s += 'z'; break; case 1: s += 'u'; default: s += 'd'; }`;
  if (r < 0.76) return `o = { ...o, ['p' + (i${int(3)} % 4)]: s.length };`;
  if (r < 0.82) return `const { p0 = -1, ...rest } = o; s += '' + p0 + Object.keys(rest).length;`;
  if (r < 0.88) return `s += \`t\${i${int(3)}}\${s.length % 7}\`;`;
  if (r < 0.94) return `while (s.length > ${10+int(20)}) s = s.slice(${1+int(3)});`;
  return `i${int(3)} = (i${int(3)} * ${2+int(5)}) % ${7+int(10)};`;
}

for (let n = 0; n < count; n++) {
  const body = [];
  body.push(`let i0 = ${int(5)}, i1 = ${int(5)}, i2 = ${int(5)};`);
  body.push(`let s = 'a0b1';`);
  body.push(`let o = {};`);
  body.push(`const fns = []; const set = new Set(); const map = new Map();`);
  const k = 5 + int(8);
  for (let i = 0; i < k; i++) body.push(stmt());
  body.push(`return JSON.stringify([s, o, i0, i1, i2, fns.map(f => f()), [...set], [...map.entries()]]);`);
  const prog = `(function(){ ${body.join(" ")} })()`;
  let out;
  try { out = "" + eval(prog); } catch (e) { out = "THROW:" + e.constructor.name; }
  console.log(JSON.stringify([prog, out]));
}
