// Statement-level differential fuzz: small deterministic programs that
// build and mutate state, then emit JSON.stringify of the result.
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "300", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

function stmt(v){
  const r = rnd();
  if (r < 0.12) return `${v}.push(${int(10)});`;
  if (r < 0.20) return `${v}.push('' + ${v}.length);`;
  if (r < 0.26) return `if (${v}.length > ${int(5)}) ${v}.pop();`;
  if (r < 0.32) return `${v}[${int(8)}] = ${int(100)};`;
  if (r < 0.38) return `delete ${v}[${int(6)}];`;
  if (r < 0.44) return `for (let i = 0; i < ${1+int(3)}; i++) ${v}.push(i * ${1+int(4)});`;
  if (r < 0.50) return `${v} = ${v}.map(x => x === undefined ? -1 : x);`;
  if (r < 0.56) return `${v}.sort((a, b) => ('' + a).length - ('' + b).length);`;
  if (r < 0.60) return `${v} = ${v}.filter((x, i) => i % 2 === ${int(2)});`;
  if (r < 0.66) return `${v}.splice(${int(4)}, ${int(3)}, ${int(50)});`;
  if (r < 0.71) return `o.k${int(4)} = ${v}.length;`;
  if (r < 0.76) return `o['d' + ${int(3)}] = Object.keys(o).length;`;
  if (r < 0.80) return `delete o.k${int(4)};`;
  if (r < 0.85) return `try { ${v}.reduce((a, b) => a + b) } catch (e) { o.err = e.name; }`;
  if (r < 0.88) return `s += ${v}.join('') + Object.keys(o).join('');`;
  if (r < 0.91) return `${v}.reverse();`;
  if (r < 0.94) return `${v} = ${v}.toSorted((a, b) => ('' + a).length - ('' + b).length);`;
  if (r < 0.96) return `o.cc = ${v}.toReversed().join('') + ${v}.toSpliced(${int(3)}, ${int(2)}, 7).length;`;
  if (r < 0.98) return `try { ${v} = ${v}.with(${int(6)}, 'w') } catch (e) { o.werr = e.name }`;
  return `${v}.length = ${int(9)};`;
}

for (let n = 0; n < count; n++) {
  const body = [];
  body.push(`let a = [${Array.from({length: int(4)}, () => int(9)).join(",")}];`);
  body.push(`let o = {};`);
  body.push(`let s = '';`);
  const k = 4 + int(7);
  for (let i = 0; i < k; i++) body.push(stmt("a"));
  body.push(`return JSON.stringify([a, o, s]);`);
  const prog = `(function(){ ${body.join(" ")} })()`;
  let out;
  try { out = "" + eval(prog); } catch (e) { out = "THROW:" + e.constructor.name; }
  console.log(JSON.stringify([prog, out]));
}
