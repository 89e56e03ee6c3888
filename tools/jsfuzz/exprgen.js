// Seeded differential-fuzz expression generator for the graft JS subset.
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "1000", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

const NUMS = ["0","-0","1","2","3","-5","255","0.1","0.5","-2.5","1e21","1e-7","NaN","Infinity","-Infinity","4.35","(2**53)","123456789","0.000001"];
const STRS = ["''","'abc'","'a b'","'ÿ'","'\\u00a0'","'123'","'1e3'","'-2'","' 5 '","'true'","'NaN'","'aAbB'","'x,y,,z'","'0x1f'","'  '","'aaa'"];
const MISC = ["true","false","null","undefined","[]","[1,2,3]","[1,,3]","['a','b']","[[1],[2,3]]","({})","({a:1,b:'x'})","({a:{b:2}})"];

function atom(){
  const r = rnd();
  if (r < 0.4) return pick(NUMS);
  if (r < 0.7) return pick(STRS);
  return pick(MISC);
}
const BINOPS = ["+","-","*","/","%","**","==","!=","===","!==","<","<=",">",">=","&&","||","??","&","|","^","<<",">>",">>>"];
const STRMETH = [
  x=>`(${x}).toString()`, x=>`String(${x})`, x=>`(''+${x}).length`,
  x=>`(''+${x}).toUpperCase()`, x=>`(''+${x}).slice(${int(5)-2})`,
  x=>`(''+${x}).indexOf('a')`, x=>`(''+${x}).split('a').length`,
  x=>`(''+${x}).charCodeAt(${int(3)})`, x=>`(''+${x}).trim()`,
  x=>`(''+${x}).repeat(${int(3)})`, x=>`(''+${x}).padStart(${int(6)},'ab')`,
  x=>`(''+${x}).includes('b')`, x=>`(''+${x}).replace('a','Z')`,
  x=>`(''+${x}).substring(1, ${int(5)})`, x=>`(''+${x}).at(${int(4)-2})`,
  x=>`(''+${x}).concat('q')`, x=>`(''+${x}).startsWith('a')`,
  x=>`(''+${x}).codePointAt(0)`, x=>`(''+${x}).normalize()`,
];
const NUMMETH = [
  x=>`(+${x}).toFixed(${int(4)})`, x=>`(+${x}) | 0`, x=>`(+${x}) >>> 0`,
  x=>`Math.abs(${x})`, x=>`Math.sign(${x})`, x=>`Math.round(${x})`,
  x=>`Math.floor(${x})`, x=>`Math.ceil(${x})`, x=>`Math.trunc(${x})`,
  x=>`Math.max(${x}, 2)`, x=>`Math.min(${x}, -1)`, x=>`Math.sqrt(Math.abs(${x}))`,
  x=>`Number(${x})`, x=>`parseInt('' + ${x})`, x=>`parseFloat('' + ${x})`,
  x=>`Number.isInteger(${x})`, x=>`isNaN(${x})`,
  x=>`(+${x}).toPrecision(${1+int(5)})`, x=>`(+${x}).toExponential(${int(4)})`,
];
const ARRMETH = [
  x=>`[${x}].concat(${x}).length`, x=>`[${x}, ${x}].join('|')`,
  x=>`[${x}].includes(${x})`, x=>`[${x}, 2, ${x}].indexOf(2)`,
  x=>`[3, ${x}, 1].sort().join(',')`, x=>`[${x}, 2].map(v => '' + v).join(';')`,
  x=>`[${x}, 2, 3].filter(v => v > 1).length`, x=>`[${x}, 2].reverse().join(',')`,
  x=>`[1, ${x}, 2].slice(1).length`, x=>`[[${x}], [2]].flat().length`,
  x=>`[${x}, 5].reduce((a, b) => '' + a + b, 'r')`,
  x=>`JSON.stringify([${x}])`,
];
const JSONM = [ x=>`JSON.stringify(${x})`, x=>`typeof (${x})` ];

function expr(d){
  if (d <= 0) return atom();
  const r = rnd();
  if (r < 0.30) return `(${expr(d-1)} ${pick(BINOPS)} ${expr(d-1)})`;
  if (r < 0.45) return pick(STRMETH)(expr(d-1));
  if (r < 0.60) return pick(NUMMETH)(expr(d-1));
  if (r < 0.72) return pick(ARRMETH)(atom());
  if (r < 0.80) return pick(JSONM)(expr(d-1));
  if (r < 0.88) return `(${expr(d-1)} ? ${expr(d-1)} : ${expr(d-1)})`;
  if (r < 0.94) return `(!${expr(d-1)})`;
  return `(${atom()})`;
}

const seen = new Set();
let emitted = 0;
while (emitted < count) {
  const e = expr(2 + int(2));
  if (seen.has(e)) continue;
  seen.add(e);
  let out;
  try { out = "" + eval("(" + e + ")"); } catch (err) { out = "THROW:" + err.constructor.name; }
  console.log(JSON.stringify([e, out]));
  emitted++;
}
