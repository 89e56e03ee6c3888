// Regex-translation differential fuzz: random patterns from the safe
// subset grammar x random subjects; compare test/match/replace/split.
function mulberry32(a){return function(){a|=0;a=a+0x6D2B79F5|0;var t=Math.imul(a^a>>>15,1|a);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}}
const seed = parseInt(process.argv[2] || "1", 10);
const count = parseInt(process.argv[3] || "500", 10);
const rnd = mulberry32(seed);
function pick(a){ return a[Math.floor(rnd()*a.length)] }
function int(n){ return Math.floor(rnd()*n) }

const ATOMS = ["a","b","c","0","1",".","\\\\d","\\\\w","\\\\s","\\\\b","[ab]","[^ab]","[a-c]","[0-9a-f]","\\\\.","x"];
function re(d){
  if (d <= 0) return pick(ATOMS);
  const r = rnd();
  if (r < 0.30) return re(d-1) + re(d-1);
  if (r < 0.42) return re(d-1) + pick(["*","+","?","{1,2}","{2}"]);
  if (r < 0.52) return "(" + re(d-1) + "|" + re(d-1) + ")";
  if (r < 0.60) return "(" + re(d-1) + ")";
  if (r < 0.66) return "(?:" + re(d-1) + ")";
  if (r < 0.72) return "(?=" + re(d-1) + ")" + re(d-1);
  if (r < 0.76) return "(?!" + re(d-1) + ")" + re(d-1);
  if (r < 0.82) return "^" + re(d-1);
  if (r < 0.88) return re(d-1) + "$";
  return pick(ATOMS);
}
const SUBJECTS = ["", "abc", "aabbcc", "a b c", "0a1b2c", "  ab  ", "abcabcabc",
  "xyz", "aA bB", "a.b.c", "Ab0 cD1", " a ", "a\nb\nc", "ccc", "ab01ab"];

let emitted = 0, tries = 0;
while (emitted < count && tries < count * 20) {
  tries++;
  const p = re(2 + int(2));
  // r16: sticky 'y' and indices 'd' join the pool (anchored exec/
  // test/match/replace semantics + per-group index arrays)
  const flags = pick(["", "g", "i", "m", "gi", "gm", "s",
                      "y", "gy", "yi", "d", "gd", "gyd"]);
  const s = pick(SUBJECTS);
  const kind = int(6);
  let e;
  if (kind === 0) e = `/${p}/${flags}.test(${JSON.stringify(s)})`;
  else if (kind === 1) e = `JSON.stringify(${JSON.stringify(s)}.match(/${p}/${flags}))`;
  else if (kind === 2) e = `${JSON.stringify(s)}.replace(/${p}/${flags}, '<$&>')`;
  else if (kind === 3) e = `JSON.stringify(${JSON.stringify(s)}.split(/${p}/${flags.replace("g","")}))`;
  else if (kind === 4) // exec at a random lastIndex: the sticky/global anchor paths
    e = `(() => { const r = /${p}/${flags}; r.lastIndex = ${int(4)}; ` +
        `const m = r.exec(${JSON.stringify(s)}); ` +
        `return JSON.stringify([m && m[0], m && m.index, r.lastIndex, m && m.indices]) })()`;
  else // two consecutive exec calls: lastIndex tracking across hits/misses
    e = `(() => { const r = /${p}/${flags}; const a = r.exec(${JSON.stringify(s)}); ` +
        `const b = r.exec(${JSON.stringify(s)}); ` +
        `return JSON.stringify([a && a[0], b && b[0], r.lastIndex]) })()`;
  let out;
  try { out = "" + eval("(" + e + ")"); } catch (err) { out = "THROW:" + err.constructor.name; }
  console.log(JSON.stringify([e, out]));
  emitted++;
}
