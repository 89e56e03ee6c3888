#!/usr/bin/env python3
"""Build SCALING.md from two same-session Bench artifacts (VERDICT r8 #1).

Usage: python3 tools/scaling_report.py <bench_sf0.1.json> <bench_sf1.json> [out.md]

Reads the full-format bench JSON (the target/bench.json shape with
"queries" per-query min seconds), computes the t(sf1)/t(sf0.1) ratio
per query, and emits a markdown table sorted by ratio descending with
a flag column for anything scaling worse than 1.3x linear (ratio > 13
for a 10x volume step).
"""
import json
import sys

LINEAR = 10.0          # sf1.0 / sf0.1 volume ratio
FLAG = 1.3 * LINEAR    # the verdict's "worse than ~1.3x linear" bar
# sub-second sf0.1 queries are dominated by fixed per-query overhead
# (job scheduling, plan compile); their ratios understate scaling, so
# they are reported but the flag applies the absolute-floor guard
FLOOR = 0.15


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALING.md"
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(qs):
        if name not in qb:
            rows.append((float("inf"), name, qs[name], None, None, "MISSING at sf1"))
            continue
        t0, t1 = qs[name], qb[name]
        ratio = t1 / t0 if t0 > 0 else float("inf")
        flagged = ratio > FLAG and t0 >= FLOOR
        rows.append((ratio, name, t0, t1, ratio, "FLAG" if flagged else ""))
    rows.sort(key=lambda r: -r[0])
    lines = [
        "| query | t(sf0.1) s | t(sf1.0) s | ratio | vs linear (10x) | note |",
        "|---|---|---|---|---|---|",
    ]
    for _, name, t0, t1, ratio, note in rows:
        if t1 is None:
            lines.append(f"| {name} | {t0:.3f} | — | — | — | {note} |")
        else:
            lines.append(
                f"| {name} | {t0:.3f} | {t1:.3f} | {ratio:.1f}× | "
                f"{ratio / LINEAR:.2f}× | {note} |")
    tot0 = sum(qs[n] for n in qs if n in qb)
    tot1 = sum(qb[n] for n in qs if n in qb)
    lines.append(
        f"| **total** | **{tot0:.3f}** | **{tot1:.3f}** | "
        f"**{tot1 / tot0:.1f}×** | **{tot1 / tot0 / LINEAR:.2f}×** | |")
    print("\n".join(lines))
    with open(out + ".table", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
