#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the oracle
SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the sfDir tables,
sorts columns by name and rows by all columns, and diffs values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, vout = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{vout}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{vout}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    got = canon(con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df())
    want = canon(con.execute(sql).df())
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1
        continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}")
        fails += 1
        continue
    # Driver-faithful compare: the driver hashes values type-sensitively,
    # so a decimal-vs-double difference is a FAIL even at equal values.
    mismatch = None
    for c in got.columns:
        a, b = got[c], want[c]
        if str(a.dtype) != str(b.dtype):
            mismatch = (c, "dtype", str(a.dtype), str(b.dtype))
            break
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = (c, i, a[i], b[i])
            break
    if mismatch:
        c, i, av, bv = mismatch
        print(f"FAIL {name}: col {c} @{i}: spark={av!r} oracle={bv!r}")
        fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")

# queries without oracle: rows-only
print(f"\n{fails} failures / {len(oracle)} oracle queries")
sys.exit(1 if fails else 0)
