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
import pyarrow.dataset as pads

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


def check(name, sql):
    """Compare one query; returns an error string or None on match."""
    spark_dir = f"{vout}/{name}"
    if not os.path.isdir(spark_dir):
        return "no spark output dir"
    # Type-fidelity gate the DuckDB->pandas path can't provide: pandas
    # collapses DECIMAL(38,0) to float64 on BOTH sides, which hid the
    # r11 q117 driver hash-FAIL (VERDICT r11 #2). Read the Spark
    # parquet schema with pyarrow (types intact) and the oracle result
    # as arrow; any decimal column on either side is a loud contract
    # violation (SparkEntry.scala:13-21 forbids DECIMAL outputs), and
    # any arrow-type mismatch is a FAIL before the value diff runs.
    spark_schema = pads.dataset(spark_dir, format="parquet").schema
    # ONE oracle execution: the arrow table carries both the type gate
    # (schema) and the value side (to_pandas) — the heavy oracles
    # (q129's gram chain, q132's all-pairs rank) must not run twice
    oracle_tbl = con.execute(sql).arrow()
    oracle_arrow = oracle_tbl.schema
    type_fail = None
    for fld in spark_schema:
        if "decimal" in str(fld.type):
            type_fail = f"spark col {fld.name} is {fld.type} (DECIMAL outputs forbidden)"
            break
    if type_fail is None:
        for fld in oracle_arrow:
            if "decimal" in str(fld.type):
                type_fail = f"oracle col {fld.name} is {fld.type} (DECIMAL outputs forbidden)"
                break
    if type_fail is None:
        sg = {f.name: str(f.type) for f in spark_schema}
        og = {f.name: str(f.type) for f in oracle_arrow}
        for cname in sorted(set(sg) & set(og)):
            # DuckDB emits count(*) as int64 like Spark longs; strings
            # may arrive as string vs large_string — same driver hash.
            a, b = sg[cname].replace("large_", ""), og[cname].replace("large_", "")
            if a != b:
                type_fail = f"col {cname}: spark arrow type {sg[cname]} != oracle {og[cname]}"
                break
    if type_fail:
        return type_fail
    got = canon(con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df())
    # date_as_object=False keeps DATE columns as datetime64, matching
    # the dtype the duckdb .df() path (used for the Spark side) yields
    want = canon(oracle_tbl.to_pandas(date_as_object=False))
    if list(got.columns) != list(want.columns):
        return f"columns {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    # Driver-faithful compare: the driver hashes values type-sensitively,
    # so a decimal-vs-double difference is a FAIL even at equal values.
    mismatch = None
    for c in got.columns:
        a, b = got[c], want[c]
        # datetime64 storage RESOLUTION (us vs ms) is a pandas artifact
        # of the read path, not a driver-visible type — the arrow-type
        # gate above already compared the real types; values compare
        # fine across resolutions
        da, db = str(a.dtype), str(b.dtype)
        if da.startswith("datetime64") and db.startswith("datetime64"):
            da = db = "datetime64"
        if da != db:
            mismatch = (c, "dtype", str(a.dtype), str(b.dtype))
            break
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = (c, i, a[i], b[i])
            break
    if mismatch:
        c, i, av, bv = mismatch
        return f"col {c} @{i}: spark={av!r} oracle={bv!r}"
    print(f"OK   {name}: {len(got)} rows")
    return None



for name, sql in sorted(oracle.items()):
    # per-query isolation: one bad oracle (stale path, engine error)
    # must not abort the whole sweep
    try:
        err = check(name, sql)
    except Exception as e:
        err = f"{type(e).__name__}: {e}"
    if err:
        print(f"FAIL {name}: {err}")
        fails += 1

# queries without oracle: rows-only
print(f"\n{fails} failures / {len(oracle)} oracle queries")
sys.exit(1 if fails else 0)
