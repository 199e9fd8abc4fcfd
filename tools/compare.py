#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
Loads each <verifyOutDir>/<name> parquet (our engine's result), runs the
oracle SQL from oracle_sql.json in DuckDB over the sf parquet tables, sorts
columns by name and rows by value, and diffs.
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
# optional extra args: restrict the compare to these query names
if len(sys.argv) > 3:
    only = set(sys.argv[3].split(","))
    oracle = {k: v for k, v in oracle.items() if k in only}
fails = []
for name, sql in sorted(oracle.items()):
    resdir = os.path.join(outdir, name)
    files = glob.glob(os.path.join(resdir, "*.parquet"))
    if not files:
        fails.append((name, "no result parquet")); continue
    try:
        mine = con.sql(f"SELECT * FROM '{resdir}/*.parquet'").df()
        ref = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"query error: {e}")); continue
    mine = mine[sorted(mine.columns)]
    ref = ref[sorted(ref.columns)]
    if list(mine.columns) != list(ref.columns):
        fails.append((name, f"columns {list(mine.columns)} vs {list(ref.columns)}")); continue
    if len(mine) != len(ref):
        fails.append((name, f"rows {len(mine)} vs {len(ref)}")); continue
    ms = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
    rs = ref.sort_values(by=list(ref.columns)).reset_index(drop=True)
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(ms, rs, check_dtype=False, check_exact=True)
        print(f"OK   {name} ({len(mine)} rows)")
    except AssertionError as e:
        fails.append((name, "value mismatch: " + str(e).split("\n")[0]))

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
