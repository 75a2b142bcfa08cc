#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify
output (parquet per query + oracle_sql.json) against DuckDB on the same
testdata tables, compare row counts, sorted columns, and values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails, passes, skips = [], [], []
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.read_parquet(d)
    if name not in oracle:
        skips.append((name, len(spark_df)))
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {e}"))
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    k = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(k.columns):
        fails.append((name, f"columns differ: spark={list(s.columns)} duck={list(k.columns)}"))
        continue
    if len(s) != len(k):
        fails.append((name, f"row count differs: spark={len(s)} duck={len(k)}"))
        continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    k = k.sort_values(by=list(k.columns)).reset_index(drop=True)
    bad = None
    for c in s.columns:
        sv, kv = s[c], k[c]
        try:
            kv = kv.astype(sv.dtype)
        except Exception:
            pass
        if sv.dtype.kind == "f":
            import numpy as np
            if not np.allclose(sv.fillna(-1e308), kv.fillna(-1e308), rtol=0, atol=1e-9):
                bad = c
                break
        else:
            if not sv.fillna("\0").equals(kv.fillna("\0")):
                bad = c
                break
        if str(s[c].dtype) != str(duck_df.reindex(sorted(duck_df.columns), axis=1)[c].dtype):
            print(f"  [warn] {name}.{c}: dtype spark={s[c].dtype} duck={kv.dtype}")
    if bad:
        i = (s[bad].fillna(-1) != k[bad].fillna(-1)).idxmax() if s[bad].dtype.kind != "O" else 0
        fails.append((name, f"values differ in col {bad}; spark[{i}]={s[bad].iloc[i]!r} duck[{i}]={k[bad].iloc[i]!r}"))
    else:
        passes.append((name, len(s)))

print(f"== PASS ({len(passes)}):")
for n, r in passes:
    print(f"   {n}: {r} rows")
print(f"== ROWS-ONLY ({len(skips)}):")
for n, r in skips:
    print(f"   {n}: {r} rows")
print(f"== FAIL ({len(fails)}):")
for n, m in fails:
    print(f"   {n}: {m}")
sys.exit(1 if fails else 0)
