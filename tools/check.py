#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify at a
given SF dir, then run each oracle SQL in DuckDB over the same parquet tables
and compare (row count, column names, values with sorted columns).

Usage: python3 tools/check.py [sfDir] [outDir]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))])
    if name not in oracle:
        results[name] = f"NO-ORACLE rows={len(spark_df)}"
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        results[name] = f"ORACLE-SQL-ERROR {e}"
        continue
    s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
    if s_cols != d_cols:
        results[name] = f"SCHEMA-MISMATCH spark={s_cols} duck={d_cols}"
        continue
    if len(spark_df) != len(duck_df):
        results[name] = f"ROWCOUNT-MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
        continue
    a = spark_df[s_cols].reset_index(drop=True)
    b = duck_df[s_cols].reset_index(drop=True)
    mismatch = None
    for c in s_cols:
        av, bv = a[c], b[c]
        # The driver's hash is dtype-sensitive: an int column on one side vs a
        # float column on the other fails even when values are identical (e.g.
        # DuckDB SUM(BIGINT)->HUGEINT materializes as float64). Flag it instead
        # of coercing so the local gate matches the driver.
        if {av.dtype.kind, bv.dtype.kind} == {"i", "f"} or {av.dtype.kind, bv.dtype.kind} == {"u", "f"}:
            mismatch = f"TYPE-MISMATCH col={c} spark={av.dtype} duck={bv.dtype}"
            break
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            eq = np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
            exact = (av.astype(float).values == bv.astype(float).values) | (av.isna().values & bv.isna().values)
            if not eq.all():
                mismatch = f"VALUE-MISMATCH col={c} row={int(np.argmin(eq))} spark={av[np.argmin(eq)]} duck={bv[np.argmin(eq)]}"
                break
            if not exact.all():
                i = int(np.argmin(exact))
                mismatch = f"BIT-MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
                break
        else:
            eq = (av.astype(str).values == bv.astype(str).values)
            if not eq.all():
                i = int(np.argmin(eq))
                mismatch = f"VALUE-MISMATCH col={c} row={i} spark={av[i]!r} duck={bv[i]!r}"
                break
    results[name] = mismatch or f"OK rows={len(a)}"

twin_of = {}
try:
    twin_of = json.load(open(f"{out}/twin_of.json"))
except Exception:
    pass

npass = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in sorted(results.items()):
    tag = f" [audit: twin of {twin_of[k]}]" if k in twin_of else ""
    print(f"{'PASS' if v.startswith('OK') else 'FAIL' if 'MISMATCH' in v or 'ERROR' in v else 'WARN':4} {k}: {v}{tag}")
n_audit = sum(1 for k in results if k in twin_of)
print(f"\n{npass}/{len([k for k in results if k in oracle])} oracle-checked pass, {len(results)} total"
      f" ({len(results) - n_audit} production + {n_audit} audit)")
