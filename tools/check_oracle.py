#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB against the sf tables and compares (schema + values) with the parquet
dumped by graft.Verify. Usage: check_oracle.py <sfDir> <verifyOutDir> [query...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

sqls = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, q in sorted(sqls.items()):
    if only and name not in only:
        continue
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"[MISS] {name}: no spark output"); fails.append(name); continue
    try:
        exp = con.sql(q).df()
    except Exception as e:
        print(f"[SQLERR] {name}: {e}"); fails.append(name); continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{spark_dir}/*.parquet"))],
                    ignore_index=True) if glob.glob(f"{spark_dir}/*.parquet") else pd.DataFrame()
    # driver-style compare: sort columns by name, then row-sort and compare values
    def canon(df):
        df = df[sorted(df.columns)]
        df = df.sort_values(by=list(df.columns), ignore_index=True)
        return df
    if sorted(exp.columns) != sorted(got.columns):
        print(f"[SCHEMA] {name}: exp={sorted(exp.columns)} got={sorted(got.columns)}")
        fails.append(name); continue
    e, g = canon(exp), canon(got)
    if len(e) != len(g):
        print(f"[ROWS] {name}: exp={len(e)} got={len(g)}"); fails.append(name); continue
    # dtype-tolerant value compare
    mismatch = None
    for c in e.columns:
        ev, gv = e[c], g[c]
        try:
            if ev.dtype.kind in "fc" or gv.dtype.kind in "fc":
                import numpy as np
                if not np.allclose(ev.astype(float), gv.astype(float), rtol=0, atol=0, equal_nan=True):
                    mismatch = c; break
            else:
                if not (ev.astype(str).values == gv.astype(str).values).all():
                    mismatch = c; break
        except Exception as ex:
            mismatch = f"{c} ({ex})"; break
    # schema dtype check (driver checks schema too)
    dtypes_e = {c: str(exp[c].dtype) for c in exp.columns}
    dtypes_g = {c: str(got[c].dtype) for c in got.columns}
    dtype_diff = {c: (dtypes_e[c], dtypes_g[c]) for c in dtypes_e if dtypes_e[c] != dtypes_g[c]}
    if mismatch:
        print(f"[VALUE] {name}: column {mismatch} differs")
        idx = (e[mismatch].astype(str).values != g[mismatch].astype(str).values).argmax() if mismatch in e else 0
        print("  exp:", e.iloc[max(0,idx-1):idx+2].to_dict('records'))
        print("  got:", g.iloc[max(0,idx-1):idx+2].to_dict('records'))
        fails.append(name)
    elif dtype_diff:
        print(f"[DTYPE] {name}: {dtype_diff} (values match)")
        print(f"[OK*]   {name}: {len(e)} rows")
    else:
        print(f"[OK]    {name}: {len(e)} rows")
print()
print("FAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
