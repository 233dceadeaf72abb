#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables, compare to the Spark parquet dumps (rows, schema
by sorted column names, value hash)."""
import sys, json, glob, hashlib
import duckdb, pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    try:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    except Exception as e:
        pass

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def h(df):
    s = df.to_csv(index=False, float_format="%.9g")
    return hashlib.md5(s.encode()).hexdigest()

fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    try:
        o = con.execute(sql).fetchdf()
        spath = glob.glob(f"{out}/{name}/*.parquet")
        s = pq.read_table(spath[0]).to_pandas() if spath else None
        if s is None:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        on, sn = norm(o), norm(s)
        rows = len(on) == len(sn)
        schema = list(on.columns) == list(sn.columns)
        # coerce dtypes for hash compare
        for c in on.columns:
            if c in sn.columns:
                try:
                    on[c] = on[c].astype(sn[c].dtype)
                except Exception: pass
        hm = h(on) == h(sn)
        status = "ok  " if (rows and schema and hm) else "FAIL"
        if status == "FAIL":
            fails += 1
            print(f"{status} {name}: rows={len(on)}/{len(sn)} schema={schema} hash={hm} cols_o={list(on.columns)} cols_s={list(sn.columns)}")
            if rows and schema and not hm:
                diff = (on != sn)
                bad = diff.any(axis=1)
                print(on[bad].head(3)); print(sn[bad].head(3))
        else:
            print(f"{status} {name} ({len(sn)} rows)")
    except Exception as e:
        fails += 1
        print(f"FAIL {name}: {e}")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
