#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB-oracle compare:
run each oracle SQL on the same parquet tables, sort columns by name,
sort rows, hash values, compare with the Spark parquet output."""
import duckdb, json, sys, glob
import pandas as pd

verify_dir, sf_dir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{verify_dir}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def canon(df):
    df = df[sorted(df.columns)]
    # normalize dtypes: everything to string with rounding on floats
    out = df.copy()
    for c in out.columns:
        if out[c].dtype.kind == 'f':
            out[c] = out[c].round(6)
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
        got = pd.concat([pd.read_parquet(p) for p in glob.glob(f"{verify_dir}/{name}/*.parquet")])
        e, g = canon(exp), canon(got)
        if list(e.columns) != list(g.columns):
            print(f"FAIL {name}: columns differ: oracle={list(e.columns)} spark={list(g.columns)}"); fails += 1; continue
        if len(e) != len(g):
            print(f"FAIL {name}: rows differ: oracle={len(e)} spark={len(g)}"); fails += 1; continue
        eq = e.astype(str).equals(g.astype(str))
        if not eq:
            diff = (e.astype(str) != g.astype(str)).any(axis=1)
            print(f"FAIL {name}: values differ in {diff.sum()} rows; first:")
            print(e[diff].head(3)); print(g[diff].head(3)); fails += 1
        else:
            print(f"OK   {name} ({len(e)} rows)")
    except Exception as ex:
        print(f"ERR  {name}: {ex}"); fails += 1
sys.exit(1 if fails else 0)
