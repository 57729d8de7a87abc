#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB against the parquet tables in
<sfDir>, loads the matching Spark parquet result from <verifyOutDir>, sorts
columns by name and rows by all values, and compares cell-by-cell (exact for
non-floats, tiny epsilon report for floats so we can see drift before the
driver's hash compare fails on it).
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            expected = canon(con.sql(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(expected.columns) != list(got.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != oracle "
                  f"{list(expected.columns)}")
            n_fail += 1
            continue
        if len(expected) != len(got):
            print(f"FAIL {name}: rows {len(got)} != oracle {len(expected)}")
            n_fail += 1
            continue
        bad = []
        for col in expected.columns:
            ev, gv = expected[col].tolist(), got[col].tolist()
            for i, (a, b) in enumerate(zip(ev, gv)):
                ok = cell_eq(a, b)
                if not ok:
                    bad.append((col, i, a, b))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: {len(bad)}+ cell diffs, e.g. {bad[:3]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows x {len(got.columns)} cols)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
