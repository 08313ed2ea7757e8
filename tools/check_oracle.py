#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [outDir]

Reads outDir/oracle_sql.json (written by graft.Verify), registers the
fixture parquet tables as DuckDB views, runs each oracle SQL, and
compares against the Spark parquet dump in outDir/<name>/ — column
names (sorted), dtypes, and exact row values (rows sorted by all
columns, so stricter drivers that also check order need the ORDER BY
already present in the queries themselves).
"""
import duckdb
import glob
import json
import sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


ORDERED = "--ordered" in sys.argv  # strict: do not sort rows before compare


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and not ORDERED:
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out = args[1] if len(args) > 1 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            n_fail += 1
            continue
        dtype_diff = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                      if str(g[c].dtype) != str(w[c].dtype)]
        try:
            pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
        except AssertionError as e:
            msg = str(e).replace("\n", " | ")[:400]
            print(f"FAIL {name}: values differ: {msg}")
            n_fail += 1
            continue
        flag = f" (dtype diff: {dtype_diff})" if dtype_diff else ""
        print(f"PASS {name} ({len(g)} rows){flag}")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, "
          f"{len(oracle)} oracled")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
