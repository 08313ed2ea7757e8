#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate — exact edition.

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--ordered]

Reads outDir/oracle_sql.json (written by graft.Verify), registers the
fixture parquet tables as DuckDB views, runs each oracle SQL, and
compares against the Spark parquet dump in outDir/<name>/.

Comparison is EXACT at the arrow level — no pandas float64 round-trip:
  - Spark output is read with pyarrow directly (so INT96/nanos
    timestamps and decimal physical types are visible, as the driver
    sees them), the oracle via duckdb's .arrow().
  - decimals compare as decimal.Decimal values AND must agree on scale;
  - floats compare bitwise (uint64 view) — catches last-digit drift
    that float64-through-pandas silently forgave;
  - timestamps must agree on unit (us vs ns is a FAIL: values can match
    while an epoch-level hash diverges) and on epoch value;
  - everything else compares as exact python values.
Rows are sorted by every non-nested column (mergesort, nulls last) on
both sides unless --ordered.
"""
import decimal
import glob
import json
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

ORDERED = "--ordered" in sys.argv  # strict: do not sort rows before compare


def canon(t: pa.Table):
    """Columns sorted by name; rows sorted by all non-nested columns."""
    t = t.select(sorted(t.column_names))
    if not ORDERED and t.num_rows:
        keys = [(c, "ascending") for c in t.column_names
                if not pa.types.is_nested(t.schema.field(c).type)]
        if keys:
            t = t.take(pc.sort_indices(t, sort_keys=keys, null_placement="at_end"))
    return t


def col_diff(name, a: pa.ChunkedArray, b: pa.ChunkedArray):
    """None if identical, else a human-readable reason."""
    ta, tb = a.type, b.type
    if pa.types.is_decimal(ta) or pa.types.is_decimal(tb):
        if not (pa.types.is_decimal(ta) and pa.types.is_decimal(tb)):
            return f"{name}: decimal vs non-decimal ({ta} vs {tb})"
        if ta.scale != tb.scale:
            return f"{name}: decimal scale {ta.scale} vs {tb.scale}"
        va, vb = a.to_pylist(), b.to_pylist()
        bad = sum(1 for x, y in zip(va, vb) if x != y)
        return f"{name}: {bad} decimal values differ" if bad else None
    if pa.types.is_floating(ta) or pa.types.is_floating(tb):
        if ta != tb:
            return f"{name}: float type {ta} vs {tb}"
        # NULL masks must match BEFORE the numeric view: to_pylist maps
        # arrow NULL to None -> np.float64 NaN, which would silently
        # equate a NULL on one side with a NaN on the other.
        na = [x is None for x in a.to_pylist()]
        nb = [x is None for x in b.to_pylist()]
        if na != nb:
            bad = sum(1 for x, y in zip(na, nb) if x != y)
            return f"{name}: {bad} null-mask positions differ"
        xa = np.array(a.to_pylist(), dtype=np.float64)
        xb = np.array(b.to_pylist(), dtype=np.float64)
        bad = int((xa.view(np.uint64) != xb.view(np.uint64)).sum())
        return f"{name}: {bad} float values differ bitwise" if bad else None
    if pa.types.is_timestamp(ta) or pa.types.is_timestamp(tb):
        if ta != tb:
            return f"{name}: timestamp type {ta} vs {tb} (unit/tz must match)"
        va = a.cast(pa.int64()).to_pylist()
        vb = b.cast(pa.int64()).to_pylist()
        bad = sum(1 for x, y in zip(va, vb) if x != y)
        return f"{name}: {bad} timestamp values differ" if bad else None
    va, vb = a.to_pylist(), b.to_pylist()
    if va != vb:
        bad = sum(1 for x, y in zip(va, vb) if x != y)
        return f"{name}: {bad} values differ ({ta} vs {tb})"
    return None


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
            got = canon(pa.concat_tables([pq.read_table(f) for f in files]))
            want = canon(con.sql(sql).arrow())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if got.column_names != want.column_names:
            print(f"FAIL {name}: columns spark={got.column_names} oracle={want.column_names}")
            n_fail += 1
            continue
        if got.num_rows != want.num_rows:
            print(f"FAIL {name}: rows spark={got.num_rows} oracle={want.num_rows}")
            n_fail += 1
            continue
        diffs = [d for c in got.column_names
                 if (d := col_diff(c, got.column(c), want.column(c)))]
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:4]))
            n_fail += 1
            continue
        widths = [f"{c}:{got.schema.field(c).type}~{want.schema.field(c).type}"
                  for c in got.column_names
                  if got.schema.field(c).type != want.schema.field(c).type]
        flag = f" (width diff: {widths})" if widths else ""
        print(f"PASS {name} ({got.num_rows} rows){flag}")
        n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} oracled")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
