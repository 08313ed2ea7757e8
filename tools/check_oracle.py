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

In ADDITION to the arrow-exact compare, every query is checked in
DRIVER-EQUIVALENT mode (replicating the round-grading harness, which
round 2 proved is repr-sensitive in ways arrow-exactness is not):
Spark output via pd.read_parquet (DECIMAL -> decimal.Decimal objects),
oracle via duckdb .df() (DECIMAL -> float64), rows sorted with pandas
sort_values on ALL columns, then str() of every cell compared. This is
the mode that catches `Decimal('218536.00')` vs `218536.0` and
unhashable array columns — both invisible to the arrow compare.
Flags: --arrow-only / --driver-only restrict to one mode.
"""
import decimal
import glob
import json
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

ORDERED = "--ordered" in sys.argv  # strict: do not sort rows before compare
ARROW_ONLY = "--arrow-only" in sys.argv
DRIVER_ONLY = "--driver-only" in sys.argv


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
        # Verify's canonicalizer intentionally widens Spark-side decimals
        # to double (the driver's .df() does the same to the oracle side),
        # so double-vs-decimal compares as float64 bitwise. NOTE: pyarrow's
        # own decimal->float64 cast is NOT correctly rounded (observed
        # last-bit drift vs duckdb/Spark); python float(Decimal) IS, so
        # convert per-value through decimal.Decimal.
        def dec2f64(arr):
            vals = [None if v is None else float(v) for v in arr.to_pylist()]
            return pa.chunked_array([pa.array(vals, type=pa.float64())])
        if pa.types.is_float64(ta) and pa.types.is_decimal(tb):
            return col_diff(name, a, dec2f64(b))
        if pa.types.is_decimal(ta) and pa.types.is_float64(tb):
            return col_diff(name, dec2f64(a), b)
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


def driver_diff(con, sql, files):
    """Replicates the driver's repr-hash compare. None if it would pass,
    else the reason string. Any exception (e.g. pandas failing to sort
    an array column) is the same hard error the driver reports."""
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    want = con.sql(sql).df()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        return f"columns spark={list(got.columns)} oracle={list(want.columns)}"
    if len(got) != len(want):
        return f"rows spark={len(got)} oracle={len(want)}"
    if len(got):
        cols = list(got.columns)
        got = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
        want = want.sort_values(cols, kind="mergesort").reset_index(drop=True)
    ga = got.astype(str).to_numpy()
    wa = want.astype(str).to_numpy()
    neq = ga != wa
    if neq.any():
        r, c = map(int, np.argwhere(neq)[0])
        col = list(got.columns)[c]
        return (f"{int(neq.sum())} cell reprs differ; first at row {r} "
                f"col {col}: spark={ga[r, c]!r} oracle={wa[r, c]!r}")
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
        fails = []
        nrows = 0
        flag = ""
        if not DRIVER_ONLY:
            try:
                got = canon(pa.concat_tables([pq.read_table(f) for f in files]))
                want = canon(con.sql(sql).arrow())
                if got.column_names != want.column_names:
                    fails.append(f"arrow: columns spark={got.column_names} oracle={want.column_names}")
                elif got.num_rows != want.num_rows:
                    fails.append(f"arrow: rows spark={got.num_rows} oracle={want.num_rows}")
                else:
                    nrows = got.num_rows
                    diffs = [d for c in got.column_names
                             if (d := col_diff(c, got.column(c), want.column(c)))]
                    if diffs:
                        fails.append("arrow: " + "; ".join(diffs[:4]))
                    widths = [f"{c}:{got.schema.field(c).type}~{want.schema.field(c).type}"
                              for c in got.column_names
                              if got.schema.field(c).type != want.schema.field(c).type]
                    if widths:
                        flag = f" (width diff: {widths})"
            except Exception as e:
                fails.append(f"arrow: {type(e).__name__}: {e}")
        if not ARROW_ONLY:
            try:
                d = driver_diff(con, sql, files)
                if d:
                    fails.append(f"driver: {d}")
            except Exception as e:
                fails.append(f"driver: harness error {type(e).__name__}: {e}")
        # Vacuous-green lint: a 0-row dump "matches" any oracle that also
        # returns 0 rows without the query's operator path ever touching
        # data (q13's round-3 lesson). Every registered query must yield
        # survivors at every tested SF — an empty result is a FAIL even
        # when both engines agree on it.
        if not fails and not DRIVER_ONLY and nrows == 0:
            fails.append("vacuous: 0 rows at this SF — parity proven on nothing")
        if fails:
            print(f"FAIL {name}: " + " | ".join(fails))
            n_fail += 1
            continue
        print(f"PASS {name} ({nrows} rows){flag}")
        n_pass += 1

    # Band oracles (r8 verdict stretch 7): the estimate-valued sketch
    # queries (approx distinct, approx percentiles) can never hash-match
    # a different engine's sketch, but DuckDB's own approximators over
    # the same data must land within rel_tol of Spark's — both are
    # spec-bounded near the exact answer, while any wrong plan (dropped
    # filter, doubled input) moves an estimate by ~2x. Keys (non-float
    # columns) must match exactly; numeric estimate columns band-match.
    import os.path
    band_path = f"{out}/band_oracle.json"
    band_verdicts = {}
    if os.path.exists(band_path):
        with open(band_path) as f:
            bands = json.load(f)
        for name in sorted(bands):
            spec = bands[name]
            files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
            if not files:
                print(f"FAIL {name}: band oracle but no spark output")
                n_fail += 1
                continue
            try:
                got = pa.concat_tables([pq.read_table(f) for f in files]).to_pandas()
                want = con.sql(spec["sql"]).df()
                got = got[sorted(got.columns)]
                want = want[sorted(want.columns)]
                # rows align on the KEY (non-numeric) columns — sorting by
                # an estimate column would misalign rows whenever the two
                # engines' estimates order differently
                keys = [c for c in got.columns
                        if not np.issubdtype(got[c].dtype, np.number)] or list(got.columns)
                got = got.sort_values(keys).reset_index(drop=True)
                want = want.sort_values(keys).reset_index(drop=True)
                assert list(got.columns) == list(want.columns), \
                    f"columns {list(got.columns)} vs {list(want.columns)}"
                assert len(got) == len(want), f"rows {len(got)} vs {len(want)}"
                tol = float(spec["rel_tol"])
                worst = 0.0
                for c in got.columns:
                    if np.issubdtype(got[c].dtype, np.number):
                        g = got[c].astype(float).to_numpy()
                        w = want[c].astype(float).to_numpy()
                        rel = np.abs(g - w) / np.maximum(np.abs(w), 1.0)
                        worst = max(worst, float(rel.max()))
                        assert rel.max() <= tol, \
                            f"col {c}: rel diff {rel.max():.4f} > {tol} (spark={g[rel.argmax()]}, duckdb={w[rel.argmax()]})"
                    else:
                        assert (got[c].astype(str) == want[c].astype(str)).all(), \
                            f"key col {c} mismatch"
                print(f"BAND-PASS {name} (worst rel diff {worst:.4f} <= {tol})")
                band_verdicts[name] = {"pass": True, "worst_rel_diff": round(worst, 6),
                                       "rel_tol": tol, "engine": "duckdb-own-approximator"}
                n_pass += 1
            except Exception as e:
                print(f"FAIL {name}: band: {e}")
                band_verdicts[name] = {"pass": False, "error": str(e),
                                       "rel_tol": float(spec["rel_tol"])}
                n_fail += 1
        # Driver-readable adjudication next to the per-query dumps (r10
        # verdict item 7): the driver's CORRECTNESS harness reads only
        # oracleSql, so the three sketch queries show as no_oracle there;
        # this file carries their measured cross-engine verdicts so a
        # reader of the dump dir can count every registered query
        # adjudicated. gates.sh close commits it as BAND_VERDICTS.json.
        with open(f"{out}/band_verdicts.json", "w") as f:
            json.dump(band_verdicts, f, indent=1, sort_keys=True)

    print(f"\n{n_pass} passed, {n_fail} failed, {len(oracle)} oracled")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
