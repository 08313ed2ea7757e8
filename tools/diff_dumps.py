#!/usr/bin/env python3
"""Cross-run determinism gate: arrow-level diff of two INDEPENDENT
graft.Verify dumps of the same queries at the same SF.

Usage: python3 tools/diff_dumps.py <dumpDirA> <dumpDirB>

Any difference between two runs of identical code is run-to-run
nondeterminism (merge-order-sensitive aggregation state, uncommitted
ordering, wallclock leakage) — the r52 HLL flap (494<->495 on identical
code) was exactly this shape and was caught by hand with this diff;
this tool makes it a standing gate. Rows are canonicalized like the
oracle compare (columns sorted by name, rows sorted by all non-nested
columns); floats compare bitwise.
"""
import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

import check_oracle  # canon() + col_diff() — same comparison semantics


def load(d, name):
    files = sorted(glob.glob(f"{d}/{name}/*.parquet"))
    if not files:
        return None
    return check_oracle.canon(pa.concat_tables([pq.read_table(f) for f in files]))


def main():
    a, b = sys.argv[1], sys.argv[2]
    # Enumerate dump SUBDIRS, not oracle_sql.json: the no-oracle sketch
    # queries (r28/r47/r52) are precisely where merge-order
    # nondeterminism hides, and they must be covered too.
    names = sorted(e.name for e in os.scandir(a) if e.is_dir())
    n_fail = 0
    for name in names:
        ta, tb = load(a, name), load(b, name)
        if ta is None or tb is None:
            print(f"FAIL {name}: missing dump ({'A' if ta is None else 'B'})")
            n_fail += 1
            continue
        if ta.column_names != tb.column_names:
            print(f"FAIL {name}: columns {ta.column_names} vs {tb.column_names}")
            n_fail += 1
            continue
        if ta.num_rows != tb.num_rows:
            print(f"FAIL {name}: rows {ta.num_rows} vs {tb.num_rows}")
            n_fail += 1
            continue
        diffs = [d for c in ta.column_names
                 if (d := check_oracle.col_diff(c, ta.column(c), tb.column(c)))]
        if diffs:
            print(f"FAIL {name}: nondeterministic: " + "; ".join(diffs[:4]))
            n_fail += 1
    # The no-oracle sketch rows are the reason this gate exists — name
    # them in the output so the round artifact proves they were covered
    # (not just implied by subdir enumeration).
    sketch = [n for n in names
              if n in ("r28_approx_distinct", "r47_approx_percentiles",
                       "r52_hll_sketch_columns")]
    missing_sketch = {"r28_approx_distinct", "r47_approx_percentiles",
                      "r52_hll_sketch_columns"} - set(sketch)
    # Absence of a sketch query is a coverage failure, not a
    # nondeterminism failure: it drives the exit code but must not skew
    # the per-query identical count (ADVICE r6).
    sketch_absent = bool(missing_sketch)
    if sketch_absent:
        print(f"FAIL sketch queries absent from dump: {sorted(missing_sketch)}")
    print(f"determinism: {len(names) - n_fail}/{len(names)} queries identical "
          f"across runs (incl. no-oracle sketch queries: {', '.join(sketch)})")
    sys.exit(1 if (n_fail or sketch_absent) else 0)


if __name__ == "__main__":
    main()
