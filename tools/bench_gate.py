#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares the CURRENT bench run (bench_queries.json, reps>=2 minima) against
the per-query HISTORICAL minimum at the same scale factor from the committed
bench_history.jsonl, and fails if any query regressed past the threshold.
The total-time number cannot catch this: a 3x regression in one query ships
silently inside ~15% run-to-run total variance.

Fail rule (both must hold, so sub-second flap can't false-alarm):
    current > FACTOR * historical_min   AND   current - historical_min > SLACK

- FACTOR 1.5 sits above the measured per-query minima variance band but
  below any plan-shape regression seen so far (those are 2-10x).
- SLACK 1.0 s: short queries cross 1.5x with no plan change (measured:
  q01 flaps 1.13-2.01 s across the 14 recorded sf0.1 runs, driver runs
  under load) -- the absolute gap requirement keeps the gate focused on
  the multi-second queries where a real regression is expensive.

Allowlist (the PlanLintSpec pattern): tools/bench_allowlist.json maps
query name -> reason string; allowlisted regressions print the reason and
do not fail. An entry must carry a real reason - reviewers read them.

History lines whose "queries" dict is identical to the current run are
excluded (graft.Bench appends the current run to history BEFORE the gate
runs; a run must not be its own baseline).

Self-test mode (--selftest) proves the gate is not vacuous: it re-runs the
check on a copy of the current run with one query slowed 3x and requires
THAT to fail while the real run passes.

Usage: bench_gate.py [bench_queries.json] [--history bench_history.jsonl]
                     [--factor 1.5] [--slack 1.0] [--selftest]
"""
import argparse
import json
import os
import sys


def load_history(path, sf, exclude_queries):
    best = {}
    if not os.path.exists(path):
        return best
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("sf") != sf or d.get("queries") == exclude_queries:
                continue
            # Floors come from GREEN-gated runs ONLY (r7 verdict item 6,
            # strict option): a red run's retries ran under the same load
            # that made it red, and legacy pre-gate lines were recorded
            # under much smaller registries (r61's 2.13 s floor came from
            # a 171-query JVM; the same plan in a 296-query run context
            # times 2.5-3.3 s with no plan change) — cross-era floors are
            # not comparable, so only gate-green runs set them.
            if d.get("gate") != "green":
                continue
            # Era re-baseline (r10, verdict item 5): lines carrying a
            # "retired" marker were recorded under materially smaller
            # registries (<356 queries) — the same plan times 1.5-2x
            # slower inside a heavier-registry JVM with no plan change,
            # so those floors generated retry churn, not signal. They
            # stay in the file for archaeology but set no floors.
            if d.get("retired"):
                continue
            for q, t in d["queries"].items():
                if q not in best or t < best[q]:
                    best[q] = t
    return best


def check(cur, best, allow, factor, slack, label):
    failures, new = [], []
    for q, t in sorted(cur.items()):
        if q not in best:
            new.append(q)
            continue
        b = best[q]
        if t > factor * b and t - b > slack:
            if q in allow:
                print(f"[bench-gate] ALLOW {q}: {t:.2f}s vs best {b:.2f}s -- {allow[q]}")
            else:
                failures.append((q, t, b))
    for q, t, b in failures:
        print(f"[bench-gate] REGRESSION {q}: {t:.2f}s vs historical best {b:.2f}s "
              f"({t / b:.1f}x, threshold {factor}x + {slack}s)")
    if new:
        print(f"[bench-gate] {len(new)} queries with no history at this sf "
              f"(pass by default): {', '.join(new[:8])}{'...' if len(new) > 8 else ''}")
    print(f"[bench-gate] {label}: {len(cur)} queries checked, "
          f"{len(cur) - len(new)} with history, {len(failures)} regressions")
    return not failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("current", nargs="?", default="bench_queries.json")
    ap.add_argument("--history", default="bench_history.jsonl")
    ap.add_argument("--allowlist", default=os.path.join(os.path.dirname(__file__), "bench_allowlist.json"))
    ap.add_argument("--factor", type=float, default=1.5)
    ap.add_argument("--slack", type=float, default=1.0)
    ap.add_argument("--selftest", action="store_true")
    args = ap.parse_args()

    with open(args.current) as f:
        run = json.load(f)
    cur, sf = run["queries"], run["sf"]
    allow = {}
    if os.path.exists(args.allowlist):
        with open(args.allowlist) as f:
            allow = json.load(f)
    best = load_history(args.history, sf, cur)

    ok = check(cur, best, allow, args.factor, args.slack, f"real run ({sf})")

    if args.selftest:
        victims = [q for q in sorted(cur) if q in best and q not in allow]
        if not victims:
            print("[bench-gate] SELFTEST SKIPPED: no query has history to plant against")
        else:
            # one victim per line family: the gate must trip on a planted
            # slowdown in a query, a pool build, AND a streaming kernel
            # (r10 verdict item 6) -- a family with no history yet is
            # skipped the same way victimless runs are.
            fams = {"query": [q for q in victims if not q.startswith(("pool:", "stream:"))],
                    "pool": [q for q in victims if q.startswith("pool:")],
                    "stream": [q for q in victims if q.startswith("stream:")]}
            for fam, qs in fams.items():
                if not qs:
                    print(f"[bench-gate] selftest: no {fam} line with history yet -- skipped")
                    continue
                victim = max(qs, key=lambda q: best[q])
                planted = dict(cur)
                planted[victim] = max(3.0 * best[victim], best[victim] + 2 * args.slack)
                print(f"[bench-gate] selftest: planting {fam} victim {victim} at {planted[victim]:.2f}s")
                if check(planted, best, allow, args.factor, args.slack, f"planted {fam} run"):
                    print(f"[bench-gate] SELFTEST FAILED: planted {fam} regression not detected")
                    sys.exit(1)
            print("[bench-gate] selftest PASS: planted regression detected")

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
