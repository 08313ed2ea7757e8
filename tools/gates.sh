#!/usr/bin/env bash
# Full pre-ship gate matrix: compile, tests, oracle compare at all three
# scale factors in BOTH modes (arrow-exact + driver-equivalent repr),
# strict row order, ANSI mode, smoke, bench line.
#
# Usage: tools/gates.sh [quick|close]
#   quick = sf0.01 both-modes + tests only (the inner dev loop)
#   close = full matrix PLUS the sf0.1 per-query bench (the committed
#           bench_queries.json) and an all-registry coverage check —
#           the ATOMIC round close (r7 verdict item 4): one invocation
#           whose exit 0 certifies green suite + green gate + full-
#           registry bench + synced docs, so the snapshot commit either
#           contains all of them or doesn't happen.
#
# NOTE: never run sbt compile while a background Verify/Bench JVM is
# running — it clobbers classfiles mid-run.
set -euo pipefail
cd "$(dirname "$0")/.."

CP="$(find /opt/spark/jars -name '*.jar' | tr '\n' ':')target/scala-2.13/classes"
JAVA_FLAGS=(--add-exports java.base/sun.nio.ch=ALL-UNNAMED)
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}"
run_verify() { # sfdir outdir  (honors SPARK_GRAFT_ANSI etc. from env)
  # tee to a log instead of a bare pipe: a Verify JVM that dies printing
  # no [verify] line (OOM, launch failure) must fail the gate directly,
  # not surface downstream as per-query "no spark output".
  local log=/tmp/gates_verify.log
  if ! java -Xmx20g -cp "$CP" "${JAVA_FLAGS[@]}" graft.Verify "$1" "$2" >"$log" 2>&1; then
    tail -5 "$log"; echo "VERIFY JVM EXITED NONZERO for $1"; exit 1
  fi
  if grep '\[verify\]' "$log"; then echo "VERIFY FAILURES in $1"; exit 1; fi
}

echo "== compile"
sbt -batch compile | tail -1

if [ "${1:-full}" = "close" ]; then
  # A close MUST be round-numbered (r10 verdict item 2): round 10 closed
  # green but un-numbered, so the BENCH_QUERIES_r10 freeze never fired
  # and the green close lived only in bench_history + the gitignored
  # live file. Fail at the top, not after 45 minutes of gates.
  if [ -z "${GRAFT_ROUND:-}" ]; then
    echo "gates.sh close requires GRAFT_ROUND=<N> (the BENCH_QUERIES_rNN freeze is part of the close)" >&2
    exit 1
  fi
  # Closing bench FIRST (r8 verdict item 1): rounds 6-8 each closed red
  # purely from end-of-round machine contention — the bench used to run
  # 50 minutes in, after the test suite and three Verify sweeps had
  # heated the box. On a cold machine straight after compile, the floors
  # (all recorded on comparable idle runs) are actually comparable.
  # 32 threads, NOT the gate matrix's 16: every bench_history floor was
  # recorded at local[32], and a half-width run would trip the per-query
  # gate on timing alone.
  echo "== closing sf0.1 per-query bench (writes bench_queries.json if green)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    java -Xmx24g -cp "$CP" "${JAVA_FLAGS[@]}" graft.Bench 2>&1 | tail -3
  # Stash the close artifacts NOW and assert their SF (r9 verdict item 1:
  # the later "bench (sf0.001 line)" step also writes bench_queries.json
  # when green, so round 9's end-of-script snapshot cp froze an sf0.001
  # run under an sf0.1-implying name). The stash is what gets snapshotted.
  python3 - <<'EOF'
import json, shutil
run = json.load(open('bench_total.json'))
assert run['sf'] == '/root/testdata/sf0.1', \
    f"closing bench_total.json is {run['sf']}, expected the sf0.1 close"
assert run.get('gate') == 'green', \
    f"closing bench is {run.get('gate')} ({run.get('gate_failures')}) — triage before continuing"
snap = json.load(open('bench_queries.json'))
assert snap['sf'] == '/root/testdata/sf0.1', \
    f"bench_queries.json is {snap['sf']} — a non-sf0.1 green run overwrote the close"
shutil.copy('bench_queries.json', '/tmp/close_bench_queries.json')
shutil.copy('bench_total.json', '/tmp/close_bench_total.json')
print("[close] green sf0.1 bench stashed for the end-of-script snapshot")
EOF
fi

echo "== sf0.01 dump + both-mode compare + ordered"
run_verify /root/testdata/sf0.01 /tmp/gates_sf001
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/gates_sf001 | tail -1
python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/gates_sf001 --ordered | tail -1
# Commit the sketch queries' cross-engine band adjudication (r10 verdict
# item 7): the driver's harness reads only oracleSql and reports them
# no_oracle — this artifact carries the measured rel-diffs + pass/fail.
if [ -f /tmp/gates_sf001/band_verdicts.json ]; then
  python3 -c "import json,sys; v=json.load(open('/tmp/gates_sf001/band_verdicts.json')); sys.exit(0 if v and all(e.get('pass') for e in v.values()) else sys.stderr.write(f'band verdicts not all green: {v}\n') or 1)"
  cp /tmp/gates_sf001/band_verdicts.json BAND_VERDICTS.json
  echo "== BAND_VERDICTS.json refreshed (all green)"
fi

echo "== COVERAGE.md counts (generated from the live registry, r6 item 6)"
python3 tools/sync_coverage.py /tmp/gates_sf001

echo "== sbt test"
sbt -batch test 2>&1 | grep -E 'Tests:|\*\*\* FAILED'

if [ "${1:-full}" != "quick" ]; then
  echo "== sf0.001"
  run_verify /root/testdata/sf0.001 /tmp/gates_sf0001
  python3 tools/check_oracle.py /root/testdata/sf0.001 /tmp/gates_sf0001 | tail -1
  echo "== sf0.1"
  run_verify /root/testdata/sf0.1 /tmp/gates_sf01
  python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/gates_sf01 | tail -1
  echo "== ANSI (sf0.01)"
  SPARK_GRAFT_ANSI=true run_verify /root/testdata/sf0.01 /tmp/gates_ansi
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/gates_ansi | tail -1
  echo "== determinism (two independent sf0.01 dumps, arrow diff)"
  # Second dump from a FRESH JVM: merge-order-sensitive state (HLL/GK
  # sketch internals, uncommitted orderings) flaps across runs, not
  # within one — the r52 494<->495 flap is this gate's reason to exist.
  run_verify /root/testdata/sf0.01 /tmp/gates_sf001_b
  (cd tools && python3 diff_dumps.py /tmp/gates_sf001 /tmp/gates_sf001_b) | tail -1
  echo "== smoke"
  sbt -batch "runMain graft.Smoke" 2>&1 | grep ENTRY_ROWS
  echo "== bench (sf0.001 line)"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 SPARK_GRAFT_CPUS=8 \
    java -Xmx8g -cp "$CP" "${JAVA_FLAGS[@]}" graft.Bench 2>&1 | grep '"metric"'
  if [ "${1:-full}" = "close" ]; then
    # (the closing bench itself already ran, FIRST, straight after
    # compile — see top of file; here we only adjudicate its artifacts)
    # Restore the stashed sf0.1 close over whatever the sf0.001 bench
    # line just wrote, so the committed bench_queries.json IS the close
    # (r9 verdict item 1) and every downstream check reads the close run.
    cp /tmp/close_bench_queries.json bench_queries.json
    cp /tmp/close_bench_total.json bench_total.json
    echo "== all-registry bench coverage (committed snapshot vs live registry)"
    python3 - <<'EOF'
import json, os
# registry size = one dump dir per SparkEntry.queries entry (incl. no-oracle)
reg = sum(1 for e in os.scandir('/tmp/gates_sf001') if e.is_dir())
run = json.load(open('bench_total.json'))          # the stashed sf0.1 close
assert run['sf'] == '/root/testdata/sf0.1' and run.get('gate') == 'green', \
    f"stashed close is {run.get('gate')} at {run.get('sf')} — stash protocol broken"
snap = json.load(open('bench_queries.json'))       # the committed artifact
assert snap['sf'] == '/root/testdata/sf0.1', f"snapshot sf is {snap['sf']}"
# pool:<key> (warm-pools pre-pass, r10 item 5) and stream:<kernel>
# (streaming kernel bench, r10 item 6) lines are not registry queries —
# count them separately.
n = len([q for q in snap['queries'] if not q.startswith(('pool:', 'stream:'))])
nextra = len(snap['queries']) - n
assert n == reg, f"committed bench covers {n} queries but the registry has {reg}"
print(f"[close] committed green sf0.1 bench covers all {n} registry queries (+{nextra} pool/stream lines)")
EOF
  fi
  echo "== per-query bench regression gate (vs bench_history.jsonl minima)"
  # --selftest also plants a 3x-slowed query and requires the gate to
  # trip on it, so a vacuous gate (bad sf match, empty history) fails loud
  python3 tools/bench_gate.py bench_queries.json --selftest | tail -3
  # Round-close snapshot (r4 verdict item 7): GRAFT_ROUND=5 tools/gates.sh
  # freezes the current per-query bench file as BENCH_QUERIES_r{N}.json so
  # later rounds diff against a committed artifact instead of mining
  # bench_history.jsonl timestamps. Inside the full-mode block (r5 advice:
  # quick mode must not freeze a stale file), and gated: the regression
  # gate must be green ON THE EXACT FILE being frozen (r5 verdict item 2 —
  # round 5 shipped a red closing snapshot).
  if [ -n "${GRAFT_ROUND:-}" ] && [ -f bench_queries.json ]; then
    # The snapshot must be the sf0.1 close, never whatever green run
    # last touched bench_queries.json (r9 verdict item 1).
    python3 -c "import json,sys; sf=json.load(open('bench_queries.json'))['sf']; sys.exit(0 if sf=='/root/testdata/sf0.1' else sys.stderr.write(f'refusing to snapshot a {sf} run as BENCH_QUERIES_rNN\n') or 1)"
    python3 tools/bench_gate.py bench_queries.json | tail -1
    cp bench_queries.json "BENCH_QUERIES_r$(printf '%02d' "$GRAFT_ROUND").json"
    # Assert the file we claim to have written (r10 verdict item 2: the
    # freeze must prove itself, not just echo).
    python3 -c "
import json, sys
snap = json.load(open('BENCH_QUERIES_r$(printf '%02d' "$GRAFT_ROUND").json'))
assert snap['sf'] == '/root/testdata/sf0.1', f\"frozen snapshot sf is {snap['sf']}\"
assert len(snap['queries']) > 0, 'frozen snapshot has no queries'
print(f\"[close] frozen BENCH_QUERIES_r$(printf '%02d' "$GRAFT_ROUND").json: {len(snap['queries'])} queries, sf0.1\")
"
    echo "== snapshotted BENCH_QUERIES_r$(printf '%02d' "$GRAFT_ROUND").json (gate green)"
  fi
fi
echo "== ALL GATES GREEN"
