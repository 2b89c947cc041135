#!/bin/bash
# Round-close validation: everything the driver will grade, in one command.
#   bash tools/round_check.sh
# Exits non-zero on the first failure.
set -e
cd "$(dirname "$0")/.."

echo "== 1/4 full pytest suite =="
python -m pytest tests/ -q

echo "== 2/4 oracle mirror at sf0.01 (the driver's correctness gate) =="
SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01 python -m pytest tests/test_oracle.py -q

echo "== 3/4 driver-hash dtype audit =="
python tools/audit_oracle_dtypes.py /root/testdata/sf0.001 2>/dev/null | tail -3

echo "== 3.5/4 physical-plan anti-pattern sweep =="
timeout 600 python tools/plan_audit.py 2>/dev/null | head -5

echo "== 4/4 bench (sf0.1, one JSON line) + 2x-per-query regression guard =="
BENCH_OUT=$(mktemp)
timeout 900 python3 bench.py 2>/dev/null | tail -1 | tee "$BENCH_OUT"
# One retry on guard failure: sub-second queries can catch a 1-2s
# scheduler/GC stall on a shared machine (observed: different queries
# flagged on consecutive runs); a REAL regression fails both runs.
python tools/bench_guard.py "$BENCH_OUT" || {
    echo "guard failed - one retry to rule out a transient stall"
    timeout 900 python3 bench.py 2>/dev/null | tail -1 | tee "$BENCH_OUT"
    python tools/bench_guard.py "$BENCH_OUT"
}
rm -f "$BENCH_OUT"
