#!/usr/bin/env bash
# Round-4 hardware evidence chain, one TPU process at a time (CLAUDE.md):
#
#   1. tools/tpu_session.sh      — hw_validate gate + full qualification
#                                  matrix (incl. consistent-vK nonlinear,
#                                  modal_power K ladder, forced-ROM rows)
#                                  -> BENCH_SESSION.jsonl
#   2. tools/power_decomp.py     — composed-propagator cost decomposition
#                                  (VERDICT r3 #6) -> POWER_DECOMP.jsonl
#   3. tools/work_precision.py   — error-vs-throughput ladder
#                                  (VERDICT r3 #4) -> work_precision.json
#
# Run:  bash tools/r4_hw_session.sh 2>&1 | tee /tmp/r4_session.log
set -u
cd "$(dirname "$0")/.."

echo "=== phase 1: qualification matrix ($(date -u +%H:%M:%S)) ==="
bash tools/tpu_session.sh BENCH_SESSION.jsonl
rc=$?
if [ $rc -ne 0 ]; then
    echo "=== matrix phase FAILED (rc=$rc) — stopping before decomp ==="
    exit $rc
fi

echo "=== phase 2: power_decomp ($(date -u +%H:%M:%S)) ==="
timeout -k 30 3600 python tools/power_decomp.py >POWER_DECOMP.jsonl \
    2>/tmp/power_decomp.stderr
echo "power_decomp rc=$?"

echo "=== phase 3: work_precision ($(date -u +%H:%M:%S)) ==="
timeout -k 30 5400 python tools/work_precision.py run --out work_precision.json \
    2>/tmp/work_precision.stderr
echo "work_precision rc=$?"

echo "=== done ($(date -u +%H:%M:%S)) ==="
