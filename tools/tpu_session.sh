#!/usr/bin/env bash
# One-command TPU qualification + benchmark matrix.
#
# Run after bringing up (or recovering) the TPU worker:
#
#     bash tools/tpu_session.sh [results.jsonl]
#
# Order matters: hw_validate first (correctness gate — a wedged/miscompiling
# backend fails fast before any number is recorded), then the benchmark
# matrix, one process at a time (concurrent TPU access can crash the axon
# remote worker, CLAUDE.md). Each bench line is appended as JSON to the
# results file with its configuration alongside.
#
# BENCH_FILTER=<regex> runs only the matching rows and APPENDS to the
# results file instead of truncating it — for completing a matrix after a
# worker crash (re-measure the FAILED/missing rows) without re-running the
# clean ones. Dedup afterward: keep the LAST row per config
# (tools/bench_table.py does).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-BENCH_SESSION.jsonl}"
FILTER="${BENCH_FILTER:-}"

# Truncation trap: a run that dies mid-matrix (worker wedge, OOM-kill,
# SIGTERM) must leave an explicit marker row — a silently-short file reads
# as a complete matrix (round-2 lesson: the session stopped at row 6 of 14
# with nothing in the file saying so).
SESSION_COMPLETE=0
on_exit() {
    if [ "$SESSION_COMPLETE" -ne 1 ] && [ -f "$OUT" ]; then
        printf '{"config": "__truncated__", "result": null, "error": "session did not run to completion — rows below the planned matrix are MISSING, not skipped"}\n' >>"$OUT"
    fi
}
trap on_exit EXIT

run_bench() { # label, env assignments...
    local label="$1"; shift
    if [ -n "$FILTER" ] && ! printf '%s' "$label" | grep -Eq "$FILTER"; then
        return 0
    fi
    echo "== $label" >&2
    # No pipe: capture everything so the exit status tested is python's,
    # then keep the last line (the JSON). Validate it's non-empty AND
    # parses as JSON before recording a success — a timeout kill, an
    # assertion, or an OOM must land in the error branch, never as a
    # malformed "success" row.
    local out rc line
    out=$(env "$@" timeout "${BENCH_ROW_TIMEOUT:-1800}" python bench.py 2>>"$OUT.stderr")
    rc=$?
    line=${out##*$'\n'}
    if [ $rc -eq 0 ] && [ -n "$line" ] && \
       printf '%s' "$line" | python -c 'import json,sys; json.load(sys.stdin)' \
           2>/dev/null; then
        printf '{"config": "%s", "result": %s}\n' "$label" "$line" >>"$OUT"
    else
        printf '{"config": "%s", "result": null, "error": "bench failed (rc=%s)"}\n' \
            "$label" "$rc" >>"$OUT"
    fi
}

echo "== hw_validate (correctness gate)" >&2
if ! timeout 1800 python tools/hw_validate.py; then
    echo "hw_validate FAILED — not benchmarking a broken backend" >&2
    exit 1
fi

if [ -z "$FILTER" ]; then
    : >"$OUT"
    : >"$OUT.stderr"
fi

# Headline engines (the round driver runs BENCH_ENGINE=modal_power K=64,
# the package default; modal_pallas is the per-step stepper headline).
run_bench "linear modal_pallas" BENCH_ENGINE=modal_pallas
run_bench "linear modal XLA" BENCH_ENGINE=modal
# Scan-unroll sweep on the memory-bound XLA engines.
for K in 2 4 8 16; do
    run_bench "linear modal XLA unroll=$K" BENCH_ENGINE=modal BENCH_UNROLL=$K
done
# Composed-propagator drive: the same discrete trajectory as the modal
# stepper, K steps per precomputed affine map (vs_stepper_rel in the row
# quantifies the whole-span composition drift on this horizon).
for K in 16 64 256; do
    tag=""
    [ "$K" = 64 ] && tag=" (default)"
    run_bench "linear modal_power K=$K$tag" BENCH_ENGINE=modal_power BENCH_K=$K
done
run_bench "nonlinear modal_rom m=256" BENCH_TYPE=nonlinear BENCH_ENGINE=modal_rom
run_bench "nonlinear modal_rom_pallas m=256" \
    BENCH_TYPE=nonlinear BENCH_ENGINE=modal_rom_pallas
run_bench "nonlinear ECSW tau=1e-3" \
    BENCH_TYPE=nonlinear BENCH_ENGINE=modal_rom BENCH_ECSW_TAU=1e-3
for K in 4 8 16; do
    run_bench "nonlinear ECSW tau=1e-3 unroll=$K" \
        BENCH_TYPE=nonlinear BENCH_ENGINE=modal_rom BENCH_ECSW_TAU=1e-3 \
        BENCH_UNROLL=$K
done
# The reference's flagship force-coupled workload (fluid drag + gravity)
# on the throughput tier: exact reduced corrections (ext_modal) on the XLA
# split path (VERDICT r3 item 4 — previously forced beams ran only on the
# ~135x-slower dense tier).
run_bench "nonlinear modal_rom m=256 fluid+gravity" \
    BENCH_TYPE=nonlinear BENCH_ENGINE=modal_rom BENCH_FORCES=1
run_bench "nonlinear ECSW tau=1e-3 unroll=8 fluid+gravity" \
    BENCH_TYPE=nonlinear BENCH_ENGINE=modal_rom BENCH_ECSW_TAU=1e-3 \
    BENCH_UNROLL=8 BENCH_FORCES=1
# bf16 scan carry on the HBM-bound ECSW engine (compute stays f32): halves
# the compulsory carry traffic; the row's carry_drift_rel field quantifies
# the accuracy cost on the same horizon (VERDICT r2 item 5).
for K in 8 16; do
    run_bench "nonlinear ECSW tau=1e-3 unroll=$K carry=bf16" \
        BENCH_TYPE=nonlinear BENCH_ENGINE=modal_rom BENCH_ECSW_TAU=1e-3 \
        BENCH_UNROLL=$K BENCH_CARRY=bf16
done
# Dense-operator paths (the non-modal tier the README table quotes).
run_bench "linear dense" BENCH_ENGINE=dense
run_bench "nonlinear dense modified-Newton" BENCH_TYPE=nonlinear BENCH_ENGINE=dense
# Multi-chip machinery cost at sp=1 (vs the dense rows above — VERDICT r2
# item 6b): shard_map + SPIKE + halo/interface collectives on one chip.
run_bench "linear sharded-SPIKE sp=1" BENCH_ENGINE=sharded_genalpha
# Scan (Thomas) lowering on the LINEAR sharded program only: value-checked
# on hardware at substep granularity (round-5 bisect phase 1, AGREE
# 1.6e-06) and ~2x the dense lowering's throughput at sp=1; the nonlinear
# program's scan lowering is MISCOMPILED at this batch (never benched).
run_bench "linear sharded-SPIKE sp=1 local=thomas" \
    BENCH_ENGINE=sharded_genalpha BENCH_LOCAL_SOLVER=thomas
run_bench "nonlinear sharded-SPIKE sp=1" \
    BENCH_TYPE=nonlinear BENCH_ENGINE=sharded_genalpha
# Error-controlled (BENCH_TOL) mode: the no-manual-dt capability.
run_bench "linear adaptive rtol=1e-6" BENCH_TOL=1e-6
run_bench "nonlinear adaptive rtol=1e-6" BENCH_TYPE=nonlinear BENCH_TOL=1e-6

SESSION_COMPLETE=1
echo "results in $OUT" >&2
cat "$OUT"
