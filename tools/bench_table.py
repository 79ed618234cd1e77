"""Render a tools/tpu_session.sh results file as a markdown table.

Usage:  python tools/bench_table.py [BENCH_SESSION.jsonl]

Each input line is ``{"config": <label>, "result": <bench JSON or null>}``
(see tools/tpu_session.sh). Output: one markdown table row per config with
throughput, utilization, and roofline columns — the format NOTES_r2.md and
README.md quote hardware measurements in.
"""

import json
import sys


def fmt_rate(v):
    if v is None:
        return "—"
    if v >= 1e6:
        return f"{v / 1e6:.1f}M"
    if v >= 1e3:
        return f"{v / 1e3:.1f}k"
    return f"{v:.0f}"


def main(path="BENCH_SESSION.jsonl"):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))

    # Append-mode re-runs (BENCH_FILTER, tpu_session.sh) add fresh rows for
    # configs already in the file: keep the LAST row per config, in first-
    # seen order, so a re-measured FAILED row renders once with its newest
    # result. A __truncated__ marker means "rows below are MISSING" — it
    # only stays meaningful as the LAST line of the file; once an
    # append-mode re-run adds rows after it, the marker is stale (its
    # claim no longer matches table order) and is dropped.
    latest = {}
    order = []
    for i, row in enumerate(rows):
        key = row.get("config")
        if key == "__truncated__":
            if i == len(rows) - 1:
                order.append(row)
            continue
        if key not in latest:
            order.append(key)
        latest[key] = row
    rows = [r if isinstance(r, dict) else latest[r] for r in order]

    print(
        "| config | env-steps/s | vs baseline | achieved | roofline_frac "
        "| bound | error |"
    )
    print("|---|---|---|---|---|---|---|")
    for row in rows:
        # '|' in a label/error string would split the markdown row into
        # extra cells; escape it (latent only — current labels are safe).
        config = str(row["config"]).replace("|", "\\|")
        r = row.get("result")
        if not r:
            err = str(row.get("error", "?")).replace("|", "\\|")
            print(f"| {config} | FAILED ({err}) | | | | | |")
            continue
        # Achieved column: FLOP/s when compute-bound, HBM GB/s when
        # memory-bound (matches how NOTES_r2 quotes utilization).
        bound = r.get("bound", "—")
        if bound == "compute" and "flops_per_sec" in r:
            achieved = f"{r['flops_per_sec'] / 1e12:.2f} TFLOP/s"
        elif "hbm_gbps" in r:
            achieved = f"{r['hbm_gbps']:.0f} GB/s IO"
        else:
            achieved = "—"
        frac = r.get("roofline_frac")
        extra = ""
        if "accepted_steps" in r:
            extra = (
                f" (acc {r['accepted_steps']},"
                f" rej {r.get('rejected_steps', '?')})"
            )
        # Accuracy column: every row that measured a drift/deviation shows
        # it inline (VERDICT r3 item 5 — publishing throughput with the
        # accuracy in a separate doc invites picking the fastest row and
        # silently losing trajectory fidelity; the bf16-carry rows measure
        # carry_drift_rel ~0.29 on the bench horizon).
        if "carry_drift_rel" in r:
            acc = f"carry drift {r['carry_drift_rel']:.2g}"
        elif "vs_stepper_rel" in r:
            acc = f"vs stepper {r['vs_stepper_rel']:.2g}"
        elif "force_parity_rel" in r:
            acc = f"vs dense {r['force_parity_rel']:.2g}"
        else:
            acc = "—"
        print(
            f"| {config}{extra} | {fmt_rate(r.get('value'))} | "
            f"{fmt_rate(r.get('vs_baseline'))}x | {achieved} | "
            f"{frac if frac is not None else '—'} | {bound} | {acc} |"
        )


if __name__ == "__main__":
    main(*sys.argv[1:2])
