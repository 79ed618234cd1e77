"""Cost decomposition of the headline fused-Pallas modal kernel.

VERDICT r2 weakness #2: the kernel claims compute-bound at ~0.33 of the
measured VPU ceiling, with no recorded explanation for the other 67%.
This tool measures the three candidate limiters directly on hardware:

1. **Block-size sweep** — the (mode_tile, tile) grid cell sets whether the
   fori_loop carry (q, v, a blocks) fits in vector registers. At the
   default (256, 512) each block is 512 KB — far beyond the ~256 KB
   register file — so every step round-trips the carry through VMEM:
   ~24 B of VMEM traffic per 16 flops. The VPU-ceiling probe
   (`utils/roofline.measure_vpu_ceiling`) runs 256 FMAs per memory touch;
   if the kernel is VMEM-bandwidth-bound rather than VPU-bound, small
   blocks (carry register-resident across steps) should be markedly
   faster and large blocks should plateau at the same ~1.9 TFLOP/s.

2. **Fixed-vs-marginal split** — a step-count sweep at the best block
   size separates per-call overhead (launch, pad/transpose, HBM in/out)
   from the per-step marginal cost the "env-steps/s" headline implies.

3. **Speed-of-light probe** — the same grid/BlockSpec layout running the
   same op count per element-step but with NO cross-step dependence and
   no broadcast columns (8 independent FMAs on register values): the
   achievable ceiling for this loop structure, as opposed to the
   whole-chip VPU number.

Usage:  python tools/modal_kernel_sweep.py [--quick] [--out sweep.json]
(TPU; one process at a time — CLAUDE.md.)
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ELEMENTS = 1000
N_ENVS = 4096
N_STEPS = 2000
DT = 1e-4
RHO_INF = 0.8


def build_modal():
    import pandas as pd

    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
    from continuum_robot_tpu.models.simulate import make_modal_genalpha

    L_el, E, r, rho = 0.25 / 6, 75e9, 0.005, 6450.0
    I = np.pi * r**4 / 4
    A = np.pi * r**2
    n = N_ELEMENTS
    df = pd.DataFrame(
        {
            "length": [L_el] * n,
            "elastic_modulus": [E] * n,
            "moment_inertia": [I] * n,
            "density": [rho] * n,
            "cross_area": [A] * n,
            "type": ["linear"] * n,
            "boundary_condition": ["FIXED"] + ["NONE"] * (n - 1),
        }
    )
    model = DynamicEulerBernoulliBeam(df)
    return make_modal_genalpha(model, DT, rho_inf=RHO_INF), model.n_pos_states


def time_call(fn, *args):
    """Wall time of fn(*args) with host-scalar completion forcing."""
    import jax.numpy as jnp

    out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(first))
    t0 = time.time()
    out = fn(*args)
    first = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(first))
    return time.time() - t0


def sol_probe(mode_tile, tile, m, B, steps):
    """Speed-of-light twin: same grid/layout, 8 independent FMAs/elem/step.

    No cross-step dependence (the three carries update independently from
    themselves only), no broadcast columns (scalar Python constants bake
    into the instruction stream): what the loop structure can reach if
    operand streaming and broadcasts were free.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m_p = -(-m // mode_tile) * mode_tile
    Bp = -(-B // tile) * tile

    def kernel(q_ref, v_ref, a_ref, qo_ref, vo_ref, ao_ref):
        def step(_, qva):
            q, v, a = qva
            # 8 FMAs, dependence only within this step's own value.
            q = q * 1.000001 + 1e-7
            v = v * 1.000001 + 1e-7
            a = a * 1.000001 + 1e-7
            q = q * 0.999999 + 1e-7
            v = v * 0.999999 + 1e-7
            a = a * 0.999999 + 1e-7
            q = q * 1.0000001 + 1e-7
            v = v * 1.0000001 + 1e-7
            return (q, v, a)

        q, v, a = jax.lax.fori_loop(
            0, steps, step, (q_ref[:, :], v_ref[:, :], a_ref[:, :])
        )
        qo_ref[:, :] = q
        vo_ref[:, :] = v
        ao_ref[:, :] = a

    spec = pl.BlockSpec(
        (mode_tile, tile), lambda i, b: (i, b), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((m_p, Bp), jnp.float32)

    @jax.jit
    def run(q, v, a):
        return pl.pallas_call(
            kernel,
            out_shape=(out_shape, out_shape, out_shape),
            grid=(m_p // mode_tile, Bp // tile),
            in_specs=(spec, spec, spec),
            out_specs=(spec, spec, spec),
        )(q, v, a)

    q = jnp.full((m_p, Bp), 0.5, jnp.float32)
    wall = time_call(run, q, q, q)
    return wall


def main():
    quick = "--quick" in sys.argv
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "float32")
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    ms, n_red = build_modal()
    m = n_red
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(scale=1e-6, size=(N_ENVS, m)), jnp.float32)
    v = jnp.zeros((N_ENVS, m), jnp.float32)
    u = jnp.zeros(m, jnp.float32).at[-2].set(0.1)

    eta, etad = jax.jit(ms.to_modal)(q, v)
    u_m = ms.project_force(u)
    eta.block_until_ready()

    records = []

    def rec(kind, **kw):
        r = {"kind": kind, **kw}
        records.append(r)
        print(json.dumps(r), flush=True)

    flops_per_envstep = 16.0 * m  # 8 FMAs x 2 per mode per env-step
    unroll_only = "--unroll-only" in sys.argv

    # --- 1. block-size sweep at the benchmark step count -----------------
    combos = [] if unroll_only else [
        (256, 512),  # current default
        (8, 128), (8, 256), (8, 512), (8, 1024),
        (16, 256), (16, 512), (16, 1024),
        (32, 256), (32, 512),
        (64, 256), (64, 512),
        (128, 512),
    ]
    if quick:
        combos = [(256, 512), (8, 256), (16, 512), (64, 256)]
    for mt, tl in combos:
        try:
            wall = time_call(
                lambda e, ed: ms.rollout_pallas(
                    e, ed, u_m, N_STEPS, tile=tl, mode_tile=mt
                ),
                eta, etad,
            )
        except Exception as e:  # OOM on VMEM etc. — record, keep sweeping
            rec("block_sweep", mode_tile=mt, tile=tl, error=str(e)[:200])
            continue
        rate = N_STEPS * N_ENVS / wall
        rec(
            "block_sweep", mode_tile=mt, tile=tl, steps=N_STEPS,
            env_steps_per_sec=round(rate, 1),
            tflops=round(rate * flops_per_envstep / 1e12, 3),
            wall_s=round(wall, 4),
        )

    if unroll_only:
        mt, tl = 16, 1024  # phase-1 winner (2026-08-19 sweep)
    else:
        best = max(
            (r for r in records
             if r["kind"] == "block_sweep" and "error" not in r),
            key=lambda r: r["env_steps_per_sec"],
        )
        mt, tl = best["mode_tile"], best["tile"]

    # --- 2. fixed-vs-marginal at the best block ---------------------------
    for steps in ([] if unroll_only else [500, 2000, 8000] if quick
                  else [250, 500, 1000, 2000, 4000, 8000, 16000]):
        wall = time_call(
            lambda e, ed: ms.rollout_pallas(
                e, ed, u_m, steps, tile=tl, mode_tile=mt
            ),
            eta, etad,
        )
        rec(
            "step_sweep", mode_tile=mt, tile=tl, steps=steps,
            env_steps_per_sec=round(steps * N_ENVS / wall, 1),
            wall_s=round(wall, 4),
        )

    # Marginal rate from the two largest step counts (overhead cancels).
    ss = sorted(
        (r for r in records if r["kind"] == "step_sweep"),
        key=lambda r: r["steps"],
    )
    if len(ss) >= 2:
        s0, s1 = ss[-2], ss[-1]
        marg = (s1["steps"] - s0["steps"]) * N_ENVS / (
            s1["wall_s"] - s0["wall_s"]
        )
        fixed_ms = 1e3 * (
            s1["wall_s"] - s1["steps"] * N_ENVS / marg / 1.0
        )
        rec(
            "marginal", mode_tile=mt, tile=tl,
            env_steps_per_sec=round(marg, 1),
            tflops=round(marg * flops_per_envstep / 1e12, 3),
            fixed_overhead_ms=round(fixed_ms, 2),
        )

    # --- 2b. wide-lane blocks + in-kernel fori_loop unroll ----------------
    # Steps are sequentially dependent, so unroll buys scheduling (Mosaic
    # interleaving across step boundaries + fewer loop branches), not ILP.
    variants = [
        (16, 1024, 2), (16, 1024, 4), (16, 1024, 8),
        (8, 2048, 1), (8, 2048, 4),
        (16, 2048, 1), (16, 2048, 4),
        (8, 4096, 1), (8, 4096, 4),
        (32, 1024, 1), (32, 1024, 4),
        (256, 512, 4),
    ]
    if "--phase2" in sys.argv:  # follow-up around the phase-1 winner
        variants = [
            (16, 1024, 8), (16, 1024, 16), (16, 1024, 32),
            (8, 1024, 8), (8, 1024, 16),
            (32, 1024, 8), (16, 512, 8), (256, 512, 8),
            (16, 1024, 8),  # repeat for run-to-run stability
        ]
    if quick:
        variants = [(16, 1024, 4), (8, 2048, 4)]
    for vmt, vtl, ur in variants:
        try:
            wall = time_call(
                lambda e, ed: ms.rollout_pallas(
                    e, ed, u_m, N_STEPS, tile=vtl, mode_tile=vmt, unroll=ur
                ),
                eta, etad,
            )
        except Exception as e:
            rec("unroll_sweep", mode_tile=vmt, tile=vtl, unroll=ur,
                error=str(e)[:200])
            continue
        rate = N_STEPS * N_ENVS / wall
        rec(
            "unroll_sweep", mode_tile=vmt, tile=vtl, unroll=ur,
            steps=N_STEPS,
            env_steps_per_sec=round(rate, 1),
            tflops=round(rate * flops_per_envstep / 1e12, 3),
            wall_s=round(wall, 4),
        )

    # Parity: the best unrolled variant must stay bit-identical to the
    # default kernel (unroll is a pure loop transformation).
    cands = [r for r in records
             if r["kind"] == "unroll_sweep" and "error" not in r]
    if cands:
        bu = max(cands, key=lambda r: r["env_steps_per_sec"])
        ref_out = ms.rollout_pallas(eta, etad, u_m, 400)
        new_out = ms.rollout_pallas(
            eta, etad, u_m, 400, tile=bu["tile"],
            mode_tile=bu["mode_tile"], unroll=bu["unroll"],
        )
        dev = max(
            float(jnp.max(jnp.abs(a - b))) for a, b in zip(ref_out, new_out)
        )
        rec("unroll_parity", mode_tile=bu["mode_tile"], tile=bu["tile"],
            unroll=bu["unroll"], max_abs_dev_400_steps=dev)

    # --- 3. speed-of-light twin at default + best blocks ------------------
    for pmt, ptl in [] if unroll_only else {(256, 512), (mt, tl)}:
        wall = sol_probe(pmt, ptl, m, N_ENVS, N_STEPS)
        rate = N_STEPS * N_ENVS / wall
        rec(
            "sol_probe", mode_tile=pmt, tile=ptl, steps=N_STEPS,
            env_steps_per_sec=round(rate, 1),
            tflops=round(rate * flops_per_envstep / 1e12, 3),
            wall_s=round(wall, 4),
        )

    if out_path:
        with open(out_path, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
        print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
