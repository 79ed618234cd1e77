"""Onset scan for the `nonlinear sharded-SPIKE sp=1` hardware failure.

RESOLVED (round 4): the failure was the WORKLOAD, not the engine. The
reference-parity von Karman polynomials are non-conservative (PARITY.md
divergence 10) and under the bench's sustained 0.1 N tip load the ODE is
genuinely unstable — the reference itself (solve_ivp RK45), our dopri5 at
rtol=1e-8, the dense gen-alpha, and this sharded SPIKE engine all diverge
on the same trajectory (engine parity holds to 1e-7 all the way into the
blowup; see tools/repros/diag_nl_matrix.py, diag_nl_reference.py,
diag_f32_cpu.py, diag_f32_dense.py). Round 3's "bounded on CPU" verdict
was a false negative: the old frame-split rollout here RESET the
consistent acceleration every frame, which damps the recurrence enough to
mask the growth (exactly the carry-fidelity concern the round-3 advisor
flagged); with the exact (q, v, a) carry the CPU f64 run reproduces the
blowup. The benchmark's full-order nonlinear rows now integrate the
variationally consistent element (bench.py BENCH_CONSISTENT, stable), and
tests/test_sharding.py::TestShardedF32Parity pins boundedness of that
workload at f32.

Historical context (round-3 session 6): on the axon TPU the bench's
second 2000-step call returned non-finite states at the identical
configuration (1000 elements, f32, dt=1e-4, rho_inf=0.5, n_newton=2,
constant 0.1 tip force, 4000 total steps).

This tool remains the triage asset for any future non-finite hardware
row: it executes the exact bench workload split into FRAMES of
`substeps` steps with the exact generalized-alpha carry threaded between
them, checking finiteness on the host after every frame, so a failure is
localized to a ~frame-sized step window together with the |q|/|v| growth
history leading into it (energy blow-up looks like exponential growth
over many frames; a backend miscompile/corruption looks like a clean
history that goes non-finite in one frame).

Usage:
    python tools/repros/repro_sharded_nl.py --backend cpu            # bounded repro (B=4)
    python tools/repros/repro_sharded_nl.py --backend axon --envs 4096  # bench scale
    python tools/repros/repro_sharded_nl.py --frames 80 --substeps 50   # finer onset grid

Exit status 0 = finite whole-span, 1 = non-finite onset found.
One process at a time on the TPU (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

DT = 1e-4
RHO_INF = 0.5
N_NEWTON = 2
TIP_FORCE = 0.1


def build_model(n: int = 1000):
    import pandas as pd

    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam

    L_el, E, r, rho = 0.25 / 6, 75e9, 0.005, 6450.0
    I = np.pi * r**4 / 4
    A = np.pi * r**2
    df = pd.DataFrame(
        {
            "length": [L_el] * n,
            "elastic_modulus": [E] * n,
            "moment_inertia": [I] * n,
            "density": [rho] * n,
            "cross_area": [A] * n,
            "type": ["nonlinear"] * n,
            "boundary_condition": ["FIXED"] + ["NONE"] * (n - 1),
        }
    )
    return DynamicEulerBernoulliBeam(df)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None, help="cpu | axon (default: jax's)")
    ap.add_argument("--envs", type=int, default=None,
                    help="default: 4 on cpu, 4096 otherwise (bench scale)")
    ap.add_argument("--elements", type=int, default=1000)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--substeps", type=int, default=100)
    ap.add_argument("--sp", type=int, default=1)
    ap.add_argument("--consistent", action="store_true",
                    help="variationally consistent element (the current "
                    "bench workload, BENCH_CONSISTENT=1; default here "
                    "stays the parity element, i.e. the round-3 failing "
                    "workload)")
    args = ap.parse_args()

    import jax

    if args.backend:
        # CLAUDE.md: the JAX_PLATFORMS env var is ignored by the axon
        # plugin; the config call is the one that works.
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from continuum_robot_tpu.parallel import make_spatial_beam
    from continuum_robot_tpu.parallel.facade import _node_force
    from continuum_robot_tpu.parallel.spatial_implicit import (
        build_spatial_genalpha,
    )

    backend = jax.default_backend()
    envs = args.envs or (4 if backend == "cpu" else 4096)
    print(f"# backend={backend} envs={envs} elements={args.elements} "
          f"frames={args.frames} substeps={args.substeps} sp={args.sp} "
          f"(total {args.frames * args.substeps} steps at dt={DT:g})",
          flush=True)

    model = build_model(args.elements)
    n_red = model.n_pos_states
    mesh = Mesh(np.array(jax.devices()[: args.sp]), ("sp",))
    beam = make_spatial_beam(
        model.beam_model.arrays,
        model.beam_model.bc_info.free_mask.reshape(-1, 3),
        mesh, axis="sp",
    )
    Np = beam.n_nodes
    roll = build_spatial_genalpha(
        beam, DT, rho_inf=RHO_INF, n_newton=N_NEWTON,
        use_consistent=args.consistent,
    )

    # Exactly the bench row's initial state: tiny white noise on the free
    # DOFs (rng seed 0), constant 0.1 tip force in node layout.
    bc = model.beam_model.bc_info
    free = np.asarray(bc.free_dofs)
    n_full = bc.n_dofs_full
    nn = n_full // 3
    rng = np.random.default_rng(0)
    qf = np.zeros((envs, n_full), np.float32)
    qf[:, free] = rng.normal(scale=1e-6, size=(envs, n_red))
    x0 = np.zeros((envs, 2, Np, 3), np.float32)
    x0[:, 0, :nn, :] = qf.reshape(envs, nn, 3)
    x = jnp.asarray(x0)
    u_red = np.zeros(n_red, np.float32)
    u_red[-2] = TIP_FORCE
    u_node = _node_force(model, u_red, Np, jnp.float32)

    # One jitted frame call = `substeps` steps, carrying the FULL
    # generalized-alpha state (q, v, a) across frames via return_carry, so
    # the chunked scan is the bench recurrence bit-for-bit — no
    # consistent-acceleration reset at frame boundaries (an accel restart
    # perturbs and slightly damps the recurrence, which could shift or
    # mask the onset). The first call takes the 2-plane (q, v) state and
    # computes the initial acceleration once, exactly like the bench.
    def run(s):
        return roll(s, 1, u=u_node, substeps=args.substeps,
                    return_carry=True)[2]

    run = jax.jit(run)

    t0 = time.time()
    for f in range(args.frames):
        x = run(x)
        xh = np.asarray(x)  # host sync + finite check outside the device
        finite = np.isfinite(xh).all()
        q_max = float(np.abs(xh[:, 0]).max())
        v_max = float(np.abs(xh[:, 1]).max())
        step_hi = (f + 1) * args.substeps
        print(f"frame {f + 1:4d} (steps <= {step_hi:6d}): "
              f"finite={finite} max|q|={q_max:.3e} max|v|={v_max:.3e}",
              flush=True)
        if not finite:
            bad_env = np.where(~np.isfinite(xh).reshape(envs, -1).all(1))[0]
            bad_node = np.where(
                ~np.isfinite(xh).all(axis=(0, 1, 3))
            )[0] if xh.ndim == 4 else []
            print(f"NON-FINITE onset in frame {f + 1} "
                  f"(steps {step_hi - args.substeps + 1}..{step_hi}); "
                  f"{len(bad_env)}/{envs} envs affected "
                  f"(first: {bad_env[:8].tolist()}), "
                  f"nodes: {np.asarray(bad_node)[:8].tolist()}...",
                  flush=True)
            sys.exit(1)
    print(f"# finite over the whole {args.frames * args.substeps}-step span "
          f"({time.time() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
