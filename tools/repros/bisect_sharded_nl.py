"""TPU-vs-CPU step bisection for the `nonlinear sharded-SPIKE sp=1` row.

Round-4 standing evidence (NOTES_r4.md §Session 4 final datum): the exact
bench program (1000 el, consistent-vK, f32, modified Newton n=2, sp=1) is
bounded at physical scale on CPU over the full 4000-step horizon; the dense
TPU engine is clean on the same recurrence; the sharded TPU program goes
non-finite regardless of precision pinning or call length (chunked 15 s
calls with forced host sync fail identically). Remaining suspect: an
axon/XLA:TPU compilation defect in this shard_map+SPIKE nonlinear program.

This tool localizes it by running the IDENTICAL program (same host-built
f32 inputs, seed 0) on two backends and comparing the carry after a
configurable number of substeps and Newton iterations:

    # phase 1 (CPU reference, writes golden):
    python tools/repros/bisect_sharded_nl.py --backend cpu --substeps 1 \
        --save /tmp/nl_s1.npz
    # phase 2 (hardware, compares):
    python tools/repros/bisect_sharded_nl.py --backend axon --substeps 1 \
        --compare /tmp/nl_s1.npz

Dials for fragment isolation:
    --n-newton 0|1|2   0 = predictor + consistent-acceleration mass solve
                       only (tests internal(q) at x0 + SPIKE mass solve);
                       1 adds one Jacobian SPIKE correction; 2 = bench.
    --substeps N       recurrence depth inside one scan.
    --envs N           vmap width (bench = 4096; failure may be
                       batch-layout dependent).
    --elements N       mesh scale (bench = 1000).
    --parity-element   drop --consistent (round-3 failing workload).

A large step-1 divergence (>> 1e-5 rel) pinpoints the miscompiled
fragment; step-1 agreement with later-onset NaN points at state-dependent
corruption instead. One process at a time on the TPU (CLAUDE.md).
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
TIP_FORCE = 0.1


def build_model(n: int, beam_type: str = "nonlinear"):
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
            "type": [beam_type] * n,
            "boundary_condition": ["FIXED"] + ["NONE"] * (n - 1),
        }
    )
    return DynamicEulerBernoulliBeam(df)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", required=True, help="cpu | axon")
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--elements", type=int, default=1000)
    ap.add_argument("--substeps", type=int, default=1)
    ap.add_argument("--frames", type=int, default=1)
    ap.add_argument("--n-newton", type=int, default=2)
    ap.add_argument("--sp", type=int, default=1)
    ap.add_argument("--parity-element", action="store_true")
    ap.add_argument("--beam", default="nonlinear",
                    choices=["nonlinear", "linear"],
                    help="beam type (linear = the bench linear sharded "
                    "row: rho_inf=0.8, n_newton=1 unless overridden)")
    ap.add_argument("--local-solver", default="thomas",
                    choices=["thomas", "cr", "dense"],
                    help="within-shard solve lowering (spike_prepare); "
                    "'dense'/'cr' dodge the all-scan fusion-miscompile "
                    "shape (docs/design.md pitfall 4)")
    ap.add_argument("--save", default=None, help="write carry to .npz")
    ap.add_argument("--compare", default=None, help="compare vs .npz")
    args = ap.parse_args()

    import jax

    # CLAUDE.md: JAX_PLATFORMS env is ignored by the axon plugin; the
    # config call is the one that works.
    jax.config.update("jax_platforms", args.backend)
    from continuum_robot_tpu.utils import enable_persistent_cache
    enable_persistent_cache()  # sharded compiles take minutes; replay from disk
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from continuum_robot_tpu.parallel import make_spatial_beam
    from continuum_robot_tpu.parallel.facade import _node_force
    from continuum_robot_tpu.parallel.spatial_implicit import (
        build_spatial_genalpha,
    )

    backend = jax.default_backend()
    print(
        f"# backend={backend} envs={args.envs} elements={args.elements} "
        f"frames={args.frames} substeps={args.substeps} "
        f"n_newton={args.n_newton} consistent={not args.parity_element} "
        f"local_solver={args.local_solver} beam={args.beam}",
        flush=True,
    )

    model = build_model(args.elements, args.beam)
    rho_inf = RHO_INF if args.beam == "nonlinear" else 0.8
    n_red = model.n_pos_states
    mesh = Mesh(np.array(jax.devices()[: args.sp]), ("sp",))
    beam = make_spatial_beam(
        model.beam_model.arrays,
        model.beam_model.bc_info.free_mask.reshape(-1, 3),
        mesh,
        axis="sp",
    )
    Np = beam.n_nodes
    roll = build_spatial_genalpha(
        beam,
        DT,
        rho_inf=rho_inf,
        n_newton=args.n_newton,
        use_consistent=not args.parity_element,
        local_solver=args.local_solver,
    )

    # Bench row initial state: tiny white noise on free DOFs, seed 0.
    bc = model.beam_model.bc_info
    free = np.asarray(bc.free_dofs)
    n_full = bc.n_dofs_full
    nn = n_full // 3
    rng = np.random.default_rng(0)
    qf = np.zeros((args.envs, n_full), np.float32)
    qf[:, free] = rng.normal(scale=1e-6, size=(args.envs, n_red))
    x0 = np.zeros((args.envs, 2, Np, 3), np.float32)
    x0[:, 0, :nn, :] = qf.reshape(args.envs, nn, 3)
    u_red = np.zeros(n_red, np.float32)
    u_red[-2] = TIP_FORCE
    u_node = _node_force(model, u_red, Np, jnp.float32)

    t0 = time.time()
    ts, xs, carry = roll(
        jnp.asarray(x0), args.frames, u=u_node, substeps=args.substeps,
        return_carry=True,
    )
    carry_h = np.asarray(carry)  # (envs, 3, Np, 3)
    xs_h = np.asarray(xs)
    print(f"# ran in {time.time() - t0:.1f}s", flush=True)

    finite = np.isfinite(carry_h).all()
    print(
        f"finite={finite} max|q|={np.abs(carry_h[:, 0]).max():.6e} "
        f"max|v|={np.abs(carry_h[:, 1]).max():.6e} "
        f"max|a|={np.abs(carry_h[:, 2]).max():.6e}",
        flush=True,
    )

    if args.save:
        np.savez(args.save, carry=carry_h, xs=xs_h)
        print(f"# saved -> {args.save}", flush=True)
    if args.compare:
        ref = np.load(args.compare)
        rc = ref["carry"]
        if rc.shape != carry_h.shape:
            print(f"SHAPE MISMATCH ref={rc.shape} here={carry_h.shape}")
            sys.exit(2)
        for i, name in enumerate(["q", "v", "a"]):
            a, b = carry_h[:, i], rc[:, i]
            denom = max(np.abs(b).max(), 1e-30)
            rel = np.abs(a - b).max() / denom
            print(f"plane {name}: rel-max dev {rel:.3e} "
                  f"(|ref|max {np.abs(b).max():.3e})", flush=True)
        ok = finite and np.isfinite(rc).all()
        rel_all = np.abs(carry_h - rc).max() / max(np.abs(rc).max(), 1e-30)
        verdict = "AGREE" if (ok and rel_all < 1e-4) else "DIVERGE"
        print(f"VERDICT: {verdict} (overall rel {rel_all:.3e})", flush=True)
        sys.exit(0 if verdict == "AGREE" else 1)


if __name__ == "__main__":
    main()
