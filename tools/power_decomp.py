"""Cost decomposition of the composed-propagator modal engine (VERDICT r3 #6).

The `modal_power K=16` bench row reports ~9.3% of the VPU ceiling with an
analytic cost model — the repo's fastest engine with no measured account of
where the other 90% goes. This sweeps, on hardware:

  * step-count ladder at fixed K      -> fixed vs marginal cost split
    (fixed = host map composition + dispatch + VMEM fill; marginal = one
    composed-map application),
  * K ladder at fixed steps           -> arithmetic-vs-latency scaling
    (apps = steps/K, so wall should drop ~K-fold if application-bound),
  * kernel dials (unroll, mode_tile)  -> layout/lane-utilization effects,
  * XLA tier (use_pallas=False)       -> kernel vs compiler baseline.

Each config prints one JSON line; redirect to POWER_DECOMP.jsonl and write
the conclusion into docs/design.md §Utilization.

ONE PROCESS AT A TIME on the TPU (CLAUDE.md). Timing forces a scalar to
the host (never block_until_ready on axon).

Run:  python tools/power_decomp.py [--quick]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ELEMENTS = int(os.environ.get("BENCH_ELEMENTS", 1000))
N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
DT = 1e-4


def build_model():
    import pandas as pd

    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam

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
    return DynamicEulerBernoulliBeam(df)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="fewer configs (smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "float32")
    from continuum_robot_tpu.utils import enable_persistent_cache
    enable_persistent_cache()  # sharded compiles take minutes; replay from disk

    from continuum_robot_tpu.models.simulate import make_modal_genalpha

    model = build_model()
    n_red = model.n_pos_states
    ms = make_modal_genalpha(model, DT, rho_inf=0.8)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(scale=1e-6, size=(N_ENVS, n_red)),
                    jnp.float32)
    v = jnp.zeros((N_ENVS, n_red), jnp.float32)
    u = np.zeros(n_red, np.float32)
    u[-2] = 0.1
    eta0, etad0 = jax.jit(ms.to_modal)(q, v)
    u_m = jnp.asarray(ms.project_force_host(u), jnp.float32)
    interp = jax.default_backend() == "cpu"

    def measure(label, n_steps, K, unroll=8, mode_tile=16,
                use_pallas=True):
        def roll(e, ed):
            return ms.rollout_power(
                e, ed, u_m, n_steps, K=K, unroll=unroll,
                mode_tile=mode_tile, interpret=interp,
                use_pallas=use_pallas,
            )

        e1, ed1, _ = roll(eta0, etad0)
        float(jnp.sum(e1))  # warm (compile + first run)
        walls = []
        for _ in range(3):
            t0 = time.time()
            e2, ed2, _ = roll(e1, ed1)
            float(jnp.sum(e2))
            walls.append(time.time() - t0)
        wall = min(walls)
        n_apps = n_steps // K + (1 if n_steps % K else 0)
        rec = {
            "label": label,
            "n_steps": n_steps,
            "K": K,
            "unroll": unroll,
            "mode_tile": mode_tile,
            "pallas": use_pallas,
            "wall_s": round(wall, 6),
            "n_apps": n_apps,
            "us_per_app": round(1e6 * wall / n_apps, 3),
            "env_steps_per_sec": round(n_steps * N_ENVS / wall, 1),
        }
        print(json.dumps(rec), flush=True)
        return rec

    # 1) step-count ladder at K=16: wall = fixed + n_apps * marginal.
    steps_ladder = [500, 2000, 8000] if not args.quick else [500, 2000]
    rows = [measure("steps-ladder", s, 16) for s in steps_ladder]
    # Linear fit through the ladder: marginal per app + fixed per call.
    xs = np.array([r["n_apps"] for r in rows], float)
    ys = np.array([r["wall_s"] for r in rows], float)
    A_ = np.vstack([xs, np.ones_like(xs)]).T
    (marg, fixed), *_ = np.linalg.lstsq(A_, ys, rcond=None)
    print(json.dumps({
        "label": "fixed-vs-marginal@K=16",
        "marginal_us_per_app": round(1e6 * marg, 3),
        "fixed_ms_per_call": round(1e3 * fixed, 3),
        "fixed_frac_at_2000_steps": round(
            fixed / (fixed + marg * (2000 // 16)), 4),
    }), flush=True)

    # 2) K ladder at 2000 steps (matrix rows measure 16/64/256 too; this
    #    isolates the scaling with identical drive code).
    for K in ([16, 64, 256] if not args.quick else [16, 64]):
        measure("K-ladder", 2000, K)

    # 3) kernel dials at K=16.
    if not args.quick:
        for unroll in (1, 4, 16):
            measure("unroll-dial", 2000, 16, unroll=unroll)
        for mt in (8, 32, 64):
            measure("mode-tile-dial", 2000, 16, mode_tile=mt)

    # 4) XLA tier baseline.
    measure("xla-tier", 2000, 16, use_pallas=False)


if __name__ == "__main__":
    main()
