"""Repro: fused batched implicit step miscompiles when all operators are scans.

On the axon TPU backend, the fully-fused batched implicit beam step computes
WRONG batched results when every linear operator in the program lowers to
block-tridiagonal ``lax.scan`` sweeps (mass matvec + Thomas factor/solve):

* batched output != the same jitted function applied per-env,
* both != the f64 CPU ground truth,
* every component (matvec, factor, solve) is individually correct to ~1e-8
  when checked in isolation,
* replacing ANY single component with a dense-matmul equivalent makes the
  whole program correct again.

CPU lowers the identical program correctly, so this is a backend fusion/
layout bug, not a numerics bug in the operators. Mitigations in this repo:
platform-aware solver defaults (``simulate.make_newmark_operator`` picks
``dense_inv`` on TPU) and a runtime batch-consistency guard
(``utils.checks.verify_batch_consistency``, run by ``tools/hw_validate.py``).

This script builds the observed configuration through the package (a
1000-element linear cantilever, generalized-alpha steps, all-btd operators),
runs K steps batched and per-env through the SAME jitted program, and prints
the max relative divergence. Exit code is always 0; prints one RESULT line.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

import jax
import jax.numpy as jnp
import numpy as np

N_ELEMENTS = int(os.environ.get("REPRO_ELEMENTS", 1000))
N_ENVS = int(os.environ.get("REPRO_ENVS", 32))
N_STEPS = int(os.environ.get("REPRO_STEPS", 50))
DT = 1e-4


def main():
    jax.config.update("jax_default_matmul_precision", "float32")
    import pandas as pd

    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
    from continuum_robot_tpu.models.simulate import make_newmark_operator
    from continuum_robot_tpu.ops.integrators import generalized_alpha_step

    print(f"backend: {jax.default_backend()}")

    L_el, E, r, rho = 0.25 / 6, 75e9, 0.005, 6450.0
    I = np.pi * r**4 / 4
    A = np.pi * r**2
    df = pd.DataFrame(
        {
            "length": [L_el] * N_ELEMENTS,
            "elastic_modulus": [E] * N_ELEMENTS,
            "moment_inertia": [I] * N_ELEMENTS,
            "density": [rho] * N_ELEMENTS,
            "cross_area": [A] * N_ELEMENTS,
            "type": ["linear"] * N_ELEMENTS,
            "boundary_condition": ["FIXED"] + ["NONE"] * (N_ELEMENTS - 1),
        }
    )
    model = DynamicEulerBernoulliBeam(df)
    n = model.n_pos_states

    RHO_INF = 0.8
    am = (2.0 * RHO_INF - 1.0) / (RHO_INF + 1.0)
    af = RHO_INF / (RHO_INF + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    # ALL-btd operators: this is the trigger condition.
    op = make_newmark_operator(
        model,
        dt=None,
        linear_solver="btd",
        extra_systems=[(1.0 - am, (1.0 - af) * beta * DT * DT)],
    )

    @jax.jit
    def run(q, v, a, u):
        def body(carry, _):
            q, v, a = carry
            q, v, a = generalized_alpha_step(
                op, 0.0, q, v, a, DT, u, rho_inf=RHO_INF, n_newton=1
            )
            return (q, v, a), None

        (q, v, a), _ = jax.lax.scan(body, (q, v, a), None, length=N_STEPS)
        return q

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.normal(scale=1e-6, size=(N_ENVS, n)), jnp.float32)
    v0 = jnp.zeros((N_ENVS, n), jnp.float32)
    u = jnp.zeros(n, jnp.float32).at[-2].set(0.1)
    a0 = op.solve(q0, 0.0)(u - op.internal_force(q0))

    q_batched = np.asarray(run(q0, v0, a0, u))
    float(jnp.sum(jnp.asarray(q_batched)))

    # The SAME jitted program, one env at a time.
    errs = []
    for i in [0, N_ENVS // 2, N_ENVS - 1]:
        qi = np.asarray(run(q0[i : i + 1], v0[i : i + 1], a0[i : i + 1], u))[0]
        denom = max(np.abs(qi).max(), 1e-30)
        errs.append(np.abs(q_batched[i] - qi).max() / denom)
    err = float(max(errs))

    print(f"N={N_ELEMENTS} B={N_ENVS} steps={N_STEPS}, all-btd operators")
    print(f"max rel divergence, batched vs per-env (same program): {err:.3e}")
    if err > 1e-4:
        print(
            "RESULT: REPRODUCED — the batched fused program disagrees with "
            "itself run per-env (each operator is individually correct; "
            "substituting any dense component fixes it)"
        )
    else:
        print(
            "RESULT: NOT-REPRODUCED on this backend (batched == per-env "
            f"to {err:.1e})"
        )


if __name__ == "__main__":
    main()
