"""Gradient-based system identification from a measured tip trajectory.

The rollout is differentiable in every physical parameter
(``parallel/sweep.py``), so identifying a beam's material constants is just
gradient descent on a trajectory-mismatch loss — no finite differences, no
per-candidate re-simulation farm. The reference has no identification
capability at all (its closest analogue is the manual parameter sweep in
``examples/beam_comparison_*.py``, one OS process per candidate).

Workload: a 4-segment Nitinol cantilever is struck at the tip; we observe
the (optionally noisy) tip-displacement trace and recover the elastic
modulus starting from a 40% misestimate, optimizing ``log E`` with Adam.

Usage: python examples/system_identification.py [--plot] [--noise SIGMA]
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.parallel.sweep import override_arrays, parametric_rollout

from example_utilities import cleanup_temp_files, create_csv_file

TRUE_E = 75e9
N_SEGMENTS = 4
T_FINAL, DT = 0.02, 2e-4
SUBSTEPS = 20


def build_model():
    f = create_csv_file(
        ["linear"] * N_SEGMENTS, ["FIXED"] + ["NONE"] * (N_SEGMENTS - 1)
    )
    model = DynamicEulerBernoulliBeam(f)
    cleanup_temp_files(f)
    return model


def make_tip_trace_fn(model):
    """Differentiable map: elastic modulus -> tip-displacement trace."""
    bc_info = model.beam_model.bc_info
    arrays = model.beam_model.arrays
    n = model.n_pos_states
    x0 = jnp.zeros((1, 2 * n))
    tip_impulse = jnp.zeros(n).at[-2].set(0.1)

    def u(t):
        return jnp.where(t < 0.002, tip_impulse, jnp.zeros_like(tip_impulse))

    def tip_trace(log_E):
        batch = override_arrays(
            arrays, elastic_modulus=jnp.exp(log_E)[None, None]
        )
        _, ys = parametric_rollout(
            bc_info, batch, x0, T_FINAL, DT, u=u, substeps=SUBSTEPS
        )
        return ys[:, 0, n - 2]  # tip w over frames

    return tip_trace


def main():
    noise = 0.0
    if "--noise" in sys.argv:
        noise = float(sys.argv[sys.argv.index("--noise") + 1])

    model = build_model()
    tip_trace = make_tip_trace_fn(model)

    rng = np.random.default_rng(0)
    y_obs = np.asarray(jax.jit(tip_trace)(jnp.log(jnp.asarray(TRUE_E))))
    if noise > 0:
        y_obs = y_obs + noise * np.abs(y_obs).max() * rng.normal(size=y_obs.shape)
    y_obs = jnp.asarray(y_obs)
    scale = float(jnp.abs(y_obs).max())

    def loss(log_E):
        return jnp.mean(((tip_trace(log_E) - y_obs) / scale) ** 2)

    value_and_grad = jax.jit(jax.value_and_grad(loss))

    try:
        import optax

        opt = optax.adam(3e-2)
    except ImportError:  # pragma: no cover - optax is baked in
        opt = None

    log_E = jnp.log(jnp.asarray(0.6 * TRUE_E))  # 40% misestimate
    print(f"true E = {TRUE_E:.4e}, initial guess = {float(jnp.exp(log_E)):.4e}")

    if opt is not None:
        state = opt.init(log_E)
        for it in range(150):
            v, g = value_and_grad(log_E)
            updates, state = opt.update(g, state)
            log_E = optax.apply_updates(log_E, updates)
            if it % 25 == 0 or it == 149:
                print(
                    f"  iter {it:3d}: loss {float(v):.3e}, "
                    f"E = {float(jnp.exp(log_E)):.4e}"
                )
    else:
        for it in range(300):
            v, g = value_and_grad(log_E)
            log_E = log_E - 0.05 * g

    E_hat = float(jnp.exp(log_E))
    rel_err = abs(E_hat - TRUE_E) / TRUE_E
    print(f"\nrecovered E = {E_hat:.4e}  (relative error {rel_err:.2e})")

    if "--plot" in sys.argv:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ts = DT * np.arange(y_obs.shape[0])
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.plot(ts, np.asarray(y_obs), "k.", ms=3, label="observed")
        ax.plot(ts, np.asarray(tip_trace(log_E)), label="fitted model")
        ax.set(xlabel="t [s]", ylabel="tip w [m]")
        ax.legend()
        fig.tight_layout()
        fig.savefig("system_identification.png", dpi=120)
        print("wrote system_identification.png")


if __name__ == "__main__":
    main()
