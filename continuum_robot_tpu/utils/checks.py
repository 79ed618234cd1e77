"""Numerical-health guards: NaN/divergence detection inside compiled rollouts.

The reference has no failure detection (SURVEY §5) — a diverging simulation
just returns garbage, and its closest analogue is the LQR instability raise
(``linear_quadratic_regulator.py:185-189``). In a compiled scan there are no
Python exceptions, so health is tracked as data:

* :func:`divergence_flags` — per-env boolean health state folded through the
  scan; once an env trips (non-finite or out-of-bound state) it stays
  flagged and its state stops updating (freeze semantics), so one bad env
  cannot poison a 4096-env batch with NaN propagation slowdowns.
* :func:`guard_rhs` — wraps an ``rhs`` so non-finite outputs become zeros
  with a flag raised.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class HealthState(NamedTuple):
    diverged: jax.Array  # bool, per leading batch shape
    max_abs: jax.Array  # running max |state| (diagnostic)


def init_health(x: jax.Array, batch_shape=()) -> HealthState:
    return HealthState(
        diverged=jnp.zeros(batch_shape, dtype=bool),
        max_abs=jnp.zeros(batch_shape, dtype=x.dtype),
    )


def divergence_flags(x: jax.Array, limit: float = 1e3) -> jax.Array:
    """Per-env divergence indicator: non-finite or |state| beyond ``limit``."""
    bad = jnp.logical_not(jnp.all(jnp.isfinite(x), axis=-1))
    big = jnp.max(jnp.abs(x), axis=-1) > limit
    return jnp.logical_or(bad, big)


def step_with_guard(step_fn: Callable, limit: float = 1e3) -> Callable:
    """Wrap ``x -> x_next`` so diverged envs freeze instead of spreading NaN."""

    def guarded(x, health: HealthState):
        x_next = step_fn(x)
        newly_bad = divergence_flags(x_next, limit)
        diverged = jnp.logical_or(health.diverged, newly_bad)
        keep = diverged[..., None] if x.ndim > diverged.ndim else diverged
        x_out = jnp.where(keep, x, x_next)
        max_abs = jnp.maximum(health.max_abs, jnp.max(jnp.abs(x_out), axis=-1))
        return x_out, HealthState(diverged=diverged, max_abs=max_abs)

    return guarded


def verify_batch_consistency(
    step_fn: Callable, x_batch, rtol: float = 1e-4, n_check: int = 2
) -> float:
    """Cross-check a batched step against per-env execution of the same fn.

    Returns the max relative deviation; raises RuntimeError above ``rtol``.
    Exists because experimental backends can miscompile heavily-fused batched
    programs while every component is individually correct (observed on the
    axon TPU backend: the fully-fused block-tridiagonal implicit step gave
    batched results diverging from single-env and float64 ground truth).
    Run once after building a new rollout configuration on a new backend.
    """
    x_batch = jnp.asarray(x_batch)
    out_b = jax.jit(step_fn)(x_batch)
    single = jax.jit(step_fn)
    worst = 0.0
    idx = np.linspace(0, x_batch.shape[0] - 1, min(n_check, x_batch.shape[0]))
    for k in idx.astype(int):
        out_k = single(x_batch[k])
        scale = float(jnp.abs(out_k).max()) or 1.0
        dev = float(jnp.abs(out_b[k] - out_k).max()) / scale
        worst = max(worst, dev)
    if worst > rtol:
        raise RuntimeError(
            f"Batched execution deviates from per-env by {worst:.3e} "
            f"(> {rtol:.1e}) — suspected backend miscompilation; switch the "
            "implicit solver to 'dense_inv' or report the fusion."
        )
    return worst


def guard_rhs(rhs: Callable) -> Callable:
    """Zero out non-finite RHS outputs (keeps integrators from exploding)."""

    def guarded(t, x, u=None):
        dx = rhs(t, x, u)
        return jnp.where(jnp.isfinite(dx), dx, jnp.zeros_like(dx))

    return guarded
