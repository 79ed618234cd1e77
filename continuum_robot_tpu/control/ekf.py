"""Extended Kalman filtering for nonlinear beam state estimation.

The LQG stack (``control/lqg.py``) covers linear beams with a steady-state
Kalman-Bucy gain. For *nonlinear* beams (von Kármán elements,
state-dependent drag) the estimator must linearize along the trajectory;
this module provides a discrete-time EKF whose transition Jacobian comes
from ``jax.jacfwd`` of the actual compiled step function — no hand-derived
model mismatch, and the whole filter is one ``lax.scan``-compatible pure
function (jit/vmap/grad-composable, so it also serves gradient-based noise
tuning and smoothing).

No reference counterpart (the reference's only controller is full-state LQR
and it assumes perfect state access, SURVEY §2.1); this is part of the
output-feedback extension alongside ``control/lqg.py``.

Usage sketch::

    step = make_discrete_step(model, dt)        # x_{k+1} = f(x_k, u_k)
    ekf  = make_ekf(step, C, V, W)
    (x_hat, P), history = jax.lax.scan(
        lambda carry, yu: ekf(carry, yu[0], yu[1]),
        (x0_hat, P0), (ys, us))
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class EKFState(NamedTuple):
    """Filter carry: state estimate and its error covariance."""

    x_hat: jax.Array  # (..., n)
    P: jax.Array  # (..., n, n)


def make_discrete_step(model, dt: float, substeps: int = 1) -> Callable:
    """Discrete transition ``x_{k+1} = f(x_k, u_k)`` for a dynamic beam model.

    One RK4 advance (``substeps`` inner steps) of the model's full RHS —
    the same compiled physics the simulator runs, so the EKF's model is
    exact up to integration error. ``u_k`` is the constant force over the
    step (may be ``None``).
    """
    from ..ops.integrators import rk4_step

    rhs = model.build_rhs()
    h = dt / substeps

    def step(x, u=None):
        def body(x, _):
            return rk4_step(rhs, 0.0, x, h, u), None

        x, _ = jax.lax.scan(body, x, None, length=substeps)
        return x

    return step


def make_ekf(
    step_fn: Callable,
    C,
    V,
    W,
    joseph: bool = True,
) -> Callable:
    """Build a pure EKF update ``(EKFState, y, u) -> (EKFState, x_hat)``.

    Args:
      step_fn: discrete transition ``f(x, u) -> x_next`` (traceable; its
        Jacobian is taken with ``jax.jacfwd`` at every predict).
      C: measurement matrix ``(p, n)`` (``y = C x + noise``). Nonlinear
        measurement models can pass a callable ``h(x) -> y`` instead.
      V: process noise covariance ``(n, n)`` per step.
      W: measurement noise covariance ``(p, p)``.
      joseph: use the Joseph-form covariance update (numerically symmetric-
        PSD-preserving — matters in float32 on TPU).

    The returned function is scan/jit/vmap-compatible; innovation gains are
    computed with ``jnp.linalg.solve`` (no explicit inverse).
    """
    h_fn: Optional[Callable]
    if callable(C):
        h_fn = C
        C_mat = None
    else:
        h_fn = None
        C_mat = jnp.asarray(np.asarray(C))
    V = jnp.asarray(np.asarray(V))
    W = jnp.asarray(np.asarray(W))

    def ekf_update(state: EKFState, y, u=None):
        x_hat, P = state
        dtype = x_hat.dtype

        # Predict: linearize the actual transition at the current estimate.
        # jax.linearize shares the primal evaluation with the Jacobian
        # (jacfwd + a separate primal call would run the transition twice).
        x_pred, jvp_fn = jax.linearize(lambda x: step_fn(x, u), x_hat)
        n = x_hat.shape[-1]
        F = jax.vmap(jvp_fn)(jnp.eye(n, dtype=x_hat.dtype)).T
        P_pred = F @ P @ F.T + V.astype(dtype)

        # Measurement linearization.
        if h_fn is not None:
            H = jax.jacfwd(h_fn)(x_pred)
            y_pred = h_fn(x_pred)
        else:
            H = C_mat.astype(dtype)
            y_pred = H @ x_pred

        # Innovation and gain: K = P H' (H P H' + W)^-1 via solve.
        S = H @ P_pred @ H.T + W.astype(dtype)
        K = jnp.linalg.solve(S, H @ P_pred).T
        x_new = x_pred + K @ (jnp.asarray(y) - y_pred)

        eye = jnp.eye(n, dtype=dtype)
        if joseph:
            IKH = eye - K @ H
            P_new = IKH @ P_pred @ IKH.T + K @ W.astype(dtype) @ K.T
        else:
            P_new = (eye - K @ H) @ P_pred
        P_new = 0.5 * (P_new + jnp.swapaxes(P_new, -1, -2))

        return EKFState(x_new, P_new), x_new

    return ekf_update


def run_ekf(
    ekf_update: Callable,
    x0_hat,
    P0,
    ys,
    us=None,
):
    """Scan the filter over a measurement sequence.

    Args:
      ys: ``(T, p)`` measurements.
      us: optional ``(T, n)`` per-step inputs (or ``None``).

    Returns ``(final EKFState, (T, n) estimates)``.
    """
    x0_hat = jnp.asarray(x0_hat)
    P0 = jnp.asarray(P0)

    if us is None:

        def body(carry, y):
            return ekf_update(carry, y, None)

        return jax.lax.scan(body, EKFState(x0_hat, P0), jnp.asarray(ys))

    def body(carry, yu):
        y, u = yu
        return ekf_update(carry, y, u)

    return jax.lax.scan(
        body, EKFState(x0_hat, P0), (jnp.asarray(ys), jnp.asarray(us))
    )
