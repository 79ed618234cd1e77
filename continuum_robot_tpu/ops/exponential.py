"""Exact exponential propagation for linear beams (LTI discretization).

For a purely linear beam with no velocity-dependent forces the dynamics are
LTI: ``dx/dt = A x + B u`` with ``A = [[0, I], [-M^-1 K, 0]]``. Instead of
*time-stepping* this (what the reference's LSODA and our Newmark do), the
flow can be discretized exactly once on the host:

    Phi = expm(A h),   Gamma = A^-1 (Phi - I) B   (via the augmented expm)

after which propagation over any horizon is ``x_{k+1} = Phi x_k + Gamma u_k``
— one ``(2n, 2n) @ (2n, batch)`` MXU matmul per output frame, *zero*
integration error for piecewise-constant inputs (the tip-impulse workload is
exactly that), and no stability constraint whatsoever. For the batched
linear benchmark this beats implicit stepping by the substep count while
being exact — the discrete-time structural dynamics classic, shaped for the
systolic array.

Applicability gate: all-linear elements, no state-dependent forces (gravity
at fixed rotation enters as a constant through ``u``; fluid drag does not
qualify). The facade checks and raises otherwise.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def discretize_lti(A: np.ndarray, B: np.ndarray, dt: float) -> Tuple[np.ndarray, np.ndarray]:
    """Exact zero-order-hold discretization via the augmented exponential.

    ``expm([[A, B], [0, 0]] dt) = [[Phi, Gamma], [0, I]]`` (host float64).
    """
    from scipy.linalg import expm

    n = A.shape[0]
    m = B.shape[1]
    aug = np.zeros((n + m, n + m))
    aug[:n, :n] = A
    aug[:n, n:] = B
    M = expm(aug * dt)
    return M[:n, :n], M[:n, n:]


def make_expm_propagator(
    model,
    dt: float,
    dtype=jnp.float32,
) -> Callable:
    """Exact discrete propagator for an all-linear beam model.

    Returns ``propagate(x0, u_frames) -> (frames+1, ..., 2n)`` where
    ``u_frames`` has shape ``(frames, n)`` (zero-order-hold force per output
    frame; may broadcast from ``(n,)``). Raises ValueError for nonlinear
    configurations or registered state-dependent forces.
    """
    arrays = model.beam_model.arrays
    if bool(np.any(np.asarray(arrays.nonlinear_mask))):
        raise ValueError(
            "Exponential propagation requires a purely linear beam"
        )
    if len(model.force_registry) > 0:
        raise ValueError(
            "Exponential propagation cannot include state-dependent "
            "registry forces; fold constant forces into u instead"
        )

    K = model.beam_model.get_stiffness_matrix()
    M = model.beam_model.get_mass_matrix()
    n = K.shape[0]
    Minv = np.linalg.inv(M)
    A = np.zeros((2 * n, 2 * n))
    A[:n, n:] = np.eye(n)
    A[n:, :n] = -Minv @ K
    B = np.zeros((2 * n, n))
    B[n:, :] = Minv

    Phi_np, Gamma_np = discretize_lti(A, B, dt)
    Phi = jnp.asarray(Phi_np, dtype=dtype)
    Gamma = jnp.asarray(Gamma_np, dtype=dtype)

    def propagate(x0: jax.Array, u_frames: jax.Array) -> jax.Array:
        x0 = jnp.asarray(x0, dtype=dtype)
        u_frames = jnp.asarray(u_frames, dtype=dtype)
        if u_frames.ndim == 1:
            u_frames = jnp.broadcast_to(u_frames, (1, *u_frames.shape))

        def step(x, u_k):
            x_next = (
                jnp.einsum("ij,...j->...i", Phi, x)
                + jnp.einsum("ij,...j->...i", Gamma, u_k)
            )
            return x_next, x_next

        _, xs = jax.lax.scan(step, x0, u_frames)
        return jnp.concatenate([x0[None] if x0.ndim == 1 else x0[None], xs], axis=0)

    return propagate
