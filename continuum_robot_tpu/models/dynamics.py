"""Functional ODE core: reduced-coordinate beam dynamics as pure jax programs.

The reference builds its ODE right-hand side as nested Python closures over
NumPy/SciPy objects (``dynamic_beam_model.py:243-364``); every RHS evaluation
re-enters Python per segment and rebuilds the sparse input matrix
(``:326``). Here the complete RHS —

    dx/dt = [ v,  M^-1 (F_ext(x, t) + u - k(q)) ]

— is a single traced function: vmapped element kernels, one (pre-inverted or
factorized) mass solve, and composable pure force terms. It jits once, vmaps
over rollout batches, and shards over device meshes unchanged.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def make_mass_inverse_apply(m_reduced: np.ndarray):
    """Dense precomputed ``M^-1`` application (reference semantics).

    The reference precomputes ``scipy.sparse.linalg.inv(M)`` once
    (``dynamic_beam_model.py:60``). We invert the reduced mass in float64 on
    the host at setup and apply it as a batched matmul — on TPU this is an
    MXU-shaped ``(n, n) @ (n, batch)`` contraction. For very large beams use
    the block-tridiagonal factorization in ``ops/banded.py`` instead.
    """
    m_inv = np.linalg.inv(np.asarray(m_reduced, dtype=np.float64))

    def apply(f: jax.Array) -> jax.Array:
        # Constant-folded under jit; the eager fallback path pays a transfer.
        # precision=HIGHEST: TPU matmuls otherwise multiply in bfloat16,
        # which is not enough mantissa for stiffness-scale cancellations.
        m = jnp.asarray(m_inv, dtype=f.dtype)
        return jnp.einsum("ij,...j->...i", m, f, precision=jax.lax.Precision.HIGHEST)

    return apply, m_inv


def build_system_fn(
    k_red: Callable,
    m_inv_apply: Callable,
    forces_fn: Optional[Callable] = None,
):
    """Autonomous part of the dynamics: ``system(x, t) -> dx/dt``.

    Parity with ``dynamic_beam_model.py:256-272`` — split state, stiffness
    force, aggregated external forces, mass solve — except the real time is
    threaded through to the forces (the reference pins ``t=0.0``; SURVEY
    §2.3 flags this as a fix-with-note).
    """

    def system(x: jax.Array, t=0.0) -> jax.Array:
        x = jnp.asarray(x)
        n = x.shape[-1] // 2
        q = x[..., :n]
        v = x[..., n:]
        k_x = k_red(q)
        rhs_force = -k_x
        if forces_fn is not None:
            rhs_force = rhs_force + jnp.asarray(forces_fn(x, t))
        acc = m_inv_apply(rhs_force)
        return jnp.concatenate([v, acc], axis=-1)

    return system


def build_input_fn(m_inv_apply: Callable):
    """Input map ``(x, u, t) -> [0; M^-1 u]`` with the B matrix folded in.

    The reference rebuilds a sparse block matrix on every call
    (``dynamic_beam_model.py:326``); here the zero block is never
    materialized at all.
    """

    def input_function(x: jax.Array, u: jax.Array, t=0.0) -> jax.Array:
        x = jnp.asarray(x)
        u = jnp.asarray(u)
        acc = m_inv_apply(u)
        zeros = jnp.zeros_like(acc)
        return jnp.concatenate([zeros, acc], axis=-1)

    return input_function


def build_rhs(
    system_fn: Callable,
    input_fn: Optional[Callable] = None,
):
    """Full ``rhs(t, x, u) -> dx/dt`` for the scan integrators.

    ``u`` may be ``None``, a force array over position DOFs, or a callable
    ``t -> force`` (reference ``dynamic_beam_model.py:343-362``). When ``u``
    is a callable it must be traceable for use under jit.
    """

    def rhs(t, x, u=None):
        dx = system_fn(x, t)
        if u is None or input_fn is None:
            return dx
        force = u(t) if callable(u) else u
        return dx + input_fn(x, force, t)

    return rhs


def sum_forces(force_fns: Sequence[Callable]):
    """Compose pure force terms by summation (registry algebra, pure form)."""

    def total(x, t):
        x = jnp.asarray(x)
        n = x.shape[-1] // 2
        out = jnp.zeros((*x.shape[:-1], n), dtype=x.dtype)
        for fn in force_fns:
            out = out + jnp.asarray(fn(x, t))
        return out

    return total
