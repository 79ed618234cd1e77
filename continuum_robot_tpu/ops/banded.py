"""Block-tridiagonal (3x3 blocks) linear algebra for beam operators.

The global mass and tangent-stiffness operators of a 1-D FEM chain couple
only adjacent nodes, so they are block-tridiagonal with 3x3 blocks
(``models/assembly.py``). This module provides O(N) factorization/solves in
that form — the structured alternative to the reference's explicit sparse
inverse (``dynamic_beam_model.py:60``) and the backbone of the implicit
integrators (``ops/integrators.py``).

Representation: ``(diag, lower, upper)`` with shapes ``(..., N, 3, 3)``,
``(..., N-1, 3, 3)``, ``(..., N-1, 3, 3)``; ``lower[i]`` couples node i+1 to
node i, ``upper[i]`` couples node i to node i+1. Symmetric operators may pass
``lower = transpose(upper)``.

All routines broadcast over leading batch axes and are differentiable. The
sequential block-Thomas recursion is a ``lax.scan`` over nodes: per step it
does a handful of 3x3 ops, vectorized across the entire batch — so with a
4096-env batch each scan step is a (4096, 3, 3) batched matmul, which keeps
the VPU busy despite the O(N) dependency chain. For single-env very-long
beams, prefer the dense precomputed inverse (MXU matmul) or the Pallas
cyclic-reduction kernel (``ops/pallas``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def _ns(*args):
    for a in args:
        if isinstance(a, (jax.Array, jax.core.Tracer)):
            return jnp
    return np


def inv33(m) -> jax.Array:
    """Explicit adjugate inverse of 3x3 blocks, batched over leading axes.

    Closed form is branch-free, fuses well, and differentiates cleanly —
    preferable to ``jnp.linalg.inv`` for tiny fixed-size blocks on TPU.
    """
    xp = _ns(m)
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d

    det = a * A + b * B + c * C
    adj = xp.stack(
        [
            xp.stack([A, D, G], axis=-1),
            xp.stack([B, E, H], axis=-1),
            xp.stack([C, F, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def btd_matvec(diag, lower, upper, x):
    """``y = T x`` for block-tridiagonal ``T``; ``x``: ``(..., N, 3)``."""
    y = jnp.einsum("...nij,...nj->...ni", diag, x, precision=_HI)
    y = y.at[..., 1:, :].add(jnp.einsum("...nij,...nj->...ni", lower, x[..., :-1, :], precision=_HI))
    y = y.at[..., :-1, :].add(jnp.einsum("...nij,...nj->...ni", upper, x[..., 1:, :], precision=_HI))
    return y


def btd_factor(diag, lower, upper):
    """Block-Thomas forward elimination (no pivoting — SPD/diag-dominant use).

    Returns factors ``(dinv, lw, upper)`` where ``dinv[i]`` is the inverse of
    the i-th Schur-complement pivot ``D_i = A_i - C_{i-1} D_{i-1}^{-1} B_{i-1}``
    and ``lw[i] = C_i D_i^{-1}`` is the forward-substitution multiplier.
    Scan over nodes; all block algebra batched over leading axes.
    """

    d0 = diag[..., 0, :, :]
    dinv0 = inv33(d0)

    # Move the node axis to the front for scan.
    def to_front(x):
        return jnp.moveaxis(x, -3, 0)

    diag_f = to_front(diag[..., 1:, :, :])
    lower_f = to_front(lower)
    upper_f = to_front(upper)

    def step(carry, inputs):
        dinv_prev = carry
        a_i, c_im1, b_im1 = inputs
        w = jnp.einsum("...ij,...jk->...ik", c_im1, dinv_prev, precision=_HI)  # C D^{-1}
        d_i = a_i - jnp.einsum("...ij,...jk->...ik", w, b_im1, precision=_HI)
        dinv_i = inv33(d_i)
        return dinv_i, (dinv_i, w)

    _, (dinvs, ws) = jax.lax.scan(step, dinv0, (diag_f, lower_f, upper_f))
    dinv = jnp.concatenate(
        [dinv0[..., None, :, :], jnp.moveaxis(dinvs, 0, -3)], axis=-3
    )
    lw = jnp.moveaxis(ws, 0, -3)
    return dinv, lw, upper


def btd_solve(factors, b):
    """Solve ``T x = b`` from :func:`btd_factor` output; ``b``: ``(..., N, 3)``.

    Forward sweep ``y_i = b_i - (C D^{-1})_{i-1} y_{i-1}`` then backward sweep
    ``x_i = D_i^{-1} (y_i - B_i x_{i+1})``, both as scans batched over leading
    axes. Factors and ``b`` broadcast against each other (a shared
    factorization solves a whole environment batch at once).
    """
    dinv, lw, upper = factors

    b_f = jnp.moveaxis(b[..., 1:, :], -2, 0)
    lw_f = jnp.moveaxis(lw, -3, 0)

    y0 = b[..., 0, :]

    def fwd(carry, inputs):
        y_prev = carry
        b_i, w_i = inputs
        y_i = b_i - jnp.einsum("...ij,...j->...i", w_i, y_prev, precision=_HI)
        return y_i, y_i

    y_last, ys = jax.lax.scan(fwd, y0, (b_f, lw_f))
    y = jnp.concatenate([y0[..., None, :], jnp.moveaxis(ys, 0, -2)], axis=-2)

    xN = jnp.einsum("...ij,...j->...i", dinv[..., -1, :, :], y[..., -1, :], precision=_HI)

    y_rev = jnp.moveaxis(y[..., :-1, :], -2, 0)[::-1]
    dinv_rev = jnp.moveaxis(dinv[..., :-1, :, :], -3, 0)[::-1]
    up_rev = jnp.moveaxis(upper, -3, 0)[::-1]

    def bwd(carry, inputs):
        x_next = carry
        y_i, dinv_i, b_i = inputs
        x_i = jnp.einsum(
            "...ij,...j->...i",
            dinv_i,
            y_i - jnp.einsum("...ij,...j->...i", b_i, x_next, precision=_HI),
            precision=_HI,
        )
        return x_i, x_i

    _, xs = jax.lax.scan(bwd, xN, (y_rev, dinv_rev, up_rev))
    x = jnp.concatenate([jnp.moveaxis(xs[::-1], 0, -2), xN[..., None, :]], axis=-2)
    return x


def btd_apply_bc(diag, lower, upper, free_mask_nodes):
    """Impose constraints on a block-tridiagonal operator without reshaping.

    ``free_mask_nodes``: ``(N, 3)`` boolean. Constrained rows/cols are zeroed
    and the diagonal gets 1.0 there, so solving ``T~ x = S f`` yields exactly
    the reduced-system solution with zeros at constrained DOFs — the static-
    shape equivalent of the reference's row/col deletion
    (``euler_bernoulli_beam.py:265``).
    """
    xp = _ns(diag, lower, upper, free_mask_nodes)
    m = xp.asarray(free_mask_nodes).astype(diag.dtype)
    diag = diag * m[..., :, :, None] * m[..., :, None, :]
    eye = xp.eye(3, dtype=diag.dtype)
    diag = diag + (1.0 - m)[..., :, :, None] * eye  # unit pivot on constrained DOFs
    lower = lower * m[..., 1:, :, None] * m[..., :-1, None, :]
    upper = upper * m[..., :-1, :, None] * m[..., 1:, None, :]
    return diag, lower, upper
