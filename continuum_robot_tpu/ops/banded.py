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


# ---------------------------------------------------------------------------
# Block cyclic reduction: log-depth solves for latency-bound (small-batch)
# long beams
# ---------------------------------------------------------------------------


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision=_HI)


def _mv(m, v):
    return jnp.einsum("...nij,...nj->...ni", m, v, precision=_HI)


def btd_cr_factor(diag, lower, upper):
    """Block cyclic-reduction factorization (log-depth alternative to Thomas).

    The block-Thomas recursion (:func:`btd_factor`/:func:`btd_solve`) is a
    sequential chain of N tiny steps — throughput-optimal when a large env
    batch fills the vector lanes at every step, but latency-bound for a
    single long beam (N serialized dependency hops). Cyclic reduction
    eliminates the even-indexed nodes level by level, halving the system
    ``ceil(log2(N+1))`` times; every level is one *vectorized* batch of 3x3
    block ops over the whole remaining chain, so XLA sees O(log N) fat ops
    instead of O(N) thin ones. Stable for the SPD / block-diagonally-dominant
    operators this framework produces (M, M + c*K_tan): CR is block Gaussian
    elimination under a nested-dissection permutation.

    Same input convention as :func:`btd_factor`; broadcasts over leading
    batch axes and is differentiable. The chain is zero-padded to ``2^L - 1``
    nodes with identity pivots (padding decouples exactly).

    Measured envelope (TPU v5e, f32): at N=1001/B=1 CR solves in 1.45 ms vs
    2.97 ms Thomas and 3.14 ms dense-inverse; at N=8193/B=1 it is 1.66 ms vs
    15.2 ms Thomas (9x). CAVEAT: batched RHS at large N (B>1, N >~ 4096)
    hits a pathological axon/Mosaic lowering (~300 ms regardless of B) —
    use the Thomas scan, the Pallas kernel, or the dense inverse for
    batched solves; CR is the single-/few-env long-beam path.

    Returns an opaque factor pytree for :func:`btd_cr_solve`.
    """
    N = diag.shape[-3]
    batch = diag.shape[:-3]
    dtype = diag.dtype
    L = max(1, int(np.ceil(np.log2(N + 1))))
    M = 2**L - 1

    def zpad(x, k):
        if k == 0:
            return x
        return jnp.concatenate(
            [x, jnp.zeros(batch + (k, 3, 3), dtype)], axis=-3
        )

    if M > N:
        eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), batch + (M - N, 3, 3))
        A = jnp.concatenate([diag, eye], axis=-3)
    else:
        A = diag
    # Full-length couplings: C[i] couples node i to i-1 (C[0] = 0),
    # B[i] couples node i to i+1 (B[M-1] = 0).
    C = zpad(
        jnp.concatenate([jnp.zeros(batch + (1, 3, 3), dtype), lower], axis=-3),
        M - N,
    )
    B = zpad(upper, M - (N - 1))

    levels = []
    for _ in range(L):
        m = A.shape[-3]
        if m == 1:
            levels.append((inv33(A), None, None, None, None))
            break
        Ainv_e = inv33(A[..., 0::2, :, :])
        Ce, Be = C[..., 0::2, :, :], B[..., 0::2, :, :]
        Ao = A[..., 1::2, :, :]
        Co, Bo = C[..., 1::2, :, :], B[..., 1::2, :, :]
        # Odd node j = 2p+1 has even neighbors j-1 (even slot p) and j+1
        # (even slot p+1); eliminate both into j's equation.
        W1 = _mm(Co, Ainv_e[..., :-1, :, :])  # C_j A_{j-1}^{-1}
        W2 = _mm(Bo, Ainv_e[..., 1:, :, :])  # B_j A_{j+1}^{-1}
        A_next = Ao - _mm(W1, Be[..., :-1, :, :]) - _mm(W2, Ce[..., 1:, :, :])
        C_next = -_mm(W1, Ce[..., :-1, :, :])  # boundary: Ce[0]=0 keeps C[0]=0
        B_next = -_mm(W2, Be[..., 1:, :, :])  # boundary: Be[-1]=0 keeps B[-1]=0
        levels.append((Ainv_e, Ce, Be, W1, W2))
        A, C, B = A_next, C_next, B_next

    return {"levels": tuple(levels), "n": N, "m_pad": M}


def btd_cr_solve(factors, b):
    """Solve ``T x = b`` from :func:`btd_cr_factor` output; ``b``: ``(..., N, 3)``.

    One downward rhs-reduction sweep and one upward back-substitution sweep,
    each ``ceil(log2(N+1))`` vectorized levels. Factors and ``b`` broadcast
    (a shared factorization solves an environment batch of right-hand sides).
    """
    levels = factors["levels"]
    # int() tolerates the sizes having been round-tripped through jit as
    # 0-d arrays (they are always concrete — factors are closure constants).
    N, M = int(factors["n"]), int(factors["m_pad"])
    if M > N:
        pad_shape = b.shape[:-2] + (M - N, 3)
        b = jnp.concatenate([b, jnp.zeros(pad_shape, b.dtype)], axis=-2)

    # Downward: fold the even-node equations into the odd ones.
    saved = []
    for Ainv_e, Ce, Be, W1, W2 in levels[:-1]:
        be, bo = b[..., 0::2, :], b[..., 1::2, :]
        saved.append(be)
        b = bo - _mv(W1, be[..., :-1, :]) - _mv(W2, be[..., 1:, :])

    # Root (single node).
    x = _mv(levels[-1][0], b)

    # Upward: recover the even nodes from the now-known odd ones.
    for (Ainv_e, Ce, Be, _, _), be in zip(reversed(levels[:-1]), reversed(saved)):
        zero = jnp.zeros(x.shape[:-2] + (1, 3), x.dtype)
        x_left = jnp.concatenate([zero, x], axis=-2)  # x_{i-1}; 0 at i=0
        x_right = jnp.concatenate([x, zero], axis=-2)  # x_{i+1}; 0 at i=m-1
        xe = _mv(Ainv_e, be - _mv(Ce, x_left) - _mv(Be, x_right))
        # Interleave evens (q+1) and odds (q) -> 2q+1 nodes.
        pair = jnp.stack([xe[..., :-1, :], x], axis=-2)
        merged = pair.reshape(*pair.shape[:-3], -1, 3)
        x = jnp.concatenate([merged, xe[..., -1:, :]], axis=-2)

    return x[..., :N, :]


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
