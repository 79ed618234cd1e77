"""Pallas TPU kernel: batched block-tridiagonal (3x3) solve.

The implicit Newmark path solves ``J x = r`` with a shared prefactored
block-tridiagonal ``J`` against thousands of per-environment right-hand
sides every step. The pure-XLA implementation (``ops/banded.py``) lowers the
Thomas recursion to a ``lax.scan`` whose per-node carry streams through HBM;
this kernel instead runs the entire forward+backward sweep inside VMEM:

* layout: the environment batch is the **lane** dimension — RHS is tiled as
  ``(N, 3, TB)`` with ``TB`` a multiple of 128, so each of the 2N sequential
  block steps is nine fused scalar x (3, TB) vector MACs at full lane width;
* the shared factors (``dinv``, ``lw``, ``upper`` from ``btd_factor``) are
  loaded once per grid cell (~325 KB for a 1000-element beam) and reused by
  every environment in the tile;
* grid = batch tiles; no inter-tile communication.

Numerically identical to ``banded.btd_solve`` (same recursion, same order of
operations up to fusion); validated in ``tests/test_pallas.py`` and usable
on CPU via ``interpret=True``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _solve_kernel(dinv_ref, lw_ref, up_ref, rhs_ref, out_ref, y_ref):
    """One batch tile: forward elimination + back substitution in VMEM.

    Refs:
      dinv_ref: (N, 3, 3)   inverse pivots D_i^{-1}
      lw_ref:   (N-1, 3, 3) forward multipliers C_i D_i^{-1}
      up_ref:   (N-1, 3, 3) upper blocks B_i
      rhs_ref:  (N, 3, TB)  right-hand sides (env batch on lanes)
      out_ref:  (N, 3, TB)  solutions
      y_ref:    (N, 3, TB)  scratch (forward-swept intermediate)
    """
    n = rhs_ref.shape[0]

    y_ref[0] = rhs_ref[0]

    def matvec33(m_ref, i, v):
        # (3,3) block times (3, TB) lanes, unrolled: rows of scalar FMAs.
        rows = []
        for r in range(3):
            acc = m_ref[i, r, 0] * v[0]
            acc += m_ref[i, r, 1] * v[1]
            acc += m_ref[i, r, 2] * v[2]
            rows.append(acc)
        return jnp.stack(rows, axis=0)

    def fwd(i, _):
        y_prev = y_ref[i - 1]
        y_ref[i] = rhs_ref[i] - matvec33(lw_ref, i - 1, y_prev)
        return 0

    jax.lax.fori_loop(1, n, fwd, 0)

    out_ref[n - 1] = matvec33(dinv_ref, n - 1, y_ref[n - 1])

    def bwd(k, _):
        i = n - 2 - k
        x_next = out_ref[i + 1]
        out_ref[i] = matvec33(
            dinv_ref, i, y_ref[i] - matvec33(up_ref, i, x_next)
        )
        return 0

    jax.lax.fori_loop(0, n - 1, bwd, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def btd_solve_pallas(
    factors,
    rhs: jax.Array,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Solve ``T x = rhs`` for a batch of RHS with shared factors.

    Args:
      factors: ``(dinv (N,3,3), lw (N-1,3,3), upper (N-1,3,3))`` from
        :func:`continuum_robot_tpu.ops.banded.btd_factor` (unbatched).
      rhs: ``(B, N, 3)`` per-environment right-hand sides.
      tile: environments per grid cell (multiple of 128 on hardware).
      interpret: run in interpreter mode (CPU testing).

    Returns ``(B, N, 3)`` solutions.
    """
    dinv, lw, up = factors
    B, N, _ = rhs.shape

    pad = (-B) % tile
    if pad:
        rhs = jnp.concatenate([rhs, jnp.zeros((pad, N, 3), rhs.dtype)], axis=0)
    Bp = rhs.shape[0]

    # (B, N, 3) -> (N, 3, B): envs on lanes.
    rhs_t = jnp.transpose(rhs, (1, 2, 0))

    dinv = dinv.astype(rhs.dtype)
    lw = lw.astype(rhs.dtype)
    up = up.astype(rhs.dtype)

    grid = (Bp // tile,)
    out = pl.pallas_call(
        _solve_kernel,
        out_shape=jax.ShapeDtypeStruct((N, 3, Bp), rhs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, 3, 3), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N - 1, 3, 3), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N - 1, 3, 3), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 3, tile), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (N, 3, tile), lambda b: (0, 0, b), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((N, 3, tile), rhs.dtype)],
        interpret=interpret,
    )(dinv, lw, up, rhs_t)

    x = jnp.transpose(out, (2, 0, 1))
    return x[:B]
