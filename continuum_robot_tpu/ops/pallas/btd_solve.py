"""Pallas TPU kernel: batched block-tridiagonal (3x3) solve.

The implicit Newmark path solves ``J x = r`` with a shared prefactored
block-tridiagonal ``J`` against thousands of per-environment right-hand
sides every step. The pure-XLA implementation (``ops/banded.py``) lowers the
Thomas recursion to a ``lax.scan``; this kernel runs the entire
forward+backward sweep inside VMEM at full lane width.

TPU-constraint-driven design (all measured/hit on v5e):

* **Layout**: RHS/solution live as ``(3N8, TB)`` — DOF rows on sublanes, the
  environment batch on lanes. ``(N, 3, TB)``/``(N, 3, 3)`` layouts pad
  sublane dim 3 -> 8 and tile 3x3 factors to (8, 128) — a VMEM OOM.
  Factors are flattened to ``(N8, 9)``.
* **Alignment**: Mosaic requires dynamically-offset sublane slices to be
  8-aligned, so the recursion runs over *groups of 8 nodes* (24 = 3x8 rows,
  aligned): one aligned (24, TB) load per group, an unrolled 8-step
  recursion on static sub-slices, one aligned store; the 3-row boundary
  vector is the loop carry.
* **In-place sweep**: the backward pass overwrites the forward intermediate
  (``x_i`` needs ``y_i`` — not yet overwritten — and ``x_{i+1}`` — already
  final), so there is no scratch buffer.

The band arrays are zero-padded to the group boundary with identity pivots,
which the recursion passes through as exact zeros. Numerically identical to
``banded.btd_solve``; validated in ``tests/test_pallas.py`` and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 8  # nodes per aligned group (f32 sublane quantum)


def _solve_kernel(dinv_ref, lwp_ref, upp_ref, rhs_ref, out_ref):
    """One batch tile: grouped forward elimination + in-place back subst.

    Refs:
      dinv_ref: (N8, 9)    inverse pivots D_i^{-1}, row-major 3x3
      lwp_ref:  (N8, 9)    forward multipliers, SHIFTED: row i = C_{i-1} D_{i-1}^{-1} (row 0 = 0)
      upp_ref:  (N8, 9)    upper blocks B_i (row N-1.. = 0)
      rhs_ref:  (3*N8, TB) right-hand sides (DOF rows x env lanes)
      out_ref:  (3*N8, TB) solutions (holds the forward sweep y first)
    """
    n8 = dinv_ref.shape[0]
    n_groups = n8 // _G

    def matvec33(mrow, v):
        # (9,) row-major block (static scalar reads) x (3, TB) lanes.
        rows = []
        for r in range(3):
            acc = mrow[3 * r] * v[0]
            acc += mrow[3 * r + 1] * v[1]
            acc += mrow[3 * r + 2] * v[2]
            rows.append(acc)
        return jnp.stack(rows, axis=0)

    zero_carry = jnp.zeros((3, rhs_ref.shape[1]), rhs_ref.dtype)

    def fwd_group(j, y_prev):
        r_chunk = rhs_ref[pl.ds(3 * _G * j, 3 * _G), :]  # aligned (24, TB)
        lw_chunk = lwp_ref[pl.ds(_G * j, _G), :]  # aligned (8, 9)
        ys = []
        for k in range(_G):
            y_i = r_chunk[3 * k : 3 * k + 3, :] - matvec33(lw_chunk[k], y_prev)
            y_prev = y_i
            ys.append(y_i)
        out_ref[pl.ds(3 * _G * j, 3 * _G), :] = jnp.concatenate(ys, axis=0)
        return y_prev

    jax.lax.fori_loop(0, n_groups, fwd_group, zero_carry)

    def bwd_group(jj, x_next):
        j = n_groups - 1 - jj
        y_chunk = out_ref[pl.ds(3 * _G * j, 3 * _G), :]
        di_chunk = dinv_ref[pl.ds(_G * j, _G), :]
        up_chunk = upp_ref[pl.ds(_G * j, _G), :]
        xs = [None] * _G
        for k in reversed(range(_G)):
            y_i = y_chunk[3 * k : 3 * k + 3, :]
            x_i = matvec33(di_chunk[k], y_i - matvec33(up_chunk[k], x_next))
            x_next = x_i
            xs[k] = x_i
        out_ref[pl.ds(3 * _G * j, 3 * _G), :] = jnp.concatenate(xs, axis=0)
        return x_next

    jax.lax.fori_loop(0, n_groups, bwd_group, zero_carry)


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
    N8 = -(-N // _G) * _G
    n_pad = N8 - N

    pad_b = (-B) % tile
    if pad_b:
        rhs = jnp.concatenate([rhs, jnp.zeros((pad_b, N, 3), rhs.dtype)], axis=0)
    Bp = rhs.shape[0]
    if n_pad:
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((Bp, n_pad, 3), rhs.dtype)], axis=1
        )

    # (B, N8, 3) -> (3*N8, B): DOF rows on sublanes, envs on lanes.
    rhs_t = jnp.transpose(rhs, (1, 2, 0)).reshape(3 * N8, Bp)

    eye9 = jnp.broadcast_to(jnp.eye(3, dtype=rhs.dtype).reshape(9), (n_pad, 9))
    dinv9 = jnp.concatenate(
        [dinv.reshape(N, 9).astype(rhs.dtype), eye9], axis=0
    )
    zero_block = jnp.zeros((1, 9), rhs.dtype)
    # Shifted forward multipliers: row i corresponds to C_{i-1} D_{i-1}^{-1}.
    lwp9 = jnp.concatenate(
        [
            zero_block,
            lw.reshape(N - 1, 9).astype(rhs.dtype),
            jnp.zeros((n_pad, 9), rhs.dtype),
        ],
        axis=0,
    )
    upp9 = jnp.concatenate(
        [
            up.reshape(N - 1, 9).astype(rhs.dtype),
            jnp.zeros((n_pad + 1, 9), rhs.dtype),
        ],
        axis=0,
    )

    grid = (Bp // tile,)
    out = pl.pallas_call(
        _solve_kernel,
        out_shape=jax.ShapeDtypeStruct((3 * N8, Bp), rhs.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N8, 9), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N8, 9), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N8, 9), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * N8, tile), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3 * N8, tile), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(dinv9, lwp9, upp9, rhs_t)

    x = out.reshape(N8, 3, Bp).transpose(2, 0, 1)
    return x[:B, :N]
