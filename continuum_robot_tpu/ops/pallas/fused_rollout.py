"""Pallas TPU kernel: fused implicit rollout for small linear beams.

For few-element beams (the reference's own 6-segment workloads) a batched
implicit step is a handful of tiny matmuls plus elementwise updates — at
which point XLA per-step overhead (~0.3 ms) dominates the arithmetic
(~microseconds). This kernel runs S generalized-alpha steps *entirely in
VMEM* per invocation: states live as ``(n_p, TB)`` tiles (DOFs on sublanes,
envs on lanes), the three operator matrices (M, K, J^-1 — prefactored dense,
all-linear beams) sit in VMEM as small matmul operands, and quadratic fluid
drag is a pure elementwise term (in reduced coordinates the drag force index
equals the velocity index, so the per-DOF drag coefficient vector makes it
``f = -c * v * |v|`` with no gather at all).

Scope (checked by the wrapper): purely linear elements, prefactored
modified-Newton (exact for linear + drag-in-residual), constant input force
per call — callers split rollouts at force discontinuities (the reference's
tip impulse = 2 phases).

Validated against ``integrators.integrate_generalized_alpha`` in
``tests/test_pallas.py`` and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(n_p: int, steps: int, h: float, rho_inf: float, n_newton: int):
    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    gamma = 0.5 - am + af

    def kernel(m_ref, k_ref, jinv_ref, drag_ref, u_ref, x_ref, out_ref):
        """One env tile: S fused generalized-alpha steps.

        m/k/jinv: (n_p, n_p) operators; drag/u: (n_p, 1); x/out: (3*n_p, TB)
        stacked [q; v; a].
        """
        M = m_ref[:, :]
        K = k_ref[:, :]
        Jinv = jinv_ref[:, :]
        c_drag = drag_ref[:, :]  # (n_p, 1), broadcasts over lanes
        u = u_ref[:, :]

        def mv(A, x):
            # precision=HIGHEST: the MXU multiplies in bfloat16 by default,
            # which accumulates to ~0.2 relative trajectory error over 5000
            # implicit steps (measured); 6-pass f32 is still tiny here.
            return jax.lax.dot_general(
                A, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        def step(_, qva):
            q, v, a = qva
            q_pred = q + h * v + (0.5 - beta) * h * h * a
            v_pred = v + (1.0 - gamma) * h * a
            a1 = a
            for _n in range(n_newton):
                q1 = q_pred + beta * h * h * a1
                v1 = v_pred + gamma * h * a1
                q_af = (1.0 - af) * q1 + af * q
                v_af = (1.0 - af) * v1 + af * v
                a_am = (1.0 - am) * a1 + am * a
                f_drag = -c_drag * v_af * jnp.abs(v_af)
                r = mv(M, a_am) + mv(K, q_af) - f_drag - u
                a1 = a1 - mv(Jinv, r)
            return (
                q_pred + beta * h * h * a1,
                v_pred + gamma * h * a1,
                a1,
            )

        q0 = x_ref[0:n_p, :]
        v0 = x_ref[n_p : 2 * n_p, :]
        a0 = x_ref[2 * n_p : 3 * n_p, :]
        q, v, a = jax.lax.fori_loop(0, steps, step, (q0, v0, a0))
        out_ref[0:n_p, :] = q
        out_ref[n_p : 2 * n_p, :] = v
        out_ref[2 * n_p : 3 * n_p, :] = a

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("steps", "h", "rho_inf", "n_newton", "tile", "interpret"),
)
def fused_gen_alpha_steps(
    mats,
    drag_coeffs,
    u,
    x,
    steps: int,
    h: float,
    rho_inf: float = 0.8,
    n_newton: int = 2,
    tile: int = 512,
    interpret: bool = False,
):
    """Advance ``(q, v, a)`` by ``steps`` fused generalized-alpha steps.

    Args:
      mats: ``(M, K, Jinv)`` dense reduced operators, each ``(n, n)`` — Jinv
        is the inverse of ``(1-am) M + (1-af) beta h^2 K``.
      drag_coeffs: ``(n,)`` per-DOF quadratic drag coefficients (zeros where
        no drag acts).
      u: ``(n,)`` constant input force over this span.
      x: ``(B, 3n)`` stacked ``[q; v; a]`` states.
      steps, h, rho_inf, n_newton: stepper configuration (static).
    Returns the advanced ``(B, 3n)`` states.
    """
    M, K, Jinv = mats
    B, three_n = x.shape
    n = three_n // 3
    n_p = -(-n // 8) * 8

    pad_b = (-B) % tile
    xb = x
    if pad_b:
        xb = jnp.concatenate([xb, jnp.zeros((pad_b, three_n), x.dtype)], axis=0)
    Bp = xb.shape[0]

    def pad_mat(A):
        out = jnp.zeros((n_p, n_p), x.dtype)
        return out.at[:n, :n].set(jnp.asarray(A, x.dtype))

    def pad_vec(v):
        out = jnp.zeros((n_p, 1), x.dtype)
        return out.at[:n, 0].set(jnp.asarray(v, x.dtype))

    # (B, 3n) -> (3*n_p, B) with each component padded to n_p rows.
    comps = [xb[:, :n], xb[:, n : 2 * n], xb[:, 2 * n :]]
    rows = []
    for c in comps:
        c = c.T  # (n, Bp)
        c = jnp.concatenate(
            [c, jnp.zeros((n_p - n, Bp), x.dtype)], axis=0
        )
        rows.append(c)
    x_t = jnp.concatenate(rows, axis=0)  # (3*n_p, Bp)

    kernel = _make_kernel(n_p, steps, float(h), float(rho_inf), int(n_newton))
    grid = (Bp // tile,)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3 * n_p, Bp), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_p, n_p), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, n_p), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, n_p), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * n_p, tile), lambda b: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3 * n_p, tile), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        pad_mat(M), pad_mat(K), pad_mat(Jinv),
        pad_vec(drag_coeffs), pad_vec(u), x_t,
    )

    # (3*n_p, Bp) -> (B, 3n)
    outs = []
    for kcomp in range(3):
        outs.append(out[kcomp * n_p : kcomp * n_p + n, :].T)
    return jnp.concatenate(outs, axis=-1)[:B]


def fused_rollout(
    model,
    x0,
    t_final: float,
    dt: float,
    u=None,
    substeps: int = 20,
    rho_inf: float = 0.8,
    n_newton: int = 2,
    tile: int = 512,
    interpret: bool = False,
):
    """Full fused-kernel rollout of a linear(+drag) beam model.

    ``x0``: (B, 2n) reduced states; ``u``: constant force (n,) or None.
    Returns ``(ts, ys (frames+1, B, 2n))``. One kernel invocation per output
    frame (``substeps`` implicit steps inside VMEM), scanned under jit.
    """
    import numpy as _np

    from ...models.simulate import reduce_matrix_dense

    arrays = model.beam_model.arrays
    if bool(_np.any(_np.asarray(arrays.nonlinear_mask))):
        raise ValueError("fused_rollout requires a purely linear beam")

    h = dt / substeps
    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2

    M = _np.asarray(model.beam_model.M.toarray(), _np.float64)
    K = reduce_matrix_dense(arrays, model.beam_model.bc_info.free_dofs, False)
    Jinv = _np.linalg.inv((1.0 - am) * M + (1.0 - af) * beta * h * h * K)
    Minv = _np.linalg.inv(M)
    mats = (M, K, Jinv)
    c_drag = drag_coefficient_vector(model)

    x0 = jnp.asarray(x0)
    B, two_n = x0.shape
    n = two_n // 2
    u_vec = jnp.zeros(n, x0.dtype) if u is None else jnp.asarray(u, x0.dtype)

    # initial acceleration a0 = M^-1 (u - K q0 + drag(v0))
    q0, v0 = x0[:, :n], x0[:, n:]
    f0 = (
        u_vec
        - jnp.einsum("ij,bj->bi", jnp.asarray(K, x0.dtype), q0,
                     precision=jax.lax.Precision.HIGHEST)
        - jnp.asarray(c_drag, x0.dtype) * v0 * jnp.abs(v0)
    )
    a0 = jnp.einsum("ij,bj->bi", jnp.asarray(Minv, x0.dtype), f0,
                    precision=jax.lax.Precision.HIGHEST)

    n_frames = int(round(t_final / dt))
    x_full = jnp.concatenate([q0, v0, a0], axis=-1)

    def frame(x, _):
        x = fused_gen_alpha_steps(
            mats, c_drag, u_vec, x, steps=substeps, h=h,
            rho_inf=rho_inf, n_newton=n_newton, tile=tile,
            interpret=interpret,
        )
        return x, x[:, : 2 * n]

    _, ys = jax.lax.scan(frame, x_full, None, length=n_frames)
    ts = dt * jnp.arange(n_frames + 1)
    ys = jnp.concatenate([x0[None], ys], axis=0)
    return ts, ys


def drag_coefficient_vector(model) -> np.ndarray:
    """Per-reduced-DOF quadratic drag coefficients for the fused kernel.

    In reduced coordinates the fluid force lands at the same index the
    transverse velocity is read from (``forces.FluidDragForce``), so the
    whole force is ``f_i = -c_i v_i |v_i|`` with ``c_i`` nonzero at 'w' DOFs.
    Returns zeros when no fluid force is registered.
    """
    from ...models.forces import FluidDragForce  # local import, avoid cycle

    n = model.n_pos_states
    c = np.zeros(n)
    for f in model.force_registry.get_registered_forces():
        if isinstance(f, FluidDragForce) and f.is_enabled() and f.fluid_coefficients:
            fc = f.fluid_coefficients
            c[np.asarray(fc["w_pos_indices"])] += np.asarray(fc["drag_factors"])
    return c
