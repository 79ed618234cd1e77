"""Parameter sweeps: batched beam configurations as traced pytrees.

The reference sweeps configurations by writing one CSV per variant and
farming separate processes (``beam_comparison_*.py``). Here
:class:`~continuum_robot_tpu.models.config.BeamArrays` is a pytree, so a
*batch of beams* is just the same pytree with a leading axis — one compiled
rollout vmapped over both the configuration and the initial state. Because
everything is traced, the rollout is also **differentiable in the physical
parameters**: ``jax.grad`` of a trajectory loss w.r.t. elastic modulus,
lengths, drag coefficients, etc. comes for free (design optimization /
system identification — no reference counterpart).

The mass operator depends on the swept parameters, so each environment
factors its own block-tridiagonal mass on device (``banded.btd_factor`` is
traceable and vmaps); there is no host-side precomputation in this path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import assembly
from ..models.config import BeamArrays
from ..ops import banded, integrators


def tile_arrays(arrays: BeamArrays, n: int) -> BeamArrays:
    """Replicate a host config into an ``(n, E)`` batched jnp pytree."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (n, *np.shape(x))), arrays
    )


def override_arrays(arrays: BeamArrays, **columns) -> BeamArrays:
    """Batched copies of ``arrays`` with some fields replaced.

    Each keyword maps a field name to an array of shape ``(n_envs, E)`` or
    ``(n_envs, 1)`` (broadcast over elements). Example::

        sweep = override_arrays(model.beam_model.arrays,
                                elastic_modulus=E_samples[:, None])
    """
    n = None
    for v in columns.values():
        n = np.shape(v)[0]
        break
    if n is None:
        raise ValueError("provide at least one override column")
    batched = tile_arrays(arrays, n)
    updates = {}
    for k, v in columns.items():
        if not hasattr(arrays, k):
            raise ValueError(f"BeamArrays has no field {k!r}")
        v = jnp.asarray(v)
        tgt = getattr(batched, k)
        updates[k] = jnp.broadcast_to(v, tgt.shape).astype(tgt.dtype)
    import dataclasses

    return dataclasses.replace(batched, **updates)


def make_parametric_rhs(
    bc_info,
    forces_func: Optional[Callable] = None,
    use_consistent: bool = False,
) -> Callable:
    """Pure ``rhs(t, x_red, u, arrays)`` — beam parameters are an argument.

    Unlike ``DynamicEulerBernoulliBeam.build_rhs`` (which closes over one
    fixed configuration with a prefactored mass inverse), this evaluates the
    mass solve from the given ``arrays`` every call via an on-device
    block-tridiagonal factorization, so it can be vmapped over configuration
    batches and differentiated w.r.t. every physical parameter.
    """
    free = np.asarray(bc_info.free_dofs)
    n_full = bc_info.n_dofs_full
    n_nodes = bc_info.n_nodes
    mask_nodes = jnp.asarray(bc_info.free_mask.reshape(n_nodes, 3))

    def rhs(t, x, u, arrays: BeamArrays):
        n = x.shape[-1] // 2
        q, v = x[..., :n], x[..., n:]

        q_full = assembly.pad_to_full(q, free, n_full)
        k_full = assembly.internal_force_full(
            arrays, q_full, use_consistent=use_consistent
        )
        f = -assembly.reduce_from_full(k_full, free)
        if forces_func is not None:
            f = f + forces_func(x, t, arrays)
        if u is not None:
            f = f + (u(t) if callable(u) else u)

        diag, off = assembly.mass_block_tridiagonal(arrays)
        lower = jnp.swapaxes(off, -1, -2)
        diag, lower, upper = banded.btd_apply_bc(diag, lower, off, mask_nodes)
        factors = banded.btd_factor(diag, lower, upper)
        f_nodes = assembly.pad_to_full(f, free, n_full).reshape(
            *f.shape[:-1], n_nodes, 3
        )
        acc_full = banded.btd_solve(factors, f_nodes).reshape(
            *f.shape[:-1], n_full
        )
        acc = assembly.reduce_from_full(acc_full, free)
        return jnp.concatenate([v, acc], axis=-1)

    return rhs


def parametric_rollout(
    bc_info,
    arrays_batch: BeamArrays,
    x0_batch,
    t_final: float,
    dt: float,
    u=None,
    forces_func: Optional[Callable] = None,
    substeps: int = 1,
    use_consistent: bool = False,
):
    """Batched RK4 rollout over ``(configuration, initial state)`` pairs.

    Returns ``(ts, ys (frames, envs, state))``. Fully differentiable w.r.t.
    ``arrays_batch`` and ``x0_batch``.
    """
    rhs = make_parametric_rhs(bc_info, forces_func, use_consistent)
    n_steps = int(round(t_final / dt))

    def one(arrays, x0):
        def rhs_fixed(t, x, uu):
            return rhs(t, x, uu, arrays)

        return integrators.integrate_fixed(
            rhs_fixed, x0, 0.0, dt, n_steps, u=u, substeps=substeps
        )

    ts, ys = jax.vmap(one)(arrays_batch, jnp.asarray(x0_batch))
    return ts[0], jnp.swapaxes(ys, 0, 1)


def make_traced_genalpha_operator(
    bc_info,
    arrays: BeamArrays,
    dt: float,
    rho_inf: float = 0.8,
    use_consistent: bool = False,
    modified_newton: bool = True,
    forces_func: Optional[Callable] = None,
):
    """Implicit-stepper operators built ONLY from traced ops.

    ``models/simulate.make_newmark_operator`` prefactoring runs on the host
    (float64 constants closed over by the jitted program) — the fast path
    for fixed configurations, but opaque to autodiff in the physical
    parameters. This variant assembles, masks, and factors the operators
    with traced banded ops (``ops/banded.btd_*`` are differentiable), so a
    generalized-alpha rollout built on it is differentiable w.r.t. every
    ``BeamArrays`` field and vmappable over configuration batches — implicit
    differentiable physics for *stiff* design/identification problems where
    the explicit ``parametric_rollout`` would need absurd dt.

    ``forces_func(x, t, arrays) -> f`` may also close over/receive the
    traced parameters.
    """
    free = np.asarray(bc_info.free_dofs)
    n_full = bc_info.n_dofs_full
    n_nodes = bc_info.n_nodes
    mask_nodes = jnp.asarray(bc_info.free_mask.reshape(n_nodes, 3))

    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    c_eff = (1.0 - af) * beta * dt * dt
    a_eff = 1.0 - am

    m_diag, m_off = assembly.mass_block_tridiagonal(arrays)
    m_diag = jnp.asarray(m_diag)
    m_off = jnp.asarray(m_off)
    m_lower = jnp.swapaxes(m_off, -1, -2)
    mm_diag, mm_lower, mm_upper = banded.btd_apply_bc(
        m_diag, m_lower, m_off, mask_nodes
    )

    def pad(r):
        return assembly.pad_to_full(r, free, n_full)

    def red(v):
        return assembly.reduce_from_full(v, free)

    def mass_apply(a_red):
        a_nodes = pad(a_red).reshape(*a_red.shape[:-1], n_nodes, 3)
        out = banded.btd_matvec(mm_diag, mm_lower, mm_upper, a_nodes)
        return red(out.reshape(*a_red.shape[:-1], n_full))

    def internal_force(q_red):
        k_full = assembly.internal_force_full(
            arrays, pad(q_red), use_consistent=use_consistent
        )
        return red(k_full)

    def factors_at(q_full, c, a):
        kd, kl, ku = assembly.tangent_block_tridiagonal(
            arrays, q_full, use_consistent=use_consistent
        )
        jd = a * mm_diag + c * kd
        jl = a * mm_lower + c * kl
        ju = a * mm_upper + c * ku
        jd, jl, ju = banded.btd_apply_bc(jd, jl, ju, mask_nodes)
        return banded.btd_factor(jd, jl, ju)

    prefactored = None
    if modified_newton:
        q_zero = jnp.zeros(n_full, dtype=m_diag.dtype)
        prefactored = {
            (1.0, 0.0): factors_at(q_zero, 0.0, 1.0),
            (a_eff, c_eff): factors_at(q_zero, c_eff, a_eff),
        }

    def solve(q_red, c, a=1.0):
        def do_solve(r_red):
            key = (float(a), float(c))
            if prefactored is not None and key in prefactored:
                factors = prefactored[key]
            else:
                factors = factors_at(pad(q_red), c, a)
            r_nodes = pad(r_red).reshape(*r_red.shape[:-1], n_nodes, 3)
            x = banded.btd_solve(factors, r_nodes)
            return red(x.reshape(*r_red.shape[:-1], n_full))

        return do_solve

    wrapped_forces = None
    if forces_func is not None:
        wrapped_forces = lambda x, t: forces_func(x, t, arrays)  # noqa: E731

    return integrators.NewmarkOperator(
        mass_apply=mass_apply,
        internal_force=internal_force,
        external_force=wrapped_forces,
        solve=solve,
    )


def parametric_genalpha_rollout(
    bc_info,
    arrays_batch: BeamArrays,
    x0_batch,
    t_final: float,
    dt: float,
    u=None,
    forces_func: Optional[Callable] = None,
    substeps: int = 1,
    rho_inf: float = 0.8,
    n_newton: int = 2,
    use_consistent: bool = False,
    modified_newton: bool = True,
    remat: bool = False,
):
    """Batched *implicit* rollout, differentiable in the beam parameters.

    The stiff-configuration counterpart of :func:`parametric_rollout`:
    unconditionally stable generalized-alpha stepping whose whole pipeline
    (assembly, BC masking, factorization, solves) is traced, so
    ``jax.grad`` flows into every ``BeamArrays`` field. ``remat`` stores one
    state per frame under reverse-mode autodiff (long-horizon gradients).
    Returns ``(ts, ys (frames, envs, state))``.
    """
    n_steps = int(round(t_final / dt))

    def one(arrays, x0):
        op = make_traced_genalpha_operator(
            bc_info, arrays, dt / substeps, rho_inf=rho_inf,
            use_consistent=use_consistent, modified_newton=modified_newton,
            forces_func=forces_func,
        )
        n = x0.shape[-1] // 2
        ts, qs, vs = integrators.integrate_generalized_alpha(
            op, x0[..., :n], x0[..., n:], 0.0, dt, n_steps,
            u=u, rho_inf=rho_inf, n_newton=n_newton, substeps=substeps,
            remat=remat,
        )
        return ts, jnp.concatenate([qs, vs], axis=-1)

    ts, ys = jax.vmap(one)(arrays_batch, jnp.asarray(x0_batch))
    return ts[0], jnp.swapaxes(ys, 0, 1)
