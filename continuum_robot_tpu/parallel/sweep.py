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

# Full-input-precision contractions: the TPU MXU default is bfloat16
# inputs, fatal for the stiff reduced operators in the Newton solve below
# (see parallel/spatial_implicit.py and continuum_robot_tpu/__init__.py).
# The package pins the global default at import, but the hot path stays
# correct standalone (tests/test_precision_policy.py AST-checks this file).
_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    """``a @ b`` with full-f32 MXU inputs (precision=HIGHEST)."""
    return jnp.matmul(a, b, precision=_HI)


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
        # Same contract as make_newmark_operator's solve: the factorization
        # happens HERE (adaptive steppers pass a traced c = f(dt), which
        # has no prefactor — key=None), so holding the returned closure
        # reuses one factored system across applications.
        try:
            key = (float(a), float(c))
        except (TypeError, jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            key = None
        if prefactored is not None and key in prefactored:
            factors = prefactored[key]
        else:
            factors = factors_at(pad(q_red), c, a)

        def do_solve(r_red):
            r_nodes = pad(r_red).reshape(*r_red.shape[:-1], n_nodes, 3)
            x = banded.btd_solve(factors, r_nodes)
            return red(x.reshape(*r_red.shape[:-1], n_full))

        return do_solve

    wrapped_forces = None
    if forces_func is not None:
        wrapped_forces = lambda x, t: forces_func(x, t, arrays)  # noqa: E731

    # Frozen tangent (one factored system per trial step in the implicit
    # steppers): provable for modified Newton, and for all-linear beams
    # when the element-type mask is host-concrete (a traced mask cannot
    # prove linearity at build time).
    all_linear = False
    try:
        all_linear = not bool(np.any(np.asarray(arrays.nonlinear_mask)))
    except (TypeError, jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        pass
    return integrators.NewmarkOperator(
        mass_apply=mass_apply,
        internal_force=internal_force,
        external_force=wrapped_forces,
        solve=solve,
        tangent_frozen=modified_newton or all_linear,
    )


def parametric_modal_rom_rollout(
    ms,
    bc_info,
    arrays_batch: BeamArrays,
    eta0_batch,
    etad0_batch,
    u_modal=None,
    n_steps: int = 100,
    rho_inf: float = 0.5,
    n_newton: int = 1,
    use_consistent: bool = False,
    remat: bool = False,
    save_every: int = 0,
):
    """Differentiable modal-ROM rollout: gradients at ROM speed.

    Round-1 gradients flowed only through the DENSE parametric engines
    (:func:`parametric_genalpha_rollout` — O(N) banded work per step). This
    runs the Petrov-Galerkin ROM recurrence with the beam parameters as
    TRACED inputs and the round-1 engine's bases FROZEN at their trained
    configuration (``ms``), so system identification works at 1000-element
    scale at ROM per-step cost: two ``(n x m)`` basis transforms + the
    exact element force + ``m x m`` reduced solves.

    FROZEN-BASIS CAVEAT: ``Phi``/``PhiW`` are treated as constants — the
    gradient is the exact derivative OF THE ROM whose basis was trained at
    the nominal parameters, not of the re-trained ROM. Valid exactly like
    the ROM itself: for parameter neighborhoods where the trained basis
    still spans the response (the standard basis-fixed adjoint assumption;
    re-train the basis and re-linearize for large parameter steps — the
    ECSW guard's direction-residual logic applies here too). Unlike the
    fixed-configuration engine, the reduced operators are rebuilt from the
    traced parameters: ``Mr = W^T M(theta) Phi``, ``K0r = W^T K0(theta)
    Phi`` and the effective inverse via ``jnp.linalg.inv`` (m x m,
    differentiable), so biorthonormality is NOT assumed away from the
    nominal configuration.

    Returns ``(etas, etads)`` — final states, or frame stacks (every
    ``save_every`` steps, frame axis leading) when ``save_every > 0``.
    Batched over ``(arrays_batch, eta0_batch)`` via vmap; ``remat``
    checkpoints each step under reverse-mode autodiff.
    """
    free = np.asarray(bc_info.free_dofs)
    n_full = bc_info.n_dofs_full
    n_nodes = bc_info.n_nodes
    mask_nodes = jnp.asarray(bc_info.free_mask.reshape(n_nodes, 3))

    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    gamma = 0.5 - am + af
    dt = ms.dt
    c_eff = (1.0 - af) * beta * dt * dt
    a_eff = 1.0 - am

    eta0_batch = jnp.asarray(eta0_batch)
    dtype = eta0_batch.dtype
    Phi = jnp.asarray(ms.Phi, dtype)  # (n_red, m) FROZEN
    W = jnp.asarray(ms.PhiW, dtype)
    m = Phi.shape[1]

    def pad(r):
        return assembly.pad_to_full(r, free, n_full)

    def red(v):
        return assembly.reduce_from_full(v, free)

    def one(arrays, eta0, etad0, u_m):
        # Reduced operators from the TRACED parameters, frozen bases.
        m_diag, m_off = assembly.mass_block_tridiagonal(arrays)
        m_lower = jnp.swapaxes(m_off, -1, -2)
        md, mlw, mup = banded.btd_apply_bc(
            m_diag, m_lower, m_off, mask_nodes
        )
        Phi_nodes = pad(Phi.T).reshape(m, n_nodes, 3)
        MPhi = banded.btd_matvec(md, mlw, mup, Phi_nodes)
        MPhi_red = red(MPhi.reshape(m, n_full)).T  # (n_red, m)
        Mr = _mm(W.T, MPhi_red)

        q_zero = jnp.zeros(n_full, dtype)
        kd, kl, ku = assembly.tangent_block_tridiagonal(
            arrays, q_zero, use_consistent=use_consistent
        )
        kd, kl, ku = banded.btd_apply_bc(kd, kl, ku, mask_nodes)
        KPhi = banded.btd_matvec(kd, kl, ku, Phi_nodes)
        K0r = _mm(W.T, red(KPhi.reshape(m, n_full)).T)
        Sinv = jnp.linalg.inv(a_eff * Mr + c_eff * K0r)
        Mr_inv = jnp.linalg.inv(Mr)

        def force_modal(eta_af):
            q = _mm(Phi, eta_af)
            k_full = assembly.internal_force_full(
                arrays, pad(q), use_consistent=use_consistent
            )
            return _mm(W.T, red(k_full))

        if u_m is None:
            u_m = jnp.zeros(m, dtype)
        etadd0 = _mm(Mr_inv, u_m - force_modal(eta0))

        def step(carry):
            eta, etad, etadd = carry
            eta_pred = eta + dt * etad + (0.5 - beta) * dt * dt * etadd
            etad_pred = etad + (1.0 - gamma) * dt * etadd

            def newton(_, a1):
                eta1 = eta_pred + beta * dt * dt * a1
                eta_af = (1.0 - af) * eta1 + af * eta
                a_am = (1.0 - am) * a1 + am * etadd
                r = _mm(Mr, a_am) + force_modal(eta_af) - u_m
                return a1 - _mm(Sinv, r)

            a1 = jax.lax.fori_loop(0, n_newton, newton, etadd)
            eta1 = eta_pred + beta * dt * dt * a1
            etad1 = etad_pred + gamma * dt * a1
            return (eta1, etad1, a1)

        maybe_remat = jax.checkpoint(step) if remat else step
        if save_every > 0:
            n_frames = n_steps // save_every

            def frame(carry, _):
                def inner(c, _):
                    return maybe_remat(c), None

                carry, _ = jax.lax.scan(
                    inner, carry, None, length=save_every
                )
                return carry, (carry[0], carry[1])

            _, (etas, etads) = jax.lax.scan(
                frame, (eta0, etad0, etadd0), None, length=n_frames
            )
            return etas, etads
        else:

            def body(c, _):
                return maybe_remat(c), None

            (eta, etad, _), _ = jax.lax.scan(
                body, (eta0, etad0, etadd0), None, length=n_steps
            )
            return eta, etad

    u_b = None if u_modal is None else jnp.asarray(u_modal, dtype)
    in_axes = (0, 0, 0, None)
    out = jax.vmap(one, in_axes=in_axes)(
        arrays_batch, eta0_batch, jnp.asarray(etad0_batch), u_b
    )
    return out


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
