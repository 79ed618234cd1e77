"""Batched and device-sharded rollouts.

This is the TPU-native replacement for the reference's process-pool parameter
sweep (``examples/beam_comparison_fluid.py:53-84``): thousands of independent
environments become a leading batch axis of one compiled program (``vmap``),
and that axis is sharded across a device mesh with ``NamedSharding`` — XLA's
SPMD partitioner handles all communication (there is none on the batch axis;
reductions for sweep statistics become ``psum``-style collectives).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..models.simulate import SimulationResult
from ..ops import integrators


def build_rollout_fn(
    model,
    t_final: float,
    dt: float,
    method: str = "rk4",
    u=None,
    forces_func: Optional[Callable] = None,
    substeps: int = 1,
    n_newton: int = 2,
    linear_solver: str = None,
    rho_inf: float = 0.8,
    n_modes: int = None,
) -> Callable:
    """Compile-ready single-env rollout ``x0 -> (ts, ys)``.

    vmap/shard over the leading axis of ``x0`` to batch it; the returned
    callable contains no Python-level control flow dependent on data.

    For long f32 implicit rollouts prefer ``generalized_alpha``: undamped
    Newmark keeps high modes exactly on the unit circle, where f32 roundoff
    accumulates into divergence over thousands of steps.
    """
    n_steps = int(round(t_final / dt))

    if method == "newmark":
        from ..models.simulate import make_newmark_operator

        op = make_newmark_operator(
            model, forces_func=forces_func, dt=dt / substeps,
            linear_solver=linear_solver,
        )

        def rollout(x0):
            n = x0.shape[-1] // 2
            ts, qs, vs = integrators.integrate_newmark(
                op, x0[..., :n], x0[..., n:], 0.0, dt, n_steps,
                u=u, n_newton=n_newton, substeps=substeps,
            )
            return ts, jnp.concatenate([qs, vs], axis=-1)

    elif method == "generalized_alpha":
        from ..models.simulate import make_newmark_operator

        h = dt / substeps
        am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
        af = rho_inf / (rho_inf + 1.0)
        beta_ga = 0.25 * (1.0 - am + af) ** 2
        op = make_newmark_operator(
            model, forces_func=forces_func, dt=None,
            linear_solver=linear_solver,
            extra_systems=[(1.0 - am, (1.0 - af) * beta_ga * h * h)],
        )

        def rollout(x0):
            n = x0.shape[-1] // 2
            ts, qs, vs = integrators.integrate_generalized_alpha(
                op, x0[..., :n], x0[..., n:], 0.0, dt, n_steps,
                u=u, rho_inf=rho_inf, n_newton=n_newton, substeps=substeps,
            )
            return ts, jnp.concatenate([qs, vs], axis=-1)

    elif method == "modal":
        from ..models.simulate import make_modal_rollout_fn

        rollout = make_modal_rollout_fn(
            model, dt, n_steps, substeps=substeps, rho_inf=rho_inf,
            u=u, forces_func=forces_func,
        )

    elif method == "modal_power":
        # Composed-propagator drive: each output frame is ONE application
        # of the host-precomputed substeps-step affine map — the same
        # discrete trajectory as method="modal" to roundoff at ~1/substeps
        # of its per-frame arithmetic (ModalGenAlpha.rollout_frames_power).
        # Constant or PiecewiseConstant input force only (the maps bake
        # the modal force in).
        from ..models.simulate import PiecewiseConstant, make_modal_genalpha

        if forces_func is not None:
            raise ValueError(
                "method='modal_power' cannot include state-dependent forces"
            )
        if callable(u) and not isinstance(u, PiecewiseConstant):
            raise ValueError(
                "method='modal_power' requires a constant or "
                "PiecewiseConstant input force; use method='modal' for "
                "arbitrary time-varying inputs"
            )
        ms_p = make_modal_genalpha(model, dt / substeps, rho_inf=rho_inf)
        if u is None:
            u_modal_p = None
        elif isinstance(u, PiecewiseConstant):
            u_modal_p = u.map_values(ms_p.project_force_host)
        else:
            u_modal_p = ms_p.project_force_host(u)

        def rollout(x0):
            n = x0.shape[-1] // 2
            eta, etad = ms_p.to_modal(x0[..., :n], x0[..., n:])
            ts, etas, etads = ms_p.rollout_frames_power(
                eta, etad, u_modal_p, n_steps, substeps=substeps
            )
            qs, vs = ms_p.from_modal(etas, etads)
            return ts, jnp.concatenate([qs, vs], axis=-1)

    elif method == "modal_rom":
        from ..models.simulate import make_modal_rom

        ms = make_modal_rom(
            model, dt / substeps, rho_inf=rho_inf, n_modes=n_modes,
            forces_func=forces_func,
        )
        if u is None:
            u_modal = None
        elif callable(u):
            u_modal = lambda t: ms.project_force(u(t))  # noqa: E731
        else:
            u_modal = ms.project_force_host(u)

        def rollout(x0):
            n = x0.shape[-1] // 2
            eta, etad = ms.to_modal(x0[..., :n], x0[..., n:])
            ts, etas, etads = ms.rollout_frames(
                eta, etad, u_modal, n_steps, substeps=substeps,
                n_newton=n_newton,
            )
            qs, vs = ms.from_modal(etas, etads)
            return ts, jnp.concatenate([qs, vs], axis=-1)

    else:
        rhs = model.build_rhs(forces_func)

        def rollout(x0):
            ts, xs = integrators.integrate_fixed(
                rhs, x0, 0.0, dt, n_steps, u=u, substeps=substeps
            )
            return ts, xs

    return rollout


def batched_rollout(
    model,
    x0_batch,
    t_final: float,
    dt: float,
    mesh: Optional[Mesh] = None,
    batch_axis: str = "dp",
    **kwargs,
) -> SimulationResult:
    """Run a batch of rollouts, optionally sharded across a device mesh.

    ``x0_batch``: ``(n_envs, 2*n_free)``. With a mesh, the env axis is
    sharded over ``batch_axis`` and the result stays sharded (device-resident)
    — pull back only the reductions you need.
    """
    rollout = build_rollout_fn(model, t_final, dt, **kwargs)
    vmapped = jax.vmap(rollout)

    if mesh is None:
        fn = jax.jit(vmapped)
        ts, ys = fn(jnp.asarray(x0_batch))
    else:
        x_sharding = NamedSharding(mesh, PartitionSpec(batch_axis))
        out_sharding = (
            NamedSharding(mesh, PartitionSpec()),  # ts replicated
            NamedSharding(mesh, PartitionSpec(batch_axis, None, None)),
        )
        fn = jax.jit(vmapped, in_shardings=(x_sharding,), out_shardings=out_sharding)
        x0_batch = jax.device_put(jnp.asarray(x0_batch), x_sharding)
        ts, ys = fn(x0_batch)

    # ys: (envs, frames, state) -> SimulationResult wants (frames, ..., state)
    return SimulationResult(ts=ts[0] if ts.ndim > 1 else ts, ys=jnp.swapaxes(ys, 0, 1))


def sweep_statistics(ys: jax.Array) -> dict:
    """Cross-env summary stats (the ``psum`` workload of a parameter sweep).

    ``ys`` layout is ``[..., q; v]``: the tip transverse displacement is
    position index ``n-2`` (the last free node's w), NOT ``-2`` (which would
    be the tip *velocity*).
    """
    n = ys.shape[-1] // 2
    tip = ys[..., n - 2]
    return {
        "tip_abs_max": jnp.max(jnp.abs(tip)),
        "tip_mean_final": jnp.mean(tip[-1]),
        "tip_vel_abs_max": jnp.max(jnp.abs(ys[..., -2])),
        "state_rms": jnp.sqrt(jnp.mean(ys**2)),
    }
