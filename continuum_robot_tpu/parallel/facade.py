"""``solve_ivp``-grade facade over the spatially-sharded engines.

``models.simulate.simulate`` is the single-chip rollout facade; this module
gives the SAME reduced-coordinate contract for beams sharded over the
``sp`` mesh axis: reduced ``[q; v]`` in, :class:`SimulationResult` out,
fluid/gravity auto-wired from the model's :class:`ForceParams` — a user
moves a workload from one chip to a device mesh by adding ``mesh=``,
without touching the node-layout plumbing (``make_spatial_beam``,
``reduced_to_node_layout``, per-engine builders) underneath.

The reference scales only by ``multiprocessing.Pool`` over whole
independent simulations (``/root/reference/examples/beam_comparison_fluid
.py:53-84``); a beam too long for one device has no reference counterpart.
Every engine tier ``simulate()`` offers is dispatchable here — the
node-layout engines (rk4 / gen-alpha / adaptive / SDIRK3) and the modal
tier (modal / modal_rom / modal_rom_adaptive, via
:func:`_simulate_sharded_modal`). The richer ECSW workflows
(hyper-reduction training, envelope-guarded rollouts, sharded physical
frames) keep the builder API (``build_spatial_modal_rom``).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import jax.numpy as jnp

from .spatial import (
    make_spatial_beam,
    reduced_to_node_layout,
)
from .spatial_implicit import (
    build_spatial_genalpha,
    build_spatial_genalpha_adaptive,
    build_spatial_sdirk3,
)

_METHODS = (
    "rk4",
    "generalized_alpha",
    "generalized_alpha_adaptive",
    "sdirk3",
)
_MODAL_METHODS = (
    "modal",
    "modal_rom",
    "modal_rom_adaptive",
)


def _spatial_beam_of(model, mesh, axis: str):
    return make_spatial_beam(
        model.beam_model.arrays,
        model.beam_model.bc_info.free_mask.reshape(-1, 3),
        mesh,
        axis=axis,
    )


def _chunked_adaptive(roll, method, xn, t_eval, chunk, u_node, rtol, atol,
                      arrays, batched):
    """Watchdog-safe chunked drive of the sharded adaptive rollouts.

    One device call per ``chunk`` output intervals, threading the
    controller proposal (``stats.dt_next``, per env when batched) and —
    for generalized-alpha — the exact 3-plane ``[q; v; a]`` algorithmic
    carry (``return_carry``); SDIRK3 restarts exactly from the last
    frame. Mirrors ``models.simulate._run_chunked``; the host-side stat
    reads between chunks double as the per-chunk completion force.
    """
    from ..ops.integrators import AdaptiveStats

    chunk = int(chunk)
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    is_ga = method == "generalized_alpha_adaptive"
    n_iv = len(t_eval) - 1
    dt0 = float(t_eval[1] - t_eval[0]) / 16.0
    state = xn
    frame_ax = 0  # builders keep frames leading, envs second
    xs_parts = []
    n_steps = n_acc = n_rej = n_inc = 0
    i = 0
    while i < n_iv:
        j = min(i + chunk, n_iv)
        grid = t_eval[i:j + 1]
        if is_ga:
            xs_c, stats, state = roll(
                state, grid, u=u_node, rtol=rtol, atol=atol,
                arrays=arrays, dt0=dt0, return_carry=True,
            )
        else:
            xs_c, stats = roll(
                state, grid, u=u_node, rtol=rtol, atol=atol,
                arrays=arrays, dt0=dt0,
            )
            state = xs_c[-1]
        xs_parts.append(xs_c if i == 0 else
                        jnp.take(xs_c, np.arange(1, xs_c.shape[0]),
                                 axis=frame_ax))
        dt0 = stats.dt_next
        n_steps = n_steps + np.asarray(stats.n_steps)
        n_acc = n_acc + np.asarray(stats.n_accepted)
        n_rej = n_rej + np.asarray(stats.n_rejected)
        n_inc = n_inc + np.asarray(stats.n_incomplete)
        i = j
    stats = AdaptiveStats(n_steps, n_acc, n_rej, n_inc, dt_next=dt0)
    return jnp.concatenate(xs_parts, axis=frame_ax), stats


def _node_force(model, u_red, Np: int, dtype):
    """Reduced position-DOF force vector -> ``(Np, 3)`` node layout."""
    bc = model.beam_model.bc_info
    free = np.asarray(bc.free_dofs)
    n_full = bc.n_dofs_full
    u_red = jnp.asarray(u_red, dtype)
    if u_red.shape != (len(free),):
        raise ValueError(
            f"u must be a constant reduced force vector of shape "
            f"({len(free)},), got {tuple(u_red.shape)}"
        )
    full = jnp.zeros(n_full, dtype).at[free].set(u_red)
    out = jnp.zeros((Np, 3), dtype)
    return out.at[: n_full // 3, :].set(full.reshape(n_full // 3, 3))


def _node_frames_to_reduced(model, xs):
    """Node-layout frames ``(..., 2, Np, 3)`` -> reduced ``(..., 2n)``."""
    bc = model.beam_model.bc_info
    free = np.asarray(bc.free_dofs)
    n_full = bc.n_dofs_full
    nn = n_full // 3
    lead = xs.shape[:-3]
    q = xs[..., 0, :nn, :].reshape(*lead, n_full)[..., free]
    v = xs[..., 1, :nn, :].reshape(*lead, n_full)[..., free]
    return jnp.concatenate([q, v], axis=-1)


def simulate_sharded(
    model,
    x0,
    t_final: float,
    dt: float,
    mesh,
    method: str = "generalized_alpha",
    u=None,
    rtol: float = 1e-6,
    atol: float = 1e-9,
    substeps: int = 1,
    n_newton: Optional[int] = None,
    rho_inf: float = 0.8,
    use_consistent: bool = False,
    fluid_density: Optional[float] = None,
    gravity=None,
    node_force: Optional[Callable] = None,
    arrays=None,
    axis: str = "sp",
    cg_iters: int = 32,
    cg_tol: float = 1e-8,
    n_modes: Optional[int] = None,
    rayleigh: Optional[tuple] = None,
    engine: str = "xla",
    chunk: Optional[int] = None,
    local_solver: Optional[str] = None,
):
    """Run a sharded rollout with the single-chip ``simulate()`` contract.

    Args:
        model: a :class:`DynamicEulerBernoulliBeam`. Its ``ForceParams``
            (fluid density / gravity vector, as auto-registered from the
            CSV workflow) are wired into the sharded engines unless
            overridden by ``fluid_density=`` / ``gravity=`` here.
        x0: reduced ``[q; v]`` initial state, optionally with ONE leading
            env-batch axis (batched rollouts ride the ``dp`` mesh axis
            exactly like the per-engine builders).
        t_final, dt: horizon and output-frame spacing.
        mesh: a ``jax.sharding.Mesh`` with the node-sharding axis
            ``axis`` (default ``"sp"``; a ``dp`` axis batches envs).
        method: ``rk4`` (explicit, psum-CG mass solves) |
            ``generalized_alpha`` (fixed-dt distributed-SPIKE implicit;
            the inner step is ``dt / substeps``) |
            ``generalized_alpha_adaptive`` / ``sdirk3`` (error-controlled:
            ``rtol``/``atol`` pick every step, ``dt`` only spaces the
            output frames) |
            ``modal`` (linear beams, node-sharded basis memory/transforms)
            | ``modal_rom`` (nonlinear Petrov-Galerkin reduction, the
            correction force sharded over the beam axis; ``n_modes``
            truncates) | ``modal_rom_adaptive`` (error-controlled ROM
            stepping) — the same engine selection as ``simulate()``, on
            the ``sp`` axis. The modal methods accept ``rayleigh=`` and
            reject ``node_force``/fluid/gravity (same force scope as the
            single-chip modal engines); richer ECSW/guard workflows keep
            the builder API (``build_spatial_modal_rom``).
        u: constant reduced force vector over position DOFs (node-layout
            conversion handled here), or None.
        node_force: optional custom nodewise external force ``f(x, t) ->
            (nodes, 3)`` with ``x = (2, nodes, 3)`` stacked (q, v) node
            layout — the sharded counterpart of ``simulate()``'s
            ``forces_func`` for NODE-LOCAL forces (springs, dampers,
            time-harmonic loads), on every method. See
            ``build_spatial_genalpha``.
        arrays: optional TRACED :class:`BeamArrays` for the implicit
            methods — the differentiable-parameter path (see
            ``build_spatial_genalpha``'s rollout).
        engine: stepping engine for ``method='modal'``, matching
            ``simulate()``'s dial — ``"xla"`` (default scan), ``"pallas"``
            (fused whole-span VMEM kernel), or ``"power"`` (composed
            propagator: one host-precomputed ``substeps``-step affine map
            per output frame; ``u`` may also be a
            :class:`~continuum_robot_tpu.models.simulate.PiecewiseConstant`
            schedule). Stepping is replicated either way (the per-mode
            recurrence has no physical-space work, ``SpatialModal``); the
            sharded value stays in the basis memory and transforms.
        local_solver: within-shard solve algorithm for the implicit
            SPIKE methods — ``"thomas"`` (O(m) scan sweeps), ``"cr"``
            (log-depth cyclic reduction), ``"dense"`` (trace-time local
            inverse applied on the MXU). All exact; see
            ``spike_prepare``. Default (None) resolves per platform:
            Thomas on CPU, dense on accelerators — the all-scan program
            shape is the experimental axon TPU backend's batched-fusion
            miscompile trigger (docs/design.md pitfall 4, measured
            wrong-step results on the sharded tier in round 5).
        chunk: adaptive methods only — drive the span as one jitted
            device call per ``chunk`` output intervals, threading the
            controller proposal (``stats.dt_next``, per env on batched
            rollouts) and the full algorithmic carry between calls
            (bit-identical to the monolithic drive; SDIRK3 restarts are
            (q, v)-exact, generalized-alpha threads the 3-plane carry).
            Matches ``simulate(chunk=...)`` — the watchdog-safe pattern
            for long error-controlled spans on stacks whose device
            runtime kills long executions.

    Returns:
        :class:`SimulationResult` with reduced-layout ``ys`` (env batch
        leading, then frames), matching ``simulate()``; adaptive methods
        carry per-env :class:`AdaptiveStats` in ``.stats``.
    """
    from ..models.simulate import SimulationResult

    if method in _MODAL_METHODS:
        return _simulate_sharded_modal(
            model, x0, t_final, dt, mesh, method, u=u, rtol=rtol, atol=atol,
            substeps=substeps, n_newton=n_newton, rho_inf=rho_inf,
            use_consistent=use_consistent, fluid_density=fluid_density,
            gravity=gravity, node_force=node_force, axis=axis,
            n_modes=n_modes, rayleigh=rayleigh, engine=engine,
        )
    if method not in _METHODS:
        raise ValueError(
            f"Unknown sharded method: {method!r} "
            f"(use one of {_METHODS + _MODAL_METHODS})"
        )
    if engine != "xla":
        raise ValueError(
            "engine= selects the modal stepping engine "
            "(method='modal'; 'xla'|'pallas'|'power', matching simulate())"
        )
    if rayleigh is not None:
        raise ValueError(
            "rayleigh structural damping is supported by the modal "
            "sharded methods (method='modal'/'modal_rom'/"
            "'modal_rom_adaptive'), matching simulate()"
        )

    if local_solver is not None and method == "rk4":
        raise ValueError(
            "local_solver= selects the within-shard solve of the implicit "
            "SPIKE methods (generalized_alpha / *_adaptive / sdirk3); the "
            "explicit rk4 path solves its mass system with CG"
        )

    fp = getattr(model, "force_params", None)
    if fp is not None:
        if fluid_density is None and fp.enable_fluid_effects:
            fluid_density = float(fp.fluid_density)
        if gravity is None and fp.enable_gravity_effects:
            gravity = np.asarray(fp.gravity_vector, dtype=float)

    beam = _spatial_beam_of(model, mesh, axis)
    x0 = jnp.asarray(x0)
    if x0.ndim not in (1, 2):
        raise ValueError(
            "x0 must be reduced [q; v] with at most one leading batch "
            f"axis, got shape {tuple(x0.shape)}"
        )
    batched = x0.ndim == 2
    xn = reduced_to_node_layout(model, x0, beam.n_nodes)

    if callable(u):
        raise ValueError(
            "simulate_sharded takes a constant reduced force vector; "
            "for time-varying inputs use the per-engine builders"
        )
    u_node = None if u is None else _node_force(model, u, beam.n_nodes,
                                                x0.dtype)

    n_frames = int(round(t_final / dt))
    stats = None

    if chunk is not None and method not in (
        "generalized_alpha_adaptive", "sdirk3"
    ):
        raise ValueError(
            "chunk= applies to the adaptive sharded methods "
            "('generalized_alpha_adaptive' / 'sdirk3'); fixed-step spans "
            "are already one bounded device call per frame (got "
            f"method={method!r})"
        )

    if method == "rk4":
        if arrays is not None:
            raise ValueError(
                "arrays= (traced parameters) is supported by the "
                "implicit methods; for explicit differentiable rollouts "
                "use build_spatial_rhs directly with cg_tol=None"
            )
        from .spatial import spatial_rollout

        if cg_tol is not None:
            # Counted CG cap-hit stat (the explicit tier's analogue of
            # AdaptiveStats.n_incomplete) rides SimulationResult.stats.
            ts, xs, stats = spatial_rollout(
                beam, xn, t_final, dt, u=u_node, substeps=substeps,
                cg_iters=cg_iters, use_consistent=use_consistent,
                cg_tol=cg_tol, fluid_density=fluid_density,
                gravity=gravity, node_force=node_force, cg_stats=True,
            )
        else:
            ts, xs = spatial_rollout(
                beam, xn, t_final, dt, u=u_node, substeps=substeps,
                cg_iters=cg_iters, use_consistent=use_consistent,
                cg_tol=cg_tol, fluid_density=fluid_density,
                gravity=gravity, node_force=node_force,
            )
    elif method == "generalized_alpha":
        roll = build_spatial_genalpha(
            beam, dt / substeps, rho_inf=rho_inf,
            n_newton=1 if n_newton is None else n_newton,
            use_consistent=use_consistent,
            fluid_density=fluid_density, gravity=gravity,
            node_force=node_force, local_solver=local_solver,
        )
        ts, xs = roll(xn, n_frames, u=u_node, substeps=substeps,
                      arrays=arrays)
    else:
        builder = (
            build_spatial_genalpha_adaptive
            if method == "generalized_alpha_adaptive"
            else build_spatial_sdirk3
        )
        kw = dict(
            n_newton=2 if n_newton is None else n_newton,
            use_consistent=use_consistent,
            fluid_density=fluid_density, gravity=gravity,
            node_force=node_force, local_solver=local_solver,
        )
        if method == "generalized_alpha_adaptive":
            kw["rho_inf"] = rho_inf
        roll = builder(beam, **kw)
        t_eval = np.linspace(0.0, t_final, n_frames + 1)
        if chunk is None:
            xs, stats = roll(xn, t_eval, u=u_node, rtol=rtol, atol=atol,
                             arrays=arrays)
        else:
            xs, stats = _chunked_adaptive(
                roll, method, xn, t_eval, int(chunk), u_node, rtol, atol,
                arrays, batched,
            )
        ts = jnp.asarray(t_eval, x0.dtype)

    ys = _node_frames_to_reduced(model, xs)
    if batched:  # builders put frames leading, envs second
        ys = jnp.moveaxis(ys, 1, 0)
    return SimulationResult(ts=jnp.asarray(ts), ys=ys, stats=stats)


def _simulate_sharded_modal(
    model, x0, t_final, dt, mesh, method, *, u, rtol, atol, substeps,
    n_newton, rho_inf, use_consistent, fluid_density, gravity, node_force,
    axis, n_modes, rayleigh, engine="xla",
):
    """``simulate()``-contract front end for the sharded modal/ROM tier.

    Engine selection and argument semantics mirror
    ``models.simulate.simulate(method='modal'/'modal_rom'/
    'modal_rom_adaptive')``; the basis memory, the transforms, and (for
    the ROM) the per-Newton correction force are sharded over ``axis``.
    Force scope matches the single-chip modal engines: the ROM tiers
    carry the model's registered fluid-drag/gravity forces as exact
    reduced corrections (``ext_modal``), the linear ``modal`` method and
    ``node_force`` raise exactly like ``make_modal_genalpha`` raises on
    registered registry forces.
    """
    from ..models.simulate import PiecewiseConstant, SimulationResult
    from .spatial_modal import build_spatial_modal, build_spatial_modal_rom

    if engine not in ("xla", "pallas", "power"):
        raise ValueError(
            f"Unknown engine: {engine!r} (use 'xla'|'pallas'|'power')"
        )
    if engine != "xla" and method != "modal":
        raise ValueError(
            "engine='pallas'/'power' applies to method='modal' here; the "
            "sharded ROM tiers step through the sp-sharded correction "
            "force (fused single-chip ROM kernels live in simulate())"
        )
    if node_force is not None:
        raise ValueError(
            "node_force is supported by the node-layout sharded methods; "
            "the modal tier's force scope is a constant reduced u (same "
            "as the single-chip modal engines)"
        )
    fp = getattr(model, "force_params", None)
    if fluid_density is not None or gravity is not None:
        raise ValueError(
            "the sharded modal methods take forces from the model's "
            "force registry (ForceParams / register_force), same as the "
            "single-chip modal engines — the explicit fluid_density/"
            "gravity dials configure the node-layout methods "
            "('generalized_alpha'/'sdirk3')"
        )
    registry_forces = (
        fp is not None and (fp.enable_fluid_effects
                            or fp.enable_gravity_effects)
    )
    if registry_forces and method == "modal":
        raise ValueError(
            "the sharded linear modal method supports no fluid/gravity "
            "forces (same scope as make_modal_genalpha); use "
            "method='modal_rom' — registered forces ride its sharded "
            "rollouts as exact reduced corrections — or the node-layout "
            "methods ('generalized_alpha'/'sdirk3')"
        )
    if use_consistent and method != "modal":
        raise ValueError(
            "the sharded ROM engine requires the parity element "
            "(use_consistent=False) — see build_spatial_modal_rom"
        )

    x0 = jnp.asarray(x0)
    if x0.ndim not in (1, 2):
        raise ValueError(
            "x0 must be reduced [q; v] with at most one leading batch "
            f"axis, got shape {tuple(x0.shape)}"
        )
    batched = x0.ndim == 2
    n = x0.shape[-1] // 2
    n_frames = int(round(t_final / dt))

    u_is_pwc = isinstance(u, PiecewiseConstant)
    if callable(u) and not (u_is_pwc and engine == "power"):
        raise ValueError(
            "simulate_sharded takes a constant reduced force vector "
            "(engine='power' additionally accepts a PiecewiseConstant "
            "schedule, matching simulate()); for arbitrary time-varying "
            "inputs use the per-engine builders"
        )

    h = dt / substeps
    if method == "modal":
        eng = build_spatial_modal(
            model, mesh, h, rho_inf=rho_inf, n_modes=n_modes,
            rayleigh=rayleigh, axis=axis,
        )
    else:
        eng = build_spatial_modal_rom(
            model, mesh, h, rho_inf=rho_inf, n_modes=n_modes,
            rayleigh=rayleigh, axis=axis,
        )

    beam_nodes = eng.n_nodes
    xn = reduced_to_node_layout(model, x0, beam_nodes)
    eta, etad = eng.to_modal(xn)
    if u is not None and not u_is_pwc and jnp.asarray(u).shape != (n,):
        raise ValueError(
            f"u must be a constant reduced force vector of shape ({n},), "
            f"got {tuple(jnp.asarray(u).shape)}"
        )
    if u is None:
        u_m = None
    elif engine == "power":
        # No dtype cast here: rollout_frames_power composes the maps on
        # the host in float64 and converts to the state dtype on device —
        # pre-casting to x0.dtype (f32 in production) would diverge from
        # simulate(engine='power')'s single-chip trajectory.
        u_m = (
            u.map_values(eng.ms.project_force_host)
            if u_is_pwc
            else eng.ms.project_force_host(u)
        )
    else:
        # (PiecewiseConstant is rejected above for non-power engines.)
        u_m = jnp.asarray(eng.ms.project_force_host(u), x0.dtype)

    stats = None
    if method == "modal":
        if engine == "power":
            ts, etas, etads = eng.ms.rollout_frames_power(
                eta, etad, u_m, n_frames, substeps=substeps
            )
        elif engine == "pallas":
            import jax

            if not batched:  # the fused kernel's state layout is (B, m)
                eta, etad = eta[None, :], etad[None, :]
            ts, etas, etads = eng.ms.rollout_frames_pallas(
                eta, etad, u_m, n_frames, substeps=substeps,
                interpret=jax.default_backend() == "cpu",
            )
            if not batched:
                etas, etads = etas[:, 0, :], etads[:, 0, :]
        else:
            ts, etas, etads = eng.rollout_frames(
                eta, etad, u_m, n_frames, substeps=substeps
            )
    elif method == "modal_rom":
        ts, etas, etads = eng.rollout_frames(
            eta, etad, u_m, n_frames, substeps=substeps,
            n_newton=2 if n_newton is None else n_newton,
        )
    else:  # modal_rom_adaptive
        t_eval = np.linspace(0.0, t_final, n_frames + 1)
        etas, etads, stats = eng.rollout_adaptive(
            eta, etad, u_m, jnp.asarray(t_eval, x0.dtype),
            rtol=rtol, atol=atol,
            n_newton=2 if n_newton is None else n_newton,
        )
        ts = jnp.asarray(t_eval, x0.dtype)

    qs, vs = eng.ms.from_modal(etas, etads)
    ys = jnp.concatenate([qs, vs], axis=-1)
    if batched:  # frames leading, envs second -> envs leading
        ys = jnp.moveaxis(ys, 1, 0)
    return SimulationResult(ts=jnp.asarray(ts), ys=ys, stats=stats)
