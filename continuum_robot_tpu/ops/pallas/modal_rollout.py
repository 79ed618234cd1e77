"""Pallas TPU kernel: fused modal generalized-alpha rollout.

The XLA modal engine (``models/simulate.ModalGenAlpha``) is HBM-bound: every
step re-reads and re-writes the ``(envs, modes)`` state arrays (~300 MB of
traffic per step at the benchmark scale). This kernel runs S steps with the
modal state *resident in VMEM*: HBM is touched once per invocation (load
states, store states), and the per-step work — ~10 elementwise FMAs per
mode-env element — runs out of VMEM on the VPU.

Because the modal recurrence is independent per mode, the grid tiles BOTH
axes: modes on sublanes (``mode_tile`` per cell, 8-aligned), env batch on
lanes (``tile`` per cell, 128-aligned). Each grid cell carries its
``(mode_tile, tile)`` state block through all S steps in VMEM — a few MB per
cell regardless of problem size. Per-mode scalar coefficients (``lam``, the
effective-Jacobian inverse ``winv`` — computed in float64 by the caller, see
``ModalGenAlpha.rollout_pallas`` — and the modal force) are ``(mode_tile,
1)`` columns broadcast across lanes. Padded modes carry ``lam = 0, u = 0``
with zero state and stay exactly zero through the recurrence.

Numerically identical (same arithmetic, same order) to
``ModalGenAlpha.rollout`` with a constant input; validated in
``tests/test_pallas.py`` and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mode_coeffs(lam, winv, rho_inf: float, cdamp=None):
    """Per-mode coefficients of the substituted gen-α Newton update.

    Substituting the single Newton correction ``a1 = a - winv * r`` (exact
    for the linear modal system) into the residual ``r = a + lam * q_af
    [+ c * v_af] - u`` and expanding the alpha-point states gives

        ``a1 = winv*u + p1*a - p2*q_pred - p3*q [- p5*v_pred - p6*v]``

    with ``p1 = -am * winv`` — the ``1 - winv*(1 + lam e f [+ c e g])``
    bracket collapses exactly because ``1/winv`` is that same bracket plus
    ``(1 - am)`` — ``p2 = winv*lam*(1-af)``, ``p3 = winv*lam*af``,
    ``p5 = winv*c*(1-af)``, ``p6 = winv*c*af``. The step body is then 8
    (10 damped) pure FMAs per element against ~14 ops for the nested form,
    and every per-step coefficient is a loop-invariant column.

    Shared by the fused kernel and ``ModalGenAlpha._step_fn`` — identical
    expression order keeps the two engines bit-identical. Works on jnp or
    NumPy arrays of any dtype (coefficient products round in that dtype).
    """
    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    wl = winv * lam
    p1 = winv * (-am)
    p2 = wl * (1.0 - af)
    p3 = wl * af
    if cdamp is None:
        return p1, p2, p3, None, None
    wc = winv * cdamp
    return p1, p2, p3, wc * (1.0 - af), wc * af


def _tiling(eta, u_modal, lam, winv, cdamp, rho_inf: float,
            mode_tile: int, tile: int):
    """Shared layout prep: padded coefficient columns + grid/block specs.

    Returns ``(m_p, Bp, pad_state, cols, grid, col_spec, state_spec)`` where
    ``pad_state`` maps a ``(B, m)`` state to the kernel's ``(m_p, Bp)``
    modes-on-sublanes layout and ``cols`` is the substituted-update
    coefficients ``(p1, p2, p3, p4 [, p5, p6])`` (``mode_coeffs``; ``p4 =
    winv * u``) as ``(m_p, 1)`` columns. Padded modes carry all-zero
    coefficients, so zero state stays exactly zero through the recurrence.
    """
    B, m = eta.shape
    dtype = eta.dtype
    m_p = -(-m // mode_tile) * mode_tile
    Bp = -(-B // tile) * tile

    def pad_state(s):
        return jnp.pad(s.T, ((0, m_p - m), (0, Bp - B)))

    def pad_col(v):
        return jnp.zeros((m_p, 1), dtype).at[:m, 0].set(jnp.asarray(v, dtype))

    lam = jnp.asarray(lam, dtype)
    winv = jnp.asarray(winv, dtype)
    p1, p2, p3, p5, p6 = mode_coeffs(
        lam, winv, rho_inf,
        None if cdamp is None else jnp.asarray(cdamp, dtype),
    )
    p4 = (
        jnp.zeros((m_p, 1), dtype)
        if u_modal is None
        else pad_col(winv * jnp.asarray(u_modal, dtype))
    )
    cols = (pad_col(p1), pad_col(p2), pad_col(p3), p4)
    if cdamp is not None:
        cols = (*cols, pad_col(p5), pad_col(p6))

    grid = (m_p // mode_tile, Bp // tile)
    col_spec = pl.BlockSpec(
        (mode_tile, 1), lambda i, b: (i, 0), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec(
        (mode_tile, tile), lambda i, b: (i, b), memory_space=pltpu.VMEM
    )
    return m_p, Bp, pad_state, cols, grid, col_spec, state_spec


def _make_kernel(steps: int, h: float, rho_inf: float, damped: bool = False,
                 unroll: int = 1):
    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    gamma = 0.5 - am + af
    bh2 = beta * h * h
    gh = gamma * h
    c_qp = (0.5 - beta) * h * h
    c_vp = (1.0 - gamma) * h

    def body(pcols, q0, v0, a0):
        # Substituted-update coefficients (mode_coeffs): 8 (10 damped)
        # FMAs per element per step, no per-step residual assembly.
        if damped:
            p1, p2, p3, p4, p5, p6 = pcols
        else:
            p1, p2, p3, p4 = pcols

        def step(_, qva):
            q, v, a = qva
            q_pred = q + h * v + c_qp * a
            v_pred = v + c_vp * a
            a1 = p4 + p1 * a - p2 * q_pred - p3 * q
            if damped:
                a1 = a1 - p5 * v_pred - p6 * v
            return (q_pred + bh2 * a1, v_pred + gh * a1, a1)

        # ``unroll``: pure loop transformation (identical arithmetic) —
        # lets Mosaic schedule across step boundaries and drops per-
        # iteration branch overhead. Hand-unrolled (K step applications
        # per fori_loop iteration + trace-time remainder): Mosaic's
        # fori_loop only accepts unroll=1 or full. Steps are sequentially
        # dependent, so gains are scheduling, not ILP; measured in
        # tools/modal_kernel_sweep.py.
        k = max(1, min(int(unroll), steps))

        def k_steps(_, qva):
            for _ in range(k):
                qva = step(None, qva)
            return qva

        qva = jax.lax.fori_loop(0, steps // k, k_steps, (q0, v0, a0))
        for _ in range(steps - (steps // k) * k):
            qva = step(None, qva)
        return qva

    if damped:

        def kernel(
            p1_ref, p2_ref, p3_ref, p4_ref, p5_ref, p6_ref,
            q_ref, v_ref, a_ref, qo_ref, vo_ref, ao_ref,
        ):
            """One (mode_tile, env_tile) cell: S fused damped gen-α steps."""
            q, v, a = body(
                (p1_ref[:, :], p2_ref[:, :], p3_ref[:, :], p4_ref[:, :],
                 p5_ref[:, :], p6_ref[:, :]),
                q_ref[:, :], v_ref[:, :], a_ref[:, :],
            )
            qo_ref[:, :] = q
            vo_ref[:, :] = v
            ao_ref[:, :] = a

    else:

        def kernel(
            p1_ref, p2_ref, p3_ref, p4_ref, q_ref, v_ref, a_ref,
            qo_ref, vo_ref, ao_ref,
        ):
            """One (mode_tile, env_tile) cell: S fused modal gen-alpha steps."""
            q, v, a = body(
                (p1_ref[:, :], p2_ref[:, :], p3_ref[:, :], p4_ref[:, :]),
                q_ref[:, :], v_ref[:, :], a_ref[:, :],
            )
            qo_ref[:, :] = q
            vo_ref[:, :] = v
            ao_ref[:, :] = a

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "h", "rho_inf", "tile", "mode_tile", "interpret", "unroll",
    ),
)
def fused_modal_steps(
    lam,
    winv,
    u_modal,
    eta,
    etad,
    etadd=None,
    steps: int = 1,
    h: float = 1e-4,
    rho_inf: float = 0.8,
    tile: int = 1024,
    mode_tile: int = 16,
    interpret: bool = False,
    cdamp=None,
    unroll: int = 16,
):
    """Advance modal ``(eta, etad, etadd)`` by ``steps`` fused gen-α steps.

    Args:
      lam: ``(m,)`` modal eigenvalues.
      winv: ``(m,)`` effective-Jacobian inverses
        ``1 / ((1-am) + (1-af) beta h^2 lam)`` — compute in float64 on the
        host for parity with the XLA modal engine.
      u_modal: ``(m,)`` constant modal force, or None.
      eta, etad, etadd: ``(B, m)`` modal states; pass ``etadd=None`` to
        compute the consistent initial acceleration ``u - lam * eta`` here
        (inside the jit — an eager computation would cost a host-tunnel
        round trip per call on the axon backend).
      steps, h, rho_inf: stepper configuration (static).
      tile / mode_tile: env lanes (128-aligned) / mode sublanes (8-aligned)
        per grid cell; VMEM per cell ~ 9 * mode_tile * tile * 4 B, doubled
        by grid double-buffering. The 2026-08-19 hardware sweep
        (tools/modal_kernel_sweep.py, /tmp→NOTES_r3) measured flat
        (mode_tile=16, tile=1024) cells ~17% faster than the old square
        (256, 512) default at unroll=1 and the best base for unrolling.
      unroll: step applications per in-kernel fori_loop iteration (pure
        loop transformation — identical arithmetic, bit-exact; remainder
        steps are peeled at trace time). Steps are sequentially dependent,
        so the gain is Mosaic scheduling across step boundaries + loop
        overhead, not ILP: measured 36.2M (unroll=1) → 75.2M (unroll=16)
        → 76.2M (unroll=32) env-steps/s at 3000 modes x 4096 envs on v5e.

    Returns the advanced ``(B, m)`` state triple.
    """
    B, m = eta.shape
    dtype = eta.dtype
    if etadd is None:
        u_row = 0.0 if u_modal is None else jnp.asarray(u_modal, dtype)
        etadd = u_row - jnp.asarray(lam, dtype) * eta
        if cdamp is not None:
            etadd = etadd - jnp.asarray(cdamp, dtype) * etad

    damped = cdamp is not None
    m_p, Bp, pad_state, cols, grid, col_spec, state_spec = _tiling(
        eta, u_modal, lam, winv, cdamp, float(rho_inf), mode_tile, tile
    )
    kernel = _make_kernel(
        int(steps), float(h), float(rho_inf), damped, unroll=int(unroll)
    )
    out_shape = jax.ShapeDtypeStruct((m_p, Bp), dtype)
    qo, vo, ao = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=grid,
        in_specs=[col_spec] * len(cols) + [state_spec] * 3,
        out_specs=(state_spec, state_spec, state_spec),
        interpret=interpret,
    )(*cols, pad_state(eta), pad_state(etad), pad_state(etadd))
    return (
        qo[:m, :B].T,
        vo[:m, :B].T,
        ao[:m, :B].T,
    )


@functools.partial(
    jax.jit,
    static_argnames=("apps", "tile", "mode_tile", "interpret", "unroll"),
)
def fused_affine_steps(
    tmat,
    bvec,
    eta,
    etad,
    etadd,
    apps: int = 1,
    tile: int = 1024,
    mode_tile: int = 16,
    interpret: bool = False,
    unroll: int = 8,
):
    """Apply a per-mode affine map ``s -> T s + b`` ``apps`` times, fused.

    The composed-propagator engine (``ModalGenAlpha.rollout_power``): the
    linear gen-α step is an affine map on ``s = (eta, etad, etadd)`` per
    mode, so K steps collapse into one host-precomputed 3x3 map. This
    kernel is the VMEM-resident applier — same tiling as the step kernel
    (modes on sublanes, envs on lanes), 9 FMAs + 3 adds per element per
    application (vs 8 FMAs *per step* for the step kernel — the map
    advances K steps per application).

    Args:
      tmat: ``(m, 3, 3)`` per-mode map (float32/float64 — cast to state
        dtype); ``bvec``: ``(m, 3)`` per-mode offset.
      eta, etad, etadd: ``(B, m)`` state triple (etadd required — the map
        is over the full triple).
      apps: number of map applications (static).
      unroll: in-kernel applications per fori_loop iteration (pure loop
        transformation, remainder peeled at trace time).

    Returns the advanced ``(B, m)`` state triple.
    """
    B, m = eta.shape
    dtype = eta.dtype
    m_p = -(-m // mode_tile) * mode_tile
    Bp = -(-B // tile) * tile

    def pad_state(s):
        return jnp.pad(s.T, ((0, m_p - m), (0, Bp - B)))

    def pad_col(v):
        return jnp.zeros((m_p, 1), dtype).at[:m, 0].set(jnp.asarray(v, dtype))

    # 12 loop-invariant per-mode columns. Padded modes carry all-zero
    # coefficients: zero state maps to exactly zero.
    tmat = jnp.asarray(tmat)
    bvec = jnp.asarray(bvec)
    cols = tuple(
        pad_col(tmat[:, i, j]) for i in range(3) for j in range(3)
    ) + tuple(pad_col(bvec[:, i]) for i in range(3))

    grid = (m_p // mode_tile, Bp // tile)
    col_spec = pl.BlockSpec(
        (mode_tile, 1), lambda i, b: (i, 0), memory_space=pltpu.VMEM
    )
    state_spec = pl.BlockSpec(
        (mode_tile, tile), lambda i, b: (i, b), memory_space=pltpu.VMEM
    )

    k = max(1, min(int(unroll), int(apps)))
    n_loop = int(apps) // k
    n_rem = int(apps) - n_loop * k

    def kernel(*refs):
        (t00, t01, t02, t10, t11, t12, t20, t21, t22, b0, b1, b2) = (
            r[:, :] for r in refs[:12]
        )
        q_ref, v_ref, a_ref, qo_ref, vo_ref, ao_ref = refs[12:]

        def app(qva):
            q, v, a = qva
            return (
                t00 * q + t01 * v + t02 * a + b0,
                t10 * q + t11 * v + t12 * a + b1,
                t20 * q + t21 * v + t22 * a + b2,
            )

        def k_apps(_, qva):
            for _i in range(k):
                qva = app(qva)
            return qva

        qva = jax.lax.fori_loop(
            0, n_loop, k_apps, (q_ref[:, :], v_ref[:, :], a_ref[:, :])
        )
        for _i in range(n_rem):
            qva = app(qva)
        q, v, a = qva
        qo_ref[:, :] = q
        vo_ref[:, :] = v
        ao_ref[:, :] = a

    out_shape = jax.ShapeDtypeStruct((m_p, Bp), dtype)
    qo, vo, ao = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=grid,
        in_specs=[col_spec] * 12 + [state_spec] * 3,
        out_specs=(state_spec, state_spec, state_spec),
        interpret=interpret,
    )(*cols, pad_state(eta), pad_state(etad), pad_state(etadd))
    return qo[:m, :B].T, vo[:m, :B].T, ao[:m, :B].T


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_frames", "substeps", "h", "rho_inf", "tile", "mode_tile",
        "interpret", "unroll",
    ),
)
def fused_modal_frames(
    lam,
    winv,
    u_modal,
    eta,
    etad,
    n_frames: int = 1,
    substeps: int = 1,
    h: float = 1e-4,
    rho_inf: float = 0.8,
    tile: int = 1024,
    mode_tile: int = 16,
    interpret: bool = False,
    cdamp=None,
    unroll: int = 16,
):
    """Frame-collecting fused rollout: trajectories at fused-kernel speed.

    The span is an XLA ``lax.scan`` over ``n_frames`` invocations of the
    fused kernel (``substeps`` steps each), with the modal state carried in
    the kernel's native ``(modes, envs)`` layout — the layout transposes are
    paid once per span, not once per frame.

    Returns ``(etas, etads)`` of shape ``(n_frames + 1, B, m)`` including
    the initial state (the ``solve_ivp(t_eval=...)`` frame contract).
    Memory: frames materialize in HBM — ``2 * (F+1) * B * m * 4`` bytes;
    size the batch accordingly (see docs/design.md "Memory budget").
    """
    B, m = eta.shape
    dtype = eta.dtype
    u_row = 0.0 if u_modal is None else jnp.asarray(u_modal, dtype)
    etadd = u_row - jnp.asarray(lam, dtype) * eta
    if cdamp is not None:
        etadd = etadd - jnp.asarray(cdamp, dtype) * etad

    damped = cdamp is not None
    m_p, Bp, pad_state, cols, grid, col_spec, state_spec = _tiling(
        eta, u_modal, lam, winv, cdamp, float(rho_inf), mode_tile, tile
    )
    q0, v0, a0 = pad_state(eta), pad_state(etad), pad_state(etadd)

    kernel = _make_kernel(int(substeps), float(h), float(rho_inf), damped,
                          unroll=int(unroll))
    out_shape = jax.ShapeDtypeStruct((m_p, Bp), dtype)
    call = pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        grid=grid,
        in_specs=[col_spec] * len(cols) + [state_spec] * 3,
        out_specs=(state_spec, state_spec, state_spec),
        interpret=interpret,
    )

    def frame(carry, _):
        q, v, a = carry
        q, v, a = call(*cols, q, v, a)
        return (q, v, a), (q, v)

    _, (qs, vs) = jax.lax.scan(frame, (q0, v0, a0), None, length=n_frames)

    def unpack(s0, ss):
        ss = jnp.concatenate([s0[None], ss], axis=0)  # (F+1, m_p, Bp)
        return jnp.swapaxes(ss[:, :m, :B], 1, 2)  # (F+1, B, m)

    return unpack(q0, qs), unpack(v0, vs)
