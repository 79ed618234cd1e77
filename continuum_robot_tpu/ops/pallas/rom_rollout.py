"""Pallas TPU kernel: fused modal-ROM generalized-alpha rollout.

The XLA modal-ROM engine (``models/simulate.ModalROMGenAlpha``) spends its
step on two ``(3N x m)`` basis transforms plus a full-space element-force
evaluation whose operands round-trip HBM every step (~150 MB of traffic at
the benchmark scale: the reconstructed state ``q = Phi eta`` and the
correction force ``g(q)`` are ``(3N, B)`` f32 arrays). This kernel runs the
whole span with everything resident in VMEM:

* grid over env tiles (``tile`` lanes per cell); each cell carries its
  ``(m, tile)`` modal state through all S steps,
* the trial/test bases, the reduced-Jacobian inverse and the per-element
  parameter columns load into VMEM once per cell and stay there,
* per step, the cell runs expand (MXU) -> element correction force (VPU)
  -> project (MXU) -> Newton update (MXU) without touching HBM.

Layout: envs on lanes, everything else on sublanes. The full-coordinate
state lives as three DOF planes ``[u; w; theta]`` stacked on sublanes with
each plane padded to ``S_pad`` rows (128-aligned so the planes of the
pre-transposed test basis are lane-aligned). Element quantities use
``pltpu.roll`` shifts instead of unaligned sublane slices: the next-node
plane is ``roll(plane, -1)`` and the node-2 force scatter is ``roll(+1)``,
with a ``(S_pad, 1)`` element mask column zeroing padded rows (and linear
elements of hybrid beams) before any roll wraps around.

The element polynomials are NOT re-implemented here: the kernel calls
``elements.nonlinear_correction_planes`` — the same jnp function the XLA
path uses — on VMEM-resident planes, so kernel/XLA parity is structural.

ECSW hyper-reduced engines (``ModalROMGenAlpha.hyper_reduce``) are fused
the same way from their gathered-sample layout: the six basis blocks
[u1, w1, t1, u2, w2, t2] expand the modal state directly to per-element
node values (the gather already duplicated shared nodes), the element
correction evaluates on the sampled rows only, and the weight-folded test
blocks project back — no roll adjacency at all. At the benchmark scale the
XLA gathered engine is memory-bound at 0.82 of the measured HBM ceiling on
per-step carry roundtrips; this kernel removes exactly that traffic.

Matches ``ModalROMGenAlpha.rollout`` (same recurrence, same modified-Newton
iteration; validated in tests/test_pallas.py and on hardware by
``tools/hw_validate.py``), including Rayleigh-damped engines (the damping
column adds ``cd * etad_af`` to the residual; its Jacobian share is
prefactored into ``Sinv``). Constant-input, no-external-force
configurations only — the XLA path remains for callable inputs /
registered forces.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import elements


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _make_kernel(
    steps: int,
    h: float,
    rho_inf: float,
    n_newton: int,
    s_pad: int,
    precision,
    nl_precision,
    gathered: bool = False,
    diag_newton: bool = False,
    damped: bool = False,
    unroll: int = 1,
):
    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    gamma = 0.5 - am + af
    bh2 = beta * h * h
    split = nl_precision == "split"
    # Basis row blocks: 3 DOF planes of the contiguous element window, or —
    # for the ECSW gathered-sample layout — the six per-element-node blocks
    # [u1, w1, t1, u2, w2, t2] (shared nodes already duplicated by the
    # gather, so no roll/scatter adjacency is needed).
    n_blk = 6 if gathered else 3

    def kernel(
        *refs,
        # Layout (split=False):
        #   phi (n_blk s_pad, m_p) f32 trial basis, planar rows;
        #   wt (m_p, n_blk s_pad) f32 test basis, pre-transposed;
        # Layout (split=True, nl_precision="split"):
        #   phi_hi, phi_lo (n_blk s_pad, m_p) bf16; wt_hi, wt_lo
        #   (m_p, n_blk s_pad) bf16 — hi/lo halves as separate 2-D arrays;
        # then, both modes:
        #   sinv (m_p, m_p); lam (m_p, 1); u (m_p, 1) constant modal force;
        #   [cd (m_p, 1) modal Rayleigh damping column, damped mode only;]
        #   L, D, A (s_pad, 1) element length/EI/EA columns (L = 1.0 in
        #   padded rows); mask (s_pad, 1) 1.0 for live nonlinear elements;
        #   q, v, a (m_p, tile) modal state in; qo, vo, ao state out.
    ):
        if split:
            phi_hi_ref, phi_lo_ref, wt_hi_ref, wt_lo_ref = refs[:4]
            refs = refs[4:]
        else:
            phi_ref, wt_ref = refs[:2]
            refs = refs[2:]
        sinv_ref, lam_ref, u_ref = refs[:3]
        refs = refs[3:]
        if damped:
            cd = refs[0][:, :]
            refs = refs[1:]
        (
            L_ref, D_ref, A_ref, mask_ref,
            q_ref, v_ref, a_ref, qo_ref, vo_ref, ao_ref,
        ) = refs
        sinv = sinv_ref[:, :]
        lam = lam_ref[:, :]
        u_m = u_ref[:, :]
        L = L_ref[:, :]
        D = D_ref[:, :]
        A = A_ref[:, :]
        mask = mask_ref[:, :]

        def dot(a, b, prec):
            return jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=prec,
            )

        def split_bf16(x):
            hi = x.astype(jnp.bfloat16)
            lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, lo

        if split:
            # Manual 3-pass bf16 transforms — the hi/lo decomposition that
            # lax.Precision.HIGH performs, written out because Mosaic
            # rejects HIGH on in-kernel dots. Basis halves are precomputed
            # host-side; the per-step operand (eta / force planes) splits
            # on the VPU.
            def transform(row0, rows, b_pair):
                a_hi = phi_hi_ref[row0 : row0 + rows, :]
                a_lo = phi_lo_ref[row0 : row0 + rows, :]
                b_hi, b_lo = b_pair
                # Explicit DEFAULT: precision=None inherits the session's
                # jax_default_matmul_precision, and Mosaic rejects an fp32
                # contract precision on bf16 operands ("Bad lhs type").
                P = jax.lax.Precision.DEFAULT
                return (
                    dot(a_hi, b_hi, P)
                    + dot(a_hi, b_lo, P)
                    + dot(a_lo, b_hi, P)
                )

            if gathered:
                # Single-dot expand/project over the stacked six-block
                # basis (no basis slicing at all — see modal_force below).
                def expand_all(eta_af):
                    return transform(0, n_blk * s_pad, split_bf16(eta_af))

                def project_all(g):
                    wt_hi = wt_hi_ref[:, :]
                    wt_lo = wt_lo_ref[:, :]
                    g_hi, g_lo = split_bf16(g)
                    P = jax.lax.Precision.DEFAULT
                    return (
                        dot(wt_hi, g_hi, P)
                        + dot(wt_hi, g_lo, P)
                        + dot(wt_lo, g_hi, P)
                    )

            else:

                def project(col0, g):
                    wt_hi = wt_hi_ref[:, col0 : col0 + s_pad]
                    wt_lo = wt_lo_ref[:, col0 : col0 + s_pad]
                    g_hi, g_lo = split_bf16(g)
                    P = jax.lax.Precision.DEFAULT
                    return (
                        dot(wt_hi, g_hi, P)
                        + dot(wt_hi, g_lo, P)
                        + dot(wt_lo, g_hi, P)
                    )

                def expand(eta_af):
                    b_pair = split_bf16(eta_af)
                    return tuple(
                        transform(k * s_pad, s_pad, b_pair)
                        for k in range(n_blk)
                    )

        else:
            phi = phi_ref[:, :]
            wt = wt_ref[:, :]

            if gathered:

                def expand_all(eta_af):
                    return dot(phi, eta_af, nl_precision)

                def project_all(g):
                    return dot(wt, g, nl_precision)

            else:

                def project(col0, g):
                    return dot(wt[:, col0 : col0 + s_pad], g, nl_precision)

                def expand(eta_af):
                    return tuple(
                        dot(phi[k * s_pad : (k + 1) * s_pad, :], eta_af,
                            nl_precision)
                        for k in range(n_blk)
                    )

        if gathered:

            def modal_force(eta_af):
                """Gathered-sample (ECSW) correction, all VMEM-resident.

                ONE dot expands eta through the stacked six-block basis
                straight to per-element node states (u1, w1, t1, u2, w2,
                t2 as 8-aligned sublane slices of the result — the gather
                already duplicated shared nodes, so no roll adjacency),
                and ONE dot projects the restacked force slots back
                through the weight-folded test basis. Versus per-block
                dots on 128-padded blocks this cuts the MXU work ~2.7x at
                the benchmark sample size (41 -> 48 rows per block instead
                of 41 -> 128) and issues 2 large dots per pass instead of
                12 small ones. Mirrors ``ModalROMGenAlpha`` +
                ``hyper_reduce.g_sampled``.
                """
                x = expand_all(eta_af)  # (6 s_pad, tile) f32
                u1, w1, t1, u2, w2, t2 = (
                    x[k * s_pad : (k + 1) * s_pad, :] for k in range(6)
                )
                g_slots = elements.nonlinear_correction_planes(
                    u1, w1, t1, u2, w2, t2, L, D, A
                )
                # Slot order (g1, g3, g4, g2, g5, g6) matches the gathered
                # test-basis block order [u1, w1, t1, u2, w2, t2].
                g_all = jnp.concatenate(
                    [mask * g for g in g_slots], axis=0
                )
                return lam * eta_af + project_all(g_all)

        else:

            def modal_force(eta_af):
                """lam * eta_af + W^T g(Phi eta_af), all VMEM-resident.

                Expansion and projection run per DOF plane (three (s_pad, m)
                dots each instead of one (3 s_pad, m) dot) so the full-space
                state/force never materialize as single (3 s_pad, tile)
                buffers — that form blows the 16 MB VMEM scoped-stack limit at
                the benchmark scale (measured: 20.6 MB).
                """
                u_p, w_p, t_p = expand(eta_af)
                # pltpu.roll requires non-negative shifts: -1 == s_pad - 1.
                u2 = pltpu.roll(u_p, s_pad - 1, 0)
                w2 = pltpu.roll(w_p, s_pad - 1, 0)
                t2 = pltpu.roll(t_p, s_pad - 1, 0)
                g1, g3, g4, g2, g5, g6 = elements.nonlinear_correction_planes(
                    u_p, w_p, t_p, u2, w2, t2, L, D, A
                )
                gu = mask * g1 + pltpu.roll(mask * g2, 1, 0)
                gw = mask * g3 + pltpu.roll(mask * g5, 1, 0)
                gt = mask * g4 + pltpu.roll(mask * g6, 1, 0)
                g_m = (
                    project(0, gu)
                    + project(s_pad, gw)
                    + project(2 * s_pad, gt)
                )
                return lam * eta_af + g_m

        def step(_, qva):
            eta, etad, etadd = qva
            eta_pred = eta + h * etad + (0.5 - beta) * h * h * etadd
            etad_pred = etad + (1.0 - gamma) * h * etadd
            a1 = etadd
            for _i in range(n_newton):
                eta1 = eta_pred + bh2 * a1
                eta_af = (1.0 - af) * eta1 + af * eta
                a_am = (1.0 - am) * a1 + am * etadd
                r = a_am + modal_force(eta_af) - u_m
                if damped:
                    # Rayleigh residual term cd * etad_af; the damping's
                    # Jacobian contribution is already folded into sinv
                    # (make_modal_rom builds S with the gamma dt cd term).
                    etad_af = (
                        (1.0 - af) * (etad_pred + gamma * h * a1) + af * etad
                    )
                    r = r + cd * etad_af
                # Diagonal effective Jacobian (Petrov-Galerkin eigenbasis):
                # the Newton solve is a per-mode VPU multiply, not an
                # (m, m) MXU dot — sinv ships as an (m_p, 1) column.
                a1 = a1 - (sinv * r if diag_newton else dot(sinv, r, precision))
            return (
                eta_pred + bh2 * a1,
                etad_pred + gamma * h * a1,
                a1,
            )

        # In-kernel unroll (same transformation as modal_rollout._make_kernel,
        # where it was the fix for the fori_loop-overhead limiter): K step
        # applications per fori_loop iteration, remainder peeled at trace
        # time — identical arithmetic, bit-exact. The ROM step body is
        # MXU-dot-heavy so the per-iteration overhead share is smaller than
        # the modal kernel's; default stays 1 until measured ahead.
        k = max(1, min(int(unroll), steps))

        def k_steps(_, qva):
            for _i in range(k):
                qva = step(None, qva)
            return qva

        qva = jax.lax.fori_loop(
            0, steps // k, k_steps, (q_ref[:, :], v_ref[:, :], a_ref[:, :])
        )
        for _i in range(steps - (steps // k) * k):
            qva = step(None, qva)
        q, v, a = qva
        qo_ref[:, :] = q
        vo_ref[:, :] = v
        ao_ref[:, :] = a

    return kernel


def _plumbing(basis, sinv, eta, s_pad, tile, h, rho_inf, n_newton,
              precision, nl_precision, interpret, gathered=False,
              diag_newton=False, damped=False, unroll=1):
    """Shared layout/spec setup for the step and frames drivers.

    Returns ``(pad_state, make_call, m_p, B, Bp)``: the state padder into
    the kernel's (modes, envs) layout, and a factory building the
    fixed-step-count pallas_call. ``basis`` is (phi, wt) in f32 mode or
    (phi_hi, phi_lo, wt_hi, wt_lo) bf16 halves in split mode — forwarded
    to the kernel positionally. ``damped`` adds the (m_p, 1) Rayleigh
    column between the force and element-parameter constants.
    """
    m_p = sinv.shape[0]
    B = eta.shape[0]
    Bp = _round_up(B, tile)

    def pad_state(s):  # (B, m) -> (m_p, Bp), modes on sublanes
        return jnp.pad(s.T, ((0, m_p - s.shape[1]), (0, Bp - B)))

    grid = (Bp // tile,)
    const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec(
        (m_p, tile), lambda b: (0, b), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((m_p, Bp), jnp.float32)

    def make_call(n_steps):
        kernel = _make_kernel(
            int(n_steps), float(h), float(rho_inf), int(n_newton),
            int(s_pad), precision, nl_precision, gathered=gathered,
            diag_newton=diag_newton, damped=damped, unroll=unroll,
        )
        n_consts = len(basis) + 7 + (1 if damped else 0)
        return pl.pallas_call(
            kernel,
            out_shape=(out_shape, out_shape, out_shape),
            grid=grid,
            in_specs=[const_spec] * n_consts + [state_spec] * 3,
            out_specs=(state_spec, state_spec, state_spec),
            # The resident working set (both bases + Mosaic's
            # HIGHEST-precision operand splits + the per-plane transients)
            # exceeds the 16 MB default scoped-vmem cap at benchmark scale;
            # v5e has headroom above it and this kernel does no DMA
            # pipelining that would compete for the space.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )

    return pad_state, make_call, m_p, B, Bp


@functools.partial(
    jax.jit,
    static_argnames=(
        "steps", "chunk", "h", "rho_inf", "n_newton", "s_pad", "tile",
        "precision", "nl_precision", "interpret", "gathered",
        "diag_newton", "unroll",
    ),
)
def _fused_rom_call(
    basis, sinv, lam_col, u_col, cd_col, L_col, D_col, A_col, mask_col,
    eta, etad, etadd,
    steps: int, chunk: int, h: float, rho_inf: float, n_newton: int,
    s_pad: int, tile: int, precision, nl_precision, interpret: bool,
    gathered: bool = False, diag_newton: bool = False, unroll: int = 1,
):
    # The kernel advances `chunk` steps per invocation; an XLA scan strings
    # chunks together in the kernel's native (modes, envs) layout. One
    # compiled kernel thus serves every span length, and the chunk boundary
    # costs one (m_p, Bp) state round trip (~KBs-MBs) against the chunk's
    # VMEM-resident work.
    chunk = min(int(chunk), int(steps)) or 1
    n_chunks, rem = divmod(int(steps), chunk)
    damped = cd_col is not None
    pad_state, make_call, m_p, B, Bp = _plumbing(
        basis, sinv, eta, s_pad, tile, h, rho_inf, n_newton,
        precision, nl_precision, interpret, gathered=gathered,
        diag_newton=diag_newton, damped=damped, unroll=unroll,
    )
    consts = (*basis, sinv, lam_col, u_col,
              *((cd_col,) if damped else ()),
              L_col, D_col, A_col, mask_col)
    state = (pad_state(eta), pad_state(etad), pad_state(etadd))
    if n_chunks:
        call = make_call(chunk)

        def body(s, _):
            return call(*consts, *s), None

        state, _ = jax.lax.scan(body, state, None, length=n_chunks)
    if rem:
        state = make_call(rem)(*consts, *state)
    qo, vo, ao = state
    m = eta.shape[1]
    return qo[:m, :B].T, vo[:m, :B].T, ao[:m, :B].T


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_frames", "substeps", "h", "rho_inf", "n_newton", "s_pad", "tile",
        "precision", "nl_precision", "interpret", "gathered",
        "diag_newton", "unroll",
    ),
)
def _fused_rom_frames(
    basis, sinv, lam_col, u_col, cd_col, L_col, D_col, A_col, mask_col,
    eta, etad, etadd,
    n_frames: int, substeps: int, h: float, rho_inf: float, n_newton: int,
    s_pad: int, tile: int, precision, nl_precision, interpret: bool,
    gathered: bool = False, diag_newton: bool = False, unroll: int = 1,
):
    """Frame-collecting variant: one ``substeps``-step kernel call per frame,
    state carried in the kernel's (modes, envs) layout across the span."""
    damped = cd_col is not None
    pad_state, make_call, m_p, B, Bp = _plumbing(
        basis, sinv, eta, s_pad, tile, h, rho_inf, n_newton,
        precision, nl_precision, interpret, gathered=gathered,
        diag_newton=diag_newton, damped=damped, unroll=unroll,
    )
    call = make_call(substeps)
    consts = (*basis, sinv, lam_col, u_col,
              *((cd_col,) if damped else ()),
              L_col, D_col, A_col, mask_col)
    s0 = (pad_state(eta), pad_state(etad), pad_state(etadd))

    def frame(s, _):
        s2 = call(*consts, *s)
        return s2, (s2[0], s2[1])

    _, (qs, vs) = jax.lax.scan(frame, s0, None, length=n_frames)
    m = eta.shape[1]

    def unpack(first, ss):
        ss = jnp.concatenate([first[None], ss], axis=0)  # (F+1, m_p, Bp)
        return jnp.swapaxes(ss[:, :m, :B], 1, 2)  # (F+1, B, m)

    return unpack(s0[0], qs), unpack(s0[1], vs)


class FusedROMRollout:
    """Host-side wrapper: pad/layout the ROM operators once, then advance.

    Built by :meth:`ModalROMGenAlpha.make_pallas_rollout`. All padded
    operator arrays are prepared host-side in NumPy (the axon backend
    charges a compile per eager device op) and shipped as jit constants.
    """

    def __init__(self, ms, tile: int = 256, chunk: int = 100):
        if ms.lam is None or ms.planar_correction is None:
            raise ValueError(
                "fused ROM rollout requires the split planar fast path "
                "(parity nonlinear/hybrid beam, no external forces)"
            )
        if ms.external_force is not None:
            raise ValueError(
                "fused ROM rollout does not support external forces; "
                "use ModalROMGenAlpha.rollout"
            )
        if ms.window_params is None and ms.sampled_params is None:
            raise ValueError(
                "engine has neither the contiguous-window nor the "
                "ECSW gathered-sample layout; use the XLA rollout"
            )
        self.ms = ms
        self.tile = int(tile)
        self.chunk = int(chunk)
        # ECSW gathered-sample layout: six per-element-node basis blocks
        # (hyper_reduce), element parameters of the sample only.
        self.gathered = ms.sampled_params is not None
        n_blk = 6 if self.gathered else 3

        Phi_p = np.asarray(ms.Phi_planar, np.float64)  # (n_blk n_sub, m)
        W_p = np.asarray(ms.PhiW_planar, np.float64)
        n_sub = Phi_p.shape[0] // n_blk
        m = Phi_p.shape[1]
        # Contiguous-window mode slices the pre-transposed test basis on
        # LANES (project per DOF plane), so blocks pad to 128; the gathered
        # kernel's single-dot expand/project only ever slices the f32
        # expand RESULT on sublanes, so the ECSW sample pads to 8 — at the
        # benchmark sample size that alone is ~2.7x less MXU work.
        s_pad = _round_up(n_sub, 8 if self.gathered else 128)
        m_p = _round_up(m, 128)

        def pad_basis(Bse):
            planes = Bse.reshape(n_blk, n_sub, m)
            out = np.zeros((n_blk, s_pad, m_p), np.float64)
            out[:, :n_sub, :m] = planes
            return out.reshape(n_blk * s_pad, m_p)

        phi64 = pad_basis(Phi_p)
        wt64 = pad_basis(W_p).T
        self.phi = jnp.asarray(phi64, jnp.float32)
        self.wt = jnp.asarray(wt64, jnp.float32)

        def hi_lo(a64):
            a32 = a64.astype(np.float32)
            hi = a32.astype(jnp.bfloat16)
            lo = (a32 - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
            return jnp.asarray(hi), jnp.asarray(lo)

        # hi/lo bf16 halves for the manual 3-pass ("HIGH") transform tier,
        # as separate 2-D arrays (Mosaic rejects dot operands sliced from a
        # stacked 3-D ref).
        self.phi_hi, self.phi_lo = hi_lo(phi64)
        self.wt_hi, self.wt_lo = hi_lo(wt64)
        # Diagonal effective Jacobian (see make_modal_rom.Sinv_diag):
        # ship an (m_p, 1) column and skip the (m, m) Newton dot.
        self.diag_newton = ms.Sinv_diag is not None
        if self.diag_newton:
            sinv = np.zeros((m_p, 1), np.float64)
            sinv[:m, 0] = np.asarray(ms.Sinv_diag, np.float64)
        else:
            sinv = np.zeros((m_p, m_p), np.float64)
            sinv[:m, :m] = np.asarray(ms.Sinv, np.float64)
        self.sinv = jnp.asarray(sinv, jnp.float32)
        lam_col = np.zeros((m_p, 1), np.float64)
        lam_col[:m, 0] = np.asarray(ms.lam, np.float64)
        self.lam_col = jnp.asarray(lam_col, jnp.float32)
        # Rayleigh damping column (make_modal_rom rayleigh=...): the
        # kernel adds cd * etad_af to the residual; the Jacobian term is
        # already inside Sinv, so nothing else changes.
        self.cd_col = None
        if ms.cdamp is not None:
            cd_col = np.zeros((m_p, 1), np.float64)
            cd_col[:m, 0] = np.asarray(ms.cdamp, np.float64)
            self.cd_col = jnp.asarray(cd_col, jnp.float32)

        # Element parameter columns — of the restricted window, or of the
        # ECSW sample (the jnp correction closure the XLA path uses closes
        # over the same values; padded rows keep L = 1.0 so the kernel's
        # 1/L powers stay finite, with A = 0 zeroing every correction term).
        arrays = ms.sampled_params if self.gathered else ms.window_params
        E = arrays["length"].shape[0]
        L_col = np.ones((s_pad, 1), np.float64)
        D_col = np.zeros((s_pad, 1), np.float64)
        A_col = np.zeros((s_pad, 1), np.float64)
        mask_col = np.zeros((s_pad, 1), np.float64)
        L_col[:E, 0] = arrays["length"]
        D_col[:E, 0] = arrays["EI"]
        A_col[:E, 0] = arrays["EA"]
        mask_col[:E, 0] = arrays["nonlinear_mask"].astype(np.float64)
        self.L_col = jnp.asarray(L_col, jnp.float32)
        self.D_col = jnp.asarray(D_col, jnp.float32)
        self.A_col = jnp.asarray(A_col, jnp.float32)
        self.mask_col = jnp.asarray(mask_col, jnp.float32)
        self.s_pad = s_pad
        self.m_p = m_p
        self.m = m
        self._ia_cache = {}

    @staticmethod
    def _as_precision(p):
        """Normalize string spellings ('high', ...) to lax.Precision."""
        if isinstance(p, str):
            return jax.lax.Precision[p.upper()]
        return p

    def _prep(self, eta, etad, u_modal, precision, nl_precision):
        """Shared setup: precision mapping, force column, initial accel."""
        if callable(u_modal):
            raise ValueError("fused ROM rollout takes a constant input force")
        precision = self._as_precision(precision)
        nl_precision = self._as_precision(nl_precision)
        prec = jax.lax.Precision.HIGHEST if precision is None else precision
        nl_prec = (
            jax.lax.Precision.HIGH if nl_precision is None else nl_precision
        )
        # Mosaic rejects Precision.HIGH on in-kernel dots; the kernel's
        # equivalent for the correction transforms is the manual hi/lo bf16
        # 3-pass ("split") path. The (m, m) Newton dot has no split variant
        # — it is a negligible cost share — so HIGH there promotes to
        # HIGHEST rather than crashing the Mosaic compile.
        split = nl_prec == jax.lax.Precision.HIGH
        if prec == jax.lax.Precision.HIGH:
            prec = jax.lax.Precision.HIGHEST
        u_col = np.zeros((self.m_p, 1), np.float32)
        u_host = None
        if u_modal is not None:
            u_host = np.asarray(jax.device_get(u_modal), np.float64)
            u_col[: self.m, 0] = u_host
        etadd = self._initial_accel(eta, etad, u_host, prec, nl_prec)
        basis = (
            (self.phi_hi, self.phi_lo, self.wt_hi, self.wt_lo)
            if split
            else (self.phi, self.wt)
        )
        consts = (
            basis, self.sinv, self.lam_col, jnp.asarray(u_col), self.cd_col,
            self.L_col, self.D_col, self.A_col, self.mask_col,
        )
        return consts, etadd, prec, ("split" if split else nl_prec)

    def _initial_accel(self, eta, etad, u_host, prec, nl_prec):
        """Jitted-and-cached initial acceleration.

        The engine's ``initial_accel`` evaluates the full correction
        polynomial; running it eagerly would cost dozens of one-off
        compiles on the axon backend plus per-call dispatch round trips
        (CLAUDE.md), and would pollute benchmark timings of the fused
        kernel. One cached jit per (precision pair, has-force) variant.
        """
        key = (prec, nl_prec, u_host is not None)
        fn = self._ia_cache.get(key)
        if fn is None:
            if u_host is None:
                fn = jax.jit(
                    lambda e, ed: self.ms.initial_accel(
                        e, ed, None, precision=prec, nl_precision=nl_prec
                    )
                )
            else:
                fn = jax.jit(
                    lambda e, ed, u: self.ms.initial_accel(
                        e, ed, u, precision=prec, nl_precision=nl_prec
                    )
                )
            self._ia_cache[key] = fn
        if u_host is None:
            return fn(eta, etad)
        return fn(eta, etad, jnp.asarray(u_host, jnp.float32))

    def __call__(
        self, eta, etad, u_modal, n_steps: int, n_newton: int = 1,
        precision=None, nl_precision=None, interpret: bool = False,
        unroll: int = 1,
    ):
        """Advance ``(eta, etad)`` by ``n_steps`` fused ROM gen-α steps.

        ``u_modal`` must be a constant modal force vector (or None). The
        initial acceleration is computed with the engine's XLA
        ``initial_accel`` (identical arithmetic to the scan path).
        ``unroll``: in-kernel step applications per fori_loop iteration
        (bit-exact loop transformation; see modal_rollout).
        """
        consts, etadd, prec, nl_prec = self._prep(
            eta, etad, u_modal, precision, nl_precision
        )
        return _fused_rom_call(
            *consts, eta, etad, etadd,
            steps=int(n_steps), chunk=self.chunk, h=float(self.ms.dt),
            rho_inf=float(self.ms.rho_inf), n_newton=int(n_newton),
            s_pad=self.s_pad, tile=self.tile,
            precision=prec, nl_precision=nl_prec, interpret=interpret,
            gathered=self.gathered, diag_newton=self.diag_newton,
            unroll=int(unroll),
        )

    def frames(
        self, eta, etad, u_modal, n_frames: int, substeps: int = 1,
        n_newton: int = 1, precision=None, nl_precision=None,
        interpret: bool = False, unroll: int = 1,
    ):
        """Frame-collecting fused rollout (``rollout_frames`` contract).

        One ``substeps``-step kernel invocation per frame with the state
        carried in the kernel's (modes, envs) layout across the span.
        Returns ``(ts (F+1,), etas (F+1, B, m), etads (F+1, B, m))``
        including the initial state.
        """
        consts, etadd, prec, nl_prec = self._prep(
            eta, etad, u_modal, precision, nl_precision
        )
        etas, etads = _fused_rom_frames(
            *consts, eta, etad, etadd,
            n_frames=int(n_frames), substeps=int(substeps),
            h=float(self.ms.dt), rho_inf=float(self.ms.rho_inf),
            n_newton=int(n_newton), s_pad=self.s_pad, tile=self.tile,
            precision=prec, nl_precision=nl_prec, interpret=interpret,
            gathered=self.gathered, diag_newton=self.diag_newton,
            unroll=int(unroll),
        )
        ts = (self.ms.dt * substeps) * jnp.arange(n_frames + 1)
        return ts, etas, etads
