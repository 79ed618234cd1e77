"""Spatially-sharded modal / modal-ROM engines over the ``sp`` axis.

The modal engines (``models/simulate.py``: ``ModalGenAlpha``,
``ModalROMGenAlpha``) carry a tiny replicated per-step state — ``(B, m)``
modal amplitudes — while everything that grows with beam LENGTH lives in
the bases (``(3N, m)`` per basis) and, for the nonlinear ROM, in the
per-step correction force (expand modal state to physical nodes, evaluate
the quadratic/cubic element correction, project back). Sharding the NODE
axis over ``sp`` therefore:

* shards every basis' rows — each device holds an ``(Np/S, 3, m)`` block,
  so basis memory scales past one chip like the rest of the spatial layer;
* makes the ROM's per-Newton correction an entirely local element batch
  (1-node ``ppermute`` halo, the same ring payload as every other spatial
  engine) followed by ONE ``(m,)`` ``psum`` — per-step communication is
  O(modes), independent of beam length;
* keeps the per-mode recurrence replicated (it is elementwise on ``(m,)``
  and costs nothing to duplicate).

The linear modal engine does no physical-space work per step at all, so
its sharded value is in the transforms and the basis memory
(:class:`SpatialModal`); the nonlinear ROM is where the ``sp`` axis
genuinely carries per-step load (:class:`SpatialModalROM`).

Split fast path only: the sharded ROM requires the exactly-diagonal
reduced linear operator (``ms.lam``) — the same scope as the single-chip
split path (``_force_modal``). Registered registry forces with a reduced
closure (fluid drag / gravity, ``make_reduced_modal``) ride every sharded
rollout as the engine's ``ext_modal`` term, exactly like the single-chip
engine; only forces that would need the general full-transform
``external_force`` path are rejected.
The correction is evaluated per element from
``elements.nonlinear_correction_planes`` and masked by the per-element
``nonlinear_mask`` (linear elements have identically zero correction), so
hybrid beams work unchanged.

No reference counterpart (the reference has neither reduced-order modeling
nor any distributed runtime — SURVEY §2.2); this module is the
TPU-native scale-out of the framework's own headline engines.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

# Full-input-precision transforms: the TPU MXU default is bfloat16 inputs
# (see continuum_robot_tpu/__init__.py); basis projections/reconstructions
# and the ECSW gathered transforms pin f32 precision explicitly.
_HI = jax.lax.Precision.HIGHEST
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from ..models import elements
from ..models.simulate import (
    ModalGenAlpha,
    ModalROMGenAlpha,
    make_modal_genalpha,
    make_modal_rom,
)
from .spatial import _left_perm, _right_perm, pad_arrays_for_shards


def _scatter_node_basis(B_red: np.ndarray, free, n_full: int,
                        n_nodes_padded: int) -> np.ndarray:
    """Reduced-coordinate basis ``(n_red, m)`` -> node layout ``(Np, 3, m)``.

    Constrained DOFs get zero rows (exactly the zero-pad/extract BC
    semantics of the dense path); padding nodes beyond the real beam are
    zero too, so they contribute nothing to expansions or projections.
    """
    B_red = np.asarray(B_red, np.float64)
    m = B_red.shape[1]
    full = np.zeros((3 * n_nodes_padded, m))
    full[np.asarray(free)] = B_red
    return np.ascontiguousarray(full.reshape(n_nodes_padded, 3, m))


def spatial_correction_force_local(
    q_local, el_L, el_EI, el_EA, el_nl, axis: str, n_shards: int
):
    """Per-shard von Karman correction force with 1-node halo exchange.

    ``q_local``: (n_loc, 3) this shard's node states. Element ``i`` couples
    nodes ``i, i+1``; the bridging element's far-node contribution is pushed
    to the right neighbor with a second ``ppermute`` (the exact pattern of
    ``spatial.spatial_internal_force_local``). Only the quadratic/cubic
    correction planes are evaluated — the linear force never appears here
    (it rides the exactly-diagonal reduced operator), and ``el_nl`` masks
    the correction to the nonlinear elements (hybrid beams).
    """
    halo = jax.lax.ppermute(q_local[:1], axis, _left_perm(n_shards))
    q_ext = jnp.concatenate([q_local, halo], axis=0)  # (n_loc+1, 3)
    u1, w1, t1 = q_ext[:-1, 0], q_ext[:-1, 1], q_ext[:-1, 2]
    u2, w2, t2 = q_ext[1:, 0], q_ext[1:, 1], q_ext[1:, 2]
    g1, g3, g4, g2, g5, g6 = elements.nonlinear_correction_planes(
        u1, w1, t1, u2, w2, t2, el_L, el_EI, el_EA
    )
    nl = el_nl.astype(q_ext.dtype)[:, None]
    fe1 = jnp.stack([g1, g3, g4], axis=-1) * nl  # (n_loc, 3) node i
    fe2 = jnp.stack([g2, g5, g6], axis=-1) * nl  # (n_loc, 3) node i+1
    f_ext = jnp.zeros_like(q_ext)
    f_ext = f_ext.at[:-1].add(fe1)
    f_ext = f_ext.at[1:].add(fe2)
    bridge = jax.lax.ppermute(f_ext[-1:], axis, _right_perm(n_shards))
    return f_ext[:-1].at[:1].add(bridge)


def _make_force_modal(Phi, Wn, eL, eEI, eEA, eNL, lam, axis, n_shards,
                      ext_modal=None):
    """Shard-local reduced force closure for the split fast path.

    ``f_m(eta_af, etad_af, t_af) = lam * eta_af + psum(W^T g(Phi eta_af))
    - ext_modal(eta_af, etad_af, t_af)`` — same term order as the
    single-chip split path (``ModalROMGenAlpha._force_modal``) so sharded
    rollouts pair bit-for-bit with the replicated engine up to psum
    reduction order.

    ``ext_modal`` is the engine's reduced external-force closure
    (``ModalROMGenAlpha.ext_modal`` — fluid drag / gravity via their
    restricted basis rows, ``forces.*.make_reduced_modal``). It maps modal
    coordinates to modal force through REPLICATED restricted rows, so
    inside ``shard_map`` every shard evaluates the identical value with no
    collective: exact agreement with the single-chip forced engine, all
    reference quirks preserved. Cost note: that evaluation is O(k·m)
    replicated work (k = restricted rows, ~N/3 for fluid drag) — at the
    8-shard production mesh it is comparable to one shard's local
    transform, so it does not dominate; a node-sharded formulation would
    save it at the price of diverging from the single-chip force
    conventions (the node-layout engines' documented gravity divergence,
    PARITY.md).
    """

    # All three arguments required: a default etad_af=None would defer the
    # failure of a missing argument into the fluid-drag closure
    # (jnp.asarray(None)) instead of the call site (ADVICE r4).
    def force_modal(eta_af, etad_af, t_af):
        q_loc = jnp.einsum(
            "ncm,m->nc", Phi, eta_af,
            precision=jax.lax.Precision.HIGHEST,
        )
        g_loc = spatial_correction_force_local(
            q_loc, eL, eEI, eEA, eNL, axis, n_shards
        )
        corr = jax.lax.psum(
            jnp.einsum(
                "ncm,nc->m", Wn, g_loc,
                precision=jax.lax.Precision.HIGHEST,
            ),
            axis,
        )
        f = lam * eta_af + corr
        if ext_modal is not None:
            f = f - ext_modal(
                eta_af, etad_af, t_af,
                precision=jax.lax.Precision.HIGHEST,
            )
        return f

    return force_modal


@dataclasses.dataclass
class _SpatialModalBase:
    """Shared node-sharded basis transforms (linear + ROM engines)."""

    mesh: Mesh
    axis: str
    n_nodes: int  # Np, padded to a multiple of the sp axis size
    n_nodes_real: int
    Phi_nodes: np.ndarray  # (Np, 3, m) trial basis, node layout
    PhiTM_nodes: np.ndarray  # (Np, 3, m) projector rows, node layout

    @property
    def n_shards(self) -> int:
        return self.mesh.shape[self.axis]

    @property
    def n_modes(self) -> int:
        return self.Phi_nodes.shape[-1]

    def _p_node(self):
        return PartitionSpec(self.axis, None, None)

    def to_modal(self, x_node):
        """Node-layout state ``(..., 2, Np, 3)`` -> replicated ``(eta, etad)``.

        One ``psum`` over the ``sp`` axis per projection (the projector's
        rows are sharded with the nodes).
        """
        axis, S = self.axis, self.n_shards

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(PartitionSpec(None, axis, None), self._p_node()),
            out_specs=(PartitionSpec(None), PartitionSpec(None)),
        )
        def core(x, PTM):
            eta = jax.lax.psum(
                jnp.einsum("ncm,nc->m", PTM, x[0], precision=_HI), axis
            )
            etad = jax.lax.psum(
                jnp.einsum("ncm,nc->m", PTM, x[1], precision=_HI), axis
            )
            return eta, etad

        x_node = jnp.asarray(x_node)
        PTM = jnp.asarray(self.PhiTM_nodes, x_node.dtype)
        if x_node.ndim == 4:  # leading env batch
            return jax.vmap(lambda x: core(x, PTM))(x_node)
        return core(x_node, PTM)

    def project_force(self, u_node):
        """Node-layout force ``(Np, 3)`` -> replicated modal force ``(m,)``.

        Petrov-Galerkin test-basis projection ``PhiW^T u`` (for the linear
        engine ``PhiW = Phi``); one ``psum`` over the ``sp`` axis.
        """
        axis = self.axis
        W = getattr(self, "W_nodes", None)
        if W is None:
            raise AttributeError("engine records no separate test basis")

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(PartitionSpec(axis, None), self._p_node()),
            out_specs=PartitionSpec(None),
        )
        def core(u, Wn):
            return jax.lax.psum(
                jnp.einsum("ncm,nc->m", Wn, u, precision=_HI), axis
            )

        u_node = jnp.asarray(u_node)
        return core(u_node, jnp.asarray(W, u_node.dtype))

    def physical_frames(self, etas, etads):
        """Modal frames ``(F, ..., m)`` -> node-sharded ``(qs, vs)``.

        Purely LOCAL per shard (each device expands its own basis rows);
        outputs are ``(F, ..., Np, 3)`` sharded on the node axis — the full
        physical trajectory never materializes on one device.
        """

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(PartitionSpec(), PartitionSpec(), self._p_node()),
            out_specs=(
                PartitionSpec(None, self.axis, None),
                PartitionSpec(None, self.axis, None),
            ),
        )
        def core(es, eds, Phi):
            q = jnp.einsum("ncm,fm->fnc", Phi, es, precision=_HI)
            v = jnp.einsum("ncm,fm->fnc", Phi, eds, precision=_HI)
            return q, v

        etas = jnp.asarray(etas)
        Phi = jnp.asarray(self.Phi_nodes, etas.dtype)
        if etas.ndim == 3:  # (F, B, m): env batch
            return jax.vmap(
                lambda e, ed: core(e, ed, Phi), in_axes=1, out_axes=1
            )(etas, jnp.asarray(etads))
        return core(etas, jnp.asarray(etads), Phi)


@dataclasses.dataclass
class SpatialModal(_SpatialModalBase):
    """Node-sharded linear modal engine.

    The per-mode generalized-alpha recurrence involves no physical-space
    work, so stepping delegates to the single-chip :class:`ModalGenAlpha`
    (replicated ``(B, m)`` state — 8-10 FMAs per mode per step duplicated
    per device is free); the sharded value is the basis memory and the
    transforms, which scale with beam length.
    """

    ms: ModalGenAlpha = None

    def rollout_frames(self, eta, etad, u_modal, n_frames: int,
                       substeps: int = 1, t0: float = 0.0):
        """Delegates to :meth:`ModalGenAlpha.rollout_frames` (replicated)."""
        return self.ms.rollout_frames(
            eta, etad, u_modal, n_frames, substeps=substeps, t0=t0
        )


@dataclasses.dataclass
class SpatialModalROM(_SpatialModalBase):
    """Node-sharded nonlinear modal-ROM generalized-alpha engine.

    Identical recurrence to :class:`ModalROMGenAlpha`'s split fast path —
    ``f_m = lam * eta_af + W^T g(Phi eta_af)`` with the exact element
    correction — but the expand/correct/project pipeline runs sharded over
    the beam axis: per Newton correction, each device expands its own node
    block, evaluates its own elements (one halo ``ppermute``), and the
    reduced correction force is one ``(m,)`` ``psum``. Equality with the
    single-chip engine on a fake mesh is pinned in
    ``tests/test_sharding.py::TestSpatialModalROM``.
    """

    ms: ModalROMGenAlpha = None
    W_nodes: np.ndarray = None  # (Np, 3, m) test basis, node layout
    el_L: np.ndarray = None  # (Np,) padded element lengths
    el_EI: np.ndarray = None
    el_EA: np.ndarray = None
    el_nl: np.ndarray = None  # (Np,) padded nonlinear mask

    @property
    def is_hyper_reduced(self) -> bool:
        return self.ms.sampled_params is not None

    def hyper_reduce(self, snapshots, tau: float = 1e-3,
                     return_info: bool = False):
        """ECSW-train on host f64 snapshots; returns a sharded ECSW engine.

        Training (NNLS over the full element set) delegates to
        :meth:`ModalROMGenAlpha.hyper_reduce` — it is the offline step.
        The returned engine STEPS on the replicated gathered sample
        (``O(s)`` work — sharding it would only add a psum) while the
        ``sp`` axis keeps carrying everything that scales with beam
        length: the transforms, :meth:`physical_frames`, and the
        full-correction envelope guard
        (:meth:`ecsw_residual` / :meth:`rollout_frames_guarded`).
        """
        out = self.ms.hyper_reduce(snapshots, tau, return_info=return_info)
        if return_info:
            reduced, info = out
            return dataclasses.replace(self, ms=reduced), info
        return dataclasses.replace(self, ms=out)

    def apply_ecsw(self, sel, xi_sel, train_tau: float = None):
        """Apply a pretrained ECSW sample (see :meth:`hyper_reduce`)."""
        return dataclasses.replace(
            self, ms=self.ms.apply_ecsw(sel, xi_sel, train_tau=train_tau)
        )

    def _sampled_correction_fn(self, dtype):
        """Replicated gathered-sample reduced correction ``W6^T g(Phi6 eta)``.

        Bitwise the computation of the single-chip
        :meth:`ModalROMGenAlpha.ecsw_residual` sampled branch.
        """
        ms = self.ms
        Phi6 = jnp.asarray(ms.Phi_planar, dtype)
        W6 = jnp.asarray(ms.PhiW_planar, dtype)
        g_fn = ms.planar_correction

        def sampled(eta):
            q_p = jnp.einsum("nm,...m->...n", Phi6, eta, precision=_HI)
            n3 = q_p.shape[-1]
            g = g_fn(q_p.reshape(*q_p.shape[:-1], 3, n3 // 3))
            g = g.reshape(*q_p.shape[:-1], n3)
            return jnp.einsum("nm,...n->...m", W6, g, precision=_HI)

        return sampled

    def _node_consts(self, dtype):
        return (
            jnp.asarray(self.Phi_nodes, dtype),
            jnp.asarray(self.W_nodes, dtype),
            jnp.asarray(self.el_L, dtype),
            jnp.asarray(self.el_EI, dtype),
            jnp.asarray(self.el_EA, dtype),
            jnp.asarray(self.el_nl, dtype),
        )

    def ecsw_residual(self, eta):
        """Sharded ECSW envelope audit: sampled vs FULL correction.

        Same contract as :meth:`ModalROMGenAlpha.ecsw_residual`, but the
        full correction — the O(beam length) evaluation the sample
        normally avoids — runs node-sharded over ``sp`` (one psum), so the
        guard scales with the mesh like the rest of the spatial layer.
        ``eta``: ``(m,)`` or ``(B, m)``; returns per-env ``rho``.
        """
        ms = self.ms
        if ms.guard_Phi is None:
            raise ValueError(
                "ecsw_residual requires a hyper-reduced engine "
                "(call hyper_reduce first)"
            )
        eta = jnp.asarray(eta)
        dtype = eta.dtype
        axis, S = self.axis, self.n_shards
        sampled = self._sampled_correction_fn(dtype)
        Phi, Wn, eL, eEI, eEA, eNL = self._node_consts(dtype)
        p_el = PartitionSpec(axis)

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                PartitionSpec(None),
                self._p_node(), self._p_node(), p_el, p_el, p_el, p_el,
            ),
            out_specs=PartitionSpec(),
        )
        def core(e, Ph, W, L_, EI, EA, NL):
            q_loc = jnp.einsum(
                "ncm,m->nc", Ph, e, precision=jax.lax.Precision.HIGHEST
            )
            g_loc = spatial_correction_force_local(
                q_loc, L_, EI, EA, NL, axis, S
            )
            f_full = jax.lax.psum(
                jnp.einsum(
                    "ncm,nc->m", W, g_loc,
                    precision=jax.lax.Precision.HIGHEST,
                ),
                axis,
            )
            f_s = sampled(e)
            num = jnp.linalg.norm(f_s - f_full)
            den = jnp.linalg.norm(f_full)
            return num / jnp.maximum(den, jnp.asarray(1e-30, dtype))

        def run_one(e):
            return core(e, Phi, Wn, eL, eEI, eEA, eNL)

        if eta.ndim == 2:
            return jax.vmap(run_one)(eta)
        return run_one(eta)

    def rollout_frames_guarded(
        self, eta, etad, u_modal, n_frames: int, substeps: int = 1,
        t0: float = 0.0, n_newton: int = 1, guard_tol: float = None,
    ):
        """Guarded ECSW rollout with the envelope audit sharded over ``sp``.

        Stepping is the replicated gathered-sample recurrence (identical
        to :meth:`ModalROMGenAlpha.rollout_frames_guarded`); the per-frame
        audit evaluates the FULL correction node-sharded — the one piece
        of guarded ECSW stepping that scales with beam length. Returns
        ``(ts, etas, etads, guard)`` with the single-chip guard contract.
        """
        ms = self.ms
        if ms.guard_Phi is None:
            raise ValueError(
                "rollout_frames_guarded requires a hyper-reduced engine"
            )
        if guard_tol is None:
            guard_tol = 10.0 * (ms.guard_train_tau or 1e-3)
        eta = jnp.asarray(eta)
        dtype = eta.dtype
        axis, S = self.axis, self.n_shards
        step = ms._step_fn(dtype, u_modal, n_newton, None, None)
        h = ms.dt
        n_frames = int(n_frames)
        substeps = int(substeps)
        sampled = self._sampled_correction_fn(dtype)
        Phi, Wn, eL, eEI, eEA, eNL = self._node_consts(dtype)
        p_el = PartitionSpec(axis)
        u_m = u_modal

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(
                PartitionSpec(None), PartitionSpec(None),
                self._p_node(), self._p_node(), p_el, p_el, p_el, p_el,
            ),
            out_specs=(
                (PartitionSpec(None, None), PartitionSpec(None, None)),
                PartitionSpec(),
            ),
        )
        def core(eta0, etad0, Ph, W, L_, EI, EA, NL):
            def residual(e):
                q_loc = jnp.einsum(
                    "ncm,m->nc", Ph, e,
                    precision=jax.lax.Precision.HIGHEST,
                )
                g_loc = spatial_correction_force_local(
                    q_loc, L_, EI, EA, NL, axis, S
                )
                f_full = jax.lax.psum(
                    jnp.einsum(
                        "ncm,nc->m", W, g_loc,
                        precision=jax.lax.Precision.HIGHEST,
                    ),
                    axis,
                )
                f_s = sampled(e)
                num = jnp.linalg.norm(f_s - f_full)
                den = jnp.linalg.norm(f_full)
                return num / jnp.maximum(den, jnp.asarray(1e-30, dtype))

            etadd0 = ms.initial_accel(eta0, etad0, u_m, t0)

            def frame(carry, i):
                state, res_max = carry
                t_frame = t0 + (i * substeps) * h

                def inner(c, j):
                    return step(c, t_frame + j * h)

                state, _ = jax.lax.scan(
                    inner, state, jnp.arange(substeps, dtype=dtype)
                )
                q, v, _a = state
                res_max = jnp.maximum(res_max, residual(q))
                return (state, res_max), (q, v)

            (_, res_max), (es, eds) = jax.lax.scan(
                frame, ((eta0, etad0, etadd0), jnp.zeros((), dtype)),
                jnp.arange(n_frames),
            )
            es = jnp.concatenate([eta0[None], es], axis=0)
            eds = jnp.concatenate([etad0[None], eds], axis=0)
            return (es, eds), res_max

        def run_one(e0, ed0):
            return core(e0, ed0, Phi, Wn, eL, eEI, eEA, eNL)

        etad = jnp.asarray(etad, dtype)
        if eta.ndim == 2:
            (etas, etads), res_max = jax.vmap(
                run_one, out_axes=((1, 1), 0)
            )(eta, etad)
        else:
            (etas, etads), res_max = run_one(eta, etad)
        ts = t0 + (h * substeps) * jnp.arange(n_frames + 1)
        guard = {
            "max_residual": res_max,
            "flagged": res_max > guard_tol,
            "guard_tol": guard_tol,
        }
        return ts, etas, etads, guard

    def rollout_frames(self, eta, etad, u_modal, n_frames: int,
                       substeps: int = 1, n_newton: int = 1,
                       t0: float = 0.0):
        """Sharded frame-collecting rollout; ``solve_ivp(t_eval=...)`` contract.

        ``eta``/``etad``: ``(m,)`` or ``(B, m)`` modal state (replicated
        over ``sp``; an env batch is vmapped — compose with a ``dp`` mesh
        axis exactly like the other spatial engines). ``u_modal``: constant
        modal force ``(m,)`` or None. Returns ``(ts, etas, etads)`` with the
        initial state included, all replicated.

        On a hyper-reduced engine (:meth:`hyper_reduce`) stepping
        delegates to the replicated gathered-sample recurrence — the
        sample is O(s), so a sharded evaluation would only add a psum;
        use :meth:`rollout_frames_guarded` for the sharded envelope audit.
        """
        ms = self.ms
        if self.is_hyper_reduced:
            return ms.rollout_frames(
                eta, etad, u_modal, n_frames, substeps=substeps,
                t0=t0, n_newton=n_newton,
            )
        mesh, axis, S = self.mesh, self.axis, self.n_shards
        am, af, beta, gamma = ms._coeffs()
        dt = ms.dt
        n_frames = int(n_frames)
        substeps = int(substeps)

        eta = jnp.asarray(eta)
        dtype = eta.dtype
        lam = jnp.asarray(ms.lam, dtype)
        cdamp = None if ms.cdamp is None else jnp.asarray(ms.cdamp, dtype)
        if ms.Sinv_diag is not None:
            sinv_d = jnp.asarray(ms.Sinv_diag, dtype)

            def solve(r):
                return sinv_d * r

        else:
            Sinv = jnp.asarray(ms.Sinv, dtype)

            def solve(r):
                return jnp.einsum(
                    "mk,k->m", Sinv, r,
                    precision=jax.lax.Precision.HIGHEST,
                )

        u_m = (
            jnp.zeros(self.n_modes, dtype) if u_modal is None
            else jnp.asarray(u_modal, dtype)
        )
        t_af_off = (1.0 - af) * dt

        p_el = PartitionSpec(axis)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                PartitionSpec(None), PartitionSpec(None), PartitionSpec(None),
                self._p_node(), self._p_node(),
                p_el, p_el, p_el, p_el,
            ),
            out_specs=(PartitionSpec(None, None), PartitionSpec(None, None)),
        )
        def core(eta0, etad0, u_mc, Phi, Wn, eL, eEI, eEA, eNL):
            force_modal = _make_force_modal(
                Phi, Wn, eL, eEI, eEA, eNL, lam, axis, S,
                ext_modal=ms.ext_modal,
            )

            # Consistent initial acceleration (mirrors
            # ModalROMGenAlpha.initial_accel).
            r0 = -force_modal(eta0, etad0, t0)
            if cdamp is not None:
                r0 = r0 - cdamp * etad0
            etadd0 = r0 + u_mc

            def substep(carry, t):
                q, v, a = carry
                t_af = t + t_af_off
                q_pred = q + dt * v + (0.5 - beta) * dt * dt * a
                v_pred = v + (1.0 - gamma) * dt * a

                def newton_body(_, a1):
                    q1 = q_pred + beta * dt * dt * a1
                    v1 = v_pred + gamma * dt * a1
                    q_af = (1.0 - af) * q1 + af * q
                    v_af = (1.0 - af) * v1 + af * v
                    a_am = (1.0 - am) * a1 + am * a
                    r = a_am + force_modal(q_af, v_af, t_af) - u_mc
                    if cdamp is not None:
                        r = r + cdamp * v_af
                    return a1 - solve(r)

                a1 = jax.lax.fori_loop(0, n_newton, newton_body, a)
                q1 = q_pred + beta * dt * dt * a1
                v1 = v_pred + gamma * dt * a1
                return (q1, v1, a1), None

            def frame(carry, i):
                # Same substep time base as rollout_frames_guarded / the
                # single-chip _step_fn scan (t only feeds ext_modal;
                # fluid/gravity ignore it, future forces may not).
                t_frame = t0 + (i * substeps) * dt
                carry, _ = jax.lax.scan(
                    substep, carry,
                    t_frame + dt * jnp.arange(substeps, dtype=dtype),
                )
                q, v, _a = carry
                return carry, (q, v)

            _, (es, eds) = jax.lax.scan(
                frame, (eta0, etad0, etadd0), jnp.arange(n_frames)
            )
            es = jnp.concatenate([eta0[None], es], axis=0)
            eds = jnp.concatenate([etad0[None], eds], axis=0)
            return es, eds

        Phi = jnp.asarray(self.Phi_nodes, dtype)
        Wn = jnp.asarray(self.W_nodes, dtype)
        eL = jnp.asarray(self.el_L, dtype)
        eEI = jnp.asarray(self.el_EI, dtype)
        eEA = jnp.asarray(self.el_EA, dtype)
        eNL = jnp.asarray(self.el_nl, dtype)

        def run_one(e0, ed0):
            return core(e0, ed0, u_m, Phi, Wn, eL, eEI, eEA, eNL)

        etad = jnp.asarray(etad, dtype)
        if eta.ndim == 2:  # (B, m) env batch over dp
            etas, etads = jax.vmap(run_one, out_axes=1)(eta, etad)
        else:
            etas, etads = run_one(eta, etad)
        ts = t0 + (dt * substeps) * jnp.arange(n_frames + 1)
        return ts, etas, etads

    def rollout_adaptive(self, eta, etad, u_modal, t_eval,
                         rtol: float = 1e-6, atol: float = 1e-9,
                         dt0: float = None, n_newton: int = 2,
                         max_steps_per_interval: int = 100_000,
                         safety: float = 0.9):
        """Error-controlled sharded ROM stepping (no manual dt).

        The distributed counterpart of
        :meth:`ModalROMGenAlpha.rollout_adaptive`: the same
        Zienkiewicz-Xie estimate + PI controller via the shared
        ``adaptive_drive``, with the per-Newton correction force sharded
        over the beam axis. The modal state is replicated and the
        correction's ``psum`` makes every shard's force — hence every
        shard's error norm and accept/reject decision — identical, so no
        extra contraction collective is needed. The diagonal reduced
        Jacobian means a trial-dt "refactorization" is a per-mode
        reciprocal, exactly like the single-chip engine.

        ``eta``/``etad``: ``(m,)`` or ``(B, m)``; a batch vmaps with
        PER-ENV dt control (unlike the single-chip engine's shared-dt
        contraction — same convention as
        ``build_spatial_genalpha_adaptive``). Returns
        ``(etas, etads, AdaptiveStats)`` with the frame axis leading and
        ``etas[0] = eta`` (the ``solve_ivp(t_eval=...)`` contract).
        """
        from ..ops.integrators import AdaptiveStats, adaptive_drive

        ms = self.ms
        if self.is_hyper_reduced:
            # O(s) sampled stepping is replicated by design (see
            # rollout_frames); the single-chip adaptive engine already
            # covers it.
            return ms.rollout_adaptive(
                eta, etad, u_modal, t_eval, rtol=rtol, atol=atol, dt0=dt0,
                n_newton=n_newton,
                max_steps_per_interval=max_steps_per_interval,
                safety=safety,
            )
        mesh, axis, S = self.mesh, self.axis, self.n_shards
        am, af, beta, gamma = ms._coeffs()
        zx_coeff = abs(float(beta - 1.0 / 6.0))

        eta = jnp.asarray(eta)
        dtype = eta.dtype
        eps = float(jnp.finfo(dtype).eps)
        rtol = max(float(rtol), 50.0 * eps)
        atol = max(float(atol), 50.0 * eps * 1e-3)
        lam = jnp.asarray(ms.lam, dtype)
        cdamp = None if ms.cdamp is None else jnp.asarray(ms.cdamp, dtype)
        u_m = (
            jnp.zeros(self.n_modes, dtype) if u_modal is None
            else jnp.asarray(u_modal, dtype)
        )
        t_eval_np = np.asarray(jax.device_get(t_eval), np.float64)
        if dt0 is None:
            dt0 = float(t_eval_np[1] - t_eval_np[0]) / 16.0
        t_evals = jnp.asarray(t_eval_np, dtype)

        p_rep = PartitionSpec()
        p_el = PartitionSpec(axis)

        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                PartitionSpec(None), PartitionSpec(None),
                PartitionSpec(None), PartitionSpec(None), p_rep,
                self._p_node(), self._p_node(),
                p_el, p_el, p_el, p_el,
            ),
            out_specs=(
                (PartitionSpec(None, None), PartitionSpec(None, None)),
                AdaptiveStats(p_rep, p_rep, p_rep, p_rep, p_rep),
            ),
        )
        def core(eta0, etad0, u_mc, t_ev, dt0c, Phi, Wn, eL, eEI, eEA, eNL):
            force_modal = _make_force_modal(
                Phi, Wn, eL, eEI, eEA, eNL, lam, axis, S,
                ext_modal=ms.ext_modal,
            )
            r0 = -force_modal(eta0, etad0, t_ev[0])
            if cdamp is not None:
                r0 = r0 - cdamp * etad0
            etadd0 = r0 + u_mc

            def trial(t, dt, state):
                q, v, a = state
                # Modified Newton: jd keeps the force-free diagonal (the
                # single-chip Sinv likewise omits d(ext)/d(eta, etad)).
                jd = (1.0 - am) + ((1.0 - af) * beta) * dt * dt * lam
                if cdamp is not None:
                    jd = jd + ((1.0 - af) * gamma) * dt * cdamp
                t_af = t + (1.0 - af) * dt
                q_pred = q + dt * v + (0.5 - beta) * dt * dt * a
                v_pred = v + (1.0 - gamma) * dt * a

                def newton_body(i, a1):
                    q1 = q_pred + beta * dt * dt * a1
                    v1 = v_pred + gamma * dt * a1
                    q_af = (1.0 - af) * q1 + af * q
                    v_af = (1.0 - af) * v1 + af * v
                    a_am = (1.0 - am) * a1 + am * a
                    r = a_am + force_modal(q_af, v_af, t_af) - u_mc
                    if cdamp is not None:
                        r = r + cdamp * v_af
                    return a1 - r / jd

                a1 = jax.lax.fori_loop(0, n_newton, newton_body, a)
                q1 = q_pred + beta * dt * dt * a1
                v1 = v_pred + gamma * dt * a1
                e = zx_coeff * dt * dt * (a1 - a)
                scale = atol + rtol * jnp.maximum(jnp.abs(q), jnp.abs(q1))
                en = jnp.sqrt(jnp.mean((e / scale) ** 2))
                return (q1, v1, a1), en

            _, (es, eds), stats = adaptive_drive(
                trial, (eta0, etad0, etadd0), t_ev, dt0c, -1.0 / 3.0,
                max_steps_per_interval=max_steps_per_interval,
                safety=safety, frame_out=lambda s: (s[0], s[1]),
            )
            es = jnp.concatenate([eta0[None], es], axis=0)
            eds = jnp.concatenate([etad0[None], eds], axis=0)
            return (es, eds), stats

        Phi = jnp.asarray(self.Phi_nodes, dtype)
        Wn = jnp.asarray(self.W_nodes, dtype)
        eL = jnp.asarray(self.el_L, dtype)
        eEI = jnp.asarray(self.el_EI, dtype)
        eEA = jnp.asarray(self.el_EA, dtype)
        eNL = jnp.asarray(self.el_nl, dtype)
        dt0c = jnp.asarray(dt0, dtype)[()]

        def run_one(e0, ed0):
            return core(e0, ed0, u_m, t_evals, dt0c,
                        Phi, Wn, eL, eEI, eEA, eNL)

        etad = jnp.asarray(etad, dtype)
        if eta.ndim == 2:  # (B, m): per-env dt via vmap over dp
            (etas, etads), stats = jax.vmap(
                run_one, out_axes=((1, 1), 0)
            )(eta, etad)
        else:
            (etas, etads), stats = run_one(eta, etad)
        return etas, etads, stats


def _padded_layout(model, mesh: Mesh, axis: str):
    """Shared node/element padding + scatter geometry for both builders."""
    bc_info = model.beam_model.bc_info
    arrays = model.beam_model.arrays
    n_shards = mesh.shape[axis]
    padded, n_pad_nodes = pad_arrays_for_shards(arrays, n_shards)
    n_real = arrays.n_elements + 1
    el_EI = (
        np.asarray(padded.elastic_modulus, np.float64)
        * np.asarray(padded.moment_inertia, np.float64)
    )
    el_EA = (
        np.asarray(padded.elastic_modulus, np.float64)
        * np.asarray(padded.cross_area, np.float64)
    )
    return {
        "free": bc_info.free_dofs,
        "n_full": bc_info.n_dofs_full,
        "n_pad_nodes": n_pad_nodes,
        "n_real": n_real,
        "el_L": np.asarray(padded.length, np.float64),
        "el_EI": el_EI,
        "el_EA": el_EA,
        "el_nl": np.asarray(padded.nonlinear_mask),
    }


def build_spatial_modal(
    model,
    mesh: Mesh,
    dt: float,
    rho_inf: float = 0.8,
    n_modes: int = None,
    rayleigh: tuple = None,
    axis: str = "sp",
) -> SpatialModal:
    """Node-sharded linear modal engine (see :class:`SpatialModal`).

    Host float64 eigensolve via :func:`make_modal_genalpha` (raises for
    nonlinear configurations or registered forces, same contract); the
    bases are scattered to the padded node layout and sharded over ``sp``
    by the transform programs.
    """
    ms = make_modal_genalpha(
        model, dt, rho_inf=rho_inf, n_modes=n_modes, rayleigh=rayleigh
    )
    lay = _padded_layout(model, mesh, axis)
    Np = lay["n_pad_nodes"]
    return SpatialModal(
        mesh=mesh,
        axis=axis,
        n_nodes=Np,
        n_nodes_real=lay["n_real"],
        Phi_nodes=_scatter_node_basis(ms.Phi, lay["free"], lay["n_full"], Np),
        PhiTM_nodes=_scatter_node_basis(
            ms.PhiTM.T, lay["free"], lay["n_full"], Np
        ),
        ms=ms,
    )


def build_spatial_modal_rom(
    model,
    mesh: Mesh,
    dt: float,
    rho_inf: float = 0.8,
    n_modes: int = None,
    rayleigh: tuple = None,
    basis=None,
    axis: str = "sp",
) -> SpatialModalROM:
    """Node-sharded nonlinear modal-ROM engine (see :class:`SpatialModalROM`).

    Host float64 setup via :func:`make_modal_rom` (Petrov-Galerkin bases,
    diagonal reduced operator, prefactored Newton inverse); requires the
    split fast path — the exact parity element (``use_consistent`` off).
    Registered fluid-drag / gravity forces ride the sharded rollouts as
    exact reduced corrections (the engine's ``ext_modal``, same as the
    single-chip forced fast path); forces that fall back to the general
    full-transform ``external_force`` path are rejected.
    """
    ms = make_modal_rom(
        model, dt, rho_inf=rho_inf, n_modes=n_modes, rayleigh=rayleigh,
        basis=basis,
    )
    if ms.lam is None:
        raise ValueError(
            "the sharded ROM engine requires the split fast path "
            "(exactly-diagonal reduced linear operator); "
            "use_consistent_nonlinear models are not supported"
        )
    if ms.external_force is not None:
        raise ValueError(
            "the sharded ROM engine supports registered external forces "
            "only through their reduced-modal closures (fluid drag / "
            "gravity, make_reduced_modal); this registry needs the "
            "general external_force path — use build_spatial_genalpha"
        )
    lay = _padded_layout(model, mesh, axis)
    Np = lay["n_pad_nodes"]
    return SpatialModalROM(
        mesh=mesh,
        axis=axis,
        n_nodes=Np,
        n_nodes_real=lay["n_real"],
        Phi_nodes=_scatter_node_basis(ms.Phi, lay["free"], lay["n_full"], Np),
        PhiTM_nodes=_scatter_node_basis(
            ms.PhiTM.T, lay["free"], lay["n_full"], Np
        ),
        ms=ms,
        W_nodes=_scatter_node_basis(ms.PhiW, lay["free"], lay["n_full"], Np),
        el_L=lay["el_L"],
        el_EI=lay["el_EI"],
        el_EA=lay["el_EA"],
        el_nl=lay["el_nl"],
    )
