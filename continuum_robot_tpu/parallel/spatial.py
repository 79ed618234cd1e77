"""Spatial (beam-axis) model parallelism: shard nodes across devices.

The 1-D FEM chain is this framework's "sequence" axis (SURVEY §5): global
state is ``[u, w, phi] x N`` nodes and every element couples two neighbors.
For beams too long for one chip, nodes are sharded across the ``sp`` mesh
axis and each step exchanges exactly one 3-DOF halo node with each neighbor
via ``jax.lax.ppermute`` over ICI — the structural analogue of context/ring
parallelism (no attention exists; the halo IS the ring payload).

Decomposition (S shards, m = Np/S nodes per shard, node count padded to a
multiple of S with zero-property elements so every shard is uniform):

* shard k owns nodes ``[k*m, (k+1)*m)`` and elements ``[k*m, (k+1)*m)``
  (element e connects nodes e, e+1; padded elements have zero EA/EI/rhoA so
  they contribute nothing);
* internal force: receive right neighbor's first node (halo), evaluate the
  local element batch, then send the bridging force contribution back to the
  right neighbor (one more ppermute) and add it there;
* consistent-mass solve: the block-tridiagonal Thomas recursion is serial
  across shards, so the spatial path solves ``M a = f`` with Jacobi-
  preconditioned conjugate gradients instead — every CG iteration is one
  halo-exchange matvec + ``psum`` dot products. The consistent mass is
  spectrally within a factor ~2 of its block-diagonal part, so CG converges
  to fp32 accuracy in ~10-20 iterations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

# Full-input-precision 3x3-block contractions: the TPU MXU default is
# bfloat16 inputs, fatal for the stiff beam operators (see
# parallel/spatial_implicit.py and continuum_robot_tpu/__init__.py).
_HI = jax.lax.Precision.HIGHEST
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from ..models import assembly, elements
from ..models.config import BeamArrays


def pad_arrays_for_shards(arrays: BeamArrays, n_shards: int):
    """Pad to ``Np`` nodes (multiple of ``n_shards``) with zero elements.

    Returns ``(padded_arrays, n_nodes_padded)``. Zero-property elements have
    zero stiffness/mass contribution; padded mass diagonal gets unit pivots
    via the BC mask path so solves remain well-posed.
    """
    n_el = arrays.n_elements
    n_nodes = n_el + 1
    n_pad_nodes = -(-n_nodes // n_shards) * n_shards
    # Element count must equal padded node count so each shard owns the same
    # number of elements as nodes; the element bridging shard boundaaries is
    # always present, and element Np-1 is guaranteed padding (zero).
    n_pad_el = n_pad_nodes
    pad = n_pad_el - n_el

    def pad_field(x, value=0.0):
        x = np.asarray(x)
        return np.concatenate([x, np.full((pad,), value, dtype=x.dtype)], axis=0)

    padded = BeamArrays(
        length=pad_field(arrays.length, 1.0),  # avoid 0/0 in kernels
        elastic_modulus=pad_field(arrays.elastic_modulus, 0.0),
        moment_inertia=pad_field(arrays.moment_inertia, 0.0),
        density=pad_field(arrays.density, 0.0),
        cross_area=pad_field(arrays.cross_area, 0.0),
        wetted_area=pad_field(arrays.wetted_area, 0.0),
        drag_coef=pad_field(arrays.drag_coef, 0.0),
        nonlinear_mask=np.concatenate(
            [np.asarray(arrays.nonlinear_mask), np.zeros((pad,), dtype=bool)]
        ),
    )
    return padded, n_pad_nodes


@dataclasses.dataclass
class SpatialBeam:
    """A node-sharded beam operator bound to a mesh axis."""

    arrays: BeamArrays  # padded, length Np
    n_nodes: int  # Np (padded)
    n_nodes_real: int
    free_mask: np.ndarray  # (Np, 3) bool; padding nodes are constrained
    mesh: Mesh
    axis: str = "sp"

    @property
    def n_shards(self) -> int:
        return self.mesh.shape[self.axis]


def make_spatial_beam(
    arrays: BeamArrays,
    free_mask_nodes: np.ndarray,
    mesh: Mesh,
    axis: str = "sp",
) -> SpatialBeam:
    n_shards = mesh.shape[axis]
    padded, n_pad_nodes = pad_arrays_for_shards(arrays, n_shards)
    n_real = arrays.n_elements + 1
    mask = np.zeros((n_pad_nodes, 3), dtype=bool)
    mask[:n_real] = free_mask_nodes
    return SpatialBeam(
        arrays=padded,
        n_nodes=n_pad_nodes,
        n_nodes_real=n_real,
        free_mask=mask,
        mesh=mesh,
        axis=axis,
    )


def node_drag_factors(beam: SpatialBeam, fluid_density: float) -> np.ndarray:
    """Per-node fluid-drag factors ``0.5 rho C_d A_w`` on the w DOF, (Np, 3).

    Node-LOCAL by construction (the drag force needs no halo exchange on
    the sharded axis). Node ``i`` takes element ``i``'s wetted/drag values
    and the real last node reuses the last real element's — the reference's
    final-node quirk (``fluid_forces.py:60-61``), indexed against
    ``n_nodes_real`` so zero-padded elements never zero the tip factor.
    Padded nodes get 0.
    """
    arrays = beam.arrays
    w = np.asarray(arrays.wetted_area, np.float64)
    c = np.asarray(arrays.drag_coef, np.float64)
    n_real = beam.n_nodes_real
    fac = np.zeros((beam.n_nodes, 3))
    fac[: n_real - 1, 1] = (
        0.5 * fluid_density * w[: n_real - 1] * c[: n_real - 1]
    )
    fac[n_real - 1, 1] = 0.5 * fluid_density * w[n_real - 2] * c[n_real - 2]
    return fac


def element_gravity_masses(beam: SpatialBeam) -> np.ndarray:
    """Per-element gravity masses ``rho A L``, (Np,) padded with zeros."""
    arrays = beam.arrays
    m = (
        np.asarray(arrays.density, np.float64)
        * np.asarray(arrays.cross_area, np.float64)
        * np.asarray(arrays.length, np.float64)
    )
    m[beam.n_nodes_real - 1:] = 0.0  # padding elements carry no weight
    return m


def spatial_gravity_force_local(
    q_local, gmass_local, gx, gy, mask_local, axis: str, n_shards: int
):
    """Deformation-aware distributed gravity, node-sharded (per shard).

    PHYSICAL formulation: element ``i`` rotates the global ``(gx, gy)`` by
    the average of ITS OWN end nodes' rotations and splits half its weight
    onto each end node's (u, w) DOFs. The single-chip registry force
    instead reproduces the reference's reduced-index quirk
    (``gravity_forces.py:104-146``: full-layout indices applied to the
    reduced vector, shifting each element's rotation window by the number
    of constrained DOFs below it) — that quirk is a BC-dependent index
    misalignment with no meaningful node-layout analogue, so the sharded
    path is deliberately consistent instead (divergence documented in
    PARITY.md). Same halo pattern as the internal force: one pull of the
    right neighbor's first node, one push of the bridging element's
    far-node contribution.
    """
    halo = jax.lax.ppermute(q_local[:1], axis, _left_perm(n_shards))
    q_ext = jnp.concatenate([q_local, halo], axis=0)  # (m+1, 3)
    th = q_ext[..., 2]
    phi = 0.5 * (th[:-1] + th[1:])  # per local element
    c, s = jnp.cos(phi), jnp.sin(phi)
    f_ax = (c * gx + s * gy) * gmass_local * 0.5
    f_tr = (-s * gx + c * gy) * gmass_local * 0.5
    fe = jnp.stack([f_ax, f_tr, jnp.zeros_like(f_ax)], axis=-1)  # (m, 3)
    f_ext = jnp.zeros_like(q_ext)
    f_ext = f_ext.at[:-1].add(fe)
    f_ext = f_ext.at[1:].add(fe)
    bridge = jax.lax.ppermute(f_ext[-1:], axis, _right_perm(n_shards))
    f_local = f_ext[:-1].at[:1].add(bridge)
    return f_local * mask_local


def _right_perm(n):
    """ppermute spec sending shard k's payload to shard k+1 (ring)."""
    return [(i, (i + 1) % n) for i in range(n)]


def _left_perm(n):
    return [(i, (i - 1) % n) for i in range(n)]


def spatial_internal_force_local(
    q_local, arr_local: BeamArrays, mask_local, axis: str, n_shards: int,
    use_consistent: bool = False,
):
    """Per-shard body: internal force with 1-node halo exchange.

    ``q_local``: (m, 3) this shard's nodes (already BC-masked).
    Runs inside ``shard_map``; two ppermutes per evaluation:
    (1) left-neighbor pull of the next shard's first node,
    (2) right-push of the bridging element's far-node contribution.
    """
    # Halo: receive right neighbor's first node (ring; shard S-1 receives
    # shard 0's first node but its bridging element is zero padding).
    halo = jax.lax.ppermute(q_local[:1], axis, _left_perm(n_shards))
    q_ext = jnp.concatenate([q_local, halo], axis=0)  # (m+1, 3)

    q6 = jnp.concatenate([q_ext[:-1], q_ext[1:]], axis=-1)  # (m, 6)
    fe = elements.element_internal_force(
        q6,
        arr_local.length,
        arr_local.elastic_modulus,
        arr_local.moment_inertia,
        arr_local.cross_area,
        arr_local.nonlinear_mask,
        use_consistent=use_consistent,
    )
    f_ext = jnp.zeros_like(q_ext)
    f_ext = f_ext.at[:-1].add(fe[..., 0:3])
    f_ext = f_ext.at[1:].add(fe[..., 3:6])
    # Push the halo-node contribution to its owner (right neighbor's node 0).
    bridge = jax.lax.ppermute(f_ext[-1:], axis, _right_perm(n_shards))
    f_local = f_ext[:-1].at[:1].add(bridge)
    return f_local * mask_local


def spatial_mass_matvec_local(
    v_local, mdiag_local, mlow_local, mup_local, axis: str, n_shards: int
):
    """Masked consistent-mass matvec with halo exchange (per shard).

    ``mlow_local[i]`` couples local node i to global node (start+i-1); the
    first row's lower block uses the left neighbor's last node. Bands are
    stored shard-aligned: lower/upper are (m, 3, 3) with entry 0 of ``lower``
    reaching into the left halo and entry m-1 of ``upper`` reaching into the
    right halo.
    """
    left_halo = jax.lax.ppermute(v_local[-1:], axis, _right_perm(n_shards))
    right_halo = jax.lax.ppermute(v_local[:1], axis, _left_perm(n_shards))
    v_ext = jnp.concatenate([left_halo, v_local, right_halo], axis=0)  # (m+2,3)
    y = jnp.einsum("nij,nj->ni", mdiag_local, v_local, precision=_HI)
    y = y + jnp.einsum("nij,nj->ni", mlow_local, v_ext[:-2], precision=_HI)
    y = y + jnp.einsum("nij,nj->ni", mup_local, v_ext[2:], precision=_HI)
    return y


def build_spatial_rhs(
    beam: SpatialBeam,
    cg_iters: int = 16,
    use_consistent: bool = False,
    cg_tol: float = 1e-8,
    fluid_density: float = None,
    gravity=None,
    node_force: Callable = None,
    with_info: bool = False,
) -> Callable:
    """Fully sharded ``rhs(t, x, u)`` over the ``sp`` axis via shard_map.

    ``x``: (2, Np, 3) = stacked (positions, velocities) in node layout,
    sharded on the node axis. ``u``: (Np, 3) force layout or None.
    The mass solve is Jacobi-preconditioned CG with halo-exchange matvecs
    and ``psum`` reductions, stopped by a RELATIVE RESIDUAL TOLERANCE
    inside ``lax.while_loop`` (``|r| <= cg_tol |r0|``), with ``cg_iters``
    as the iteration CAP — accuracy no longer silently depends on an
    iteration count. Pass ``cg_tol=None`` to recover the fixed-iteration
    scan (cheapest trace; e.g. when a measured count is known sufficient).
    NOTE: the tolerance stop is a ``lax.while_loop`` and therefore NOT
    reverse-mode differentiable — pass ``cg_tol=None`` when taking
    ``jax.grad`` through :func:`spatial_rollout`.
    For implicit stepping use the exact SPIKE solver instead
    (``parallel/spatial_implicit.py``).

    ``node_force``: optional custom nodewise external force ``f(x, t) ->
    (nodes, 3)`` with ``x = (2, nodes, 3)`` stacked (q, v) — same
    node-local contract as the implicit builders'
    (``spatial_implicit.build_spatial_genalpha``); evaluated at the RHS
    time ``t``, added to the assembled force before the mass solve.

    ``with_info``: the returned ``rhs(t, x, u)`` additionally returns a
    replicated scalar ``cg_incomplete`` — 1.0 when the solve exited on
    the ``cg_iters`` CAP with the residual still above ``cg_tol`` (the
    non-convergence that was previously silent), else 0.0. Consumed by
    :func:`spatial_rollout`'s counted ``cg_stats`` (the explicit tier's
    analogue of ``AdaptiveStats.n_incomplete``). Requires a tolerance
    stop (``cg_tol is not None``: a fixed-iteration scan tracks no
    residual by design).
    """
    if with_info and cg_tol is None:
        raise ValueError(
            "with_info requires a tolerance stop (cg_tol is not None): "
            "the fixed-iteration scan tracks no residual by design"
        )
    mesh, axis, S = beam.mesh, beam.axis, beam.n_shards
    arrays = beam.arrays
    mask = np.asarray(beam.free_mask, dtype=np.float32)

    # Precompute shard-aligned mass bands (global, then sharded by shard_map).
    # The padded element list has Np elements -> Np+1 assembled nodes; node Np
    # is a phantom that only zero-property padding elements touch, so its
    # row/col are exactly zero and truncation to Np nodes is lossless.
    mdiag, moff = assembly.mass_block_tridiagonal(arrays)
    mdiag = np.asarray(mdiag)[: beam.n_nodes]
    moff = np.asarray(moff)[: beam.n_nodes - 1]
    # Unit pivots on constrained/padding nodes.
    from ..ops import banded

    mlow_band = np.swapaxes(moff, -1, -2)
    mdiag, mlow_band, mup_band = banded.btd_apply_bc(
        mdiag, mlow_band, moff, np.asarray(beam.free_mask)
    )
    Np = beam.n_nodes
    # Align bands per node: lower[i] couples node i with i-1 (zero for i=0),
    # upper[i] couples node i with i+1 (zero for i=Np-1).
    zeros33 = np.zeros((1, 3, 3), dtype=mdiag.dtype)
    mlow = np.concatenate([zeros33, mlow_band], axis=0)  # (Np, 3, 3)
    mup = np.concatenate([mup_band, zeros33], axis=0)  # (Np, 3, 3)
    # Jacobi preconditioner: inverse of the 3x3 diagonal blocks.
    mdiag_inv = banded.inv33(mdiag)

    arr_fields = (
        arrays.length, arrays.elastic_modulus, arrays.moment_inertia,
        arrays.cross_area, arrays.nonlinear_mask,
    )

    # Optional reference forces on the sharded axis: node-local quadratic
    # drag and physical deformation-aware gravity (see
    # node_drag_factors / spatial_gravity_force_local for the contracts
    # and the documented gravity-quirk divergence).
    has_fluid = fluid_density is not None
    dfac_np = (
        node_drag_factors(beam, float(fluid_density)) if has_fluid
        else np.zeros((beam.n_nodes, 3))
    )
    has_gravity = gravity is not None
    if has_gravity and len(np.asarray(gravity).ravel()) != 3:
        raise ValueError("gravity must be a 3-vector [gx, gy, gz]")
    gmass_np = (
        element_gravity_masses(beam) if has_gravity
        else np.zeros(beam.n_nodes)
    )
    g_x = float(np.asarray(gravity).ravel()[0]) if has_gravity else 0.0
    g_y = float(np.asarray(gravity).ravel()[1]) if has_gravity else 0.0

    has_nf = node_force is not None

    p_node = PartitionSpec(axis, None)
    p_block = PartitionSpec(axis, None, None)
    p_el = PartitionSpec(axis)
    p_x = PartitionSpec(None, axis, None)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(PartitionSpec(), p_x, p_node, p_el, p_el, p_el, p_el,
                  p_el, p_node, p_block, p_block, p_block, p_block,
                  p_node, p_el),
        out_specs=(p_x, PartitionSpec()) if with_info else p_x,
    )
    def rhs_core(t, x, u, a_len, a_E, a_I, a_A, a_nl, m_mask,
                 md, ml, mu, mdi, dfac, gmass):
        q, v = x[0], x[1]
        arr_local = BeamArrays(
            length=a_len, elastic_modulus=a_E, moment_inertia=a_I,
            density=a_len * 0, cross_area=a_A, wetted_area=a_len * 0,
            drag_coef=a_len * 0, nonlinear_mask=a_nl,
        )
        k = spatial_internal_force_local(
            q * m_mask, arr_local, m_mask, axis, S, use_consistent
        )
        f = u - k
        if has_fluid:
            vm = v * m_mask
            f = f - dfac * vm * jnp.abs(vm)
        if has_gravity:
            f = f + spatial_gravity_force_local(
                q * m_mask, gmass, g_x, g_y, m_mask, axis, S
            )
        if has_nf:
            f = f + node_force(
                jnp.stack([q * m_mask, v * m_mask]), t
            )
        f = f * m_mask

        def matvec(z):
            return spatial_mass_matvec_local(z, md, ml, mu, axis, S)

        def pdot(a, b):
            return jax.lax.psum(jnp.sum(a * b), axis)

        # Jacobi-preconditioned CG on M a = f.
        a0 = jnp.zeros_like(f)
        r0 = f - matvec(a0)
        z0 = jnp.einsum("nij,nj->ni", mdi, r0, precision=_HI)
        p0 = z0
        rz0 = pdot(r0, z0)
        rr0 = None if cg_tol is None else pdot(r0, r0)

        def cg_step(a, r, p, rz):
            Ap = matvec(p)
            alpha = rz / jnp.maximum(pdot(p, Ap), 1e-30)
            a = a + alpha * p
            r = r - alpha * Ap
            z = jnp.einsum("nij,nj->ni", mdi, r, precision=_HI)
            rz_new = pdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return a, r, p, rz_new

        if cg_tol is None:
            # Fixed-iteration scan: no residual tracking — pdot(r, r)
            # would be one wasted psum collective per iteration here.
            (acc, _, _, _), _ = jax.lax.scan(
                lambda c, _: (cg_step(*c), None),
                (a0, r0, p0, rz0),
                None,
                length=cg_iters,
            )
            rr_final = None
        else:
            tol2 = jnp.asarray(cg_tol, f.dtype) ** 2

            def cg_body(carry):
                a, r, p, rz, _, i = carry
                a, r, p, rz = cg_step(a, r, p, rz)
                return (a, r, p, rz, pdot(r, r), i + 1)

            def cg_cond(carry):
                _, _, _, _, rr, i = carry
                return jnp.logical_and(rr > tol2 * rr0, i < cg_iters)

            acc, _, _, _, rr_final, _ = jax.lax.while_loop(
                cg_cond, cg_body, (a0, r0, p0, rz0, rr0, 0)
            )
        acc = acc * m_mask
        out = jnp.stack([v * m_mask, acc], axis=0)
        if with_info:
            # Cap-hit flag: the loop exited with the residual still above
            # tolerance. rr/rr0 are psum-contracted, so the flag is
            # identical on every shard (replicated out_spec).
            incomplete = (rr_final > tol2 * rr0).astype(out.dtype)
            return out, incomplete
        return out

    def rhs(t, x, u=None):
        if u is None:
            u = jnp.zeros((Np, 3), dtype=x.dtype)
        return rhs_core(
            jnp.asarray(t, dtype=x.dtype), x, u, *arr_fields, mask,
            mdiag, mlow, mup, mdiag_inv,
            jnp.asarray(dfac_np, x.dtype), jnp.asarray(gmass_np, x.dtype),
        )

    return rhs


def spatial_rollout(
    beam: SpatialBeam,
    x0,
    t_final: float,
    dt: float,
    u=None,
    substeps: int = 1,
    cg_iters: int = 16,
    use_consistent: bool = False,
    cg_tol: float = 1e-8,
    fluid_density: float = None,
    gravity=None,
    node_force: Callable = None,
    cg_stats: bool = False,
):
    """RK4 rollout of a node-sharded beam: the full CP-analogue pipeline.

    ``x0``: ``(2, Np, 3)`` node-layout state (optionally with a leading env
    batch for a dp x sp mesh); ``u``: ``(Np, 3)`` force layout or a traceable
    callable of t. Per step: 4 RHS evaluations, each costing 2 halo
    ppermutes + CG's (2 ppermutes + 2 psums) x iters over the ``sp`` axis.
    ``fluid_density`` / ``gravity`` / ``node_force`` pass through to
    :func:`build_spatial_rhs`. Returns
    ``(ts, xs (frames+1, ..., 2, Np, 3))``.

    ``cg_stats``: additionally return ``{"cg_incomplete": n, "cg_evals":
    total}`` counting the RHS evaluations whose mass-solve CG exited on
    the iteration CAP without reaching ``cg_tol`` — the explicit tier's
    analogue of ``AdaptiveStats.n_incomplete`` (a cap-hit was previously
    silent). Per env when batched. Requires ``cg_tol is not None``.
    """
    from ..ops import integrators

    n_steps = int(round(t_final / dt))
    x0 = jnp.asarray(x0)

    if not cg_stats:
        rhs = build_spatial_rhs(
            beam, cg_iters=cg_iters, use_consistent=use_consistent,
            cg_tol=cg_tol, fluid_density=fluid_density, gravity=gravity,
            node_force=node_force,
        )

        def run(x0):
            return integrators.integrate_fixed(
                rhs, x0, 0.0, dt, n_steps, u=u, substeps=substeps
            )

        if x0.ndim == 4:  # leading env batch -> vmap over dp
            ts, xs = jax.vmap(run, out_axes=(None, 1))(x0)
        else:
            ts, xs = run(x0)
        return ts, xs

    rhs_info = build_spatial_rhs(
        beam, cg_iters=cg_iters, use_consistent=use_consistent,
        cg_tol=cg_tol, fluid_density=fluid_density, gravity=gravity,
        node_force=node_force, with_info=True,
    )
    h = dt / substeps

    def rk4_counted(t, x, u_t):
        """rk4_step with the cap-hit flags of all four stages summed."""
        k1, f1 = rhs_info(t, x, u_t)
        k2, f2 = rhs_info(t + 0.5 * h, x + (0.5 * h) * k1, u_t)
        k3, f3 = rhs_info(t + 0.5 * h, x + (0.5 * h) * k2, u_t)
        k4, f4 = rhs_info(t + h, x + h * k3, u_t)
        xn = x + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        return xn, f1 + f2 + f3 + f4

    def run(x0):
        u_const = None if callable(u) else u

        def outer(carry, i):
            x, n_inc = carry
            t_frame = i * dt

            def inner(c, j):
                x, n_inc = c
                t = t_frame + j * h
                u_t = u(t) if callable(u) else u_const
                x, inc = rk4_counted(t, x, u_t)
                return (x, n_inc + inc), None

            (x, n_inc), _ = jax.lax.scan(
                inner, (x, n_inc), jnp.arange(substeps)
            )
            return (x, n_inc), x

        (x_f, n_inc), xs = jax.lax.scan(
            outer, (x0, jnp.zeros((), x0.dtype)), jnp.arange(n_steps)
        )
        xs = jnp.concatenate([x0[None], xs], axis=0)
        return xs, n_inc

    ts = dt * jnp.arange(n_steps + 1)
    if x0.ndim == 4:  # leading env batch -> vmap over dp
        xs, n_inc = jax.vmap(run, out_axes=(1, 0))(x0)
    else:
        xs, n_inc = run(x0)
    stats = {
        "cg_incomplete": n_inc,
        "cg_evals": 4 * n_steps * substeps,
    }
    return ts, xs, stats


def reduced_to_node_layout(model, x_red, n_nodes_padded: int):
    """Convert reduced ``[q; v]`` states to the spatial ``(2, Np, 3)`` layout."""
    bc = model.beam_model.bc_info
    free = np.asarray(bc.free_dofs)
    n = len(free)
    n_full = bc.n_dofs_full
    x_red = jnp.asarray(x_red)
    q = jnp.zeros((*x_red.shape[:-1], n_full), x_red.dtype).at[..., free].set(
        x_red[..., :n]
    )
    v = jnp.zeros((*x_red.shape[:-1], n_full), x_red.dtype).at[..., free].set(
        x_red[..., n:]
    )
    Np = n_nodes_padded
    out = jnp.zeros((*x_red.shape[:-1], 2, Np, 3), x_red.dtype)
    out = out.at[..., 0, : n_full // 3, :].set(
        q.reshape(*x_red.shape[:-1], n_full // 3, 3)
    )
    out = out.at[..., 1, : n_full // 3, :].set(
        v.reshape(*x_red.shape[:-1], n_full // 3, 3)
    )
    return out
