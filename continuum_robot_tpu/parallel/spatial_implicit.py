"""Spatially-sharded IMPLICIT stepping: distributed SPIKE solves + gen-alpha.

Round-1 left the spatial (beam-axis) path explicit-only: a beam too long for
one chip could not use the production implicit engines at all. This module
brings generalized-alpha to the ``sp`` mesh axis with an EXACT distributed
block-tridiagonal solve — the SPIKE / substructuring algorithm — instead of
the fixed-iteration CG the explicit path used for its mass solve.

SPIKE decomposition of ``T x = r`` for a block-tridiagonal ``T`` sharded by
node runs (S shards, m nodes each; inter-shard coupling blocks ``L_k``
(shard k's first node <- left neighbor's last) and ``U_k`` (last node ->
right neighbor's first)):

1. local block-Thomas factorization of each shard's m-node chain (O(m) scan,
   once per tangent refresh — ONCE total for linear beams / modified Newton);
2. local "spike" columns ``V = A_k^{-1} e_0 L_k`` and ``W = A_k^{-1} e_last
   U_k`` (two 3-column solves, cached with the factors);
3. per solve: one local substitution ``y = A_k^{-1} r`` + ONE ``all_gather``
   of 6 floats per shard (the interface values of ``y``) + a replicated
   ``(6S, 6S)`` interface solve (cached inverse) + one local axpy.

Per-step communication is therefore two 3-DOF ``ppermute`` halos for the
force/mass applies plus a 6-float-per-shard ``all_gather`` per Newton
solve — latency-bound tiny payloads riding ICI, no serial cross-shard
recursion anywhere. Compare ``parallel/spatial.py``'s CG mass solve: ~16
iterations x (2 ppermutes + 2 psums) per application, with accuracy set by
an iteration count; SPIKE is exact in one round.

Batching: the core runs one environment inside ``shard_map``; batch with
``jax.vmap`` outside (a ``dp x sp`` mesh) exactly like the explicit path.

No reference counterpart: the reference has no distributed runtime at all
(SURVEY §2.2); this is the TPU-native scale-out of its implicit capability.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models import assembly
from ..models.config import BeamArrays
from ..ops import banded
from .spatial import (
    SpatialBeam,
    _left_perm,
    _right_perm,
    spatial_internal_force_local,
)

# f32 contractions in the solve path MUST run at full input precision: the
# TPU MXU default is bfloat16 inputs, which destroys the conditioning of
# the stiff beam operators (hardware-only NaN blowups of the nonlinear
# SPIKE engine, bounded on CPU — NOTES_r4.md session 4). The package
# default (continuum_robot_tpu/__init__.py) already pins this globally;
# the explicit annotations keep the engine correct standalone.
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Local (per-shard) operator assembly
# ---------------------------------------------------------------------------


def _local_arrays(a_len, a_E, a_I, a_A, a_nl) -> BeamArrays:
    zero = a_len * 0
    return BeamArrays(
        length=a_len, elastic_modulus=a_E, moment_inertia=a_I,
        density=zero, cross_area=a_A, wetted_area=zero, drag_coef=zero,
        nonlinear_mask=a_nl,
    )


def spatial_tangent_aligned(
    q_local, arr_local: BeamArrays, axis: str, n_shards: int,
    use_consistent: bool = False,
):
    """Shard-aligned tangent-stiffness blocks with halo exchange.

    Returns ``(kd (m,3,3), klow (m,3,3), kup (m,3,3))`` in the same aligned
    convention as the mass bands of ``build_spatial_rhs``: ``klow[0]``
    couples the first local node to the LEFT neighbor's last node,
    ``kup[m-1]`` couples the last local node to the RIGHT neighbor's first.
    Two ppermutes: pull the right halo node, push the bridging element's
    (K21, K22) contributions to their owner.
    """
    halo = jax.lax.ppermute(q_local[:1], axis, _left_perm(n_shards))
    q_ext = jnp.concatenate([q_local, halo], axis=0)  # (m+1, 3)
    q6 = jnp.concatenate([q_ext[:-1], q_ext[1:]], axis=-1)  # (m, 6)
    Kt = assembly.element_tangent_stiffness(
        arr_local, q6, use_consistent=use_consistent
    )  # (m, 6, 6)
    m = q_local.shape[0]
    kd = jnp.zeros((m, 3, 3), Kt.dtype)
    kd = kd.at[:, :, :].add(Kt[:, 0:3, 0:3])  # K11 of element j -> node j
    kd = kd.at[1:, :, :].add(Kt[:-1, 3:6, 3:6])  # K22 of element j -> node j+1
    kup = jnp.zeros((m, 3, 3), Kt.dtype)
    kup = kup.at[:-1].set(Kt[:-1, 0:3, 3:6])
    kup = kup.at[-1].set(Kt[-1, 0:3, 3:6])  # U_k: last node -> right halo
    klow = jnp.zeros((m, 3, 3), Kt.dtype)
    klow = klow.at[1:].set(Kt[:-1, 3:6, 0:3])
    # Bridging element's far-node blocks belong to the right neighbor:
    # K22 joins its diagonal node 0, K21 becomes its L_k.
    send = jnp.stack([Kt[-1, 3:6, 3:6], Kt[-1, 3:6, 0:3]])
    recv = jax.lax.ppermute(send, axis, _right_perm(n_shards))
    kd = kd.at[0].add(recv[0])
    klow = klow.at[0].set(recv[1])
    return kd, klow, kup


def mask_aligned_blocks(jd, jlow, jup, mask_local, left_last_mask,
                        right_first_mask):
    """BC-mask shard-aligned blocks; unit pivots on constrained diagonals.

    ``mask_local``: (m, 3); ``left_last_mask`` / ``right_first_mask``: (3,)
    — the STATIC free-masks of the neighbor nodes the halo entries couple to
    (precomputed host-side; padding nodes are constrained, which also zeroes
    the ring's wraparound couplings exactly).
    """
    m3 = mask_local
    eye = jnp.eye(3, dtype=jd.dtype)
    jd = jd * m3[:, :, None] * m3[:, None, :] + (1.0 - m3)[:, :, None] * eye
    col_low = jnp.concatenate([left_last_mask[None], m3[:-1]], axis=0)
    jlow = jlow * m3[:, :, None] * col_low[:, None, :]
    col_up = jnp.concatenate([m3[1:], right_first_mask[None]], axis=0)
    jup = jup * m3[:, :, None] * col_up[:, None, :]
    return jd, jlow, jup


def mass_matvec_aligned(v_local, md, mlow, mup, axis, n_shards):
    """Masked matvec in the aligned-band convention (one halo each way)."""
    left_halo = jax.lax.ppermute(v_local[-1:], axis, _right_perm(n_shards))
    right_halo = jax.lax.ppermute(v_local[:1], axis, _left_perm(n_shards))
    v_ext = jnp.concatenate([left_halo, v_local, right_halo], axis=0)
    y = jnp.einsum("nij,nj->ni", md, v_local, precision=_HI)
    y = y + jnp.einsum("nij,nj->ni", mlow, v_ext[:-2], precision=_HI)
    y = y + jnp.einsum("nij,nj->ni", mup, v_ext[2:], precision=_HI)
    return y


# ---------------------------------------------------------------------------
# Distributed SPIKE solve
# ---------------------------------------------------------------------------


def _spike_local_solve(prep, rhs):
    """Apply the factored LOCAL (within-shard) solve; ``rhs``: (..., m, 3)."""
    solver = prep["local_solver"]
    if solver == "thomas":
        return banded.btd_solve(prep["factors"], rhs)
    if solver == "cr":
        return banded.btd_cr_solve(prep["factors"], rhs)
    # dense: one (3m, 3m) inverse applied as an MXU matmul.
    flat = rhs.reshape(*rhs.shape[:-2], -1)
    out = jnp.einsum("ij,...j->...i", prep["Ainv"], flat, precision=_HI)
    return out.reshape(rhs.shape)


def _resolve_local_solver(local_solver):
    """Platform default for the within-shard SPIKE solve lowering.

    Mirrors ``make_newmark_operator``'s linear_solver default: on the TPU
    backend the trace-time dense local inverse is both the MXU-throughput
    choice at production shard sizes AND — empirically — the SAFE one: the
    experimental axon backend miscompiles the batched implicit program
    when every operator lowers to block-tridiagonal scans (measured on the
    sharded tier round 5: one substep of the 4096-env nonlinear SPIKE
    program returns finite-but-wrong states, q-plane rel dev ~1e2 vs the
    identical CPU f32 program; docs/design.md pitfall 4). CPU lowers the
    scans correctly; Thomas is the memory-lean throughput choice there.
    """
    if local_solver is None:
        import jax

        return "thomas" if jax.default_backend() == "cpu" else "dense"
    return local_solver


def spike_prepare(jd, jlow, jup, axis: str, n_shards: int,
                  local_solver: str = "thomas"):
    """Factor a shard-aligned block-tridiagonal operator for SPIKE solves.

    ``jlow[0]`` is ``L_k`` (left inter-shard coupling), ``jup[-1]`` is
    ``U_k``. Returns an opaque pytree consumed by :func:`spike_solve`:
    local factors, the two spike column blocks, and the replicated
    inverse of the (6S, 6S) interface system.

    ``local_solver`` selects how the within-shard block-tridiagonal system
    is solved — all three are exact (algebraically identical results;
    parity pinned in tests/test_sharding.py):

    * ``"thomas"`` — O(m) block-Thomas ``lax.scan`` sweeps. Throughput-
      optimal per FLOP, but on the experimental axon TPU backend a batched
      implicit program whose EVERY operator lowers to such scans is the
      known fusion-miscompile trigger (docs/design.md backend pitfall 4:
      batched output != per-env output of the same jitted program, each
      component individually correct) — the suspected root cause of the
      round-3/4 nonlinear sharded hardware NaNs.
    * ``"cr"`` — block cyclic reduction (``banded.btd_cr_*``): log-depth
      vectorized levels, no scan recursion; dodges the all-scan shape.
    * ``"dense"`` — trace-time ``(3m, 3m)`` local inverse applied as an
      MXU matmul: the same substitution that fixed pitfall 4 on the dense
      engine, and at production shard counts (m = Np/S nodes per shard)
      a small, batch-friendly matmul.
    """
    m = jd.shape[0]
    Lk, Uk = jlow[0], jup[-1]
    jl_in, ju_in = jlow[1:], jup[:-1]
    if local_solver == "thomas":
        prep0 = {"local_solver": "thomas",
                 "factors": banded.btd_factor(jd, jl_in, ju_in)}
    elif local_solver == "cr":
        prep0 = {"local_solver": "cr",
                 "factors": banded.btd_cr_factor(jd, jl_in, ju_in)}
    elif local_solver == "dense":
        A = jnp.zeros((m, 3, m, 3), jd.dtype)
        idx = jnp.arange(m)
        A = A.at[idx, :, idx, :].set(jd)
        if m > 1:
            i1 = jnp.arange(m - 1)
            A = A.at[i1 + 1, :, i1, :].set(jl_in)
            A = A.at[i1, :, i1 + 1, :].set(ju_in)
        # default_matmul_precision context: linalg.inv's blocked LU updates
        # are dot_generals with no per-call precision arg.
        with jax.default_matmul_precision("highest"):
            Ainv = jnp.linalg.inv(A.reshape(3 * m, 3 * m))
        prep0 = {"local_solver": "dense", "Ainv": Ainv}
    else:
        raise ValueError(
            f"local_solver must be 'thomas', 'cr' or 'dense', "
            f"got {local_solver!r}"
        )

    def solve_cols(rhs_blocks):
        # (m, 3, 3) block rhs -> solve each of the 3 columns.
        b = jnp.moveaxis(rhs_blocks, -1, 0)  # (3, m, 3)
        x = _spike_local_solve(prep0, b)
        return jnp.moveaxis(x, 0, -1)  # (m, 3, 3)

    V = solve_cols(jnp.zeros_like(jd).at[0, :, :].set(Lk))
    W = solve_cols(jnp.zeros_like(jd).at[m - 1, :, :].set(Uk))

    S = n_shards
    gV0 = jax.lax.all_gather(V[0], axis)  # (S, 3, 3)
    gVl = jax.lax.all_gather(V[-1], axis)
    gW0 = jax.lax.all_gather(W[0], axis)
    gWl = jax.lax.all_gather(W[-1], axis)

    dtype = jd.dtype
    eye = jnp.eye(3, dtype=dtype)
    Mred = jnp.zeros((S, 2, 3, S, 2, 3), dtype)
    idx = jnp.arange(S)
    km1 = (idx - 1) % S
    kp1 = (idx + 1) % S
    Mred = Mred.at[idx, 0, :, idx, 0, :].set(eye)
    Mred = Mred.at[idx, 1, :, idx, 1, :].set(eye)
    Mred = Mred.at[idx, 0, :, km1, 1, :].add(gV0)
    Mred = Mred.at[idx, 1, :, km1, 1, :].add(gVl)
    Mred = Mred.at[idx, 0, :, kp1, 0, :].add(gW0)
    Mred = Mred.at[idx, 1, :, kp1, 0, :].add(gWl)
    # default_matmul_precision context: linalg.inv's blocked LU updates are
    # dot_generals with no per-call precision arg.
    with jax.default_matmul_precision("highest"):
        Mred_inv = jnp.linalg.inv(Mred.reshape(6 * S, 6 * S))
    return {**prep0, "V": V, "W": W, "Mred_inv": Mred_inv}


def spike_solve(prep, r_local, axis: str, n_shards: int):
    """Exact distributed solve ``T x = r`` from :func:`spike_prepare`.

    Per call: one local substitution (Thomas/CR/dense per the prep's
    ``local_solver``), one all_gather of the 6 interface floats per shard,
    one replicated (6S, 6S) matvec, one local rank-2 correction.
    """
    S = n_shards
    y = _spike_local_solve(prep, r_local)  # (m, 3)
    g = jax.lax.all_gather(jnp.stack([y[0], y[-1]]), axis)  # (S, 2, 3)
    z = jnp.einsum(
        "ij,j->i", prep["Mred_inv"], g.reshape(6 * S), precision=_HI
    ).reshape(S, 2, 3)
    k = jax.lax.axis_index(axis)
    l_left = z[(k - 1) % S, 1]
    f_right = z[(k + 1) % S, 0]
    x = (
        y
        - jnp.einsum("nij,j->ni", prep["V"], l_left, precision=_HI)
        - jnp.einsum("nij,j->ni", prep["W"], f_right, precision=_HI)
    )
    return x


# ---------------------------------------------------------------------------
# Sharded generalized-alpha stepping
# ---------------------------------------------------------------------------


def _traced_mass_bands(arrays, Np: int, dtype):
    """Shard-aligned consistent-mass bands from a TRACED parameter pytree.

    The jnp twin of the host-NumPy band construction in
    :func:`_shard_aligned_setup` (same truncation/zero-row layout), so
    ``jax.grad`` flows from rollout losses into density/area/length.
    """
    diag, off = assembly.mass_block_tridiagonal(arrays)
    md = jnp.asarray(diag, dtype)[:Np]
    off = jnp.asarray(off, dtype)[: Np - 1]
    z33 = jnp.zeros((1, 3, 3), dtype)
    ml = jnp.concatenate([z33, jnp.swapaxes(off, -1, -2)], axis=0)
    mu = jnp.concatenate([off, z33], axis=0)
    return md, ml, mu


def _traced_drag_factors(arrays, n_real: int, Np: int,
                         fluid_density: float, dtype):
    """jnp twin of :func:`spatial.node_drag_factors` (final-node quirk incl.)."""
    w = jnp.asarray(arrays.wetted_area, dtype)
    c = jnp.asarray(arrays.drag_coef, dtype)
    half_rho = 0.5 * fluid_density
    fac_w = jnp.zeros(Np, dtype)
    fac_w = fac_w.at[: n_real - 1].set(
        half_rho * w[: n_real - 1] * c[: n_real - 1]
    )
    fac_w = fac_w.at[n_real - 1].set(
        half_rho * w[n_real - 2] * c[n_real - 2]
    )
    z = jnp.zeros(Np, dtype)
    return jnp.stack([z, fac_w, z], axis=-1)


def _traced_gravity_masses(arrays, n_real: int, dtype):
    """jnp twin of :func:`spatial.element_gravity_masses`."""
    m = (
        jnp.asarray(arrays.density, dtype)
        * jnp.asarray(arrays.cross_area, dtype)
        * jnp.asarray(arrays.length, dtype)
    )
    return m.at[n_real - 1:].set(0.0)


def _operand_arrays(beam, Np, mdiag, mlow, mup, arr_fields, dfac_np,
                    gmass_np, has_fluid, fluid_density, has_gravity,
                    arrays, dtype):
    """Traced-or-baked rollout operands for the sharded implicit builders.

    ``arrays=None`` returns the baked host constants (bit-identical to the
    pre-parametric path). Otherwise the mass bands, element fields, drag
    factors, and gravity masses are recomputed from the TRACED
    :class:`BeamArrays` inside the caller's trace, so differentiation
    w.r.t. physical parameters flows through the whole sharded rollout
    (see ``build_spatial_genalpha``'s rollout docstring for the contract).
    """
    def _cast_fields(fields):
        # Element parameters compute in the STATE dtype (all but the bool
        # nonlinear mask) — otherwise an f32 rollout under an x64 host
        # promotes the tangent/internal force (and thence the whole SPIKE
        # recurrence) to f64, diverging from what hardware actually runs.
        ln, E, I, A, nl = fields
        return (jnp.asarray(ln, dtype), jnp.asarray(E, dtype),
                jnp.asarray(I, dtype), jnp.asarray(A, dtype), nl)

    if arrays is None:
        return (
            jnp.asarray(mdiag, dtype), jnp.asarray(mlow, dtype),
            jnp.asarray(mup, dtype), _cast_fields(arr_fields),
            jnp.asarray(dfac_np, dtype), jnp.asarray(gmass_np, dtype),
        )
    md_j, ml_j, mu_j = _traced_mass_bands(arrays, Np, dtype)
    arr_j = _cast_fields((
        arrays.length, arrays.elastic_modulus, arrays.moment_inertia,
        arrays.cross_area, arrays.nonlinear_mask,
    ))
    dfac_j = (
        _traced_drag_factors(arrays, beam.n_nodes_real, Np,
                             float(fluid_density), dtype)
        if has_fluid else jnp.zeros((Np, 3), dtype)
    )
    gmass_j = (
        _traced_gravity_masses(arrays, beam.n_nodes_real, dtype)
        if has_gravity else jnp.zeros(Np, dtype)
    )
    return md_j, ml_j, mu_j, arr_j, dfac_j, gmass_j


def _shard_aligned_setup(beam: SpatialBeam) -> dict:
    """Host constants shared by the fixed-dt and adaptive gen-α builders.

    Shard-aligned mass bands WITHOUT BC masking (masking is applied once on
    the assembled operators and on matvec inputs inside the cores), the
    static neighbor seam masks (shard k's rows are the free-masks of its
    neighbors' interface nodes; ring seams get zeros, which also zeroes the
    wraparound couplings exactly), the element-parameter fields, and the
    PartitionSpecs. One definition so a seam-indexing fix can never apply
    to one builder and not the other.
    """
    from jax.sharding import PartitionSpec

    arrays = beam.arrays
    axis, S, Np = beam.axis, beam.n_shards, beam.n_nodes
    mask_nodes = np.asarray(beam.free_mask, dtype=np.float64)

    mdiag, moff = assembly.mass_block_tridiagonal(arrays)
    mdiag = np.asarray(mdiag)[:Np]
    moff = np.asarray(moff)[: Np - 1]
    zeros33 = np.zeros((1, 3, 3), dtype=mdiag.dtype)
    mlow = np.concatenate([zeros33, np.swapaxes(moff, -1, -2)], axis=0)
    mup = np.concatenate([moff, zeros33], axis=0)

    m_per = Np // S
    left_last_node = np.vstack(
        [np.zeros(3), mask_nodes[m_per - 1 :: m_per][: S - 1]]
    )
    right_first_node = np.vstack(
        [mask_nodes[m_per::m_per][: S - 1], np.zeros(3)]
    )
    arr_fields = (
        arrays.length, arrays.elastic_modulus, arrays.moment_inertia,
        arrays.cross_area, arrays.nonlinear_mask,
    )
    return dict(
        mask_nodes=mask_nodes, mdiag=mdiag, mlow=mlow, mup=mup,
        left_last_node=left_last_node, right_first_node=right_first_node,
        arr_fields=arr_fields, m_local=m_per,
        p_rep=PartitionSpec(),
        p_node=PartitionSpec(axis, None),
        p_block=PartitionSpec(axis, None, None),
        p_el=PartitionSpec(axis),
        p_x=PartitionSpec(None, axis, None),
    )


def build_spatial_genalpha(
    beam: SpatialBeam,
    dt: float,
    rho_inf: float = 0.8,
    n_newton: int = 1,
    use_consistent: bool = False,
    fluid_density: float = None,
    gravity=None,
    node_force: Callable = None,
    local_solver: str = None,
) -> Callable:
    """Implicit generalized-alpha rollout over the ``sp`` mesh axis.

    Returns ``rollout(x0, n_frames, u=None, substeps=1) -> (ts, xs)`` where
    ``x0`` is ``(2, Np, 3)`` node-layout state (leading env batch allowed —
    vmapped over ``dp``), ``u`` a constant ``(Np, 3)`` force layout, and
    ``xs`` has the frame axis leading, ``xs[0] = x0``.

    ``fluid_density``: enable the reference's quadratic transverse fluid
    drag on the sharded axis. The drag is node-LOCAL (zero additional
    communication; factors from :func:`spatial.node_drag_factors`, incl.
    the final-node quirk); it enters the residual at the alpha-point
    velocity and is LAGGED in the Jacobian — exactly the single-chip
    treatment (``op.external_force`` enters residual only).

    ``node_force``: optional custom external force ``f(x, t) -> (nodes,
    3)`` with ``x = (2, nodes, 3)`` stacked (positions, velocities) in
    node layout — the sharded counterpart of the single-chip engines'
    ``external_force(x, t)`` (``ops/integrators.py``: residual-only at
    the alpha point, lagged in the Jacobian). The callable runs INSIDE
    ``shard_map`` on each device's node block, so it must be a NODEWISE
    (shape-polymorphic, node-local) map — springs, dampers, follower
    loads, time-harmonic forcing; anything coupling *different* nodes
    would need its own halo exchange and belongs in a custom engine.
    Constrained DOFs are masked before and after the call.

    Modified Newton with the zero-state tangent: the SPIKE preparation
    (local factorization + spike columns + interface inverse) happens ONCE
    at trace time for both the effective Jacobian and the mass operator;
    each step then costs 2 halo ppermutes (internal force), 2 (mass matvec)
    and one 6-float all_gather per Newton correction. The recurrence is
    identical to the single-chip dense engine — equality to 1e-8 on a fake
    mesh is pinned in tests/test_sharding.py.
    """
    local_solver = _resolve_local_solver(local_solver)
    mesh, axis, S = beam.mesh, beam.axis, beam.n_shards
    Np = beam.n_nodes

    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    gamma = 0.5 - am + af
    c_jac = (1.0 - af) * beta * dt * dt
    a_jac = 1.0 - am

    su = _shard_aligned_setup(beam)
    mask_nodes, mdiag, mlow, mup = (
        su["mask_nodes"], su["mdiag"], su["mlow"], su["mup"]
    )
    left_last_node, right_first_node = (
        su["left_last_node"], su["right_first_node"]
    )
    arr_fields, m_local = su["arr_fields"], su["m_local"]
    p_node, p_block, p_el, p_x = (
        su["p_node"], su["p_block"], su["p_el"], su["p_x"]
    )
    from jax.sharding import PartitionSpec

    from .spatial import element_gravity_masses, node_drag_factors

    has_fluid = fluid_density is not None
    dfac_np = (
        node_drag_factors(beam, float(fluid_density)) if has_fluid
        else np.zeros((Np, 3))
    )
    has_gravity = gravity is not None
    if has_gravity and len(np.asarray(gravity).ravel()) != 3:
        raise ValueError("gravity must be a 3-vector [gx, gy, gz]")
    gmass_np = element_gravity_masses(beam) if has_gravity else np.zeros(Np)
    g_x = float(np.asarray(gravity).ravel()[0]) if has_gravity else 0.0
    g_y = float(np.asarray(gravity).ravel()[1]) if has_gravity else 0.0
    has_nf = node_force is not None

    def make_core(n_frames: int, substeps: int, carry_in: bool = False,
                  carry_out: bool = False, t0: float = 0.0):
        frames_spec = PartitionSpec(None, None, axis, None)
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(p_x, p_node, p_node, p_node, p_block, p_block,
                      p_block, p_node, p_node, p_el, p_el, p_el, p_el,
                      p_el, p_el),
            out_specs=(
                (frames_spec, p_x) if carry_out else frames_spec
            ),
        )
        def rollout_core(x, u_node, dfac, m_mask, md, ml, mu, llm, rfm,
                         a_len, a_E, a_I, a_A, a_nl, gmass):
            dtype = md.dtype
            arr_local = _local_arrays(a_len, a_E, a_I, a_A, a_nl)
            llm3, rfm3 = llm[0], rfm[0]  # (3,) static neighbor masks
            m3 = m_mask

            # BC-masked mass bands (for the matvec and the c=0 solve).
            md_bc, ml_bc, mu_bc = mask_aligned_blocks(
                md, ml, mu, m3, llm3, rfm3
            )

            # Zero-state tangent (modified Newton): env-independent — a
            # STATIC zero state, so under an outer vmap the whole SPIKE
            # preparation stays unbatched (one prep shared by all envs).
            q0_loc = jnp.zeros((m_local, 3), dtype)
            kd, klow, kup = spatial_tangent_aligned(
                q0_loc, arr_local, axis, S, use_consistent
            )
            jd = a_jac * md + c_jac * kd
            jl = a_jac * ml + c_jac * klow
            ju = a_jac * mu + c_jac * kup
            jd, jl, ju = mask_aligned_blocks(jd, jl, ju, m3, llm3, rfm3)
            prep_jac = spike_prepare(jd, jl, ju, axis, S, local_solver)
            prep_mass = spike_prepare(
                md_bc, ml_bc, mu_bc, axis, S, local_solver
            )

            def internal(q):
                return spatial_internal_force_local(
                    q * m3, arr_local, m3, axis, S, use_consistent
                )

            def mass_apply(a_vec):
                return mass_matvec_aligned(
                    a_vec * m3, md_bc, ml_bc, mu_bc, axis, S
                ) * m3

            def drag(v_at):
                # Node-local quadratic transverse drag residual term
                # (+fac*v|v| because r carries MINUS the external force).
                return dfac * v_at * jnp.abs(v_at)

            def grav(q_at):
                from .spatial import spatial_gravity_force_local

                return spatial_gravity_force_local(
                    q_at * m3, gmass, g_x, g_y, m3, axis, S
                )

            def nf(q_at, v_at, t_at):
                return node_force(
                    jnp.stack([q_at * m3, v_at * m3]), t_at
                ) * m3

            u_m = u_node * m3
            q, v = x[0] * m3, x[1] * m3
            if carry_in:
                # Exact continuation: the caller supplies the generalized-
                # alpha acceleration carry from a previous chunk, so the
                # recurrence continues bit-for-bit — no consistency reset
                # at the chunk boundary (the reset perturbs, and slightly
                # damps, the discrete recurrence).
                a = x[2] * m3
            else:
                f0 = u_m - internal(q)
                if has_fluid:
                    f0 = f0 - drag(v)
                if has_gravity:
                    f0 = f0 + grav(q)
                if has_nf:
                    f0 = f0 + nf(q, v, jnp.asarray(0.0, dtype))
                a = spike_solve(prep_mass, f0 * m3, axis, S) * m3

            def substep(carry, t):
                q, v, a = carry
                q_pred = q + dt * v + (0.5 - beta) * dt * dt * a
                v_pred = v + (1.0 - gamma) * dt * a

                def newton(_, a1):
                    q1 = q_pred + beta * dt * dt * a1
                    q_af = (1.0 - af) * q1 + af * q
                    a_am = (1.0 - am) * a1 + am * a
                    r = mass_apply(a_am) + internal(q_af) - u_m
                    if has_fluid or has_nf:
                        v1 = v_pred + gamma * dt * a1
                        v_af = (1.0 - af) * v1 + af * v
                    if has_fluid:
                        r = r + drag(v_af)
                    if has_gravity:
                        r = r - grav(q_af)
                    if has_nf:
                        r = r - nf(q_af, v_af, t + (1.0 - af) * dt)
                    da = spike_solve(prep_jac, r * m3, axis, S) * m3
                    return a1 - da

                a1 = jax.lax.fori_loop(0, n_newton, newton, a)
                q1 = q_pred + beta * dt * dt * a1
                v1 = v_pred + gamma * dt * a1
                return (q1, v1, a1), None

            def frame(carry, fidx):
                # Substep start times: only materialized on the node_force
                # path (fidx is None otherwise — trace unchanged).
                ts_sub = (
                    None if fidx is None
                    else t0 + (fidx * substeps
                               + jnp.arange(substeps, dtype=dtype)) * dt
                )
                carry, _ = jax.lax.scan(
                    substep, carry, ts_sub, length=substeps
                )
                qf, vf, _ = carry
                return carry, jnp.stack([qf, vf])

            fidxs = (
                jnp.arange(n_frames, dtype=dtype) if has_nf else None
            )
            (qf, vf, af_), xs = jax.lax.scan(
                frame, (q, v, a), fidxs, length=n_frames
            )
            frames = jnp.concatenate(
                [jnp.stack([q, v])[None], xs], axis=0
            )
            if carry_out:
                return frames, jnp.stack([qf, vf, af_])
            return frames

        return rollout_core

    def rollout(x0, n_frames: int, u=None, substeps: int = 1, arrays=None,
                return_carry: bool = False, t0: float = 0.0):
        """Roll ``x0`` for ``n_frames``; see builder docstring.

        ``arrays``: optional TRACED element-parameter pytree (a
        :class:`BeamArrays` shaped like ``beam.arrays`` — build it with
        ``dataclasses.replace(beam.arrays, elastic_modulus=...)`` etc.,
        keeping pad entries at their padded values). When given, the mass
        bands, drag factors, and gravity masses are recomputed from it
        inside the trace, so the whole sharded implicit rollout is
        DIFFERENTIABLE w.r.t. physical parameters (system identification
        on beams too long for one chip); with ``arrays=None`` the baked
        host constants are used (bit-identical to the non-parametric
        path). Differentiate UNDER JIT — ``jax.jit(jax.grad(loss))`` —
        the eager shard_map transpose mis-propagates the cotangent
        sharding of the element-sharded fields on current jax
        ("Unexpected XLA sharding override"); jit resolves it.

        Chunked driving (exact continuation across calls): pass
        ``return_carry=True`` to additionally get the final ``(3, Np, 3)``
        generalized-alpha carry ``[q; v; a]`` (env-batched:
        ``(envs, 3, Np, 3)``); feed it back as ``x0`` of the next call
        (3-plane inputs skip the consistent-acceleration solve and
        continue the recurrence bit-for-bit — no per-chunk consistency
        reset). ``t0`` offsets the ``node_force`` evaluation times and the
        returned frame times for continuation chunks. This is how long
        spans are driven on execution-watchdog-limited stacks (one device
        call per chunk) without changing the step sequence.
        """
        core = make_core(int(n_frames), int(substeps),
                         carry_in=jnp.asarray(x0).shape[-3] == 3,
                         carry_out=bool(return_carry), t0=float(t0))
        x0 = jnp.asarray(x0)
        if u is None:
            u_node = jnp.zeros((Np, 3), dtype=x0.dtype)
        else:
            u_node = jnp.asarray(u, dtype=x0.dtype)
        mask = jnp.asarray(mask_nodes, dtype=x0.dtype)

        md_j, ml_j, mu_j, arr_j, dfac_j, gmass_j = _operand_arrays(
            beam, Np, mdiag, mlow, mup, arr_fields, dfac_np, gmass_np,
            has_fluid, fluid_density, has_gravity, arrays, x0.dtype,
        )

        def run_one(x_single):
            return core(
                x_single, u_node, dfac_j, mask,
                md_j, ml_j, mu_j,
                jnp.asarray(left_last_node, x0.dtype),
                jnp.asarray(right_first_node, x0.dtype),
                *arr_j,
                gmass_j,
            )

        if x0.ndim == 4:  # (envs, 2|3, Np, 3) -> vmap over dp
            out_ax = (1, 0) if return_carry else 1
            out = jax.vmap(run_one, out_axes=out_ax)(x0)
        else:
            out = run_one(x0)
        ts = t0 + (dt * substeps) * jnp.arange(n_frames + 1)
        if return_carry:
            xs, carry = out
            return ts, xs, carry
        return ts, out

    return rollout


def build_spatial_genalpha_adaptive(
    beam: SpatialBeam,
    rho_inf: float = 0.9,
    n_newton: int = 2,
    use_consistent: bool = False,
    max_steps_per_interval: int = 100_000,
    safety: float = 0.9,
    fluid_density: float = None,
    gravity=None,
    node_force: Callable = None,
    local_solver: str = None,
) -> Callable:
    """ERROR-CONTROLLED implicit stepping over the ``sp`` mesh axis.

    ``node_force``: optional nodewise custom external force ``f(x, t)``
    (same contract as :func:`build_spatial_genalpha`) — evaluated at the
    alpha point of every trial step, so error control sees it.

    The distributed counterpart of
    ``ops.integrators.integrate_generalized_alpha_adaptive`` — the same
    Zienkiewicz-Xie estimate + PI accept/reject controller, with the SPIKE
    preparation (local block-Thomas factorization + spike columns +
    replicated interface inverse) re-run AT THE TRIAL dt inside the
    ``lax.while_loop``: a traced dt admits no prefactoring, exactly as in
    the dense engine, and every piece of the preparation is traceable
    (O(m) local scan + one all_gather + a (6S, 6S) replicated inverse).
    The error norm is psum-contracted over the shards (free DOFs only), so
    every shard takes identical accept/reject decisions — one global dt,
    no divergence across the mesh.

    Returns ``rollout(x0, t_eval, u=None, rtol=1e-6, atol=1e-9, dt0=None)
    -> (xs, AdaptiveStats)`` with ``xs`` frames leading, ``xs[0] = x0``
    (node layout, like :func:`build_spatial_genalpha`). Batched ``x0``
    (``(envs, 2, Np, 3)``) vmaps over ``dp`` with PER-ENV dt control
    (masked while-loop lanes). Beams too long for one chip thus get the
    no-manual-dt capability the single-chip engines have.
    """
    from ..ops.integrators import AdaptiveStats, adaptive_drive

    local_solver = _resolve_local_solver(local_solver)
    mesh, axis, S = beam.mesh, beam.axis, beam.n_shards
    Np = beam.n_nodes

    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    gamma = 0.5 - am + af
    a_jac = 1.0 - am
    zx_coeff = abs(float(beta - 1.0 / 6.0))

    su = _shard_aligned_setup(beam)
    mask_nodes, mdiag, mlow, mup = (
        su["mask_nodes"], su["mdiag"], su["mlow"], su["mup"]
    )
    left_last_node, right_first_node = (
        su["left_last_node"], su["right_first_node"]
    )
    arr_fields, m_local = su["arr_fields"], su["m_local"]
    p_rep, p_node, p_block, p_el, p_x = (
        su["p_rep"], su["p_node"], su["p_block"], su["p_el"], su["p_x"]
    )
    from jax.sharding import PartitionSpec

    from .spatial import element_gravity_masses, node_drag_factors

    has_fluid = fluid_density is not None
    dfac_np = (
        node_drag_factors(beam, float(fluid_density)) if has_fluid
        else np.zeros((Np, 3))
    )
    has_gravity = gravity is not None
    if has_gravity and len(np.asarray(gravity).ravel()) != 3:
        raise ValueError("gravity must be a 3-vector [gx, gy, gz]")
    gmass_np = element_gravity_masses(beam) if has_gravity else np.zeros(Np)
    g_x = float(np.asarray(gravity).ravel()[0]) if has_gravity else 0.0
    g_y = float(np.asarray(gravity).ravel()[1]) if has_gravity else 0.0
    has_nf = node_force is not None

    def make_core(n_intervals: int, rtol: float, atol: float,
                  carry_in: bool = False, carry_out: bool = False):
        frames_spec = PartitionSpec(None, None, axis, None)
        stats_spec = AdaptiveStats(p_rep, p_rep, p_rep, p_rep, p_rep)
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(p_rep, p_rep, p_x, p_node, p_node, p_node, p_block,
                      p_block, p_block, p_node, p_node, p_el, p_el, p_el,
                      p_el, p_el, p_el),
            out_specs=(
                (frames_spec, stats_spec, p_x) if carry_out
                else (frames_spec, stats_spec)
            ),
        )
        def core(t_evals, dt0, x, u_node, dfac, m_mask, md, ml, mu, llm,
                 rfm, a_len, a_E, a_I, a_A, a_nl, gmass):
            dtype = md.dtype
            arr_local = _local_arrays(a_len, a_E, a_I, a_A, a_nl)
            llm3, rfm3 = llm[0], rfm[0]
            m3 = m_mask

            md_bc, ml_bc, mu_bc = mask_aligned_blocks(
                md, ml, mu, m3, llm3, rfm3
            )
            q0_loc = jnp.zeros((m_local, 3), dtype)
            kd, klow, kup = spatial_tangent_aligned(
                q0_loc, arr_local, axis, S, use_consistent
            )
            prep_mass = spike_prepare(
                md_bc, ml_bc, mu_bc, axis, S, local_solver
            )
            n_free = jax.lax.psum(jnp.sum(m3), axis)

            def nf(q_at, v_at, t_at):
                return node_force(
                    jnp.stack([q_at * m3, v_at * m3]), t_at
                ) * m3

            def make_prep(dt):
                c_jac = (1.0 - af) * beta * dt * dt
                jd = a_jac * md + c_jac * kd
                jl = a_jac * ml + c_jac * klow
                ju = a_jac * mu + c_jac * kup
                jd, jl, ju = mask_aligned_blocks(jd, jl, ju, m3, llm3, rfm3)
                return spike_prepare(jd, jl, ju, axis, S, local_solver)

            def internal(q):
                return spatial_internal_force_local(
                    q * m3, arr_local, m3, axis, S, use_consistent
                )

            def mass_apply(a_vec):
                return mass_matvec_aligned(
                    a_vec * m3, md_bc, ml_bc, mu_bc, axis, S
                ) * m3

            def drag(v_at):
                return dfac * v_at * jnp.abs(v_at)

            def grav(q_at):
                from .spatial import spatial_gravity_force_local

                return spatial_gravity_force_local(
                    q_at * m3, gmass, g_x, g_y, m3, axis, S
                )

            u_m = u_node * m3
            q0 = x[0] * m3
            v0 = x[1] * m3
            if carry_in:
                # Exact continuation (chunked driving): the caller supplies
                # the algorithmic acceleration from a previous chunk — no
                # consistency reset at the boundary.
                a0 = x[2] * m3
            else:
                f0 = u_m - internal(q0)
                if has_fluid:
                    f0 = f0 - drag(v0)
                if has_gravity:
                    f0 = f0 + grav(q0)
                if has_nf:
                    f0 = f0 + nf(q0, v0, t_evals[0])
                a0 = spike_solve(prep_mass, f0 * m3, axis, S) * m3

            def trial_step(dt, q, v, a, t):
                prep = make_prep(dt)
                q_pred = q + dt * v + (0.5 - beta) * dt * dt * a
                v_pred = v + (1.0 - gamma) * dt * a

                def newton(_, a1):
                    q1 = q_pred + beta * dt * dt * a1
                    q_af = (1.0 - af) * q1 + af * q
                    a_am = (1.0 - am) * a1 + am * a
                    r = mass_apply(a_am) + internal(q_af) - u_m
                    if has_fluid or has_nf:
                        v1 = v_pred + gamma * dt * a1
                        v_af = (1.0 - af) * v1 + af * v
                    if has_fluid:
                        r = r + drag(v_af)
                    if has_gravity:
                        r = r - grav(q_af)
                    if has_nf:
                        r = r - nf(q_af, v_af, t + (1.0 - af) * dt)
                    da = spike_solve(prep, r * m3, axis, S) * m3
                    return a1 - da

                a1 = jax.lax.fori_loop(0, n_newton, newton, a)
                return (
                    q_pred + beta * dt * dt * a1,
                    v_pred + gamma * dt * a1,
                    a1,
                )

            def err_norm(e, q_old, q_new):
                scale = atol + rtol * jnp.maximum(
                    jnp.abs(q_old), jnp.abs(q_new)
                )
                s = jax.lax.psum(jnp.sum(((e / scale) ** 2) * m3), axis)
                return jnp.sqrt(s / n_free)

            def trial(t, dt_tr, state):
                q, v, a = state
                q1, v1, a1 = trial_step(dt_tr, q, v, a, t)
                e = zx_coeff * dt_tr * dt_tr * (a1 - a)
                # psum-contracted norm: every shard sees the same en, so
                # the shared driver's accept/reject is globally identical.
                return (q1, v1, a1), err_norm(e, q, q1)

            state_f, xs, stats = adaptive_drive(
                trial, (q0, v0, a0), t_evals,
                jnp.asarray(dt0, dtype)[()], -1.0 / 3.0,
                max_steps_per_interval=max_steps_per_interval,
                safety=safety,
                frame_out=lambda s: jnp.stack([s[0], s[1]]),
            )
            xs = jnp.concatenate(
                [jnp.stack([q0, v0])[None], xs], axis=0
            )
            if carry_out:
                return xs, stats, jnp.stack(state_f)
            return xs, stats

        return core

    def rollout(x0, t_eval, u=None, rtol: float = 1e-6,
                atol: float = 1e-9, dt0: float = None, arrays=None,
                return_carry: bool = False):
        """Adaptive rollout; see builder docstring.

        ``arrays``: optional TRACED :class:`BeamArrays` (same contract as
        ``build_spatial_genalpha``'s rollout) — with it, forward parameter
        sensitivities flow through the error-controlled sharded engine via
        ``jax.jvp`` (the while_loop has no adjoint, so reverse mode stays
        on the fixed-dt rollouts).

        Chunked driving (exact continuation across calls, the watchdog-
        safe span pattern — see ``simulate(chunk=...)``): pass
        ``return_carry=True`` to additionally get the final ``(3, Np, 3)``
        algorithmic carry ``[q; v; a]`` (env-batched: leading env axis);
        feed it back as ``x0`` of the next call (3-plane inputs skip the
        consistent-acceleration solve) together with
        ``dt0=stats.dt_next`` (``dt0`` may be an ``(envs,)`` array on
        batched rollouts — per-env controller continuation).
        """
        t_eval_np = np.asarray(jax.device_get(t_eval), np.float64)
        if dt0 is None:
            dt0 = float(t_eval_np[1] - t_eval_np[0]) / 16.0
        x0 = jnp.asarray(x0)
        t_evals = jnp.asarray(t_eval_np, x0.dtype)
        core = make_core(len(t_eval_np) - 1, float(rtol), float(atol),
                         carry_in=x0.shape[-3] == 3,
                         carry_out=bool(return_carry))
        if u is None:
            u_node = jnp.zeros((Np, 3), dtype=x0.dtype)
        else:
            u_node = jnp.asarray(u, dtype=x0.dtype)
        mask = jnp.asarray(mask_nodes, dtype=x0.dtype)
        dt0_arr = jnp.asarray(dt0, x0.dtype)
        md_j, ml_j, mu_j, arr_j, dfac_j, gmass_j = _operand_arrays(
            beam, Np, mdiag, mlow, mup, arr_fields, dfac_np, gmass_np,
            has_fluid, fluid_density, has_gravity, arrays, x0.dtype,
        )

        def run_one(x_single, dt0_single):
            return core(
                t_evals, dt0_single, x_single, u_node,
                dfac_j, mask,
                md_j, ml_j, mu_j,
                jnp.asarray(left_last_node, x0.dtype),
                jnp.asarray(right_first_node, x0.dtype),
                *arr_j,
                gmass_j,
            )

        if x0.ndim == 4:  # (envs, 2|3, Np, 3): per-env dt via vmap over dp
            if dt0_arr.ndim == 0:
                dt0_arr = jnp.broadcast_to(dt0_arr, (x0.shape[0],))
            out_ax = (1, 0, 0) if return_carry else (1, 0)
            out = jax.vmap(run_one, out_axes=out_ax)(x0, dt0_arr)
        else:
            out = run_one(x0, dt0_arr)
        return out

    return rollout


def build_spatial_sdirk3(
    beam: SpatialBeam,
    n_newton: int = 2,
    use_consistent: bool = False,
    max_steps_per_interval: int = 10_000,
    safety: float = 0.9,
    fluid_density: float = None,
    gravity=None,
    node_force: Callable = None,
    local_solver: str = None,
):
    """Error-controlled SDIRK3 on the sharded beam axis.

    ``node_force``: optional nodewise custom external force ``f(x, t)``
    (same contract as :func:`build_spatial_genalpha`) — evaluated at
    every stage state/time, exactly like the single-chip
    ``sdirk3_step``'s ``external_force``.

    The accuracy-grade stiff engine (L-stable 3rd-order Alexander DIRK with
    a TRUE embedded estimate — ``ops.integrators.sdirk3_step``) distributed
    over the ``sp`` mesh axis. Same structure as
    :func:`build_spatial_genalpha_adaptive`: SPIKE is the stage solver, the
    error norm is psum-contracted over exactly the free DOFs so every shard
    takes the identical accept/reject decision, and the shared
    ``adaptive_drive`` owns the controller.

    The frozen-tangent structure pays off doubly here: all three stages
    share ONE effective Jacobian ``M + (dt*g)^2 K0``, so each trial dt
    costs ONE SPIKE preparation reused across ``3*n_newton`` Newton solves
    AND the stiff error filter (Hairer-Wanner ``(I - dt*g*J)^{-1}``, which
    reduces to one more reuse of the same prepared system). The filter's
    exact ``K e_q`` term is a jvp of the halo-exchanged internal force —
    collectives differentiate to collectives, so the tangent rides the
    same ppermutes.

    Returns ``rollout(x0, t_eval, u=None, rtol=..., atol=..., dt0=None) ->
    (xs, AdaptiveStats)`` with the same contracts as the adaptive gen-alpha
    builder (vmap over a leading env axis for per-env dt on a dp x sp
    mesh).
    """
    from ..ops.integrators import (
        _SD_A,
        _SD_B,
        _SD_BHAT,
        _SD_C,
        _SD_G,
        AdaptiveStats,
        adaptive_drive,
    )

    local_solver = _resolve_local_solver(local_solver)
    mesh, axis, S = beam.mesh, beam.axis, beam.n_shards
    Np = beam.n_nodes

    su = _shard_aligned_setup(beam)
    mask_nodes, mdiag, mlow, mup = (
        su["mask_nodes"], su["mdiag"], su["mlow"], su["mup"]
    )
    left_last_node, right_first_node = (
        su["left_last_node"], su["right_first_node"]
    )
    arr_fields, m_local = su["arr_fields"], su["m_local"]
    p_rep, p_node, p_block, p_el, p_x = (
        su["p_rep"], su["p_node"], su["p_block"], su["p_el"], su["p_x"]
    )
    from jax.sharding import PartitionSpec

    from .spatial import element_gravity_masses, node_drag_factors

    has_fluid = fluid_density is not None
    dfac_np = (
        node_drag_factors(beam, float(fluid_density)) if has_fluid
        else np.zeros((Np, 3))
    )
    has_gravity = gravity is not None
    if has_gravity and len(np.asarray(gravity).ravel()) != 3:
        raise ValueError("gravity must be a 3-vector [gx, gy, gz]")
    gmass_np = element_gravity_masses(beam) if has_gravity else np.zeros(Np)
    g_x = float(np.asarray(gravity).ravel()[0]) if has_gravity else 0.0
    g_y = float(np.asarray(gravity).ravel()[1]) if has_gravity else 0.0
    has_nf = node_force is not None

    def make_core(n_intervals: int, rtol: float, atol: float):
        @partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(p_rep, p_rep, p_x, p_node, p_node, p_node, p_block,
                      p_block, p_block, p_node, p_node, p_el, p_el, p_el,
                      p_el, p_el, p_el),
            out_specs=(
                PartitionSpec(None, None, axis, None),
                AdaptiveStats(p_rep, p_rep, p_rep, p_rep, p_rep),
            ),
        )
        def core(t_evals, dt0, x, u_node, dfac, m_mask, md, ml, mu, llm,
                 rfm, a_len, a_E, a_I, a_A, a_nl, gmass):
            dtype = md.dtype
            arr_local = _local_arrays(a_len, a_E, a_I, a_A, a_nl)
            llm3, rfm3 = llm[0], rfm[0]
            m3 = m_mask

            md_bc, ml_bc, mu_bc = mask_aligned_blocks(
                md, ml, mu, m3, llm3, rfm3
            )
            q0_loc = jnp.zeros((m_local, 3), dtype)
            kd, klow, kup = spatial_tangent_aligned(
                q0_loc, arr_local, axis, S, use_consistent
            )
            n_free = jax.lax.psum(jnp.sum(m3), axis)

            def nf(q_at, v_at, t_at):
                return node_force(
                    jnp.stack([q_at * m3, v_at * m3]), t_at
                ) * m3

            def make_prep(c):
                jd = md + c * kd
                jl = ml + c * klow
                ju = mu + c * kup
                jd, jl, ju = mask_aligned_blocks(jd, jl, ju, m3, llm3, rfm3)
                return spike_prepare(jd, jl, ju, axis, S, local_solver)

            def internal(q):
                return spatial_internal_force_local(
                    q * m3, arr_local, m3, axis, S, use_consistent
                )

            def mass_apply(a_vec):
                return mass_matvec_aligned(
                    a_vec * m3, md_bc, ml_bc, mu_bc, axis, S
                ) * m3

            def grav(q_at):
                from .spatial import spatial_gravity_force_local

                return spatial_gravity_force_local(
                    q_at * m3, gmass, g_x, g_y, m3, axis, S
                )

            u_m = u_node * m3
            q0 = x[0] * m3
            v0 = x[1] * m3

            def sdirk_step(dt, q, v, t):
                dt_g = dt * _SD_G
                # One SPIKE preparation serves every stage Newton iterate
                # and the stiff error filter (frozen zero-state tangent).
                prep = make_prep(dt_g * dt_g)
                kqs, kvs = [], []
                for i in range(3):
                    bq, bv = q, v
                    for j in range(i):
                        bq = bq + dt * _SD_A[i][j] * kqs[j]
                        bv = bv + dt * _SD_A[i][j] * kvs[j]
                    t_s = t + _SD_C[i] * dt

                    def newton(_, qi, bq=bq, bv=bv, t_s=t_s):
                        f = u_m - internal(qi)
                        if has_fluid or has_nf:
                            vi = (qi - bq) / dt_g
                        if has_fluid:
                            f = f - dfac * vi * jnp.abs(vi)
                        if has_gravity:
                            f = f + grav(qi)
                        if has_nf:
                            f = f + nf(qi, vi, t_s)
                        r = mass_apply((qi - bq) / dt_g - bv) - dt_g * f
                        dq = dt_g * spike_solve(prep, r * m3, axis, S) * m3
                        return qi - dq

                    qi0 = (bq + dt_g * v) * m3
                    qi = jax.lax.fori_loop(0, n_newton, newton, qi0)
                    vi = (qi - bq) / dt_g * m3
                    kqs.append(vi)
                    kvs.append((vi - bv) / dt_g * m3)

                q1 = q + dt * sum(b * k for b, k in zip(_SD_B, kqs))
                v1 = v + dt * sum(b * k for b, k in zip(_SD_B, kvs))
                eq = dt * sum(
                    (b - bh) * k for b, bh, k in zip(_SD_B, _SD_BHAT, kqs)
                )
                ev = dt * sum(
                    (b - bh) * k for b, bh, k in zip(_SD_B, _SD_BHAT, kvs)
                )
                # Stiff error filter (see sdirk3_step): one more reuse of
                # the prepared system; K e_q via jvp of the halo-exchanged
                # internal force at the step end.
                _, K_eq = jax.jvp(internal, (q1,), (eq,))
                rhs_v = mass_apply(ev) - dt_g * K_eq
                ev_f = spike_solve(prep, rhs_v * m3, axis, S) * m3
                eq_f = eq + dt_g * ev_f
                return q1 * m3, v1 * m3, eq_f, ev_f

            def err_norm(e, q_old, q_new):
                scale = atol + rtol * jnp.maximum(
                    jnp.abs(q_old), jnp.abs(q_new)
                )
                s = jax.lax.psum(jnp.sum(((e / scale) ** 2) * m3), axis)
                return jnp.sqrt(s / n_free)

            def trial(t, dt_tr, state):
                q, v = state
                q1, v1, eq, ev = sdirk_step(dt_tr, q, v, t)
                # Displacement-unit velocity weighting (see sdirk3's
                # single-chip driver): e_v enters as dt*e_v.
                en = jnp.maximum(
                    err_norm(eq, q, q1), err_norm(dt_tr * ev, q, q1)
                )
                return (q1, v1), en

            _, xs, stats = adaptive_drive(
                trial, (q0, v0), t_evals,
                jnp.asarray(dt0, dtype)[()], -1.0 / 3.0,
                max_steps_per_interval=max_steps_per_interval,
                safety=safety,
                frame_out=lambda s: jnp.stack([s[0], s[1]]),
            )
            xs = jnp.concatenate(
                [jnp.stack([q0, v0])[None], xs], axis=0
            )
            return xs, stats

        return core

    def rollout(x0, t_eval, u=None, rtol: float = 1e-6,
                atol: float = 1e-9, dt0: float = None, arrays=None):
        """Adaptive SDIRK3 rollout; see builder docstring.

        ``arrays``: optional TRACED :class:`BeamArrays` (same contract as
        ``build_spatial_genalpha``'s rollout) — enables ``jax.jvp``
        forward parameter sensitivities through the sharded L-stable
        engine (while_loop has no adjoint; reverse mode stays on the
        fixed-dt rollouts).

        Chunked driving: SDIRK3's trial state is just ``(q, v)``, so the
        restart from a frame is inherently exact — continue a span by
        passing the last frame as ``x0`` with ``dt0=stats.dt_next``
        (``dt0`` may be an ``(envs,)`` array on batched rollouts).
        """
        t_eval_np = np.asarray(jax.device_get(t_eval), np.float64)
        if dt0 is None:
            dt0 = float(t_eval_np[1] - t_eval_np[0]) / 16.0
        x0 = jnp.asarray(x0)
        t_evals = jnp.asarray(t_eval_np, x0.dtype)
        core = make_core(len(t_eval_np) - 1, float(rtol), float(atol))
        if u is None:
            u_node = jnp.zeros((Np, 3), dtype=x0.dtype)
        else:
            u_node = jnp.asarray(u, dtype=x0.dtype)
        mask = jnp.asarray(mask_nodes, dtype=x0.dtype)
        dt0_arr = jnp.asarray(dt0, x0.dtype)
        md_j, ml_j, mu_j, arr_j, dfac_j, gmass_j = _operand_arrays(
            beam, Np, mdiag, mlow, mup, arr_fields, dfac_np, gmass_np,
            has_fluid, fluid_density, has_gravity, arrays, x0.dtype,
        )

        def run_one(x_single, dt0_single):
            return core(
                t_evals, dt0_single, x_single, u_node,
                dfac_j, mask,
                md_j, ml_j, mu_j,
                jnp.asarray(left_last_node, x0.dtype),
                jnp.asarray(right_first_node, x0.dtype),
                *arr_j,
                gmass_j,
            )

        if x0.ndim == 4:  # (envs, 2, Np, 3): per-env dt via vmap over dp
            if dt0_arr.ndim == 0:
                dt0_arr = jnp.broadcast_to(dt0_arr, (x0.shape[0],))
            xs, stats = jax.vmap(run_one, out_axes=(1, 0))(x0, dt0_arr)
        else:
            xs, stats = run_one(x0, dt0_arr)
        return xs, stats

    return rollout
