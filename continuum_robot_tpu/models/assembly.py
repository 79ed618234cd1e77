"""Global assembly: vmapped element kernels -> global operators, no Python loops.

Replaces the reference's sequential per-segment assembly
(``euler_bernoulli_beam.py:139-219``) with shape-static array programs:

* element state gather:   ``q (..., 3N) -> q6 (..., E, 6)`` by node reshaping
* element kernel:         one broadcasted call over all elements
* scatter-add assembly:   two static slice-adds (segments share interior nodes)
* mass matrix:            block-tridiagonal ``(diag (N,3,3), off (E,3,3))``
  representation plus dense forms for control design
* boundary conditions:    static free-DOF gather/scatter (zero-pad -> eval ->
  extract), numerically identical to the reference's row/col deletion
  (``euler_bernoulli_beam.py:265-295``) but shape-static under jit.

Everything broadcasts over arbitrary leading batch axes, so 4096-env rollouts
are the same code path as a single simulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import elements
from .config import BeamArrays


# ---------------------------------------------------------------------------
# Element <-> global state plumbing
# ---------------------------------------------------------------------------


def gather_element_states(q_full: jax.Array) -> jax.Array:
    """``(..., 3N) -> (..., E, 6)``: each element sees its two nodes' DOFs."""
    *batch, n_dofs = q_full.shape
    n_nodes = n_dofs // 3
    qn = q_full.reshape(*batch, n_nodes, 3)
    return jnp.concatenate([qn[..., :-1, :], qn[..., 1:, :]], axis=-1)


def scatter_add_element_forces(fe: jax.Array) -> jax.Array:
    """``(..., E, 6) -> (..., 3N)``: segment-sum over shared nodes.

    Node i receives element i's first triple and element i-1's second triple
    (reference semantics, ``euler_bernoulli_beam.py:201-219``) — expressed as
    two static slice-adds instead of a scatter so XLA lowers it to adds.
    """
    *batch, n_el, _ = fe.shape
    n_nodes = n_el + 1
    out = jnp.zeros((*batch, n_nodes, 3), dtype=fe.dtype)
    out = out.at[..., :-1, :].add(fe[..., :, 0:3])
    out = out.at[..., 1:, :].add(fe[..., :, 3:6])
    return out.reshape(*batch, 3 * n_nodes)


def internal_force_full(
    arrays: BeamArrays, q_full: jax.Array, use_consistent: bool = False
) -> jax.Array:
    """Global internal (stiffness) force ``k(q)`` in full coordinates."""
    q6 = gather_element_states(q_full)
    fe = elements.element_internal_force(
        q6,
        arrays.length,
        arrays.elastic_modulus,
        arrays.moment_inertia,
        arrays.cross_area,
        arrays.nonlinear_mask,
        use_consistent=use_consistent,
    )
    return scatter_add_element_forces(fe)


# ---------------------------------------------------------------------------
# Mass operator
# ---------------------------------------------------------------------------


def mass_block_tridiagonal(arrays: BeamArrays):
    """Global consistent mass as block-tridiagonal ``(diag (N,3,3), off (E,3,3))``.

    ``off[i]`` is the coupling block between node i and node i+1 (upper band);
    the lower band is its transpose by symmetry. This is the operator form the
    batched block-Thomas / cyclic-reduction solvers consume (``ops/banded.py``).
    """
    Me = elements.consistent_mass_matrix(
        arrays.length, arrays.density, arrays.cross_area
    )  # (E, 6, 6)
    n_el = Me.shape[-3]
    n_nodes = n_el + 1
    if isinstance(Me, np.ndarray):  # host/setup path
        diag = np.zeros((*Me.shape[:-3], n_nodes, 3, 3), dtype=Me.dtype)
        diag[..., :-1, :, :] += Me[..., 0:3, 0:3]
        diag[..., 1:, :, :] += Me[..., 3:6, 3:6]
    else:
        diag = jnp.zeros((*Me.shape[:-3], n_nodes, 3, 3), dtype=Me.dtype)
        diag = diag.at[..., :-1, :, :].add(Me[..., 0:3, 0:3])
        diag = diag.at[..., 1:, :, :].add(Me[..., 3:6, 3:6])
    off = Me[..., 0:3, 3:6]
    return diag, off


def dense_from_block_tridiagonal(diag, off) -> np.ndarray:
    """Expand block-tridiagonal form to a dense ``(3N, 3N)`` NumPy matrix.

    Setup/control-design helper — runs on the host (the hot path consumes the
    block form directly via ``ops/banded.py``). ``off`` is the upper band;
    the lower band is its blockwise transpose (symmetric operators).
    """
    diag = np.asarray(diag)
    off = np.asarray(off)
    n_nodes = diag.shape[-3]
    n = 3 * n_nodes
    M = np.zeros((*diag.shape[:-3], n, n), dtype=diag.dtype)
    for i in range(n_nodes):
        M[..., 3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = diag[..., i, :, :]
    for i in range(n_nodes - 1):
        M[..., 3 * i : 3 * i + 3, 3 * i + 3 : 3 * i + 6] = off[..., i, :, :]
        M[..., 3 * i + 3 : 3 * i + 6, 3 * i : 3 * i + 3] = np.swapaxes(
            off[..., i, :, :], -1, -2
        )
    return M


def dense_mass_matrix(arrays: BeamArrays) -> np.ndarray:
    """Dense global mass matrix (host; hot path uses the block form)."""
    return dense_from_block_tridiagonal(*mass_block_tridiagonal(arrays))


def dense_linear_stiffness_matrix(arrays: BeamArrays) -> np.ndarray:
    """Dense global stiffness for purely linear beams (control design).

    Caller is responsible for the all-linear check (facade raises the
    reference's error otherwise, ``euler_bernoulli_beam.py:443-450``).
    """
    Ke = np.asarray(
        elements.linear_stiffness_matrix(
            arrays.length,
            arrays.elastic_modulus,
            arrays.moment_inertia,
            arrays.cross_area,
        )
    )  # (E, 6, 6)
    n_el = Ke.shape[-3]
    n_nodes = n_el + 1
    diag = np.zeros((*Ke.shape[:-3], n_nodes, 3, 3), dtype=Ke.dtype)
    diag[..., :-1, :, :] += Ke[..., 0:3, 0:3]
    diag[..., 1:, :, :] += Ke[..., 3:6, 3:6]
    upper = Ke[..., 0:3, 3:6]
    return dense_from_block_tridiagonal(diag, upper)


# ---------------------------------------------------------------------------
# Boundary-condition reduction (static-shape equivalents of DOF deletion)
# ---------------------------------------------------------------------------


def pad_to_full(v_red: jax.Array, free_dofs: np.ndarray, n_dofs_full: int) -> jax.Array:
    """Zero-pad a reduced vector back to full coordinates (static scatter)."""
    out = jnp.zeros((*v_red.shape[:-1], n_dofs_full), dtype=v_red.dtype)
    return out.at[..., free_dofs].set(v_red)


def reduce_from_full(v_full: jax.Array, free_dofs: np.ndarray) -> jax.Array:
    """Extract the free DOFs from a full-coordinate vector (static gather)."""
    return v_full[..., free_dofs]


def make_reduced_internal_force(
    arrays: BeamArrays,
    free_dofs: np.ndarray,
    n_dofs_full: int,
    use_consistent: bool = False,
):
    """Reduced-coordinate stiffness function ``k_red(q_red)``.

    Exactly the reference's constrained stiffness semantics
    (``euler_bernoulli_beam.py:270-295``): zero-pad the reduced state into
    full coordinates, evaluate, extract free rows — but with static shapes.
    """
    free_dofs = np.asarray(free_dofs)

    def k_red(q_red: jax.Array) -> jax.Array:
        q_full = pad_to_full(q_red, free_dofs, n_dofs_full)
        f_full = internal_force_full(arrays, q_full, use_consistent=use_consistent)
        return reduce_from_full(f_full, free_dofs)

    return k_red


def make_reduced_internal_force_np(
    arrays: BeamArrays, free_dofs: np.ndarray, n_dofs_full: int
):
    """Host-NumPy twin of :func:`make_reduced_internal_force` (parity kernel).

    Setup-time helper (e.g. modal-derivative load construction): exact f64
    on the host with zero device dispatches — on the axon TPU backend every
    eager device op costs a compile. Same zero-pad -> element kernel ->
    scatter-add -> extract semantics as the traced version.
    """
    free = np.asarray(free_dofs)
    L = np.asarray(arrays.length, np.float64)
    E = np.asarray(arrays.elastic_modulus, np.float64)
    I = np.asarray(arrays.moment_inertia, np.float64)
    A = np.asarray(arrays.cross_area, np.float64)
    nl = np.asarray(arrays.nonlinear_mask)

    def k_red(q_red: np.ndarray) -> np.ndarray:
        q_full = np.zeros(n_dofs_full)
        q_full[free] = np.asarray(q_red, np.float64)
        qn = q_full.reshape(-1, 3)
        q6 = np.concatenate([qn[:-1], qn[1:]], axis=1)  # (E, 6)
        fe = np.asarray(elements.element_internal_force(q6, L, E, I, A, nl))
        out = np.zeros_like(qn)
        out[:-1] += fe[:, 0:3]
        out[1:] += fe[:, 3:6]
        return out.reshape(-1)[free]

    return k_red


def planar_permutation(n_nodes: int) -> np.ndarray:
    """Row permutation: interleaved full DOFs ``[u0,w0,t0,u1,...]`` -> planar
    ``[u0..uN, w0..wN, t0..tN]``.

    ``perm[c * n_nodes + i] = 3 i + c``: indexing an interleaved vector with
    it yields the planar layout. Fold this into setup-time matrices (e.g.
    ``Phi[perm, :]``) so the hot path never pays a runtime transpose.
    """
    return np.arange(3 * n_nodes).reshape(n_nodes, 3).T.reshape(-1)


def make_planar_internal_force(arrays: BeamArrays):
    """Planar-layout internal force ``k(q_p)``, full coordinates.

    ``q_p``: ``(..., 3, n_nodes)`` state planes ``[u; w; theta]`` (the
    :func:`planar_permutation` image of the interleaved full state); returns
    force planes of the same shape. TPU motivation: the interleaved path's
    element gather/scatter works on ``(..., E, 6)`` blocks whose last dim is
    6 — far below lane width — while here every operand is a contiguous
    ``(..., E)`` lane slice of a plane: the whole evaluation is shifted
    slices, FMAs, and two slice-adds per plane. Same arithmetic as
    :func:`internal_force_full` (shared plane kernels in ``elements.py``);
    equality is pinned in tests/test_elements.py.

    Supports linear / nonlinear / hybrid masks; the ``use_consistent``
    energy-gradient variant stays on the interleaved path (it is defined
    via autodiff of the per-element energy).
    """
    nl_mask = np.asarray(arrays.nonlinear_mask)
    all_nl = bool(nl_mask.all())
    all_lin = not bool(nl_mask.any())

    def k_planar(q_p: jax.Array) -> jax.Array:
        # Traced-path closure (lives inside jitted rollouts; setup uses the
        # host-NumPy interleaved path).
        L = jnp.asarray(np.asarray(arrays.length), dtype=q_p.dtype)
        D = jnp.asarray(
            np.asarray(arrays.elastic_modulus)
            * np.asarray(arrays.moment_inertia),
            dtype=q_p.dtype,
        )
        A = jnp.asarray(
            np.asarray(arrays.elastic_modulus)
            * np.asarray(arrays.cross_area),
            dtype=q_p.dtype,
        )
        u, w, t = q_p[..., 0, :], q_p[..., 1, :], q_p[..., 2, :]
        args = (
            u[..., :-1], w[..., :-1], t[..., :-1],
            u[..., 1:], w[..., 1:], t[..., 1:],
            L, D, A,
        )
        if all_nl:
            planes = elements.nonlinear_force_planes(*args)
        elif all_lin:
            planes = elements.linear_force_planes(*args)
        else:
            mask = jnp.asarray(nl_mask)
            nl = elements.nonlinear_force_planes(*args)
            lin = elements.linear_force_planes(*args)
            planes = tuple(jnp.where(mask, a, b) for a, b in zip(nl, lin))
        fa1, ft1, fm1, fa2, ft2, fm2 = planes
        out = jnp.zeros(q_p.shape, dtype=q_p.dtype)
        out = out.at[..., 0, :-1].add(fa1)
        out = out.at[..., 1, :-1].add(ft1)
        out = out.at[..., 2, :-1].add(fm1)
        out = out.at[..., 0, 1:].add(fa2)
        out = out.at[..., 1, 1:].add(ft2)
        out = out.at[..., 2, 1:].add(fm2)
        return out

    return k_planar


def make_planar_correction_force(arrays: BeamArrays, element_slice=None):
    """Planar-layout nonlinear *correction* force ``g(q_p) = k(q_p) - K0 q_p``.

    The quadratic/cubic remainder of the parity internal force after
    subtracting its exact zero-state tangent
    (``elements.nonlinear_correction_planes``) — identically zero for linear
    elements, so hybrid beams contribute only their nonlinear elements.
    Returns ``None`` for all-linear beams (the correction is the zero
    function; callers take the pure linear-operator path).

    ``element_slice`` (optional ``slice``) restricts the kernel to a
    contiguous element run; the caller then feeds node planes
    ``(..., 3, stop - start + 1)`` covering nodes ``start .. stop`` and gets
    force planes of the same shape. This is how the modal-ROM engine shrinks
    its basis transforms to the nonlinear-supported rows of a hybrid beam.

    Same conventions as :func:`make_planar_internal_force` otherwise.
    """
    nl_mask = np.asarray(arrays.nonlinear_mask)
    if not nl_mask.any():
        return None
    sl = element_slice if element_slice is not None else slice(None)
    nl_mask = nl_mask[sl]
    all_nl = bool(nl_mask.all())
    L_h = np.asarray(arrays.length)[sl]
    D_h = (np.asarray(arrays.elastic_modulus) * np.asarray(arrays.moment_inertia))[sl]
    A_h = (np.asarray(arrays.elastic_modulus) * np.asarray(arrays.cross_area))[sl]

    def g_planar(q_p: jax.Array) -> jax.Array:
        L = jnp.asarray(L_h, dtype=q_p.dtype)
        D = jnp.asarray(D_h, dtype=q_p.dtype)
        A = jnp.asarray(A_h, dtype=q_p.dtype)
        u, w, t = q_p[..., 0, :], q_p[..., 1, :], q_p[..., 2, :]
        planes = elements.nonlinear_correction_planes(
            u[..., :-1], w[..., :-1], t[..., :-1],
            u[..., 1:], w[..., 1:], t[..., 1:],
            L, D, A,
        )
        if not all_nl:
            mask = jnp.asarray(nl_mask)
            planes = tuple(jnp.where(mask, p, 0.0) for p in planes)
        ga1, gt1, gm1, ga2, gt2, gm2 = planes
        out = jnp.zeros(q_p.shape, dtype=q_p.dtype)
        out = out.at[..., 0, :-1].add(ga1)
        out = out.at[..., 1, :-1].add(gt1)
        out = out.at[..., 2, :-1].add(gm1)
        out = out.at[..., 0, 1:].add(ga2)
        out = out.at[..., 1, 1:].add(gt2)
        out = out.at[..., 2, 1:].add(gm2)
        return out

    return g_planar


def nonlinear_support(arrays: BeamArrays):
    """Contiguous element run covering every nonlinear element.

    Returns ``(elem_slice, node_slice)``: ``elem_slice`` spans the first
    through last nonlinear element (interior linear elements, if any, are
    masked inside the kernel), ``node_slice`` the nodes those elements touch.
    Returns ``(None, None)`` for all-linear beams.
    """
    nl = np.flatnonzero(np.asarray(arrays.nonlinear_mask))
    if nl.size == 0:
        return None, None
    i0, i1 = int(nl[0]), int(nl[-1])
    return slice(i0, i1 + 1), slice(i0, i1 + 2)


def reduce_matrix(M: jax.Array, free_dofs: np.ndarray) -> jax.Array:
    """``M[free][:, free]`` — the reference's row/col deletion on matrices."""
    return M[..., free_dofs, :][..., :, free_dofs]


# ---------------------------------------------------------------------------
# Tangent stiffness (for implicit integrators and linearization)
# ---------------------------------------------------------------------------


def element_tangent_stiffness(
    arrays: BeamArrays, q6: jax.Array, use_consistent: bool = False
) -> jax.Array:
    """Per-element tangent ``dK/dq`` blocks ``(..., E, 6, 6)`` via jacfwd.

    The elementwise Jacobian keeps the global tangent block-tridiagonal, which
    the banded Newton solvers exploit (SURVEY §7 "hard parts").
    """

    def one(q, L, E, I, A, nl):
        f = lambda qq: elements.element_internal_force(
            qq, L, E, I, A, nl, use_consistent=use_consistent
        )
        return jax.jacfwd(f)(q)

    vec = jnp.vectorize(one, signature="(k),(),(),(),(),()->(k,k)")
    return vec(
        q6,
        arrays.length,
        arrays.elastic_modulus,
        arrays.moment_inertia,
        arrays.cross_area,
        arrays.nonlinear_mask,
    )


def tangent_block_tridiagonal(
    arrays: BeamArrays, q_full: jax.Array, use_consistent: bool = False
):
    """Global tangent stiffness in block-tridiagonal form at state ``q_full``.

    Returns ``(diag (..., N, 3, 3), lower (..., E, 3, 3), upper (..., E, 3, 3))``.
    The nonlinear element tangent is not symmetric (reference parity kernel is
    non-variational), so lower and upper bands are tracked separately.
    """
    q6 = gather_element_states(q_full)
    Kt = element_tangent_stiffness(arrays, q6, use_consistent=use_consistent)
    n_nodes = Kt.shape[-3] + 1
    diag = jnp.zeros((*Kt.shape[:-3], n_nodes, 3, 3), dtype=Kt.dtype)
    diag = diag.at[..., :-1, :, :].add(Kt[..., 0:3, 0:3])
    diag = diag.at[..., 1:, :, :].add(Kt[..., 3:6, 3:6])
    upper = Kt[..., 0:3, 3:6]
    lower = Kt[..., 3:6, 0:3]
    return diag, lower, upper
