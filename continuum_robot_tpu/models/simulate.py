"""High-level on-device simulation driver.

This is the TPU replacement for the reference's SciPy workload harness
(``example_utilities.py:116-170``): one call builds a fully-compiled rollout
program for a :class:`DynamicEulerBernoulliBeam` — explicit (RK4 / adaptive
Dopri5) or implicit (Newmark-beta with block-tridiagonal Newton) — and runs
it start to finish on device. Batched rollouts are ``jax.vmap`` over the same
program (``parallel/rollout.py``).

Solver selection guidance:

* ``dopri5`` — accuracy-controlled explicit; parity runs vs solve_ivp.
* ``rk4`` — cheapest per step; needs dt below the beam's stability limit
  (the highest FEM eigenfrequency scales ~ 1/h^2 — fine for few elements).
* ``newmark`` — unconditionally stable implicit; the throughput path for
  fine meshes where explicit dt would be absurd (SURVEY §7 step 5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import assembly, elements
from .config import BCInfo
from ..ops import banded, integrators


@dataclasses.dataclass
class SimulationResult:
    """Rollout output: times, stacked states ``[q; v]``, optional stats.

    ``ys`` has shape ``(len(ts), 2*n_free)`` (or with leading batch axes),
    matching the layout of ``solve_ivp``'s ``sol.y.T``.
    """

    ts: jax.Array
    ys: jax.Array
    stats: Optional[integrators.AdaptiveStats] = None

    @property
    def y(self) -> jax.Array:
        """Transposed view matching ``scipy`` convention (state, time)."""
        return jnp.moveaxis(self.ys, 0, -1)


def _free_mask_nodes(bc_info: BCInfo) -> np.ndarray:
    return bc_info.free_mask.reshape(bc_info.n_nodes, 3)


def reduce_matrix_dense(arrays, free_dofs, use_consistent: bool) -> np.ndarray:
    """Reduced dense tangent stiffness at q=0 (host, for prefactoring).

    Uses the elementwise tangent (not the linear element matrix) so it is
    also correct as the modified-Newton operator for nonlinear beams, whose
    reference-parity kernel has a non-symmetric zero-state tangent.
    """
    n_full = 3 * (arrays.n_elements + 1)
    q_zero = jnp.zeros(n_full)
    # One jitted call (vs dozens of per-op compiles eagerly on the TPU tunnel).
    kd, kl, ku = jax.jit(
        lambda q: assembly.tangent_block_tridiagonal(
            arrays, q, use_consistent=use_consistent
        )
    )(q_zero)
    kd, kl, ku = np.asarray(kd), np.asarray(kl), np.asarray(ku)
    n_nodes = kd.shape[0]
    K = np.zeros((n_full, n_full))
    for i in range(n_nodes):
        K[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = kd[i]
    for i in range(n_nodes - 1):
        K[3 * i : 3 * i + 3, 3 * i + 3 : 3 * i + 6] = ku[i]
        K[3 * i + 3 : 3 * i + 6, 3 * i : 3 * i + 3] = kl[i]
    free = np.asarray(free_dofs)
    return K[np.ix_(free, free)]


def make_newmark_operator(
    model,
    forces_func: Optional[Callable] = None,
    dt: float = None,
    beta: float = 0.25,
    use_modified_newton: bool = True,
    linear_solver: str = None,
    extra_systems=None,
    matmul_precision=None,
) -> integrators.NewmarkOperator:
    """Build the implicit-stepper operators for a dynamic beam model.

    All operators act on *reduced* coordinates; internally the Jacobian
    solves run in masked full coordinates where the system stays
    block-tridiagonal (``ops/banded.py``). For purely linear beams the
    effective Jacobian ``M + beta dt^2 K`` is factored once at build time;
    nonlinear beams refactor at each Newton linearization point (or reuse
    the zero-state factor when ``use_modified_newton``).

    ``linear_solver``: how prefactored (state-independent) solves execute —

    * ``"btd"`` — O(N) block-Thomas sweeps via lax.scan. Memory-lean, but a
      sequential dependency chain over nodes: right for CPU/small batches.
    * ``"dense_inv"`` — precompute the dense inverse once (host, float64)
      and apply it as one ``(n, n) @ (n, batch)`` matmul. O(N^2) memory but
      pure MXU work: the throughput choice on TPU for big batched rollouts.
    * ``"pallas"`` — prefactored block-Thomas sweeps as a Pallas TPU kernel
      (``ops/pallas/btd_solve.py``): O(N) work at full lane width with the
      whole recursion in VMEM. Best for long beams x large batches, where
      the dense inverse's O(N^2) matmul wastes 100x the FLOPs. Requires a
      leading batch axis on the solve inputs.
    * ``"cr"`` — block cyclic reduction (``ops/banded.btd_cr_*``): O(N log N)
      work at O(log N) depth. The latency choice for a SINGLE (or few) long
      beam(s), where the Thomas scan serializes N thin steps and the dense
      inverse burns O(N^2) memory; each CR level is one vectorized op over
      the whole remaining chain.

    ``matmul_precision``: MXU precision for the dense_inv contractions.
    Default HIGHEST (true f32, 6-pass). ``jax.lax.Precision.HIGH`` (3-pass
    bfloat16) runs the implicit step ~1.9x faster on v5e at a measured
    ~1.4%/400-step trajectory drift — a throughput/accuracy dial for large
    statistical sweeps, NOT for parity work.
    """
    if linear_solver is None:
        # Platform default. On the TPU backend "dense_inv" is both the
        # throughput choice (MXU matmuls) and — empirically — the SAFE one:
        # the experimental axon/Mosaic backend miscompiles the fully-fused
        # batched implicit step when every operator is the block-tridiagonal
        # scan path (batched results diverge from single-env and from f64
        # ground truth; any one dense component in the fusion fixes it).
        # CPU lowers everything correctly; "btd" is memory-lean there.
        linear_solver = "btd" if jax.default_backend() == "cpu" else "dense_inv"

    arrays = model.beam_model.arrays
    bc_info = model.beam_model.bc_info
    free = bc_info.free_dofs
    n_full = bc_info.n_dofs_full
    n_nodes = bc_info.n_nodes
    mask_nodes = _free_mask_nodes(bc_info)
    use_consistent = getattr(model, "use_consistent_nonlinear", False)

    if forces_func is None:
        forces_func = model.force_registry.create_aggregated_function()

    # Host NumPy setup; closed over as constants by the traced operators.
    m_diag, m_off = assembly.mass_block_tridiagonal(arrays)
    m_lower = np.swapaxes(np.asarray(m_off), -1, -2)
    mm_diag, mm_lower, mm_upper = banded.btd_apply_bc(
        np.asarray(m_diag), m_lower, np.asarray(m_off), mask_nodes
    )

    def pad(r):
        return assembly.pad_to_full(r, free, n_full)

    def red(v):
        return assembly.reduce_from_full(v, free)

    all_linear = not bool(np.any(np.asarray(arrays.nonlinear_mask)))

    if matmul_precision is None:
        matmul_precision = jax.lax.Precision.HIGHEST

    if linear_solver == "dense_inv":
        # MXU path: the TPU lowers small-block (N, 3, 3) einsums ~50x below
        # dense-matmul throughput (measured: 193 ms vs 3.6 ms at N=1000,
        # B=4096), so in this mode the mass apply — and, for all-linear
        # beams, the internal force — run as dense reduced-matrix matmuls.
        M_red_dense = np.asarray(model.beam_model.M.toarray())

        def mass_apply(a_red):
            m = jnp.asarray(M_red_dense, dtype=a_red.dtype)
            return jnp.einsum(
                "ij,...j->...i", m, a_red, precision=matmul_precision
            )

    else:

        def mass_apply(a_red):
            a_nodes = pad(a_red).reshape(*a_red.shape[:-1], n_nodes, 3)
            out = banded.btd_matvec(
                jnp.asarray(mm_diag, a_red.dtype),
                jnp.asarray(mm_lower, a_red.dtype),
                jnp.asarray(mm_upper, a_red.dtype), a_nodes,
            )
            return red(out.reshape(*a_red.shape[:-1], n_full))

    K_red_dense = (
        reduce_matrix_dense(arrays, free, use_consistent)
        if linear_solver == "dense_inv"
        else None
    )

    if linear_solver == "dense_inv" and all_linear:

        def internal_force(q_red):
            k = jnp.asarray(K_red_dense, dtype=q_red.dtype)
            return jnp.einsum(
                "ij,...j->...i", k, q_red, precision=matmul_precision
            )

    else:
        _if_raw = assembly.make_reduced_internal_force(
            arrays, free, n_full, use_consistent=use_consistent
        )

        def internal_force(q_red):
            # Element parameters are host f64 constants; keep the hot state
            # in ITS dtype (an f32 rollout on an x64 host must not silently
            # promote — hardware runs f32, and promoted carries crash scans).
            return jnp.asarray(_if_raw(q_red), q_red.dtype)

    # For all-linear beams (tangent constant) and modified Newton (tangent
    # frozen at q=0) the element-tangent blocks are state-independent:
    # compute them ONCE on the host so adaptive steppers — whose traced-dt
    # solves cannot be prefactored — only pay the band combine + Thomas
    # factorization per step, not a per-step jacfwd assembly.
    _tangent_cached = None
    if all_linear or use_modified_newton:
        _tangent_cached = jax.tree_util.tree_map(
            np.asarray,
            jax.jit(
                lambda q: assembly.tangent_block_tridiagonal(
                    arrays, q, use_consistent=use_consistent
                )
            )(jnp.zeros(n_full)),
        )

    def factors_at(q_full, c, a=1.0):
        # Factor in the STATE dtype: the solve sweeps (the conditioning-
        # sensitive part) must run at the precision the caller actually
        # stepped in, and mixed f64 constants would promote scan carries.
        dtype = jnp.asarray(q_full).dtype
        if _tangent_cached is not None:
            kd, kl, ku = (jnp.asarray(t, dtype) for t in _tangent_cached)
        else:
            kd, kl, ku = (
                jnp.asarray(t, dtype)
                for t in assembly.tangent_block_tridiagonal(
                    arrays, q_full, use_consistent=use_consistent
                )
            )
        jd = a * jnp.asarray(mm_diag, dtype) + c * kd
        jl = a * jnp.asarray(mm_lower, dtype) + c * kl
        ju = a * jnp.asarray(mm_upper, dtype) + c * ku
        jd, jl, ju = banded.btd_apply_bc(
            jd, jl, ju, jnp.asarray(mask_nodes, dtype)
        )
        if linear_solver == "cr":
            return banded.btd_cr_factor(jd, jl, ju)
        return banded.btd_factor(jd, jl, ju)

    prefactored = {}
    dense_inverses = {}
    if all_linear or use_modified_newton:
        q_zero = jnp.zeros(n_full, dtype=m_diag.dtype)
        # (mass_scale, stiffness_scale) systems to prefactor: plain mass
        # solve + the Newmark effective Jacobian (+ generalized-alpha's if
        # alpha coefficients are supplied via extra_systems).
        cs = [(1.0, 0.0)]
        if dt is not None:
            cs.append((1.0, beta * dt * dt))
        cs.extend(extra_systems or [])
        if linear_solver == "dense_inv":
            # Host float64 reduced-system inverses, applied as MXU matmuls.
            M_red = np.asarray(model.beam_model.M.toarray(), dtype=np.float64)
            K_red = K_red_dense
            for a, c in cs:
                dense_inverses[(float(a), float(c))] = np.linalg.inv(
                    a * M_red + c * K_red
                )
        else:
            for a, c in cs:
                # One jitted computation per system; device constants after.
                prefactored[(float(a), float(c))] = jax.tree_util.tree_map(
                    jnp.asarray,
                    jax.jit(lambda q, _c=c, _a=a: factors_at(q, _c, _a))(q_zero),
                )

    def solve(q_red, c, a=1.0):
        # Adaptive steppers pass a TRACED c = f(dt): no prefactor can exist
        # for a continuum of dt, so those solves always factor at the
        # linearization point (key=None path). The factorization is built
        # HERE, outside the returned closure, so holding on to the closure
        # reuses one factored system across applications (the steppers do,
        # per trial step, when op.tangent_frozen).
        try:
            key = (float(a), float(c))
        except (TypeError, jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            key = None

        if key in dense_inverses:
            inv_np = dense_inverses[key]

            def do_solve(r_red):
                inv = jnp.asarray(inv_np, dtype=r_red.dtype)
                return jnp.einsum(
                    "ij,...j->...i", inv, r_red, precision=matmul_precision
                )

            return do_solve

        use_pallas = False
        if key in prefactored:
            factors = prefactored[key]
            use_pallas = linear_solver == "pallas"
        else:
            factors = factors_at(pad(q_red), c, a)

        def do_solve(r_red):
            # Prefactored systems are built once (host/x64); apply them in
            # the rhs dtype (same contract as the dense_inv path above).
            # Cast ONLY floating leaves: the cyclic-reduction factors carry
            # integer size metadata ("n"/"m_pad") that btd_cr_solve reads
            # with int() — coercing those to the rhs dtype would turn them
            # into traced f64 scalars under jit (ConcretizationTypeError).
            def _cast(t):
                if jnp.issubdtype(jnp.result_type(t), jnp.inexact):
                    return jnp.asarray(t, r_red.dtype)
                return t

            fac = jax.tree_util.tree_map(_cast, factors)
            if use_pallas:
                from ..ops.pallas import btd_solve_pallas

                r_nodes = pad(r_red).reshape(-1, n_nodes, 3)
                x = btd_solve_pallas(fac, r_nodes)
                return red(x.reshape(*r_red.shape[:-1], n_full))
            r_nodes = pad(r_red).reshape(*r_red.shape[:-1], n_nodes, 3)
            solve_fn = (
                banded.btd_cr_solve if linear_solver == "cr" else banded.btd_solve
            )
            x = solve_fn(fac, r_nodes)
            return red(x.reshape(*r_red.shape[:-1], n_full))

        return do_solve

    return integrators.NewmarkOperator(
        mass_apply=mass_apply,
        internal_force=internal_force,
        external_force=forces_func,
        solve=solve,
        # Steppers reuse ONE factored system per trial step when the
        # tangent is state-independent (all-linear / modified Newton).
        tangent_frozen=_tangent_cached is not None,
    )


def _affine_power(T: np.ndarray, K: int):
    """``(T^K, S_K = sum_{j<K} T^j)`` for a batch of 3x3 maps, float64 host.

    Binary exponentiation over affine maps ``F_k(s) = T^k s + S_k b``:
    composing ``F_a`` after ``F_b`` gives ``(T^a T^b, T^a S_b + S_a)``.
    O(log K) batched 3x3 matmuls.
    """
    eye = np.broadcast_to(np.eye(3, dtype=T.dtype), T.shape)
    P, S = eye.copy(), np.zeros_like(T)
    bP, bS = T.copy(), eye.copy()
    k = int(K)
    while k:
        if k & 1:
            S = np.einsum("mij,mjk->mik", P, bS) + S
            P = np.einsum("mij,mjk->mik", P, bP)
        k >>= 1
        if k:
            bS = np.einsum("mij,mjk->mik", bP, bS) + bS
            bP = np.einsum("mij,mjk->mik", bP, bP)
    return P, S


def _affine_app(P, b, s):
    """One elementwise application of the per-mode affine map (XLA tier)."""
    q, v, a = s
    dtype = q.dtype
    P = jnp.asarray(P, dtype)
    b = jnp.asarray(b, dtype)
    return (
        P[:, 0, 0] * q + P[:, 0, 1] * v + P[:, 0, 2] * a + b[:, 0],
        P[:, 1, 0] * q + P[:, 1, 1] * v + P[:, 1, 2] * a + b[:, 1],
        P[:, 2, 0] * q + P[:, 2, 1] * v + P[:, 2, 2] * a + b[:, 2],
    )


@dataclasses.dataclass(frozen=True, eq=False)
class PiecewiseConstant:
    """Piecewise-constant input force: ``values[i]`` holds on
    ``[breaks[i-1], breaks[i])`` (``values[0]`` before ``breaks[0]``,
    ``values[-1]`` from ``breaks[-1]`` on).

    The reference's flagship workloads force the beam in exactly this shape
    — a tip impulse held for 10 ms then released
    (``/root/reference/examples/example_utilities.py:139-149``) — passed as
    an opaque Python callable. This type keeps the callable contract
    (``__call__`` is trace-compatible, so it drops into every integrator
    and engine that accepts ``u=callable``) while *declaring* the
    structure, which lets the composed-propagator drive
    (:meth:`ModalGenAlpha.rollout_power`, ``simulate(engine="power")``,
    ``batched_rollout(method="modal_power")``) reproduce the stepper
    exactly: one host-composed affine map per constant-force span instead
    of rejecting the callable.

    ``breaks``: strictly-ascending interior breakpoints (k-1 floats for k
    values). ``values``: ``(k, n)`` array (or ``(k,)`` for scalar/modal
    forces), one force vector per span.
    """

    breaks: tuple
    values: np.ndarray

    def __post_init__(self):
        object.__setattr__(
            self, "breaks", tuple(float(b) for b in self.breaks)
        )
        object.__setattr__(
            self, "values", np.asarray(jax.device_get(self.values))
        )
        if self.values.ndim < 1 or (
            self.values.shape[0] != len(self.breaks) + 1
        ):
            raise ValueError(
                f"values needs len(breaks)+1 = {len(self.breaks) + 1} rows "
                f"(one per span), got shape {self.values.shape}"
            )
        if any(b2 <= b1 for b1, b2 in zip(self.breaks, self.breaks[1:])):
            raise ValueError("breaks must be strictly ascending")

    def __call__(self, t):
        idx = jnp.searchsorted(
            jnp.asarray(np.asarray(self.breaks, np.float64)), t,
            side="right",
        )
        return jnp.asarray(self.values)[idx]

    def value_at(self, t: float) -> np.ndarray:
        """Host-side (float64-classified) value lookup."""
        i = int(np.searchsorted(
            np.asarray(self.breaks, np.float64), float(t), side="right"
        ))
        return np.asarray(self.values)[i]

    def map_values(self, fn) -> "PiecewiseConstant":
        """A new schedule with ``fn`` applied to each value (e.g. the
        modal force projection)."""
        return PiecewiseConstant(
            self.breaks,
            np.stack([np.asarray(jax.device_get(fn(v)))
                      for v in self.values]),
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "apps", "tile", "mode_tile", "unroll", "interpret", "use_pallas",
    ),
)
def _power_drive(
    lam, cdamp, u_m, PK, bK, Pr, br, eta, etad,
    apps: int, tile: int, mode_tile: int, unroll: int, interpret: bool,
    use_pallas: bool,
):
    """Jitted driver for :meth:`ModalGenAlpha.rollout_power`: consistent
    initial acceleration + ``apps`` fused map applications + the remainder
    map (one elementwise application), all in one program."""
    from ..ops.pallas.modal_rollout import fused_affine_steps

    s = (eta, etad, _power_a0(lam, cdamp, u_m, eta, etad))
    if apps:
        if use_pallas:
            s = fused_affine_steps(
                PK, bK, *s, apps=apps, tile=tile, mode_tile=mode_tile,
                interpret=interpret, unroll=unroll,
            )
        else:
            def app(si, _):
                return _affine_app(PK, bK, si), None

            s, _ = jax.lax.scan(
                app, s, None, length=apps, unroll=max(1, min(unroll, apps))
            )
    if Pr is not None:
        s = _affine_app(Pr, br, s)
    return s


@functools.partial(jax.jit, static_argnames=("n_frames",))
def _power_frames_drive(lam, cdamp, u_m, P, b, eta, etad, n_frames: int):
    """Frame-collecting composed-propagator rollout: each scan iteration is
    one precomputed ``substeps``-step map application (XLA elementwise)."""
    a0 = _power_a0(lam, cdamp, u_m, eta, etad)

    def frame(s, _):
        s2 = _affine_app(P, b, s)
        return s2, (s2[0], s2[1])

    _, (qs, vs) = jax.lax.scan(
        frame, (eta, etad, a0), None, length=n_frames
    )
    etas = jnp.concatenate([eta[None], qs], axis=0)
    etads = jnp.concatenate([etad[None], vs], axis=0)
    return etas, etads


def _power_a0(lam, cdamp, u0_m, eta, etad):
    """Consistent initial modal acceleration from the t0 force value."""
    dtype = eta.dtype
    a0 = -jnp.asarray(lam, dtype) * eta
    if u0_m is not None:
        a0 = a0 + jnp.asarray(u0_m, dtype)
    if cdamp is not None:
        a0 = a0 - jnp.asarray(cdamp, dtype) * etad
    return a0


@functools.partial(
    jax.jit,
    static_argnames=(
        "apps", "tile", "mode_tile", "unroll", "interpret", "use_pallas",
    ),
)
def _power_drive_schedule(
    lam, cdamp, u0_m, PKs, bKs, Prs, brs, eta, etad,
    apps: tuple, tile: int, mode_tile: int, unroll: int, interpret: bool,
    use_pallas: bool,
):
    """Multi-segment composed-propagator drive (piecewise-constant force):
    consistent initial acceleration from the t0 force value, then each
    constant-force segment's fused applications + remainder map in
    sequence. The full affine state ``(eta, etad, etadd)`` carries across
    force switches exactly like the step-by-step recurrence does (the
    stepper never recomputes the acceleration at a force change)."""
    from ..ops.pallas.modal_rollout import fused_affine_steps

    s = (eta, etad, _power_a0(lam, cdamp, u0_m, eta, etad))
    for i, ap in enumerate(apps):
        if ap:
            if use_pallas:
                s = fused_affine_steps(
                    PKs[i], bKs[i], *s, apps=ap, tile=tile,
                    mode_tile=mode_tile, interpret=interpret, unroll=unroll,
                )
            else:
                def app(si, _, _P=PKs[i], _b=bKs[i]):
                    return _affine_app(_P, _b, si), None

                s, _ = jax.lax.scan(
                    app, s, None, length=ap,
                    unroll=max(1, min(unroll, ap)),
                )
        if Prs[i] is not None:
            s = _affine_app(Prs[i], brs[i], s)
    return s


@functools.partial(jax.jit, static_argnames=("counts",))
def _power_frames_drive_schedule(lam, cdamp, u0_m, Ps, bs, eta, etad,
                                 counts: tuple):
    """Frame-collecting composed-propagator rollout over a schedule of
    per-frame maps: ``counts[i]`` consecutive frames apply ``(Ps[i],
    bs[i])`` (frames whose substep span crosses a force break get their
    own host-composed map — see ``ModalGenAlpha._pwc_frame_runs``)."""
    s = (eta, etad, _power_a0(lam, cdamp, u0_m, eta, etad))
    qs_out, vs_out = [eta[None]], [etad[None]]
    for i, c in enumerate(counts):
        def frame(si, _, _P=Ps[i], _b=bs[i]):
            s2 = _affine_app(_P, _b, si)
            return s2, (s2[0], s2[1])

        s, (qs, vs) = jax.lax.scan(frame, s, None, length=c)
        qs_out.append(qs)
        vs_out.append(vs)
    return (
        jnp.concatenate(qs_out, axis=0), jnp.concatenate(vs_out, axis=0)
    )


@dataclasses.dataclass(frozen=True)
class ModalGenAlpha:
    """Generalized-alpha stepping in the mass-orthonormal modal basis.

    For an all-linear prefactored beam every operator in the implicit step
    (M, K, and the effective Jacobian ``(1-am) M + (1-af) beta dt^2 K``) is
    simultaneously diagonalized by the generalized eigenvectors of
    ``K phi = lambda M phi``, so the *identical* generalized-alpha recurrence
    runs per mode with scalar coefficients: the per-step cost collapses from
    three ``(3N x 3N) @ (3N x B)`` matmuls to 8 (10 damped) fused
    multiply-adds per element on ``(B, 3N)`` arrays (see
    ``ops.pallas.modal_rollout.mode_coeffs``), with the O(N^2) basis
    transforms paid once per rollout, not per step. Trajectories match the
    dense generalized-alpha path to roundoff — this is modal superposition,
    not an approximation (unless ``n_modes`` truncates).

    Scope: purely linear beams, no state-dependent registry forces; the
    input ``u`` is projected into modal coordinates (once if constant).
    Rayleigh structural damping ``C = alpha M + beta K`` diagonalizes in the
    same basis (``cdamp_m = alpha + beta lam_m``) and enters the recurrence
    and the effective Jacobian exactly — a capability the reference lacks
    entirely (its only dissipation is quadratic fluid drag).
    Built on the host in float64; fields are ready-to-close-over constants.
    """

    Phi: np.ndarray  # (n, m) mass-orthonormal mode shapes
    PhiTM: np.ndarray  # (m, n) modal projector Phi^T M (= Phi^{-1} if m = n)
    lam: np.ndarray  # (m,) eigenvalues omega^2
    rho_inf: float
    dt: float
    cdamp: Optional[np.ndarray] = None  # (m,) modal Rayleigh damping, or None

    def with_dt(self, dt: float) -> "ModalGenAlpha":
        """The same engine at a different step size.

        Every field except ``dt`` is dt-independent (the per-mode
        effective-Jacobian inverses are computed lazily from ``dt`` by
        :meth:`winv64`), so a dt sweep — e.g. a work-precision ladder
        (tools/work_precision.py) — reuses one host eigendecomposition
        instead of refactoring the (n, n) pencil per point.
        """
        return dataclasses.replace(self, dt=float(dt))

    def to_modal(self, q, v):
        """Physical reduced (q, v) -> modal (eta, etadot) via Phi^T M."""
        PhiTM = jnp.asarray(self.PhiTM, dtype=jnp.asarray(q).dtype)
        eta = jnp.einsum("mn,...n->...m", PhiTM, q)
        etad = jnp.einsum("mn,...n->...m", PhiTM, v)
        return eta, etad

    def from_modal(self, eta, etad):
        Phi = jnp.asarray(self.Phi, dtype=jnp.asarray(eta).dtype)
        q = jnp.einsum("nm,...m->...n", Phi, eta)
        v = jnp.einsum("nm,...m->...n", Phi, etad)
        return q, v

    def project_force(self, u):
        """Physical force -> modal force (Phi^T u)."""
        PhiT = jnp.asarray(self.Phi.T, dtype=jnp.asarray(u).dtype)
        return jnp.einsum("mn,...n->...m", PhiT, u)

    def project_force_host(self, u) -> np.ndarray:
        """Host-NumPy force projection for setup-time constants.

        Eager device ops at setup cost a tunnel round trip each on the axon
        backend (CLAUDE.md); constant inputs project here instead.
        """
        return self.Phi.T @ np.asarray(jax.device_get(u), np.float64)

    def winv64(self) -> np.ndarray:
        """Per-mode effective-Jacobian inverses in float64 (host).

        ``J_m = (1-am) + (1-af) gamma dt c_m + (1-af) beta dt^2 lam_m`` —
        the damping term is in the Jacobian exactly (not lagged).
        """
        am = (2.0 * self.rho_inf - 1.0) / (self.rho_inf + 1.0)
        af = self.rho_inf / (self.rho_inf + 1.0)
        beta = 0.25 * (1.0 - am + af) ** 2
        gamma = 0.5 - am + af
        J = (1.0 - am) + (1.0 - af) * beta * self.dt * self.dt * np.asarray(
            self.lam
        )
        if self.cdamp is not None:
            J = J + (1.0 - af) * gamma * self.dt * np.asarray(self.cdamp)
        return 1.0 / J

    @staticmethod
    def _force_at(u_modal, dtype):
        """Normalize the modal-force spec to a callable of t."""
        if u_modal is None:
            return lambda t: jnp.asarray(0.0, dtype)
        if callable(u_modal):
            return lambda t: jnp.asarray(u_modal(t), dtype)
        u_const = jnp.asarray(u_modal, dtype=dtype)
        return lambda t: u_const

    def _step_fn(self, dtype, u_modal):
        """One scan-compatible generalized-alpha step in modal coordinates.

        Runs the substituted single-Newton update (exact for the linear
        system): ``a1 = winv*u + p1*a - p2*q_pred - p3*q [- p5*v_pred -
        p6*v]`` with the per-mode coefficients of
        ``ops.pallas.modal_rollout.mode_coeffs`` — the same expression
        order as the fused kernel, keeping the two engines bit-identical.
        """
        from ..ops.pallas.modal_rollout import mode_coeffs

        dt = self.dt
        am = (2.0 * self.rho_inf - 1.0) / (self.rho_inf + 1.0)
        af = self.rho_inf / (self.rho_inf + 1.0)
        beta = 0.25 * (1.0 - am + af) ** 2
        gamma = 0.5 - am + af
        lam = jnp.asarray(self.lam, dtype=dtype)
        # Effective-Jacobian inverse per mode, exact in f64 then cast.
        winv = jnp.asarray(self.winv64(), dtype=dtype)
        cdamp = (
            None if self.cdamp is None else jnp.asarray(self.cdamp, dtype)
        )
        p1, p2, p3, p5, p6 = mode_coeffs(lam, winv, self.rho_inf, cdamp)
        u_at = self._force_at(u_modal, dtype)
        t_af_off = (1.0 - af) * dt
        c_qp = (0.5 - beta) * dt * dt
        c_vp = (1.0 - gamma) * dt
        bh2 = beta * dt * dt
        gh = gamma * dt

        def step(carry, t):
            q, v, a = carry
            q_pred = q + dt * v + c_qp * a
            v_pred = v + c_vp * a
            a1 = winv * u_at(t + t_af_off) + p1 * a - p2 * q_pred - p3 * q
            if cdamp is not None:
                a1 = a1 - p5 * v_pred - p6 * v
            return (q_pred + bh2 * a1, v_pred + gh * a1, a1), None

        return step

    def initial_accel(self, eta, u_modal, t0=0.0, etad=None):
        """``a0 = u - lam eta - c etadot`` (modal mass = I)."""
        dtype = jnp.asarray(eta).dtype
        lam = jnp.asarray(self.lam, dtype=dtype)
        a0 = self._force_at(u_modal, dtype)(t0) - lam * eta
        if self.cdamp is not None and etad is not None:
            a0 = a0 - jnp.asarray(self.cdamp, dtype) * etad
        return a0

    def rollout(self, eta, etad, u_modal, n_steps: int, t0: float = 0.0,
                unroll: int = 1):
        """Scan ``n_steps`` generalized-alpha steps in modal coordinates.

        ``eta``/``etad``: ``(..., m)`` modal amplitudes/velocities;
        ``u_modal``: constant modal force ``(m,)``/``(..., m)``, a traceable
        callable ``t -> modal force``, or None. Returns final
        ``(eta, etad, etadd)``.

        ``unroll``: fuse this many steps per scan iteration. The XLA scan
        carry roundtrips HBM once per iteration; on the memory-bound XLA
        engine unrolling divides that compulsory carry traffic by
        ``unroll`` (states between fused steps stay in registers). Same
        arithmetic per step — trajectories are unchanged.
        """
        dtype = jnp.asarray(eta).dtype
        step = self._step_fn(dtype, u_modal)
        etadd = self.initial_accel(eta, u_modal, t0, etad)
        ts = t0 + self.dt * jnp.arange(n_steps, dtype=dtype)
        (eta, etad, etadd), _ = jax.lax.scan(
            step, (eta, etad, etadd), ts, unroll=unroll
        )
        return eta, etad, etadd

    def rollout_pallas(
        self, eta, etad, u_modal, n_steps: int, t0: float = 0.0,
        tile: int = 1024, mode_tile: int = 16, interpret: bool = False,
        unroll: int = 16,
    ):
        """Fused-kernel rollout: all ``n_steps`` run with the modal state
        resident in VMEM (``ops/pallas/modal_rollout.py``), touching HBM once
        per call instead of once per step. Constant ``u_modal`` only; same
        arithmetic as :meth:`rollout`.

        Defaults (flat 16x1024 cells, in-kernel unroll=16) are the winners
        of the 2026-08-19 hardware sweep — 75.2M env-steps/s vs 30.9M at
        the old (256, 512, 1) configuration; ``unroll`` is bit-exact (see
        ``fused_modal_steps``).

        ``eta``/``etad``: ``(B, m)``. Returns final ``(eta, etad, etadd)``.
        """
        from ..ops.pallas.modal_rollout import fused_modal_steps

        dtype = jnp.asarray(eta).dtype
        # etadd=None: the consistent initial acceleration is computed inside
        # the jitted kernel wrapper (eager ops cost a tunnel round trip each
        # on the axon backend).
        cdamp = (
            None if self.cdamp is None else jnp.asarray(self.cdamp, dtype)
        )
        return fused_modal_steps(
            jnp.asarray(self.lam, dtype), jnp.asarray(self.winv64(), dtype),
            u_modal, eta, etad, None, steps=n_steps, h=self.dt,
            rho_inf=self.rho_inf, tile=tile, mode_tile=mode_tile,
            interpret=interpret, cdamp=cdamp, unroll=unroll,
        )

    def rollout_frames_pallas(
        self, eta, etad, u_modal, n_frames: int, substeps: int = 1,
        tile: int = 1024, mode_tile: int = 16, interpret: bool = False,
        unroll: int = 16,
    ):
        """Frame-collecting fused-kernel rollout (constant ``u_modal`` only).

        One fused-kernel invocation per frame with the state carried in the
        kernel's native layout; transposes paid once per span. Same frame
        contract as :meth:`rollout_frames` (initial state included).
        """
        from ..ops.pallas.modal_rollout import fused_modal_frames

        dtype = jnp.asarray(eta).dtype
        cdamp = (
            None if self.cdamp is None else jnp.asarray(self.cdamp, dtype)
        )
        etas, etads = fused_modal_frames(
            jnp.asarray(self.lam, dtype), jnp.asarray(self.winv64(), dtype),
            u_modal, eta, etad, n_frames=n_frames, substeps=substeps,
            h=self.dt, rho_inf=self.rho_inf, tile=tile, mode_tile=mode_tile,
            interpret=interpret, cdamp=cdamp, unroll=unroll,
        )
        ts = (self.dt * substeps) * jnp.arange(n_frames + 1)
        return ts, etas, etads

    def _step_affine64(self):
        """The gen-α step as a per-mode affine map, float64 on host.

        The linear modal step is exact affine in ``s = (eta, etad, etadd)``:
        ``s' = T s + p4 e`` with ``p4 = winv * u`` and ``e = [beta h^2,
        gamma h, 1]`` (expand the substituted update of ``mode_coeffs``
        through the predictor/corrector lines). Returns ``(T (m, 3, 3),
        bdir (m, 3))`` where the offset is ``bdir * u`` per mode.
        """
        from ..ops.pallas.modal_rollout import mode_coeffs

        h = float(self.dt)
        am = (2.0 * self.rho_inf - 1.0) / (self.rho_inf + 1.0)
        af = self.rho_inf / (self.rho_inf + 1.0)
        beta = 0.25 * (1.0 - am + af) ** 2
        gamma = 0.5 - am + af
        bh2, gh = beta * h * h, gamma * h
        c_qp, c_vp = (0.5 - beta) * h * h, (1.0 - gamma) * h
        lam = np.asarray(self.lam, np.float64)
        winv = self.winv64()
        cd = None if self.cdamp is None else np.asarray(self.cdamp,
                                                        np.float64)
        p1, p2, p3, p5, p6 = mode_coeffs(lam, winv, self.rho_inf, cd)
        if p5 is None:
            p5 = p6 = np.zeros_like(lam)
        # a1 = p4 + Aq q + Av v + Aa a; then q' = q_pred + bh2 a1 etc.
        Aq = -(p2 + p3)
        Av = -(p2 * h + p5 + p6)
        Aa = p1 - p2 * c_qp - p5 * c_vp
        m = lam.shape[0]
        T = np.empty((m, 3, 3), np.float64)
        T[:, 0, 0] = 1.0 + bh2 * Aq
        T[:, 0, 1] = h + bh2 * Av
        T[:, 0, 2] = c_qp + bh2 * Aa
        T[:, 1, 0] = gh * Aq
        T[:, 1, 1] = 1.0 + gh * Av
        T[:, 1, 2] = c_vp + gh * Aa
        T[:, 2, 0] = Aq
        T[:, 2, 1] = Av
        T[:, 2, 2] = Aa
        bdir = winv[:, None] * np.array([bh2, gh, 1.0])[None, :]
        return T, bdir

    def _power_map(self, k: int, u_host):
        """Host-composed ``k``-step map ``(T^k, sum_{j<k} T^j b)``, f64."""
        T, bdir = self._step_affine64()
        b = (
            np.zeros((T.shape[0], 3), np.float64)
            if u_host is None
            else bdir * np.asarray(u_host, np.float64)[:, None]
        )
        P, S = _affine_power(T, k)
        return P, np.einsum("mij,mj->mi", S, b)

    def _power_map_device(self, k: int, u_host, dtype):
        """Per-instance memo of composed maps AND their device uploads.

        The composition is a pure function of ``(k, u, stepper
        coefficients)``; the round-5 decomposition (POWER_DECOMP.jsonl)
        measured the per-call fixed cost — eager f64 composition + map
        upload + dispatch — at ~54 ms, i.e. 93% of a 2000-step
        ``rollout_power`` call. Caching makes repeat calls pay only the
        ~31 us/application marginal cost, the same amortization contract
        as every prefactored operator in this module. The memo rides
        ``object.__setattr__`` (frozen dataclass); ``with_dt`` returns a
        fresh instance, so coefficient changes can never hit a stale map.
        """
        key = (
            int(k),
            None if u_host is None else u_host.tobytes(),
            jnp.dtype(dtype).name,
        )
        cache = getattr(self, "_pm_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_pm_cache", cache)
        if key not in cache:
            P, b = self._power_map(k, u_host)
            cache[key] = (jnp.asarray(P, dtype), jnp.asarray(b, dtype))
        return cache[key]

    def _power_consts_device(self, u_host, dtype):
        """Per-instance memo of the power-drive's small constant uploads
        (``lam``, ``cdamp``, the modal force) — same contract as
        :meth:`_power_map_device`. On the axon tunnel every eager upload
        is a ~ms round trip, and these three were re-uploaded per call:
        a measurable slice of the ~30 ms per-call fixed cost that
        dominates short-span ``rollout_power`` calls (POWER_DECOMP)."""
        key = (
            "consts",
            None if u_host is None else u_host.tobytes(),
            jnp.dtype(dtype).name,
        )
        cache = getattr(self, "_pm_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_pm_cache", cache)
        if key not in cache:
            cache[key] = (
                jnp.asarray(self.lam, dtype),
                None
                if self.cdamp is None
                else jnp.asarray(self.cdamp, dtype),
                None if u_host is None else jnp.asarray(u_host, dtype),
            )
        return cache[key]

    def _pwc_segments(self, u_pwc: PiecewiseConstant, n_steps: int,
                      t0: float):
        """Step counts per constant-force span of a piecewise-constant
        modal force, exactly matching the stepper's convention.

        Step ``n`` (starting at ``t0 + n h``) reads the force at its gen-α
        evaluation point ``tau_n = t0 + (n + 1 - af) h`` (``_step_fn``), so
        the value switches at the first step whose ``tau_n`` crosses the
        break — breaks need NOT be step-aligned. Classification happens in
        float64 on the host; the traced stepper classifies in the rollout
        dtype, so exact agreement on a step whose ``tau_n`` sits within
        f32-eps of a break needs f64 (the parity-test regime).

        Returns ``[(count, value_f64), ...]`` with zero-count spans
        dropped; counts sum to ``n_steps``.
        """
        af = self.rho_inf / (self.rho_inf + 1.0)
        h = float(self.dt)
        n_steps = int(n_steps)
        vals = np.asarray(u_pwc.values, np.float64)
        edges = [
            int(min(max(np.ceil((b - t0) / h - (1.0 - af)), 0), n_steps))
            for b in u_pwc.breaks
        ]
        bounds = [0] + edges + [n_steps]
        return [
            (bounds[i + 1] - bounds[i], vals[i])
            for i in range(len(bounds) - 1)
            if bounds[i + 1] > bounds[i]
        ]

    def _pwc_frame_runs(self, u_pwc: PiecewiseConstant, n_frames: int,
                        substeps: int, t0: float):
        """Per-frame composed maps for a piecewise-constant force, grouped
        into runs of consecutive frames sharing one map.

        Frames fully inside one constant-force span share that span's
        ``substeps``-step map; a frame whose substep window crosses a break
        gets its own map, composed from the partial-span pieces in order.
        Returns ``[(P (m,3,3), b (m,3), n_frames_run), ...]`` (float64).
        """
        segs = self._pwc_segments(u_pwc, n_frames * substeps, t0)
        m = np.asarray(self.lam).shape[0]
        full_maps = {}
        runs = []  # [key, P, b, count]
        si, rem_seg = 0, (segs[0][0] if segs else 0)
        for _f in range(int(n_frames)):
            pieces = []
            need = int(substeps)
            while need:
                k = min(need, rem_seg)
                pieces.append((k, si))
                need -= k
                rem_seg -= k
                if rem_seg == 0 and si + 1 < len(segs):
                    si += 1
                    rem_seg = segs[si][0]
            if len(pieces) == 1:
                key = pieces[0][1]
                if runs and runs[-1][0] == key:
                    runs[-1][3] += 1
                    continue
                if key not in full_maps:
                    full_maps[key] = self._power_map(
                        int(substeps), segs[key][1]
                    )
                runs.append([key, *full_maps[key], 1])
            else:
                P = np.broadcast_to(
                    np.eye(3), (m, 3, 3)
                ).astype(np.float64).copy()
                b = np.zeros((m, 3), np.float64)
                for k, idx in pieces:
                    Pk, bk = self._power_map(k, segs[idx][1])
                    b = np.einsum("mij,mj->mi", Pk, b) + bk
                    P = np.einsum("mij,mjk->mik", Pk, P)
                # unique key: break-crossing frames never merge into runs
                runs.append([("mix", _f), P, b, 1])
        return [(P, b, c) for _key, P, b, c in runs]

    def rollout_power(
        self, eta, etad, u_modal, n_steps: int, t0: float = 0.0,
        K: int = 16, tile: int = 1024, mode_tile: int = 16,
        unroll: int = 8, interpret: bool = False, use_pallas: bool = True,
    ):
        """Composed-propagator rollout: ``n_steps`` gen-α steps as
        ``n_steps // K`` applications of the host-precomputed K-step map.

        The linear modal gen-α step is an exact affine map per mode
        (:meth:`_step_affine64`), so K steps compose — in float64 on the
        host, O(log K) batched 3x3 matmuls — into ONE map whose
        application costs 9 FMAs + 3 adds per element, versus ``8 K`` FMAs
        of step-by-step. This is the discrete-map analogue of the ZOH
        ``expm`` propagator (``ops/exponential.py``): it reproduces the
        production stepper's *discrete trajectory* (identical to
        :meth:`rollout` up to f32 roundoff of the composed coefficients —
        NOT bit-equal, unlike ``rollout_pallas``), while the ``expm`` path
        reproduces the continuous flow. Same scope as the fused kernels:
        constant ``u_modal`` only. The remainder ``n_steps % K`` runs as
        one extra composed map.

        ``use_pallas=False`` runs the applications as an XLA scan (the
        memory-bound tier; still K-fold less carry traffic per step than
        ``rollout``). Returns final ``(eta, etad, etadd)``.

        ``u_modal`` may also be a :class:`PiecewiseConstant` over modal
        force (the tip-impulse workload shape): each constant-force span
        composes its own maps, and the affine state carries across the
        switch exactly like the stepper's does (``_pwc_segments`` matches
        its force-evaluation convention step-for-step).
        """
        K = int(K)
        if K < 1:
            raise ValueError(f"K must be >= 1, got {K}")
        if isinstance(u_modal, PiecewiseConstant):
            segs = self._pwc_segments(u_modal, n_steps, t0)
            dtype = jnp.asarray(eta).dtype
            PKs, bKs, Prs, brs, apps = [], [], [], [], []
            for count, u_host in segs:
                n_outer, rem = divmod(int(count), K)
                PK, bK = self._power_map(K, u_host)
                apps.append(n_outer)
                PKs.append(jnp.asarray(PK, dtype))
                bKs.append(jnp.asarray(bK, dtype))
                if rem:
                    Pr, br = self._power_map(rem, u_host)
                    Prs.append(jnp.asarray(Pr, dtype))
                    brs.append(jnp.asarray(br, dtype))
                else:
                    Prs.append(None)
                    brs.append(None)
            cdamp = (
                None
                if self.cdamp is None
                else jnp.asarray(self.cdamp, dtype)
            )
            u0_m = jnp.asarray(u_modal.value_at(t0), dtype)
            return _power_drive_schedule(
                jnp.asarray(self.lam, dtype), cdamp, u0_m,
                tuple(PKs), tuple(bKs), tuple(Prs), tuple(brs),
                eta, etad, apps=tuple(apps), tile=tile,
                mode_tile=mode_tile, unroll=unroll, interpret=interpret,
                use_pallas=use_pallas,
            )
        if callable(u_modal):
            raise ValueError(
                "rollout_power takes a constant modal force (or a "
                "PiecewiseConstant schedule)"
            )
        n_outer, rem = divmod(int(n_steps), K)
        u_host = (
            None
            if u_modal is None
            else np.asarray(jax.device_get(u_modal), np.float64)
        )
        dtype = jnp.asarray(eta).dtype
        PK_d, bK_d = self._power_map_device(K, u_host, dtype)
        Pr_d, br_d = (
            self._power_map_device(rem, u_host, dtype)
            if rem else (None, None)
        )
        lam_d, cdamp, u_m = self._power_consts_device(u_host, dtype)
        return _power_drive(
            lam_d, cdamp, u_m,
            PK_d, bK_d, Pr_d, br_d,
            eta, etad, apps=n_outer, tile=tile, mode_tile=mode_tile,
            unroll=unroll, interpret=interpret, use_pallas=use_pallas,
        )

    def rollout_frames_power(
        self, eta, etad, u_modal, n_frames: int, substeps: int = 1,
    ):
        """Frame-collecting composed-propagator rollout.

        Each output frame advances ``substeps`` steps via one precomputed
        map application (XLA elementwise — the per-frame work is 12 ops
        per element regardless of ``substeps``), so trajectory collection
        runs at effectively the fused-kernel rate. ``u_modal`` is a
        constant modal force or a :class:`PiecewiseConstant` schedule
        (frames crossing a force break get their own host-composed map).
        Returns ``(ts, etas, etads)`` including the initial state,
        matching :meth:`rollout_frames_pallas`.
        """
        if isinstance(u_modal, PiecewiseConstant):
            runs = self._pwc_frame_runs(
                u_modal, int(n_frames), int(substeps), 0.0
            )
            dtype = jnp.asarray(eta).dtype
            cdamp = (
                None
                if self.cdamp is None
                else jnp.asarray(self.cdamp, dtype)
            )
            etas, etads = _power_frames_drive_schedule(
                jnp.asarray(self.lam, dtype), cdamp,
                jnp.asarray(u_modal.value_at(0.0), dtype),
                tuple(jnp.asarray(P, dtype) for P, _b, _c in runs),
                tuple(jnp.asarray(b, dtype) for _P, b, _c in runs),
                eta, etad, counts=tuple(c for _P, _b, c in runs),
            )
            ts = (self.dt * substeps) * jnp.arange(int(n_frames) + 1)
            return ts, etas, etads
        if callable(u_modal):
            raise ValueError(
                "rollout_frames_power takes a constant modal force (or a "
                "PiecewiseConstant schedule)"
            )
        u_host = (
            None
            if u_modal is None
            else np.asarray(jax.device_get(u_modal), np.float64)
        )
        dtype = jnp.asarray(eta).dtype
        P_d, b_d = self._power_map_device(int(substeps), u_host, dtype)
        lam_d, cdamp, u_m = self._power_consts_device(u_host, dtype)
        etas, etads = _power_frames_drive(
            lam_d, cdamp, u_m,
            P_d, b_d,
            eta, etad, n_frames=int(n_frames),
        )
        ts = (self.dt * substeps) * jnp.arange(n_frames + 1)
        return ts, etas, etads

    def rollout_frames(
        self, eta, etad, u_modal, n_frames: int, substeps: int = 1,
        t0: float = 0.0, unroll: int = 1,
    ):
        """Frame-collecting rollout: ``substeps`` inner steps per frame.

        Returns ``(ts (F+1,), etas (F+1, ..., m), etads (F+1, ..., m))``
        including the initial state — the ``solve_ivp(t_eval=...)`` contract.
        ``unroll`` fuses inner steps per scan iteration (see :meth:`rollout`).
        """
        dtype = jnp.asarray(eta).dtype
        step = self._step_fn(dtype, u_modal)
        etadd = self.initial_accel(eta, u_modal, t0, etad)
        h = self.dt

        def frame(carry, i):
            t_frame = t0 + (i * substeps) * h

            def inner(c, j):
                return step(c, t_frame + j * h)

            carry, _ = jax.lax.scan(
                inner, carry, jnp.arange(substeps, dtype=dtype),
                unroll=unroll,
            )
            q, v, a = carry
            return carry, (q, v)

        _, (etas, etads) = jax.lax.scan(
            frame, (eta, etad, etadd), jnp.arange(n_frames)
        )
        ts = t0 + (h * substeps) * jnp.arange(n_frames + 1)
        etas = jnp.concatenate([eta[None], etas], axis=0)
        etads = jnp.concatenate([etad[None], etads], axis=0)
        return ts, etas, etads


def make_modal_genalpha(
    model,
    dt: float,
    rho_inf: float = 0.8,
    n_modes: int = None,
    rayleigh: tuple = None,
) -> ModalGenAlpha:
    """Build the modal generalized-alpha engine for an all-linear beam.

    Host float64 setup: generalized symmetric eigenproblem of the reduced
    (K, M) (the same decomposition as ``utils/modal.modal_analysis``).
    Raises for nonlinear configurations or registered state-dependent
    forces — those stay on ``make_newmark_operator``.

    ``rayleigh``: optional ``(alpha, beta)`` for structural damping
    ``C = alpha M + beta K`` (no reference counterpart — the reference has
    no material damping). Diagonalizes to ``cdamp_m = alpha + beta lam_m``
    and enters the recurrence and Jacobian exactly; per-mode damping ratio
    is ``zeta_m = (alpha / omega_m + beta omega_m) / 2``.
    """
    from scipy.linalg import eigh

    arrays = model.beam_model.arrays
    if bool(np.any(np.asarray(arrays.nonlinear_mask))):
        raise ValueError("Modal stepping requires a purely linear beam")
    if len(model.force_registry) > 0:
        raise ValueError(
            "Modal stepping (exact superposition) cannot include "
            "state-dependent registry forces — use make_modal_rom / "
            "simulate(method='modal_rom'): fluid drag and gravity ride "
            "its split fast path as reduced corrections"
        )

    K = np.asarray(model.beam_model.get_stiffness_matrix(), dtype=np.float64)
    M = np.asarray(model.beam_model.get_mass_matrix(), dtype=np.float64)
    lam, Phi = eigh(K, M)
    lam = np.maximum(lam, 0.0)
    if n_modes is not None:
        lam, Phi = lam[:n_modes], Phi[:, :n_modes]
    cdamp = None
    if rayleigh is not None:
        alpha, beta_r = float(rayleigh[0]), float(rayleigh[1])
        if alpha < 0 or beta_r < 0:
            raise ValueError("Rayleigh coefficients must be nonnegative")
        cdamp = alpha + beta_r * lam
    return ModalGenAlpha(
        Phi=Phi, PhiTM=Phi.T @ M, lam=lam, rho_inf=rho_inf, dt=dt,
        cdamp=cdamp,
    )


@dataclasses.dataclass(frozen=True)
class ModalROMGenAlpha:
    """Generalized-alpha stepping in a truncated modal (Galerkin) subspace.

    The nonlinear-beam counterpart of :class:`ModalGenAlpha`. The state is
    projected onto the lowest ``m`` mass-orthonormal modes of the symmetrized
    zero-state tangent; the *exact* vectorized element force (and any
    registered external forces) is evaluated in physical coordinates inside
    the residual, while the modified-Newton Jacobian is the Galerkin-reduced
    exact (non-symmetric, reference-parity) zero-state tangent, prefactored
    to an ``(m, m)`` inverse on the host in float64.

    Per step this replaces the dense path's three ``(3N x 3N) @ (3N x B)``
    matmuls with two ``(3N x m)`` basis transforms plus one tiny ``(m, m)``
    solve — an ``n/m`` reduction of the MXU work while keeping the element
    kernel exact. With ``m = n`` (full basis) the iteration is the dense
    modified-Newton generalized-alpha step conjugated by an invertible
    similarity, so trajectories match the dense engine to roundoff; with
    ``m < n`` it is the standard nonlinear modal reduction ROM, consistent
    with generalized-alpha's own treatment of unresolved high modes (they
    are the modes ``rho_inf`` exists to damp). Truncation accuracy is
    measured, not assumed: see ``tests/test_modal_rom.py``.

    Because the reference-parity nonlinear tangent is NON-symmetric, plain
    Galerkin projection onto symmetric-problem modes is unusable: the
    truncated reduced operator develops complex eigenvalue pairs — i.e.
    genuinely exponentially-growing ROM dynamics — even though the full
    spectrum is real (measured: m=18 of 24 diverges where m=12 and m=24 are
    stable). The engine therefore uses PETROV-Galerkin projection with the
    true right/left eigenvectors of the pencil ``(K0, M)``: trial basis
    ``Phi`` (right), test basis ``PhiW`` (left), biorthonormalized so
    ``PhiW^T M Phi = I`` — the reduced linear operator is then exactly
    ``diag`` of the true (real) eigenvalues, stable under any truncation.

    No reference counterpart (the reference has no reduced-order modeling;
    its nonlinear path is the full-order loop at
    ``euler_bernoulli_beam.py:181-195``).
    """

    Phi: np.ndarray  # (n, m) trial basis (right eigenvectors of (K0, M))
    PhiW: np.ndarray  # (n, m) test basis (left eigenvectors), PhiW^T M Phi = I
    PhiTM: np.ndarray  # (m, n) projector PhiW^T M
    Sinv: np.ndarray  # (m, m) f64 inverse of (1-am) I + (1-af) beta dt^2 K0r
    rho_inf: float
    dt: float
    internal_force: Callable  # reduced-coordinate element force k(q_red)
    external_force: Optional[Callable] = None  # (x_red, t) -> force, or None
    # Reduced external-force correction riding the split fast path:
    # ``(eta_af, etad_af, t_af, precision) -> (..., m)`` modal projection of
    # the external force, built from restricted basis rows (see
    # ``forces.FluidDragForce.make_reduced_modal`` /
    # ``GravityForce.make_reduced_modal``). Unlike ``external_force`` (which
    # forces the full (3N, m) transforms every Newton iteration), this
    # composes with the ``lam * eta + W^T g`` split — and with ECSW
    # hyper-reduction, since it is exact (not sampled). Built automatically
    # by make_modal_rom when every registered registry force supports it.
    ext_modal: Optional[Callable] = None
    # Split fast path (parity element kernel, no external forces): the
    # internal force is evaluated as ``W^T k(Phi eta) = lam * eta +
    # W^T g(Phi eta)`` with ``lam = diag(W^T K0 Phi)`` the exactly-diagonal
    # reduced linear operator and ``g = k - K0 q`` the quadratic/cubic
    # element correction (``elements.nonlinear_correction_planes``). The
    # dominant linear force never touches the (3N x m) basis transforms —
    # only the small correction does, so those transforms can run at reduced
    # MXU precision (``nl_precision``) with error scaled by ``|g|/|k|``.
    # The planar bases carry the full-coordinate planar permutation folded
    # in AND are restricted to the nodes the nonlinear elements touch
    # (``assembly.nonlinear_support``), so hybrid beams only transform the
    # rows that can produce a nonzero correction.
    lam: Optional[np.ndarray] = None  # (m,) diag of W^T K0 Phi
    Phi_planar: Optional[np.ndarray] = None  # (3 n_sub, m), restricted
    PhiW_planar: Optional[np.ndarray] = None  # (3 n_sub, m), restricted
    planar_correction: Optional[Callable] = None  # (..., 3, n_sub) -> same
    # Host NumPy element parameters of the restricted window, for the fused
    # Pallas rollout: {length, EI, EA, nonlinear_mask}, each (n_sub - 1,).
    window_params: Optional[dict] = None
    # ECSW guard fields (set by hyper_reduce): the FULL pre-reduction
    # correction machinery, retained so rollouts can periodically audit the
    # trained sample against the exact correction (ecsw_residual /
    # rollout_frames_guarded). None on non-hyper-reduced engines.
    guard_Phi: Optional[np.ndarray] = None
    guard_PhiW: Optional[np.ndarray] = None
    guard_correction: Optional[Callable] = None
    guard_train_tau: Optional[float] = None
    # Host NumPy element parameters of the ECSW sample (set by
    # hyper_reduce): {length, EI, EA, nonlinear_mask}, each (s,). The fused
    # Pallas rollout consumes these to evaluate the gathered-layout
    # correction in-kernel (ECSW weights are already folded into
    # ``PhiW_planar``). None on non-hyper-reduced engines.
    sampled_params: Optional[dict] = None
    # Diagonal of ``Sinv`` when the reduced effective Jacobian is diagonal
    # to roundoff (the Petrov-Galerkin eigenbasis case — see
    # make_modal_rom): the steppers then replace the (m, m) Newton solve
    # dot with a per-mode multiply. None when modes genuinely couple.
    Sinv_diag: Optional[np.ndarray] = None
    # (m,) modal Rayleigh structural damping ``alpha + beta lam_m``
    # (make_modal_rom rayleigh=(alpha, beta)): ``C = alpha M + beta K0``
    # diagonalizes in the Petrov-Galerkin basis exactly like the linear
    # modal engine's, enters the residual at the alpha point and the
    # effective Jacobian exactly. None = undamped (reference parity).
    cdamp: Optional[np.ndarray] = None

    @property
    def n_modes(self) -> int:
        return self.Phi.shape[1]

    def with_dt(self, dt: float) -> "ModalROMGenAlpha":
        """The same ROM engine at a different step size.

        Rebuilds the prefactored effective Jacobian for the new ``dt``
        from the exactly-diagonal reduced linear operator ``lam`` —
        available precisely when ``Sinv_diag`` was recorded (the
        Petrov-Galerkin eigenbasis case, same precondition as
        :meth:`rollout_adaptive`). A dt sweep then reuses one host
        Arnoldi/eigen setup instead of re-running :func:`make_modal_rom`
        per point. Augmented/defective bases with a genuinely coupled
        reduced operator must rebuild via :func:`make_modal_rom`.
        """
        if self.Sinv_diag is None or self.lam is None:
            raise ValueError(
                "with_dt requires the diagonal reduced effective Jacobian "
                "(Sinv_diag) — rebuild coupled/augmented engines with "
                "make_modal_rom at the new dt"
            )
        am, af, beta, gamma_ga = self._coeffs()
        d = (1.0 - am) + (1.0 - af) * beta * dt * dt * np.asarray(
            self.lam, np.float64
        )
        if self.cdamp is not None:
            d = d + (1.0 - af) * gamma_ga * dt * np.asarray(
                self.cdamp, np.float64
            )
        return dataclasses.replace(
            self, dt=float(dt), Sinv=np.diag(1.0 / d),
            Sinv_diag=np.ascontiguousarray(1.0 / d),
        )

    def to_modal(self, q, v):
        """Physical reduced (q, v) -> modal (eta, etadot) via PhiW^T M.

        Petrov-Galerkin: the projector uses the TEST basis (``PhiTM =
        PhiW^T M``), biorthonormal to the trial basis ``Phi`` — the
        adjoint-consistent pairing for the non-symmetric parity tangent.
        """
        PhiTM = jnp.asarray(self.PhiTM, dtype=jnp.asarray(q).dtype)
        return (
            jnp.einsum("mn,...n->...m", PhiTM, q),
            jnp.einsum("mn,...n->...m", PhiTM, v),
        )

    def from_modal(self, eta, etad):
        Phi = jnp.asarray(self.Phi, dtype=jnp.asarray(eta).dtype)
        return (
            jnp.einsum("nm,...m->...n", Phi, eta),
            jnp.einsum("nm,...m->...n", Phi, etad),
        )

    def project_force(self, u):
        """Physical force -> modal force (test-basis projection ``PhiW^T u``)."""
        WT = jnp.asarray(self.PhiW.T, dtype=jnp.asarray(u).dtype)
        return jnp.einsum("mn,...n->...m", WT, u)

    def project_force_host(self, u) -> np.ndarray:
        return self.PhiW.T @ np.asarray(jax.device_get(u), np.float64)

    def _coeffs(self):
        am = (2.0 * self.rho_inf - 1.0) / (self.rho_inf + 1.0)
        af = self.rho_inf / (self.rho_inf + 1.0)
        beta = 0.25 * (1.0 - am + af) ** 2
        gamma = 0.5 - am + af
        return am, af, beta, gamma

    def _force_modal(
        self, eta_af, etad_af, t_af, dtype, precision, nl_precision=None
    ):
        """Modal residual force: PhiW^T [k(q) - F_ext(x, t)] at the alpha point.

        On the split fast path the linear part is the exact diagonal
        ``lam * eta`` and only the quadratic/cubic correction ``g`` flows
        through the basis transforms, at ``nl_precision`` (defaults to
        ``precision``): a transform rounding error ``eps`` perturbs the
        modal force by ``~eps * |g|``, not ``~eps * |k|``, so bf16-grade
        MXU passes keep near-f32 trajectory accuracy while the transforms
        are the per-step cost (measured in NOTES_r1.md).
        """
        if self.lam is not None and self.external_force is None:
            nl_prec = precision if nl_precision is None else nl_precision
            lam = jnp.asarray(self.lam, dtype=dtype)
            f_m = lam * eta_af
            if self.planar_correction is not None:
                Phi = jnp.asarray(self.Phi_planar, dtype=dtype)
                W = jnp.asarray(self.PhiW_planar, dtype=dtype)
                q_p = jnp.einsum(
                    "nm,...m->...n", Phi, eta_af, precision=nl_prec
                )
                n_sub = q_p.shape[-1] // 3
                g_p = self.planar_correction(
                    q_p.reshape(*q_p.shape[:-1], 3, n_sub)
                )
                g_p = g_p.reshape(*q_p.shape[:-1], 3 * n_sub)
                f_m = f_m + jnp.einsum(
                    "nm,...n->...m", W, g_p, precision=nl_prec
                )
            if self.ext_modal is not None:
                # Reduced external forces (fluid drag / gravity) enter the
                # residual with the same sign as the general path's
                # ``k(q) - F_ext``: subtract the modal projection of F_ext.
                f_m = f_m - self.ext_modal(
                    eta_af, etad_af, t_af, precision=nl_prec
                )
            return f_m
        Phi = jnp.asarray(self.Phi, dtype=dtype)
        W = jnp.asarray(self.PhiW, dtype=dtype)
        q_af = jnp.einsum("nm,...m->...n", Phi, eta_af, precision=precision)
        f = self.internal_force(q_af)
        if self.external_force is not None:
            v_af = jnp.einsum(
                "nm,...m->...n", Phi, etad_af, precision=precision
            )
            x_af = jnp.concatenate([q_af, v_af], axis=-1)
            f = f - self.external_force(x_af, t_af)
        return jnp.einsum("nm,...n->...m", W, f, precision=precision)

    def _step_fn(self, dtype, u_modal, n_newton: int, precision,
                 nl_precision=None):
        am, af, beta, gamma = self._coeffs()
        dt = self.dt
        if self.Sinv_diag is not None:
            sinv_d = jnp.asarray(self.Sinv_diag, dtype=dtype)

            def solve(r):
                return sinv_d * r

        else:
            Sinv = jnp.asarray(self.Sinv, dtype=dtype)

            def solve(r):
                return jnp.einsum("mk,...k->...m", Sinv, r,
                                  precision=precision)

        u_at = ModalGenAlpha._force_at(u_modal, dtype)
        t_af_off = (1.0 - af) * dt
        cdamp = (
            None if self.cdamp is None else jnp.asarray(self.cdamp, dtype)
        )

        def step(carry, t):
            eta, etad, etadd = carry
            t_af = t + t_af_off
            eta_pred = eta + dt * etad + (0.5 - beta) * dt * dt * etadd
            etad_pred = etad + (1.0 - gamma) * dt * etadd

            def newton_body(i, a1):
                eta1 = eta_pred + beta * dt * dt * a1
                etad1 = etad_pred + gamma * dt * a1
                eta_af = (1.0 - af) * eta1 + af * eta
                etad_af = (1.0 - af) * etad1 + af * etad
                a_am = (1.0 - am) * a1 + am * etadd
                r = a_am + self._force_modal(
                    eta_af, etad_af, t_af, dtype, precision, nl_precision
                ) - u_at(t_af)
                if cdamp is not None:
                    r = r + cdamp * etad_af
                return a1 - solve(r)

            a1 = jax.lax.fori_loop(0, n_newton, newton_body, etadd)
            eta1 = eta_pred + beta * dt * dt * a1
            etad1 = etad_pred + gamma * dt * a1
            return (eta1, etad1, a1), None

        return step

    def initial_accel(self, eta, etad, u_modal, t0=0.0, precision=None,
                      nl_precision=None):
        """Petrov-Galerkin ``etadd0 = u_modal + PhiW^T (F_ext - k(q0))``
        (minus ``cdamp * etad0`` when structurally damped)."""
        dtype = jnp.asarray(eta).dtype
        r = -self._force_modal(eta, etad, t0, dtype, precision, nl_precision)
        if self.cdamp is not None:
            r = r - jnp.asarray(self.cdamp, dtype) * etad
        return r + ModalGenAlpha._force_at(u_modal, dtype)(t0)

    def rollout(
        self, eta, etad, u_modal, n_steps: int, t0: float = 0.0,
        n_newton: int = 1, precision=None, nl_precision=None,
        unroll: int = 1, carry_dtype=None,
    ):
        """Scan ``n_steps`` ROM generalized-alpha steps; final (eta, etad, etadd).

        ``n_newton=1`` is the semi-implicit scheme (one prefactored
        correction per step — the throughput default); larger values tighten
        the per-step dynamic balance for strongly nonlinear trajectories.
        ``nl_precision`` sets the MXU precision of the correction-force
        basis transforms alone (see ``_force_modal``). ``unroll`` fuses
        that many steps per scan iteration: the XLA scan carry roundtrips
        HBM once per iteration, so on the memory-bound ECSW engine
        unrolling divides the compulsory carry traffic by ``unroll``
        (identical per-step arithmetic — trajectories are unchanged).

        ``carry_dtype`` (e.g. ``jnp.bfloat16``) stores the HBM-crossing
        scan carry in a narrower dtype while every step still computes in
        the input dtype: the scan is restructured as an outer loop over
        ``unroll``-step chunks whose carry is downcast once per chunk and
        upcast on entry (compute precision, Newton solves, and force
        transforms are unchanged). Halves the compulsory carry traffic on
        the memory-bound engines at a cost of one ``carry_dtype`` rounding
        of the state per ``unroll`` steps — quantify drift for your
        horizon (``bench.py`` reports it as ``carry_drift_rel``; bf16
        rounding is ~4e-3 relative, so this is a throughput/accuracy
        trade, not a free win). ``carry_dtype=None`` (default) keeps the
        bit-exact single-scan path.
        """
        dtype = jnp.asarray(eta).dtype
        step = self._step_fn(dtype, u_modal, n_newton, precision, nl_precision)
        etadd = self.initial_accel(eta, etad, u_modal, t0, precision,
                                   nl_precision)
        ts = t0 + self.dt * jnp.arange(n_steps, dtype=dtype)
        if carry_dtype is None:
            (eta, etad, etadd), _ = jax.lax.scan(
                step, (eta, etad, etadd), ts, unroll=unroll
            )
            return eta, etad, etadd

        cdt = jnp.dtype(carry_dtype)
        k = max(1, min(int(unroll), int(n_steps)))
        n_outer = int(n_steps) // k
        rem = int(n_steps) - n_outer * k

        def k_chunk(carry, ts_k):
            c = tuple(x.astype(dtype) for x in carry)
            c, _ = jax.lax.scan(step, c, ts_k, unroll=k)
            return tuple(x.astype(cdt) for x in c), None

        carry = tuple(x.astype(cdt) for x in (eta, etad, etadd))
        if n_outer:
            carry, _ = jax.lax.scan(
                k_chunk, carry, ts[: n_outer * k].reshape(n_outer, k)
            )
        c = tuple(x.astype(dtype) for x in carry)
        if rem:
            c, _ = jax.lax.scan(step, c, ts[n_outer * k:], unroll=rem)
        return c

    def rollout_adaptive(
        self, eta, etad, u_modal, t_eval, rtol: float = 1e-6,
        atol: float = 1e-9, dt0: float = None, n_newton: int = 2,
        max_steps_per_interval: int = 100_000, safety: float = 0.9,
        precision=None, nl_precision=None, etadd0=None,
        return_final: bool = False,
    ):
        """Error-controlled ROM stepping: adaptive generalized-alpha.

        The same Zienkiewicz-Xie estimate + PI controller as the dense
        ``integrate_generalized_alpha_adaptive`` (no manual dt — the
        LSODA-capability engine), at ROM per-step cost: because the
        Petrov-Galerkin reduced effective Jacobian is diagonal, the
        per-trial-dt "refactorization" is a per-mode reciprocal
        ``1 / ((1-am) + (1-af) beta dt^2 lam)`` — there is nothing to
        factor, so a rejected step costs one force evaluation, not a
        solve. Error is controlled in modal coordinates (mass-orthonormal
        scaling); ``atol`` is in modal units.

        Batched inputs share one step size (the error norm contracts over
        all axes). Requires the diagonal reduced Jacobian (``Sinv_diag``,
        the normal eigenbasis case). Returns ``(etas, etads,
        AdaptiveStats)`` with frame axis leading and ``etas[0] = eta``
        (the ``solve_ivp(t_eval=...)`` contract).
        """
        from ..ops.integrators import adaptive_drive

        if self.Sinv_diag is None:
            raise ValueError(
                "rollout_adaptive requires the diagonal reduced effective "
                "Jacobian (Sinv_diag) — augmented/defective bases with a "
                "genuinely coupled reduced operator need a dense "
                "factorization per trial dt; use the fixed-step rollout"
            )
        am, af, beta, gamma = self._coeffs()
        cdamp64 = (
            None if self.cdamp is None
            else np.asarray(self.cdamp, np.float64)
        )
        # Reduced linear-operator diagonal in f64: the split fast path
        # stores it; otherwise invert the Sinv_diag relation at self.dt
        # (subtracting the damping term when present).
        if self.lam is not None:
            lam64 = np.asarray(self.lam, np.float64)
        else:
            j0 = 1.0 / np.asarray(self.Sinv_diag, np.float64) - (1.0 - am)
            if cdamp64 is not None:
                j0 = j0 - (1.0 - af) * gamma * self.dt * cdamp64
            lam64 = j0 / ((1.0 - af) * beta * self.dt * self.dt)

        if dt0 is None:
            if isinstance(t_eval, jax.core.Tracer):
                raise ValueError("dt0 is required when t_eval is traced")
            te = np.asarray(jax.device_get(t_eval))
            dt0 = float(te[1] - te[0]) / 16.0
        t_eval = jnp.asarray(t_eval)
        dtype = jnp.asarray(eta).dtype
        lam_j = jnp.asarray(lam64, dtype)
        u_at = ModalGenAlpha._force_at(u_modal, dtype)
        zx_coeff = abs(float(beta - 1.0 / 6.0))
        eps = float(jnp.finfo(dtype).eps)
        rtol = max(float(rtol), 50.0 * eps)
        atol = max(float(atol), 50.0 * eps * 1e-3)

        etadd = (
            etadd0 if etadd0 is not None
            else self.initial_accel(
                eta, etad, u_modal, t_eval[0], precision, nl_precision
            )
        )

        cdamp_j = (
            None if cdamp64 is None else jnp.asarray(cdamp64, dtype)
        )

        def trial_step(t, dt, eta0, etad0, etadd0):
            jd = (1.0 - am) + ((1.0 - af) * beta) * dt * dt * lam_j
            if cdamp_j is not None:
                jd = jd + ((1.0 - af) * gamma) * dt * cdamp_j
            t_af = t + (1.0 - af) * dt
            eta_pred = eta0 + dt * etad0 + (0.5 - beta) * dt * dt * etadd0
            etad_pred = etad0 + (1.0 - gamma) * dt * etadd0

            def newton_body(i, a1):
                eta1 = eta_pred + beta * dt * dt * a1
                etad1 = etad_pred + gamma * dt * a1
                eta_af = (1.0 - af) * eta1 + af * eta0
                etad_af = (1.0 - af) * etad1 + af * etad0
                a_am = (1.0 - am) * a1 + am * etadd0
                r = a_am + self._force_modal(
                    eta_af, etad_af, t_af, dtype, precision, nl_precision
                ) - u_at(t_af)
                if cdamp_j is not None:
                    r = r + cdamp_j * etad_af
                return a1 - r / jd

            a1 = jax.lax.fori_loop(0, n_newton, newton_body, etadd0)
            return (
                eta_pred + beta * dt * dt * a1,
                etad_pred + gamma * dt * a1,
                a1,
            )

        def err_norm(e, q_old, q_new):
            scale = atol + rtol * jnp.maximum(jnp.abs(q_old), jnp.abs(q_new))
            return jnp.sqrt(jnp.mean((e / scale) ** 2))

        def trial(t, dt, state):
            q, v, a = state
            q1, v1, a1 = trial_step(t, dt, q, v, a)
            e = zx_coeff * dt * dt * (a1 - a)
            return (q1, v1, a1), err_norm(e, q, q1)

        # Shared accept/reject interval driver (clamp policy, truncation
        # accounting, stats) — see ops.integrators.adaptive_drive.
        state_f, (etas, etads), stats = adaptive_drive(
            trial, (eta, etad, etadd), t_eval, jnp.asarray(dt0, dtype),
            -1.0 / 3.0, max_steps_per_interval=max_steps_per_interval,
            safety=safety, frame_out=lambda s: (s[0], s[1]),
        )
        etas = jnp.concatenate([eta[None], etas], axis=0)
        etads = jnp.concatenate([etad[None], etads], axis=0)
        if return_final:
            # Exact-continuation carry for chunked driving
            # (simulate(chunk=...)): the algorithmic (eta, etad, etadd).
            return etas, etads, stats, state_f
        return etas, etads, stats

    def hyper_reduce(self, snapshots, tau: float = 1e-3,
                     return_info: bool = False):
        """ECSW hyper-reduction: evaluate the correction on a trained sample.

        Energy-Conserving Sampling and Weighting (Farhat et al.): choose a
        sparse set of elements with nonnegative weights ``xi`` such that
        the weighted sampled reduced correction force reproduces the full
        assembly over the training ``snapshots`` (modal states, ``(S, m)``)
        to relative tolerance ``tau`` — solved by Lawson-Hanson NNLS with
        early stopping (each outer iteration admits one element, so
        stopping at ``tau`` yields sparsity directly).

        Returns a new engine whose planar bases are GATHERED to the
        sampled elements' six DOF rows (weights folded into the test
        basis) and whose correction closure evaluates only those elements
        — both the per-step transform rows and the element-force work
        scale with the sample size instead of the mesh. The split linear
        term ``lam * eta`` is untouched, so hyper-reduction error lives
        entirely in the (small) correction force; accuracy is measured,
        not assumed (tests/test_modal_rom.py).

        Only the split planar fast path can be hyper-reduced (parity
        kernel, no general ``external_force``). REDUCED external forces
        (``ext_modal`` — fluid drag / gravity via their restricted-basis
        closures) compose exactly: the sample only approximates the
        element correction ``g``, while ``ext_modal`` keeps evaluating the
        exact projected force, so ECSW + forced beams is supported. The
        returned engine supports the fused Pallas rollout
        (``make_pallas_rollout`` builds the gathered-layout kernel from
        ``sampled_params``) only when no external forces are attached.
        """
        if self.lam is None or self.planar_correction is None:
            raise ValueError(
                "hyper_reduce requires the split planar fast path "
                "(parity nonlinear/hybrid beam, no external forces)"
            )
        if self.external_force is not None:
            # _force_modal only takes the split (sampled) path when no
            # external forces are registered — without this check the
            # returned engine would silently never use the trained sample.
            raise ValueError(
                "hyper_reduce does not support engines with external "
                "forces (registry or forces_func): the correction sample "
                "is only evaluated on the split fast path"
            )
        if self.window_params is None:
            raise ValueError("engine is already hyper-reduced")
        wp = self.window_params
        L = np.asarray(wp["length"], np.float64)
        D = np.asarray(wp["EI"], np.float64)
        A = np.asarray(wp["EA"], np.float64)
        nl_mask = np.asarray(wp["nonlinear_mask"], bool)
        Phi_p = np.asarray(self.Phi_planar, np.float64)  # (3 n_sub, m)
        W_p = np.asarray(self.PhiW_planar, np.float64)
        m = Phi_p.shape[1]
        n_sub = Phi_p.shape[0] // 3
        E = n_sub - 1

        def plane_rows(c):  # rows of DOF plane c (u/w/theta)
            return slice(c * n_sub, (c + 1) * n_sub)

        # Training data: per-element reduced-force contributions c_{e,i}
        # and exact totals d_i, all host f64.
        S = np.asarray(jax.device_get(snapshots), np.float64)
        if S.ndim == 1:
            S = S[None, :]
        if not np.isfinite(S).all():
            raise ValueError(
                "snapshots contain non-finite values — the training "
                "rollout diverged; rerun it with a stable configuration "
                "before hyper-reducing"
            )
        q_p = S @ Phi_p.T  # (S, 3 n_sub)
        u_pl = q_p[:, plane_rows(0)]
        w_pl = q_p[:, plane_rows(1)]
        t_pl = q_p[:, plane_rows(2)]
        planes = elements.nonlinear_correction_planes(
            u_pl[:, :-1], w_pl[:, :-1], t_pl[:, :-1],
            u_pl[:, 1:], w_pl[:, 1:], t_pl[:, 1:],
            L, D, A,
        )
        planes = tuple(np.where(nl_mask, p, 0.0) for p in planes)
        ga1, gt1, gm1, ga2, gt2, gm2 = planes  # (S, E) each, slot order
        # W rows per element slot: node-1 rows e, node-2 rows e+1.
        Wu, Ww, Wt = (W_p[plane_rows(c)] for c in range(3))
        # c[e, i, :] = sum over the six slots of W_row * g_slot.
        C = (
            np.einsum("se,em->sem", ga1, Wu[:-1])
            + np.einsum("se,em->sem", gt1, Ww[:-1])
            + np.einsum("se,em->sem", gm1, Wt[:-1])
            + np.einsum("se,em->sem", ga2, Wu[1:])
            + np.einsum("se,em->sem", gt2, Ww[1:])
            + np.einsum("se,em->sem", gm2, Wt[1:])
        )  # (S, E, m)
        n_snap = C.shape[0]
        G = np.moveaxis(C, 1, 2).reshape(n_snap * m, E)
        d = G.sum(axis=1)
        xi = _ecsw_nnls(G, d, tau)
        sel = np.flatnonzero(xi > 0)
        if sel.size == 0:
            raise ValueError(
                "ECSW training selected no elements — the snapshots carry "
                "no correction-force content (all-linear window or zero "
                "states); hyper-reduction is meaningless here"
            )

        reduced = self.apply_ecsw(sel, xi[sel], train_tau=tau)
        if return_info:
            resid = G @ xi - d
            res = float(np.linalg.norm(resid) / np.linalg.norm(d))
            # Per-snapshot coverage diagnostic: how well the sample
            # reproduces each individual training state (a wide spread
            # means the envelope is thin where the residual is high).
            r2 = np.linalg.norm(resid.reshape(n_snap, m), axis=1)
            d2 = np.linalg.norm(d.reshape(n_snap, m), axis=1)
            snap_res = r2 / np.maximum(d2, 1e-300)
            return reduced, {
                "n_sampled": int(sel.size),
                "weights": xi,
                "train_residual": res,
                "snapshot_residuals": snap_res,
                "snapshot_residual_max": float(snap_res.max()),
            }
        return reduced

    def apply_ecsw(self, sel, xi_sel, train_tau: float = None):
        """Apply a (pre)trained ECSW sample: gather bases to ``sel``.

        The deployment half of :meth:`hyper_reduce` — ``sel`` are element
        indices into the restricted window, ``xi_sel`` their positive ECSW
        weights. Training (the NNLS over snapshots) is the expensive,
        data-dependent step; this application is deterministic, so a
        trained sample persisted with :meth:`save_ecsw` can be re-applied
        to a freshly built engine of the same configuration
        (:func:`load_ecsw`) without re-training.
        """
        if self.lam is None or self.planar_correction is None:
            raise ValueError(
                "apply_ecsw requires the split planar fast path "
                "(parity nonlinear/hybrid beam, no external forces)"
            )
        if self.external_force is not None:
            raise ValueError(
                "apply_ecsw does not support engines with external forces"
            )
        if self.window_params is None:
            raise ValueError("engine is already hyper-reduced")
        wp = self.window_params
        L = np.asarray(wp["length"], np.float64)
        D = np.asarray(wp["EI"], np.float64)
        A = np.asarray(wp["EA"], np.float64)
        nl_mask = np.asarray(wp["nonlinear_mask"], bool)
        Phi_p = np.asarray(self.Phi_planar, np.float64)  # (3 n_sub, m)
        W_p = np.asarray(self.PhiW_planar, np.float64)
        n_sub = Phi_p.shape[0] // 3
        E = n_sub - 1

        sel = np.asarray(sel, np.int64)
        xi_sel = np.asarray(xi_sel, np.float64)
        if sel.ndim != 1 or xi_sel.shape != sel.shape:
            raise ValueError("sel and xi_sel must be matching 1-D arrays")
        if sel.size == 0 or np.any(sel < 0) or np.any(sel >= E):
            raise ValueError(
                f"sample indices must be a nonempty subset of [0, {E})"
            )
        if np.any(xi_sel <= 0):
            raise ValueError("ECSW weights must be positive")

        def plane_rows(c):  # rows of DOF plane c (u/w/theta)
            return slice(c * n_sub, (c + 1) * n_sub)

        # Gathered six-plane bases: rows [u1; w1; t1; u2; w2; t2] x sample.
        def gather(B, weights=None):
            rows = []
            for node_off in (0, 1):
                for c in range(3):
                    blk = B[plane_rows(c)][sel + node_off]
                    rows.append(blk)
            out = np.concatenate(rows, axis=0)  # (6 s, m) in plane blocks
            if weights is not None:
                out = out * np.tile(weights, 6)[:, None]
            return np.ascontiguousarray(out)

        # Order the 6 blocks as [u1, w1, t1, u2, w2, t2] of width s each.
        Phi6 = gather(Phi_p)
        W6 = gather(W_p, weights=xi_sel)
        s = sel.size
        L_s, D_s, A_s = L[sel], D[sel], A[sel]
        mask_s = nl_mask[sel]

        def g_sampled(q_pseudo):
            # _force_modal hands (..., 3, 2s) pseudo-planes; reinterpret
            # the flat 6s layout as the six gathered width-s blocks.
            q6 = q_pseudo.reshape(*q_pseudo.shape[:-2], 6, s)
            u1, w1, t1 = q6[..., 0, :], q6[..., 1, :], q6[..., 2, :]
            u2, w2, t2 = q6[..., 3, :], q6[..., 4, :], q6[..., 5, :]
            Lj = jnp.asarray(L_s, dtype=q_pseudo.dtype)
            Dj = jnp.asarray(D_s, dtype=q_pseudo.dtype)
            Aj = jnp.asarray(A_s, dtype=q_pseudo.dtype)
            pl = elements.nonlinear_correction_planes(
                u1, w1, t1, u2, w2, t2, Lj, Dj, Aj
            )
            if not bool(mask_s.all()):
                mj = jnp.asarray(mask_s)
                pl = tuple(jnp.where(mj, p, 0.0) for p in pl)
            g1, g3, g4, g2, g5, g6_ = pl
            out = jnp.stack([g1, g3, g4, g2, g5, g6_], axis=-2)
            return out.reshape(q_pseudo.shape)

        return dataclasses.replace(
            self,
            Phi_planar=Phi6,
            PhiW_planar=W6,
            planar_correction=g_sampled,
            window_params=None,  # marks the gathered layout for _force_modal
            guard_Phi=self.Phi_planar,
            guard_PhiW=self.PhiW_planar,
            guard_correction=self.planar_correction,
            guard_train_tau=None if train_tau is None else float(train_tau),
            sampled_params={
                "length": L_s, "EI": D_s, "EA": A_s,
                "nonlinear_mask": mask_s,
                # Raw trained sample, for persistence (save_ecsw).
                "sel": sel, "xi": xi_sel,
            },
        )

    def save_basis(self, path: str) -> str:
        """Persist the Petrov-Galerkin basis ``(V, W)`` as .npz.

        The eigensolve is the dominant engine-build cost at scale (minutes
        for a 3000-DOF dense two-sided ``eig``); a persisted basis rebuilds
        the engine in milliseconds: ``make_modal_rom(model, dt, ...,
        basis=load_basis(path))``. Augmented bases (static vectors / modal
        derivatives) persist as-is.
        """
        import os as _os

        d = _os.path.dirname(_os.path.abspath(path))
        if d:
            _os.makedirs(d, exist_ok=True)
        np.savez(path, V=self.Phi, W=self.PhiW)
        return path

    def save_ecsw(self, path: str) -> str:
        """Persist the trained ECSW sample (indices, weights, tau) as .npz.

        The trained sample is the expensive artifact (NNLS over training
        snapshots); the basis itself is a deterministic function of the
        beam configuration, so deployment is: rebuild the engine with
        :func:`make_modal_rom` (same model/dt/settings), then
        ``ms.apply_ecsw(*load_ecsw(path))``.
        """
        if self.sampled_params is None or "sel" not in self.sampled_params:
            raise ValueError(
                "save_ecsw requires a hyper-reduced engine (hyper_reduce "
                "or apply_ecsw)"
            )
        import os as _os

        d = _os.path.dirname(_os.path.abspath(path))
        if d:
            _os.makedirs(d, exist_ok=True)
        np.savez(
            path,
            sel=self.sampled_params["sel"],
            xi=self.sampled_params["xi"],
            train_tau=np.float64(
                -1.0 if self.guard_train_tau is None else self.guard_train_tau
            ),
            n_modes=np.int64(self.n_modes),
        )
        return path

    def ecsw_residual(self, eta):
        """Per-env relative residual of the trained sample vs the FULL correction.

        ``rho = |f_sampled(eta) - f_full(eta)| / |f_full(eta)|`` in the
        reduced (modal) force norm — the quantity ECSW training bounded by
        ``tau`` OVER THE TRAINING SNAPSHOTS. States outside the trained
        envelope show ``rho >> tau``; nothing else in the engine would
        notice (the round-1 verdict's "silently wrong at 69M env-steps/s").
        Costs one full correction evaluation — the exact work the sample
        normally avoids — so call it every K steps, not every step
        (:meth:`rollout_frames_guarded` does, per frame).

        Only valid on a hyper-reduced engine (raises otherwise).
        """
        if self.guard_Phi is None:
            raise ValueError(
                "ecsw_residual requires a hyper-reduced engine "
                "(call hyper_reduce first)"
            )
        eta = jnp.asarray(eta)
        dtype = eta.dtype

        def reduced_correction(Phi_p, W_p, g_fn):
            q_p = jnp.einsum(
                "nm,...m->...n", jnp.asarray(Phi_p, dtype), eta
            )
            n3 = q_p.shape[-1]
            g = g_fn(q_p.reshape(*q_p.shape[:-1], 3, n3 // 3))
            g = g.reshape(*q_p.shape[:-1], n3)
            return jnp.einsum(
                "nm,...n->...m", jnp.asarray(W_p, dtype), g
            )

        f_s = reduced_correction(
            self.Phi_planar, self.PhiW_planar, self.planar_correction
        )
        f_full = reduced_correction(
            self.guard_Phi, self.guard_PhiW, self.guard_correction
        )
        num = jnp.linalg.norm(f_s - f_full, axis=-1)
        den = jnp.linalg.norm(f_full, axis=-1)
        return num / jnp.maximum(den, jnp.asarray(1e-30, dtype))

    def rollout_frames_guarded(
        self, eta, etad, u_modal, n_frames: int, substeps: int = 1,
        t0: float = 0.0, n_newton: int = 1, precision=None,
        nl_precision=None, guard_tol: float = None,
    ):
        """Frame rollout with a per-frame ECSW envelope audit.

        Identical stepping to :meth:`rollout_frames`; at every output frame
        the sampled correction is checked against the full correction
        (:meth:`ecsw_residual` — overhead ~1/substeps of an unreduced
        rollout). Returns ``(ts, etas, etads, guard)`` with ``guard`` a dict:
        ``max_residual`` (..., per env, running max), ``flagged`` (bool,
        ``max_residual > guard_tol``). ``guard_tol`` defaults to
        ``10 x`` the training tau — comfortably inside "trained", loudly
        outside.
        """
        if self.guard_Phi is None:
            raise ValueError(
                "rollout_frames_guarded requires a hyper-reduced engine"
            )
        if guard_tol is None:
            guard_tol = 10.0 * (self.guard_train_tau or 1e-3)
        dtype = jnp.asarray(eta).dtype
        step = self._step_fn(dtype, u_modal, n_newton, precision,
                             nl_precision)
        etadd = self.initial_accel(eta, etad, u_modal, t0, precision,
                                   nl_precision)
        h = self.dt

        def frame(carry, i):
            state, res_max = carry
            t_frame = t0 + (i * substeps) * h

            def inner(c, j):
                return step(c, t_frame + j * h)

            state, _ = jax.lax.scan(
                inner, state, jnp.arange(substeps, dtype=dtype)
            )
            q, v, a = state
            res_max = jnp.maximum(res_max, self.ecsw_residual(q))
            return (state, res_max), (q, v)

        res0 = jnp.zeros(jnp.asarray(eta).shape[:-1], dtype)
        (_, res_max), (etas, etads) = jax.lax.scan(
            frame, ((eta, etad, etadd), res0), jnp.arange(n_frames)
        )
        ts = t0 + (h * substeps) * jnp.arange(n_frames + 1)
        etas = jnp.concatenate([eta[None], etas], axis=0)
        etads = jnp.concatenate([etad[None], etads], axis=0)
        guard = {
            "max_residual": res_max,
            "flagged": res_max > guard_tol,
            "guard_tol": guard_tol,
        }
        return ts, etas, etads, guard

    def make_pallas_rollout(self, tile: int = 256):
        """Fused Pallas rollout: the whole span resident in VMEM.

        Returns a callable ``(eta, etad, u_modal, n_steps, n_newton=1,
        precision=None, nl_precision=None) -> (eta, etad, etadd)`` running
        the identical recurrence to :meth:`rollout` as one kernel per env
        tile (``ops/pallas/rom_rollout.py``). Constant-input,
        no-external-force configurations only.
        """
        if self.ext_modal is not None:
            raise ValueError(
                "the fused Pallas ROM kernel does not evaluate reduced "
                "external forces (fluid/gravity) in-kernel — run forced "
                "beams on the XLA split path (simulate(engine='xla'), "
                "rollout/rollout_frames/rollout_adaptive)"
            )
        if self.external_force is not None:
            raise ValueError(
                "the fused Pallas ROM kernel supports no external forces"
            )
        from ..ops.pallas.rom_rollout import FusedROMRollout

        return FusedROMRollout(self, tile=tile)

    def rollout_frames(
        self, eta, etad, u_modal, n_frames: int, substeps: int = 1,
        t0: float = 0.0, n_newton: int = 1, precision=None, nl_precision=None,
        unroll: int = 1,
    ):
        """Frame-collecting ROM rollout; ``solve_ivp(t_eval=...)`` contract.

        ``unroll`` fuses inner steps per scan iteration (see :meth:`rollout`).
        """
        dtype = jnp.asarray(eta).dtype
        step = self._step_fn(dtype, u_modal, n_newton, precision, nl_precision)
        etadd = self.initial_accel(eta, etad, u_modal, t0, precision,
                                   nl_precision)
        h = self.dt

        def frame(carry, i):
            t_frame = t0 + (i * substeps) * h

            def inner(c, j):
                return step(c, t_frame + j * h)

            carry, _ = jax.lax.scan(
                inner, carry, jnp.arange(substeps, dtype=dtype),
                unroll=unroll,
            )
            q, v, a = carry
            return carry, (q, v)

        _, (etas, etads) = jax.lax.scan(
            frame, (eta, etad, etadd), jnp.arange(n_frames)
        )
        ts = t0 + (h * substeps) * jnp.arange(n_frames + 1)
        etas = jnp.concatenate([eta[None], etas], axis=0)
        etads = jnp.concatenate([etad[None], etads], axis=0)
        return ts, etas, etads


def load_basis(path: str):
    """Load a ``(V, W)`` basis saved by :meth:`ModalROMGenAlpha.save_basis`;
    pass as ``make_modal_rom(..., basis=...)``."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    return np.asarray(data["V"], np.float64), np.asarray(data["W"], np.float64)


def load_ecsw(path: str):
    """Load a trained ECSW sample saved by :meth:`ModalROMGenAlpha.save_ecsw`.

    Returns ``(sel, xi_sel, train_tau)`` — pass to
    :meth:`ModalROMGenAlpha.apply_ecsw` on an engine rebuilt with the same
    configuration (the saved ``n_modes`` is cross-checked there only via
    basis shape compatibility; keep the CSV/dt/settings identical).
    """
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    tau = float(data["train_tau"])
    return (
        np.asarray(data["sel"], np.int64),
        np.asarray(data["xi"], np.float64),
        None if tau < 0 else tau,
    )


def _ecsw_nnls(G, d, tau: float) -> np.ndarray:
    """Sparse nonnegative weights by early-stopped Lawson-Hanson NNLS.

    Solves ``min ||G xi - d||, xi >= 0`` but stops as soon as the residual
    drops to ``tau * ||d||`` — each outer iteration admits one column
    (element), so early stopping IS the sparsification (the ECSW training
    step). ``tau = 0`` runs to the NNLS stationary point. Degenerate
    admissions (a new column whose least-squares coefficient is already
    nonpositive — linearly dependent snapshot content) are banned rather
    than looped on; if the iteration budget runs out before the target
    residual, a warning reports the achieved one.
    """
    import warnings

    n_rows, E = G.shape
    xi = np.zeros(E)
    passive: list = []
    banned: set = set()
    r = d.copy()
    dn = np.linalg.norm(d)
    if dn == 0:
        return xi
    # The inner loop can eject previously admitted columns, so the outer
    # budget must exceed one-admission-per-column.
    budget = 3 * min(E, n_rows) + 1
    for _ in range(budget):
        if np.linalg.norm(r) <= tau * dn:
            break
        grad = G.T @ r
        if passive:
            grad[passive] = -np.inf
        if banned:
            grad[list(banned)] = -np.inf
        j = int(np.argmax(grad))
        if not np.isfinite(grad[j]) or grad[j] <= 0:
            break
        passive.append(j)
        # Inner feasibility loop (standard Lawson-Hanson).
        while True:
            z = np.zeros(E)
            sol, *_ = np.linalg.lstsq(G[:, passive], d, rcond=None)
            z[np.asarray(passive)] = sol
            if all(z[p] > 0 for p in passive):
                xi = z
                break
            neg = [p for p in passive if z[p] <= 0]
            movable = [p for p in neg if xi[p] - z[p] > 0]
            if not movable:
                # 0/0 step (the just-admitted column came back at exactly
                # zero): revert the admission and never retry it.
                if j in passive:
                    passive.remove(j)
                banned.add(j)
                break
            alpha = min(xi[p] / (xi[p] - z[p]) for p in movable)
            xi = xi + alpha * (z - xi)
            passive = [p for p in passive if xi[p] > 1e-12]
            if not passive:
                xi = np.zeros(E)
                break
        r = d - G @ xi
    else:
        res = np.linalg.norm(r) / dn
        if res > tau:
            warnings.warn(
                f"ECSW NNLS iteration budget exhausted at relative "
                f"residual {res:.2e} (target {tau:.2e}); the returned "
                f"sample under-fits the snapshots",
                stacklevel=2,
            )
    return xi


def _check_real_spectrum(w, m_keep: int) -> None:
    """Require reality of the RETAINED modes only.

    On large parity nonlinear meshes the upper ~60% of the tangent pencil's
    spectrum comes in complex pairs (measured at N=1000: modes >= 1236 of
    3000) while every retained low mode is exactly real.
    """
    im = np.abs(np.imag(w))
    cplx = im > 1e-8 * np.abs(np.real(w)).max()
    if cplx.any():
        n_real = int(np.argmax(cplx))  # first complex mode index
        raise ValueError(
            f"retained modal range contains complex eigenvalue pairs; "
            f"reduce n_modes to <= {n_real} for a real stable basis"
        )


def _canonical_signs(V, W):
    """Fix the eigenvector sign ambiguity: flip each (right, left) column
    pair so the right vector's largest-magnitude entry is positive.

    Eigensolvers return vectors up to sign (ARPACK's depends on its start
    vector); a same-flip of V and W columns preserves ``W^T M V = I``.
    Deterministic bases make rebuilt engines reproduce persisted ECSW
    samples and trained artifacts exactly.
    """
    idx = np.argmax(np.abs(V), axis=0)
    s = np.sign(V[idx, np.arange(V.shape[1])])
    s = np.where(s == 0, 1.0, s)
    return V * s, W * s


def _lowest_modes_sparse(K, M, k: int):
    """Lowest-``k`` eigenpairs of the non-symmetric pencil ``(K, M)``.

    Shift-invert Arnoldi at ``sigma = 0`` on the sparse (block-tridiagonal)
    operators — O(N) factorization + O(N k) iteration vs the dense eig's
    O(N^3). Falls back to dense ``eig`` if ARPACK fails to converge.
    Returns ``(w, V)`` sorted ascending by real part (complex dtype; caller
    checks reality).
    """
    import scipy.sparse as sp
    from scipy.sparse.linalg import ArpackError, ArpackNoConvergence, eigs

    try:
        # Deterministic start vector: ARPACK's default v0 is RANDOM, which
        # flips eigenvector signs (and perturbs roundoff) between otherwise
        # identical calls — two make_modal_rom builds of the same beam must
        # produce the same basis (ECSW persistence relies on it).
        v0 = np.full(K.shape[0], 1.0 / np.sqrt(K.shape[0]))
        w, V = eigs(
            sp.csc_matrix(K), k=k, M=sp.csc_matrix(M), sigma=0.0,
            which="LM", v0=v0,
        )
    except (ArpackError, ArpackNoConvergence):
        from scipy.linalg import eig as dense_eig

        w, V = dense_eig(K, M)
    order = np.argsort(w.real)[:k]
    return w[order], V[:, order]


def _augment_static(K0, M, V, W, static_vectors, max_extra=None,
                    dense_threshold: int = 2000):
    """Augment a truncated modal basis for given static load patterns.

    Truncated eigenmode bases miss quasi-static response components whose
    modal content lives above the retained band — for beams, most notably
    the membrane (axial) deflection driven by bending-pair quadratic
    forcing, whose axial modes sit far above the retained bending modes
    (measured on the large-deflection workload: m=15 of 18 modes still
    carries 12% tip error).

    Classic static-vector augmentation (adding ``K0^{-1} b`` to the trial
    basis) is NOT usable here: the parity tangent is non-symmetric, the
    augmented subspace is not invariant, and the oblique-projected reduced
    operator genuinely develops complex (exponentially unstable) Ritz
    pairs — measured imag/real up to 0.23 with a perfectly conditioned
    joint biorthonormalization. The stable equivalent implemented here is
    PARTICIPATION-SELECTED EIGEN-AUGMENTATION: expand ``K0^{-1} b`` in the
    full two-sided eigenbasis of ``(K0, M)`` and add the true (real)
    eigenpairs that dominate it. The basis stays a set of exact
    right/left eigenvectors, so the reduced operator remains exactly
    diagonal-real and unconditionally truncation-stable.

    Candidate eigenpairs come from a dense two-sided ``eig`` on small
    systems (1.2 s at 630 DOFs — dominant setup cost only beyond a couple
    thousand), or — above ``dense_threshold`` DOFs — from shift-invert
    Arnoldi runs targeted at each static response's deflated Rayleigh
    quotient (the retained-band content is projected out of the response
    first, so the shift lands in the band that actually carries the
    missing content; O(N) per shift vs the dense eig's O(N^3)).

    FUNDAMENTAL LIMIT of the parity element: its non-normal axial coupling
    sends the membrane band complex as the mesh refines (measured: the
    4-7e8 band is entirely complex by 210 elements; at 1000 elements modes
    >= 1236 of 3000 are complex). When the static responses live in a
    complex band, NO real-stable eigen-augmentation exists — candidates
    are near-defective (|w^T M v| underflows) and are filtered out, the
    augmentation degrades to a warning no-op, and users needing
    large-mesh membrane accuracy should switch to the variationally
    consistent element (``use_consistent_nonlinear=True``), whose
    symmetric tangent keeps every band real.

    ``static_vectors``: load pattern(s) in reduced coordinates — ``(n,)``
    or ``(n, k)``. ``max_extra`` caps the added modes (default
    ``4 * n_loads``).
    """
    n = K0.shape[0]
    Bv = np.asarray(static_vectors, np.float64)
    if Bv.ndim == 1:
        Bv = Bv[:, None]
    if Bv.shape[0] != n:
        raise ValueError(
            f"static_vectors must have leading dimension {n} "
            f"(got {Bv.shape})"
        )
    m0 = V.shape[1]
    if max_extra is None:
        max_extra = 4 * Bv.shape[1]
    max_extra = min(max_extra, n - m0)
    if max_extra <= 0:
        return V, W

    import warnings

    def _noop(reason):
        warnings.warn(
            "ROM basis augmentation added no modes: " + reason + ". If the "
            "static content lives in a complex band of the parity "
            "tangent's spectrum (large meshes), no real-stable "
            "eigen-augmentation exists; consider "
            "use_consistent_nonlinear=True (symmetric tangent, all bands "
            "real).",
            stacklevel=3,
        )
        return V, W

    X = np.linalg.solve(K0, Bv)  # (n, k) static responses
    if n <= dense_threshold:
        vr_c, wl_c = _candidate_pairs_dense(K0, M, m0)
    else:
        vr_c, wl_c = _candidate_pairs_sparse(K0, M, V, W, X)
    if vr_c.shape[1] == 0:
        return _noop("no real candidate eigenpairs found")
    Mv = M @ vr_c
    denom = np.einsum("ij,ij->j", wl_c, Mv)
    # Eigenvalue-conditioning filter: cos of the left/M-right angle.
    # Near-defective pairs (the complex-adjacent region of the parity
    # tangent) have |w^T M v| orders below |w||Mv|; scaling W by 1/denom
    # then amplifies them into a basis that sends the ROM to NaN
    # (measured at n=630: 2 such modes admitted -> divergence).
    cos = np.abs(denom) / (
        np.linalg.norm(wl_c, axis=0) * np.linalg.norm(Mv, axis=0) + 1e-300
    )
    ok = cos > 1e-3
    vr_c, wl_c, denom = vr_c[:, ok], wl_c[:, ok], denom[ok]
    if vr_c.shape[1] == 0:
        return _noop("all candidate eigenpairs are near-defective")
    # Participation of each candidate mode in each (normalized) static
    # response; score = worst-case over loads. (w_i^T M x) / (w_i^T M v_i)
    # is the expansion coefficient of x along v_i by biorthogonality.
    coeff = (wl_c.T @ (M @ X)) / denom[:, None]  # (n_cand, k)
    resp_scale = np.abs(coeff).max(axis=0) + 1e-300
    score = np.abs(coeff / resp_scale[None, :]).max(axis=1)
    top = np.argsort(score)[::-1][:max_extra]
    top = top[score[top] > 1e-6]
    if top.size == 0:
        return _noop("no candidate participates in the static responses")
    V2 = np.concatenate([V, vr_c[:, top]], axis=1)
    W2 = np.concatenate([W, wl_c[:, top] / denom[top][None, :]], axis=1)
    # Joint clean-up biorthonormalization (exact pairs are already
    # near-biorthogonal; this removes roundoff-level cross terms).
    # Arnoldi-sourced pairs additionally leave the reduced operator's
    # off-diagonal at the eigenvector-residual level (~1e-6 relative,
    # measured; dense-path pairs at ~1e-12). That residual is benign: the
    # split force path drops it — simulating exactly diag(lam), i.e. a
    # stable O(residual) model perturbation well below ROM truncation
    # error — the exact-transform (non-planar) path includes it, and the
    # modified-Newton Jacobian uses the full K0r either way. (A final
    # re-diagonalization was tried and REJECTED: near-defective directions
    # inflate inv(S) and cost 1e-3 of biorthonormality to win 1e-6 of
    # diagonality.)
    D = W2.T @ M @ V2
    W2 = W2 @ np.linalg.inv(D).T
    return V2, W2


def _candidate_pairs_dense(K0, M, m0):
    """All real unretained eigenpairs of ``(K0, M)`` by dense two-sided eig.

    The ROM construction retains the lowest ``m0`` real modes, which are
    the first ``m0`` entries of the real-sorted spectrum — everything after
    them is a candidate.
    """
    from scipy.linalg import eig

    w_all, Wl, Vr = eig(K0, M, left=True, right=True)
    order = np.argsort(w_all.real)
    w_all, Vr, Wl = w_all[order], Vr[:, order], Wl[:, order]
    real_idx = np.flatnonzero(
        np.abs(w_all.imag) <= 1e-8 * np.abs(w_all.real).max()
    )
    cand = real_idx[m0:]
    # Drop eigenvalue duplicates: a near-real complex-CONJUGATE pair (tiny
    # imag under the global-scaled realness cut) passes as two "real"
    # candidates whose real parts — and hence selected columns — are
    # identical, which makes the joint Gram exactly singular downstream.
    keep, seen = [], []
    for i in cand:
        li = w_all[i].real
        if any(abs(li - l0) <= 1e-9 * abs(l0) for l0 in seen):
            continue
        seen.append(li)
        keep.append(i)
    cand = np.asarray(keep, dtype=int)
    return Vr[:, cand].real, Wl[:, cand].real


def _candidate_pairs_sparse(K0, M, V, W, X, k_per_shift: int = 16):
    """Candidate eigenpairs near each static response's active band.

    For each static response ``x``: project out the retained-band content
    (``x_perp = x - V W^T M x`` — without this the Rayleigh quotient is
    dragged toward the already-retained low modes and the shift misses the
    band carrying the new content), take ``sigma = Rayleigh(x_perp)``, and
    run shift-invert Arnoldi at ``sigma`` on ``(K0, M)`` for the RIGHT
    eigenpairs. The matching LEFT eigenvector for each converged real
    eigenvalue comes from shifted inverse iteration on ``K0^T`` at that
    exact eigenvalue (an independent left Arnoldi run converges to a
    different subset of a clustered band, leaving the rights unmatched —
    measured: zero 1e-6-matched pairs at n=630). Complex, retained-band,
    duplicate, and non-converging hits are dropped; failed shifts are
    skipped (the selection then simply sees fewer candidates).
    """
    import scipy.sparse as sp
    from scipy.sparse.linalg import (
        ArpackError, ArpackNoConvergence, eigs, splu,
    )

    Ks = sp.csc_matrix(K0)
    Ms = sp.csc_matrix(M)
    lam_ret = np.einsum("ij,ij->j", W, K0 @ V)
    lam_floor = lam_ret.max() * (1.0 + 1e-6)
    n = K0.shape[0]

    def left_vector(lam):
        """Left eigenvector at ``lam`` by shifted inverse iteration on the
        transpose pencil; None if it fails to converge.

        Keeps the BEST iterate: inverse iteration with an accurate shift
        reaches its optimal residual in one step and then stalls/degrades
        (Peters-Wilkinson; measured here 8.7e-9 at step 0 -> 1.3e-4
        plateau), so iterating "until it converges" never terminates.
        """
        try:
            lu = splu(sp.csc_matrix(K0.T - lam * (1.0 + 1e-7) * M))
        except RuntimeError:
            return None
        y = np.full(n, 1.0 / np.sqrt(n))
        best, best_res = None, np.inf
        for _ in range(3):
            y = lu.solve(np.asarray(M @ y))
            y = y / np.linalg.norm(y)
            res = np.linalg.norm(K0.T @ y - lam * (M @ y)) / abs(lam)
            if res < best_res:
                best, best_res = y, res
            if res < 1e-9:
                break
        return best if best_res < 1e-6 else None

    vr_list, wl_list, lam_list = [], [], []
    for col in range(X.shape[1]):
        x = X[:, col]
        x_perp = x - V @ (W.T @ (M @ x))
        denom = float(x_perp @ (M @ x_perp))
        if denom <= 0:
            continue
        sigma = float(x_perp @ (K0 @ x_perp)) / denom
        try:
            wr, Vr = eigs(Ks, k=k_per_shift, M=Ms, sigma=sigma, which="LM")
        except (ArpackError, ArpackNoConvergence):
            continue
        scale_w = max(np.abs(wr.real).max(), 1e-300)
        for i in range(wr.size):
            li = wr[i]
            if abs(li.imag) > 1e-8 * scale_w or li.real <= lam_floor:
                continue
            if any(abs(li.real - l0) <= 1e-6 * abs(l0) for l0 in lam_list):
                # Duplicate across shifts: ARPACK re-finds the same mode
                # with ~1e-8 relative eigenvalue scatter; a tighter
                # tolerance lets both copies in and makes the joint Gram
                # singular (measured).
                continue
            y = left_vector(li.real)
            if y is None:
                continue
            lam_list.append(li.real)
            vr_list.append(Vr[:, i].real)
            wl_list.append(y)
    if not vr_list:
        return np.zeros((n, 0)), np.zeros((n, 0))
    return np.stack(vr_list, axis=1), np.stack(wl_list, axis=1)


def _modal_derivative_loads(k_red_np, K0, V, md: int) -> np.ndarray:
    """Quadratic-coupling load patterns for modal-derivative augmentation.

    The von Karman element's quadratic force term sends bending-mode pairs
    into membrane (axial) loads whose static responses live far above any
    retained modal band — the classic blind spot of eigenmode ROMs, and the
    motivation for modal derivatives (``K0^{-1} G2(phi_i, phi_j)``). The
    quadratic form is extracted EXACTLY (no finite-difference step-size
    error): with ``F(q) = k(q) - K0 q = G2(q,q) + G3(q,q,q)``,

        G2(a, a) = (F(a) + F(-a)) / 2        (G3 is odd -> cancels)
        G2(a, b) = (G2(a+b,a+b) - G2(a,a) - G2(b,b)) / 2   (polarization)

    Returns the ``md (md+1) / 2`` load patterns for the first ``md``
    retained modes as columns ``(n, k)``; the caller feeds them through the
    static-augmentation path (which performs the ``K0^{-1}`` solves,
    deflation, and re-diagonalization).
    """

    def F(q):
        return k_red_np(q) - K0 @ q

    def G2_aa(a):
        return 0.5 * (F(a) + F(-a))

    cols = []
    base = [G2_aa(V[:, i]) for i in range(md)]
    for i in range(md):
        cols.append(base[i])
        for j in range(i + 1, md):
            mixed = G2_aa(V[:, i] + V[:, j])
            cols.append(0.5 * (mixed - base[i] - base[j]))
    return np.stack(cols, axis=1)


def _make_ext_modal(forces, Phi, PhiW):
    """Sum of reduced-modal closures for a list of registry forces.

    Returns ``(eta_af, etad_af, t_af, precision) -> (..., m)`` — the modal
    projection ``PhiW^T sum_i F_i(Phi eta, Phi etad, t)`` evaluated via each
    force's restricted basis rows (``make_reduced_modal``) — or ``None``
    when any force lacks that protocol (callers fall back to the general
    full-transform ``external_force`` path).
    """
    closures = []
    for force in forces:
        maker = getattr(force, "make_reduced_modal", None)
        cl = None if maker is None else maker(Phi, PhiW)
        if cl is None:
            return None
        closures.append(cl)
    if not closures:
        return None
    if len(closures) == 1:
        return closures[0]

    def ext_modal(eta_af, etad_af, t_af, precision=None):
        total = closures[0](eta_af, etad_af, t_af, precision=precision)
        for cl in closures[1:]:
            total = total + cl(eta_af, etad_af, t_af, precision=precision)
        return total

    return ext_modal


def make_modal_rom(
    model,
    dt: float,
    rho_inf: float = 0.8,
    n_modes: int = None,
    forces_func: Optional[Callable] = None,
    static_vectors=None,
    modal_derivatives: int = 0,
    rayleigh: tuple = None,
    basis=None,
) -> ModalROMGenAlpha:
    """Build the nonlinear modal-reduction generalized-alpha engine.

    Host float64 setup on the reduced system: right/left eigenvectors of
    the (generally non-symmetric) pencil ``(K0, M)`` with K0 the exact
    zero-state tangent, biorthonormalized to ``W^T M V = I`` — see the
    class docstring for why plain Galerkin on the symmetrized problem is
    unstable under truncation. For symmetric K0 (all-linear beams, or the
    ``use_consistent_nonlinear`` element) this reduces to the ordinary
    mass-orthonormal modal basis with ``W = V``. Works for linear,
    nonlinear, and hybrid beams; registered registry forces are aggregated
    unless ``forces_func`` overrides them.

    ``n_modes=None`` keeps the full basis (exact similarity of the dense
    modified-Newton path — the validation configuration); production ROMs
    truncate, e.g. ``n_modes=256`` for a 1000-element beam.

    ``rayleigh``: optional ``(alpha, beta)`` Rayleigh structural damping
    ``C = alpha M + beta K0`` — diagonalizes to ``cdamp_m = alpha +
    beta lam_m`` in the Petrov-Galerkin basis and enters the residual and
    the effective Jacobian exactly (a capability the reference lacks; on
    nonlinear beams it provides PHYSICAL dissipation instead of leaning on
    rho_inf to absorb the parity element's energy pumping). Supported by
    the XLA rollouts, ``rollout_adaptive``, and the fused Pallas rollout
    (the damping column rides the kernel's residual; its Jacobian share
    is prefactored into ``Sinv``).

    ``basis``: optional precomputed ``(V, W)`` trial/left bases (e.g. from
    :meth:`ModalROMGenAlpha.save_basis` / :func:`load_basis`), already
    biorthonormalized and augmented. Skips the eigensolve — the dominant
    setup cost at scale — and ``n_modes``/``static_vectors``/
    ``modal_derivatives`` are then ignored (the basis is what it is).
    """
    from scipy.linalg import eig, eigh

    arrays = model.beam_model.arrays
    bc_info = model.beam_model.bc_info
    free = bc_info.free_dofs
    n_full = bc_info.n_dofs_full
    use_consistent = getattr(model, "use_consistent_nonlinear", False)

    # Registry forces: prefer the REDUCED closures (fluid drag / gravity
    # project onto the basis exactly like the von Karman correction — the
    # split fast path and ECSW survive); fall back to the full-transform
    # ``external_force`` path for arbitrary user forces. An explicit
    # ``forces_func`` override always takes the general path (its state
    # access pattern is unknown). Built after the basis below.
    registry_forces = None
    if forces_func is None and len(model.force_registry) > 0:
        registry_forces = model.force_registry.get_registered_forces()

    M = np.asarray(model.beam_model.M.toarray(), dtype=np.float64)
    K0 = reduce_matrix_dense(arrays, free, use_consistent)

    sym_scale = np.abs(K0).max()
    if basis is not None:
        V = np.asarray(basis[0], np.float64)
        W = np.asarray(basis[1], np.float64)
        if V.shape != W.shape or V.shape[0] != K0.shape[0]:
            raise ValueError(
                f"basis shapes {V.shape}/{W.shape} do not match the "
                f"{K0.shape[0]}-DOF reduced system"
            )
        bi_err = float(np.abs(W.T @ M @ V - np.eye(V.shape[1])).max())
        if bi_err > 1e-6:
            raise ValueError(
                f"basis is not biorthonormal (|W^T M V - I| = {bi_err:.2e})"
                " — was it built for this beam configuration?"
            )
        static_vectors = None
        modal_derivatives = 0
    elif np.abs(K0 - K0.T).max() <= 1e-9 * sym_scale:
        lam, V = eigh(K0, M)  # symmetric fast path; M-orthonormal already
        W = V
        if n_modes is not None:
            V, W = V[:, :n_modes], W[:, :n_modes]
        V, W = _canonical_signs(V, W)
    elif n_modes is not None and n_modes <= K0.shape[0] // 4:
        # Truncated-basis fast path: shift-invert Arnoldi at sigma=0 pulls
        # the lowest modes of the (banded) non-symmetric pencil in seconds
        # where the full dense eig of a 3000-DOF beam takes minutes. Two
        # sparse runs (right: (K0, M); left: (K0^T, M)) + biorthonormalize.
        w, V = _lowest_modes_sparse(K0, M, n_modes)
        wl, W = _lowest_modes_sparse(K0.T, M, n_modes)
        _check_real_spectrum(w, n_modes)
        V, W = V.real, W.real
        V, W = _canonical_signs(V, W)
        D = W.T @ M @ V
        W = W @ np.linalg.inv(D).T
    else:
        w, W, V = eig(K0, M, left=True, right=True)
        order = np.argsort(w.real)
        w, V, W = w[order], V[:, order], W[:, order]
        m_keep = n_modes if n_modes is not None else V.shape[1]
        _check_real_spectrum(w[:m_keep], m_keep)
        V, W = V[:, :m_keep].real, W[:, :m_keep].real
        V, W = _canonical_signs(V, W)
        # Biorthonormalize robustly: W <- W inv(D)^T with D = W^T M V, so
        # W^T M V = I exactly even under near-degenerate eigenvalue pairing.
        D = W.T @ M @ V
        W = W @ np.linalg.inv(D).T

    if modal_derivatives > 0:
        md = min(int(modal_derivatives), V.shape[1])
        if use_consistent:
            # The consistent (energy-gradient) kernel has no host-NumPy
            # twin; one jitted evaluator serves the handful of
            # load-construction calls. Its symmetric tangent keeps every
            # band real, so — unlike the parity kernel, whose membrane
            # band goes complex on fine meshes — augmentation works at
            # any size.
            _k_jit = jax.jit(
                assembly.make_reduced_internal_force(
                    arrays, free, n_full, use_consistent=True
                )
            )

            def k_red_eval(q):
                return np.asarray(_k_jit(jnp.asarray(q)), np.float64)

        else:
            k_red_eval = assembly.make_reduced_internal_force_np(
                arrays, free, n_full
            )
        md_loads = _modal_derivative_loads(k_red_eval, K0, V, md)
        if static_vectors is None:
            static_vectors = md_loads
        else:
            sv = np.asarray(static_vectors, np.float64)
            if sv.ndim == 1:
                sv = sv[:, None]
            static_vectors = np.concatenate([sv, md_loads], axis=1)
    if static_vectors is not None and V.shape[1] < K0.shape[0]:
        V, W = _augment_static(K0, M, V, W, static_vectors)

    ext_modal = None
    if registry_forces is not None:
        if not use_consistent:  # the consistent kernel has no split path
            ext_modal = _make_ext_modal(registry_forces, V, W)
        if ext_modal is None:
            forces_func = model.force_registry.create_aggregated_function()

    am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
    af = rho_inf / (rho_inf + 1.0)
    beta = 0.25 * (1.0 - am + af) ** 2
    gamma_ga = 0.5 - am + af
    K0r = W.T @ K0 @ V  # = diag(eigenvalues) up to roundoff
    m = V.shape[1]
    S = (1.0 - am) * np.eye(m) + (1.0 - af) * beta * dt * dt * K0r
    cdamp = None
    if rayleigh is not None:
        al_r, be_r = float(rayleigh[0]), float(rayleigh[1])
        # C = al M + be K0 reduces to al I + be K0r; keep the exactly-
        # diagonal part (K0r's off-diagonal is eigensolver roundoff and
        # is already excluded from the diagonal-Newton test below).
        cdamp = al_r + be_r * np.ascontiguousarray(np.diag(K0r))
        S = S + (1.0 - af) * gamma_ga * dt * np.diag(cdamp)
    Sinv = np.linalg.inv(S)
    # Petrov-Galerkin biorthonormalization makes K0r exactly diagonal in
    # exact arithmetic; when the off-diagonal is eigensolver roundoff
    # (measured ~1e-12 relative), the Newton effective Jacobian is a
    # per-mode scalar and the (m, m) solve dot in every step is wasted
    # MXU work. Record the diagonal inverse; the steppers use it when set
    # (the dense Sinv is kept for the augmented/defective cases where the
    # reduced operator genuinely couples modes).
    Sd = np.abs(np.diag(S))
    offdiag = float(np.abs(S - np.diag(np.diag(S))).max())
    Sinv_diag = None
    if offdiag <= 1e-9 * float(Sd.max()):
        Sinv_diag = np.ascontiguousarray(1.0 / np.diag(S))

    internal_force = assembly.make_reduced_internal_force(
        arrays, free, n_full, use_consistent=use_consistent
    )
    lam = Phi_p = W_p = planar_correction = window_params = None
    if not use_consistent:
        # Split fast path: the reduced linear operator is exactly
        # diag(W^T K0 V); only the quadratic/cubic element correction flows
        # through the basis transforms at runtime. Fold zero-padding of
        # constrained DOFs + the planar permutation into the bases once on
        # the host, and restrict them to the node window the nonlinear
        # elements touch (linear elements have zero correction).
        lam = np.ascontiguousarray(np.diag(K0r))
        elem_sl, node_sl = assembly.nonlinear_support(arrays)
        if elem_sl is not None:
            n_nodes = bc_info.n_nodes
            perm = assembly.planar_permutation(n_nodes)
            Phi_full = np.zeros((n_full, V.shape[1]))
            Phi_full[np.asarray(free)] = V
            W_full = np.zeros((n_full, W.shape[1]))
            W_full[np.asarray(free)] = W
            m_modes = V.shape[1]

            def _restrict(B_full):
                planes = B_full[perm].reshape(3, n_nodes, m_modes)
                return np.ascontiguousarray(
                    planes[:, node_sl, :].reshape(-1, m_modes)
                )

            Phi_p, W_p = _restrict(Phi_full), _restrict(W_full)
            planar_correction = assembly.make_planar_correction_force(
                arrays, element_slice=elem_sl
            )
            window_params = {
                "length": np.asarray(arrays.length, np.float64)[elem_sl],
                "EI": (
                    np.asarray(arrays.elastic_modulus, np.float64)
                    * np.asarray(arrays.moment_inertia, np.float64)
                )[elem_sl],
                "EA": (
                    np.asarray(arrays.elastic_modulus, np.float64)
                    * np.asarray(arrays.cross_area, np.float64)
                )[elem_sl],
                "nonlinear_mask": np.asarray(arrays.nonlinear_mask)[elem_sl],
            }
    return ModalROMGenAlpha(
        Phi=V,
        PhiW=W,
        PhiTM=W.T @ M,
        Sinv=Sinv,
        rho_inf=rho_inf,
        dt=dt,
        internal_force=internal_force,
        external_force=forces_func,
        ext_modal=ext_modal,
        lam=lam,
        Phi_planar=Phi_p,
        PhiW_planar=W_p,
        planar_correction=planar_correction,
        window_params=window_params,
        Sinv_diag=Sinv_diag,
        cdamp=cdamp,
    )


def make_modal_rollout_fn(
    model,
    dt: float,
    n_steps: int,
    substeps: int = 1,
    rho_inf: float = 0.8,
    u=None,
    forces_func=None,
    rayleigh: tuple = None,
):
    """Frame-collecting modal rollout closure ``x0 -> (ts, ys)``.

    Shared by :func:`simulate` (method="modal") and the batched/sharded
    driver (``parallel/rollout.py``). Constant inputs project to modal
    coordinates on the host (no eager device ops at setup); traceable
    callables project inside the step.
    """
    if forces_func is not None:
        raise ValueError(
            "method='modal' (exact superposition) cannot include "
            "state-dependent forces; use method='modal_rom' — fluid "
            "drag/gravity ride its split fast path as reduced "
            "corrections — or 'newmark'/'generalized_alpha'"
        )
    ms = make_modal_genalpha(model, dt / substeps, rho_inf=rho_inf,
                             rayleigh=rayleigh)
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
            eta, etad, u_modal, n_steps, substeps=substeps
        )
        qs, vs = ms.from_modal(etas, etads)
        return ts, jnp.concatenate([qs, vs], axis=-1)

    return rollout


def _simulate_pallas(
    model, x0, n_steps, dt, method, u, forces_func, substeps, n_newton,
    rho_inf, n_modes, nl_precision, static_vectors, modal_derivatives,
    rayleigh,
):
    """Fused-kernel drive behind ``simulate(engine="pallas")``.

    Host-side wrapper around the whole-span VMEM kernels
    (``ModalGenAlpha.rollout_frames_pallas`` /
    ``FusedROMRollout.frames``); the heavy work is inside the kernels'
    own jits, so this function deliberately runs un-jitted (the fused ROM
    prep performs host-side padding/layout). Interpret mode is selected
    automatically on the CPU backend.
    """
    interpret = jax.default_backend() == "cpu"
    squeeze = x0.ndim == 1
    if squeeze:
        x0 = x0[None, :]
    n = x0.shape[-1] // 2

    if method == "modal":
        ms = make_modal_genalpha(model, dt / substeps, rho_inf=rho_inf,
                             rayleigh=rayleigh)
        if forces_func is not None:
            raise ValueError(
                "method='modal' cannot include state-dependent forces"
            )
        u_modal = None if u is None else ms.project_force_host(u)
        eta, etad = jax.jit(ms.to_modal)(x0[..., :n], x0[..., n:])
        ts, etas, etads = ms.rollout_frames_pallas(
            eta, etad, u_modal, n_steps, substeps=substeps,
            interpret=interpret,
        )
        qs, vs = jax.jit(ms.from_modal)(etas, etads)
    else:
        ms = make_modal_rom(
            model, dt / substeps, rho_inf=rho_inf, n_modes=n_modes,
            forces_func=forces_func, static_vectors=static_vectors,
            modal_derivatives=modal_derivatives, rayleigh=rayleigh,
        )
        fused = ms.make_pallas_rollout()
        u_modal = None if u is None else jnp.asarray(
            ms.project_force_host(u), jnp.float32
        )
        eta, etad = jax.jit(ms.to_modal)(x0[..., :n], x0[..., n:])
        # The fused ROM kernel is f32 (its operator layout is); under an
        # x64 session the modal projection above promotes.
        eta = eta.astype(jnp.float32)
        etad = etad.astype(jnp.float32)
        ts, etas, etads = fused.frames(
            eta, etad, u_modal, n_steps, substeps=substeps,
            n_newton=n_newton, nl_precision=nl_precision,
            interpret=interpret,
        )
        qs, vs = jax.jit(ms.from_modal)(etas, etads)
    ys = jnp.concatenate([qs, vs], axis=-1)
    if squeeze:
        ys = ys[:, 0, :]
    return SimulationResult(ts=ts, ys=ys, stats=None)


def _run_chunked(chunk_fn, state0, t_eval, chunk: int, dt0: float,
                 use_jit: bool, dtype):
    """Host-side chunked adaptive driving: the watchdog-safe span driver.

    One jitted device call per ``chunk`` output intervals, warm-restarted
    from the controller's own proposal (``stats.dt_next``) AND the
    engine's full algorithmic carry (the ``a0`` / ``etadd0`` continuation
    hooks), instead of one call over the whole span. The trajectory and
    step sequence are BIT-IDENTICAL to the monolithic driver — pinned in
    tests/test_simulate_chunked.py. No single device execution runs longer
    than ~``chunk`` intervals of trial steps — the workaround for
    execution-watchdog-limited stacks (the axon remote worker kills
    executions over ~60 s; bench.py's adaptive rows drive this pattern).

    ``chunk_fn(state, t_grid, dt0) -> (ys, stats, state_next)`` runs one
    chunk: frames leading, ``ys[0]`` = the chunk's initial frame;
    ``state`` is engine-opaque (the first call receives ``state0``, whose
    pytree structure may differ from ``state_next`` — costing exactly one
    extra trace). The host counter reads between chunks double as the
    per-chunk completion force (the house timing rule: scalars to the
    host, never ``block_until_ready``).
    """
    if use_jit:
        chunk_fn = jax.jit(chunk_fn)
    chunk = int(chunk)
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    n_iv = len(t_eval) - 1
    dt_prop = jnp.asarray(dt0, dtype)
    ys_parts = []
    state = state0
    n_steps = n_acc = n_rej = n_inc = 0
    i = 0
    while i < n_iv:
        j = min(i + chunk, n_iv)
        ys, stats, state = chunk_fn(
            state, jnp.asarray(t_eval[i:j + 1], dtype), dt_prop
        )
        ys_parts.append(ys if i == 0 else ys[1:])
        dt_prop = stats.dt_next
        n_steps += int(stats.n_steps)
        n_acc += int(stats.n_accepted)
        n_rej += int(stats.n_rejected)
        n_inc += int(stats.n_incomplete)
        i = j
    stats = integrators.AdaptiveStats(
        np.int32(n_steps), np.int32(n_acc), np.int32(n_rej),
        np.int32(n_inc), dt_next=dt_prop,
    )
    return jnp.concatenate(ys_parts, axis=0), stats


def simulate(
    model,
    x0,
    t_final: float,
    dt: float,
    method: str = "dopri5",
    u=None,
    forces_func: Optional[Callable] = None,
    rtol: float = 1e-8,
    atol: float = 1e-10,
    substeps: int = 1,
    n_newton: int = 2,
    linear_solver: str = None,
    rho_inf: float = 0.8,
    n_modes: int = None,
    nl_precision=None,
    static_vectors=None,
    modal_derivatives: int = 0,
    engine: str = "xla",
    jit: bool = True,
    rayleigh: tuple = None,
    chunk: int = None,
) -> SimulationResult:
    """Run a complete rollout on device.

    Args:
        model: a :class:`DynamicEulerBernoulliBeam`.
        x0: initial reduced state ``[q; v]`` (leading batch axes allowed for
            ``rk4``/``newmark``; vmap :func:`simulate` for adaptive batches).
        t_final, dt: horizon and output-frame spacing (the reference's 1 s /
            1 ms grid, ``example_utilities.py:20-21``).
        method: ``rk4`` | ``dopri5`` | ``newmark`` | ``generalized_alpha`` |
            ``generalized_alpha_adaptive`` (error-controlled implicit:
            ``rtol``/``atol`` drive the step size, no manual dt — the
            LSODA-capability replacement for stiff workloads) |
            ``sdirk3`` (adaptive L-stable 3rd-order DIRK with a true
            embedded error estimate: the accuracy-grade stiff engine) |
            ``modal`` (linear beams, exact diagonalized recurrence) |
            ``modal_rom`` (nonlinear/hybrid Petrov-Galerkin reduction;
            ``n_modes`` truncates the basis) |
            ``modal_rom_adaptive`` (error-controlled stepping at ROM
            per-step cost — the diagonal reduced Jacobian makes a trial-dt
            refactorization a per-mode reciprocal, so ``rtol``/``atol``
            drive the step size with no factorization on rejects).
        u: constant input-force vector over position DOFs, or traceable
           callable ``t -> force`` (the tip-impulse workload shape).
        substeps: inner steps per output frame (fixed-step methods).
        nl_precision: ``modal_rom`` only — MXU precision of the
            correction-force basis transforms (see
            :class:`ModalROMGenAlpha`); default inherits the full-force
            precision.
        static_vectors, modal_derivatives: ``modal_rom`` only — basis
            enrichment for load-dominated responses (see
            :func:`make_modal_rom`).
        engine: ``modal`` / ``modal_rom`` only — ``"xla"`` (default),
            ``"pallas"`` for the fused whole-span VMEM kernels, or
            ``"power"`` (``modal`` only) for the composed-propagator
            drive: one precomputed ``substeps``-step affine map per
            output frame, same discrete trajectory to roundoff.
            ``"pallas"`` requires a constant input force; ``"power"``
            takes a constant force or a :class:`PiecewiseConstant`
            schedule (the tip-impulse workload shape) — no external
            forces either way. Pallas kernels run interpreted
            automatically on the CPU backend.
        rayleigh: optional ``(alpha, beta)`` Rayleigh structural damping
            ``C = alpha M + beta K`` — modal engines only (both the XLA
            and fused-Pallas paths), exact in the recurrence and the
            effective Jacobian.
        chunk: adaptive methods only — drive the span as one jitted device
            call per ``chunk`` output intervals, warm-restarted from the
            controller's own step proposal (``stats.dt_next``), instead of
            one call over the whole horizon. Same trajectory and step
            sequence as the monolithic drive (pinned in
            tests/test_simulate_chunked.py); use it on stacks whose device
            runtime kills long executions (the axon TPU worker's ~60 s
            watchdog — the reason bench.py's adaptive rows drive
            chunked). Aggregated :class:`AdaptiveStats` are returned as
            usual, with ``dt_next`` ready to seed a continuation run.
    """
    x0 = jnp.asarray(x0)
    n_steps = int(round(t_final / dt))

    if rayleigh is not None and method not in (
        "modal", "modal_rom", "modal_rom_adaptive"
    ):
        raise ValueError(
            "rayleigh structural damping is supported by the modal "
            "engines (method='modal'/'modal_rom'/'modal_rom_adaptive')"
        )

    if engine not in ("xla", "pallas", "power"):
        raise ValueError(
            f"Unknown engine: {engine!r} (use 'xla'|'pallas'|'power')"
        )
    if engine == "power":
        # Composed-propagator drive: each output frame is ONE application
        # of the host-precomputed substeps-step affine map (12 ops per
        # element per frame regardless of substeps) — the same discrete
        # trajectory as engine='xla'/'pallas' to roundoff
        # (ModalGenAlpha.rollout_frames_power).
        if method != "modal":
            raise ValueError(
                "engine='power' applies to method='modal' (exact step "
                "composition exists only for the affine linear recurrence)"
            )
        if callable(u) and not isinstance(u, PiecewiseConstant):
            raise ValueError(
                "engine='power' requires a constant or PiecewiseConstant "
                "input force (the composed maps bake the modal force in); "
                "use engine='xla' for arbitrary time-varying inputs"
            )
        if forces_func is not None:
            raise ValueError(
                "method='modal' cannot include state-dependent forces"
            )
        ms_p = make_modal_genalpha(model, dt / substeps, rho_inf=rho_inf,
                                   rayleigh=rayleigh)
        squeeze = x0.ndim == 1
        xb = x0[None, :] if squeeze else x0
        n = xb.shape[-1] // 2
        if u is None:
            u_modal = None
        elif isinstance(u, PiecewiseConstant):
            u_modal = u.map_values(ms_p.project_force_host)
        else:
            u_modal = ms_p.project_force_host(u)
        eta, etad = jax.jit(ms_p.to_modal)(xb[..., :n], xb[..., n:])
        ts, etas, etads = ms_p.rollout_frames_power(
            eta, etad, u_modal, n_steps, substeps=substeps
        )
        qs, vs = jax.jit(ms_p.from_modal)(etas, etads)
        ys = jnp.concatenate([qs, vs], axis=-1)
        if squeeze:
            ys = ys[:, 0, :]
        return SimulationResult(ts=ts, ys=ys, stats=None)
    if engine == "pallas":
        if method not in ("modal", "modal_rom"):
            raise ValueError(
                "engine='pallas' applies to method='modal'/'modal_rom'"
            )
        if callable(u):
            raise ValueError(
                "engine='pallas' requires a constant input force (the "
                "fused kernels bake the modal force in); use engine='xla' "
                "for time-varying inputs"
            )
        return _simulate_pallas(
            model, x0, n_steps, dt, method, u, forces_func, substeps,
            n_newton, rho_inf, n_modes, nl_precision, static_vectors,
            modal_derivatives, rayleigh,
        )

    chunk_fn = None  # set by the adaptive branches (the chunk= drivers)

    if method == "rk4":
        rhs = model.build_rhs(forces_func)

        def run(x0):
            ts, xs = integrators.integrate_fixed(
                rhs, x0, 0.0, dt, n_steps, u=u, substeps=substeps
            )
            return ts, xs, None

    elif method == "dopri5":
        rhs = model.build_rhs(forces_func)
        t_eval = np.arange(n_steps + 1) * dt  # host: zero eager device ops (CLAUDE.md)

        def run(x0):
            xs, stats = integrators.integrate_adaptive(
                rhs, x0, t_eval, u=u, rtol=rtol, atol=atol, dt0=dt / 10.0
            )
            return t_eval, xs, stats

    elif method == "newmark":
        op = make_newmark_operator(
            model, forces_func=forces_func, dt=dt / substeps,
            linear_solver=linear_solver,
        )
        n = x0.shape[-1] // 2

        def run(x0):
            q0, v0 = x0[..., :n], x0[..., n:]
            ts, qs, vs = integrators.integrate_newmark(
                op,
                q0,
                v0,
                0.0,
                dt,
                n_steps,
                u=u,
                n_newton=n_newton,
                substeps=substeps,
            )
            return ts, jnp.concatenate([qs, vs], axis=-1), None

    elif method == "generalized_alpha":
        h = dt / substeps
        am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
        af = rho_inf / (rho_inf + 1.0)
        beta_ga = 0.25 * (1.0 - am + af) ** 2
        op = make_newmark_operator(
            model, forces_func=forces_func, dt=None,
            linear_solver=linear_solver,
            extra_systems=[(1.0 - am, (1.0 - af) * beta_ga * h * h)],
        )
        n = x0.shape[-1] // 2

        def run(x0):
            q0, v0 = x0[..., :n], x0[..., n:]
            ts, qs, vs = integrators.integrate_generalized_alpha(
                op, q0, v0, 0.0, dt, n_steps,
                u=u, rho_inf=rho_inf, n_newton=n_newton, substeps=substeps,
            )
            return ts, jnp.concatenate([qs, vs], axis=-1), None

    elif method in ("generalized_alpha_adaptive", "implicit_adaptive"):
        # Error-controlled implicit stepping (the LSODA-capability answer):
        # no hand-picked dt — the Zienkiewicz-Xie estimate + PI control pick
        # it (ops/integrators.integrate_generalized_alpha_adaptive).
        op = make_newmark_operator(
            model, forces_func=forces_func, dt=None,
            linear_solver=linear_solver,
        )
        n = x0.shape[-1] // 2
        t_eval = np.arange(n_steps + 1) * dt  # host: zero eager device ops (CLAUDE.md)

        def run(x0):
            q0, v0 = x0[..., :n], x0[..., n:]
            qs, vs, stats = integrators.integrate_generalized_alpha_adaptive(
                op, q0, v0, t_eval, u=u, rho_inf=rho_inf,
                rtol=rtol, atol=atol, n_newton=n_newton,
            )
            return t_eval, jnp.concatenate([qs, vs], axis=-1), stats

        def chunk_fn(state, t_grid, dt0):
            # state: (q, v) on the first chunk (consistent-accel init,
            # exactly like the monolithic drive), (q, v, a) thereafter
            # (exact continuation of the algorithmic acceleration).
            q0, v0 = state[0], state[1]
            a0 = state[2] if len(state) == 3 else None
            qs, vs, stats, fin = (
                integrators.integrate_generalized_alpha_adaptive(
                    op, q0, v0, t_grid, u=u, rho_inf=rho_inf,
                    rtol=rtol, atol=atol, n_newton=n_newton, dt0=dt0,
                    a0=a0, return_final=True,
                )
            )
            return jnp.concatenate([qs, vs], axis=-1), stats, fin

        chunk_state0 = (x0[..., :n], x0[..., n:])

    elif method in ("sdirk3", "sdirk3_adaptive"):
        # L-stable 3rd-order stiff adaptive (true embedded error estimate):
        # the accuracy-grade LSODA replacement.
        op = make_newmark_operator(
            model, forces_func=forces_func, dt=None,
            linear_solver=linear_solver,
        )
        n = x0.shape[-1] // 2
        t_eval = np.arange(n_steps + 1) * dt  # host: zero eager device ops (CLAUDE.md)

        def run(x0):
            q0, v0 = x0[..., :n], x0[..., n:]
            qs, vs, stats = integrators.integrate_sdirk3_adaptive(
                op, q0, v0, t_eval, u=u,
                rtol=rtol, atol=atol, n_newton=n_newton,
            )
            return t_eval, jnp.concatenate([qs, vs], axis=-1), stats

        def chunk_fn(state, t_grid, dt0):
            # SDIRK3's trial state is just (q, v): the restart is
            # inherently exact, no extra carry needed.
            q0, v0 = state
            qs, vs, stats = integrators.integrate_sdirk3_adaptive(
                op, q0, v0, t_grid, u=u,
                rtol=rtol, atol=atol, n_newton=n_newton, dt0=dt0,
            )
            return (jnp.concatenate([qs, vs], axis=-1), stats,
                    (qs[-1], vs[-1]))

        chunk_state0 = (x0[..., :n], x0[..., n:])

    elif method in ("modal_rom", "modal_rom_adaptive"):
        ms = make_modal_rom(
            model, dt / substeps, rho_inf=rho_inf, n_modes=n_modes,
            forces_func=forces_func, static_vectors=static_vectors,
            modal_derivatives=modal_derivatives, rayleigh=rayleigh,
        )
        if u is None:
            u_modal = None
        elif callable(u):
            u_modal = lambda t: ms.project_force(u(t))  # noqa: E731
        else:
            u_modal = ms.project_force_host(u)

        if method == "modal_rom_adaptive":
            # Error-controlled ROM stepping: rtol/atol pick every step
            # (ModalROMGenAlpha.rollout_adaptive); dt is just the output
            # frame grid, matching the other adaptive methods.
            t_eval = np.arange(n_steps + 1) * dt  # host: zero eager device ops (CLAUDE.md)

            def run(x0):
                n = x0.shape[-1] // 2
                eta, etad = ms.to_modal(x0[..., :n], x0[..., n:])
                etas, etads, stats = ms.rollout_adaptive(
                    eta, etad, u_modal, t_eval, rtol=rtol, atol=atol,
                    n_newton=n_newton, nl_precision=nl_precision,
                )
                qs, vs = ms.from_modal(etas, etads)
                return t_eval, jnp.concatenate([qs, vs], axis=-1), stats

            def chunk_fn(state, t_grid, dt0):
                # state: (x,) physical on the first chunk, the modal
                # (eta, etad, etadd) algorithmic carry thereafter.
                if len(state) == 1:
                    x = state[0]
                    nx = x.shape[-1] // 2
                    eta, etad = ms.to_modal(x[..., :nx], x[..., nx:])
                    etadd = None
                else:
                    eta, etad, etadd = state
                etas, etads, stats, fin = ms.rollout_adaptive(
                    eta, etad, u_modal, t_grid, rtol=rtol, atol=atol,
                    dt0=dt0, n_newton=n_newton, nl_precision=nl_precision,
                    etadd0=etadd, return_final=True,
                )
                qs, vs = ms.from_modal(etas, etads)
                return jnp.concatenate([qs, vs], axis=-1), stats, fin

            chunk_state0 = (x0,)

        else:

            def run(x0):
                n = x0.shape[-1] // 2
                eta, etad = ms.to_modal(x0[..., :n], x0[..., n:])
                ts, etas, etads = ms.rollout_frames(
                    eta, etad, u_modal, n_steps, substeps=substeps,
                    n_newton=n_newton, nl_precision=nl_precision,
                )
                qs, vs = ms.from_modal(etas, etads)
                return ts, jnp.concatenate([qs, vs], axis=-1), None

    elif method == "modal":
        rollout = make_modal_rollout_fn(
            model, dt, n_steps, substeps=substeps, rho_inf=rho_inf,
            u=u, forces_func=forces_func, rayleigh=rayleigh,
        )

        def run(x0):
            ts, ys = rollout(x0)
            return ts, ys, None

    else:
        raise ValueError(f"Unknown method: {method}")

    if chunk is not None:
        if chunk_fn is None:
            raise ValueError(
                "chunk= applies to the adaptive methods "
                "('generalized_alpha_adaptive' / 'sdirk3' / "
                "'modal_rom_adaptive'); fixed-step spans are already one "
                f"bounded device call per frame (got method={method!r})"
            )
        t_eval = np.arange(n_steps + 1) * dt  # host grid (CLAUDE.md)
        # First-chunk dt0 replicates each engine's monolithic default,
        # (te[1]-te[0])/16 — identical because the chunk grids share the
        # full grid's spacing.
        ys, stats = _run_chunked(
            chunk_fn, chunk_state0, t_eval, chunk, dt / 16.0, jit, x0.dtype
        )
        return SimulationResult(ts=t_eval, ys=ys, stats=stats)

    if jit:
        run = jax.jit(run)
    ts, ys, stats = run(x0)
    return SimulationResult(ts=ts, ys=ys, stats=stats)
