"""Property-based invariants (hypothesis) over the numerical core.

The example-based suite pins parity against reference goldens at specific
states; these tests assert the *structural* invariants that must hold for
every admissible input — the FEM identities (symmetry, rigid-body
nullspace, exact integral masses), the algebraic force split the fast
paths rely on, the gradient consistency of the variational element, the
banded solver's inverse contract, and the adaptive driver's accounting —
over randomized physical parameter ranges spanning the reference's
Nitinol workload by several decades each way.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("hypothesis")  # optional test dep (pyproject [test])
from hypothesis import given, settings, strategies as st  # noqa: E402

from continuum_robot_tpu.models import elements
from continuum_robot_tpu.ops import banded, integrators

# Physical parameter ranges: decades around the reference Nitinol segment
# (L=0.25 m, E=75 GPa, I=4.9e-10 m^4, A=7.85e-5 m^2, rho=6450 kg/m^3).
lengths = st.floats(1e-3, 10.0)
e_moduli = st.floats(1e8, 1e12)
inertias = st.floats(1e-13, 1e-6)
areas = st.floats(1e-8, 1e-2)
densities = st.floats(100.0, 2e4)

COMMON = dict(deadline=None, max_examples=25)


class TestElementInvariants:
    @settings(**COMMON)
    @given(lengths, e_moduli, inertias, areas)
    def test_linear_stiffness_symmetric_psd_rigid_null(self, L, E, I, A):
        K = np.asarray(elements.linear_stiffness_matrix(L, E, I, A))
        scale = np.abs(K).max()
        np.testing.assert_allclose(K, K.T, atol=1e-12 * scale)
        # Positive semidefinite; the rigid-body modes (axial translation,
        # transverse translation, rotation) are exact nullvectors. (A
        # mode-COUNT check is ill-conditioned across parameter decades:
        # with EI/L^3 << EA/L the smallest elastic eigenvalue can sit
        # below any scale-relative cutoff.)
        w = np.linalg.eigvalsh(K)
        assert w[0] > -1e-10 * scale
        for rigid in ([1, 0, 0, 1, 0, 0], [0, 1, 0, 0, 1, 0]):
            np.testing.assert_allclose(
                K @ np.asarray(rigid, float), 0.0, atol=1e-9 * scale
            )
        # Rigid rotation about node 1: w2 = -L*phi under phi = -w'.
        rot = np.array([0.0, 0.0, 1.0, 0.0, -L, 1.0])
        np.testing.assert_allclose(K @ rot, 0.0, atol=1e-7 * scale)

    @settings(**COMMON)
    @given(lengths, densities, areas)
    def test_mass_matrix_spd_and_exact_translation_mass(self, L, rho, A):
        M = np.asarray(elements.consistent_mass_matrix(L, rho, A))
        scale = np.abs(M).max()
        np.testing.assert_allclose(M, M.T, atol=1e-12 * scale)
        assert np.linalg.eigvalsh(M)[0] > 0
        # A rigid translation must carry exactly the element mass rho*A*L.
        m_tot = rho * A * L
        for rigid in ([1, 0, 0, 1, 0, 0], [0, 1, 0, 0, 1, 0]):
            r = np.asarray(rigid, float)
            np.testing.assert_allclose(r @ M @ r, m_tot, rtol=1e-12)

    @settings(**COMMON)
    @given(
        st.lists(st.floats(-0.05, 0.05), min_size=6, max_size=6),
        lengths, e_moduli, inertias, areas,
    )
    def test_parity_force_splits_exactly(self, q, L, E, I, A):
        """f(q) == linear_planes(q) + correction_planes(q), the algebraic
        split every fast path (modal ROM, ECSW, Pallas kernels) relies on."""
        args = tuple(np.float64(x) for x in q) + (L, E * I, E * A)
        f = np.asarray(elements.nonlinear_force_planes(*args))
        lin = np.asarray(elements.nonlinear_linear_planes(*args))
        g = np.asarray(elements.nonlinear_correction_planes(*args))
        scale = max(np.abs(f).max(), 1e-30)
        np.testing.assert_allclose(lin + g, f, atol=1e-12 * scale)

    @settings(**COMMON)
    @given(lengths, e_moduli, inertias, areas)
    def test_correction_has_no_linear_part(self, L, E, I, A):
        """The correction g = f - K0 q is purely quadratic+cubic: its value
        AND Jacobian must vanish exactly at q = 0 (so the split's linear
        plane really is the whole zero-state tangent), for any element
        geometry/material."""
        D, Ax = E * I, E * A

        def g(q6):
            return jnp.stack(
                elements.nonlinear_correction_planes(
                    q6[0], q6[1], q6[2], q6[3], q6[4], q6[5], L, D, Ax
                )
            )

        z = jnp.zeros(6, jnp.float64)
        np.testing.assert_array_equal(np.asarray(g(z)), 0.0)
        J0 = np.asarray(jax.jacfwd(g)(z))
        scale = max(Ax / L, 12.0 * D / L**3)
        np.testing.assert_allclose(J0, 0.0, atol=1e-12 * scale)

    @settings(deadline=None, max_examples=15)
    @given(
        st.lists(st.floats(-0.05, 0.05), min_size=6, max_size=6),
        lengths, e_moduli, inertias, areas,
    )
    def test_consistent_element_tangent_symmetric(self, q, L, E, I, A):
        """The variational element is a gradient field: its tangent
        (Hessian of the strain energy) must be symmetric at every state —
        the property the reference's parity polynomials famously lack."""
        q = jnp.asarray(q, jnp.float64)
        J = jax.jacfwd(
            lambda x: elements.nonlinear_internal_force_consistent(
                x, L, E, I, A
            )
        )(q)
        J = np.asarray(J)
        scale = max(np.abs(J).max(), 1e-30)
        np.testing.assert_allclose(J, J.T, atol=1e-8 * scale)

    @settings(deadline=None, max_examples=15)
    @given(st.lists(st.floats(-0.05, 0.05), min_size=6, max_size=6))
    def test_consistent_force_is_energy_gradient(self, q):
        L, E, I, A = 0.25, 75e9, 4.9e-10, 7.85e-5
        q = jnp.asarray(q, jnp.float64)
        f = np.asarray(
            elements.nonlinear_internal_force_consistent(q, L, E, I, A)
        )
        g = np.asarray(
            jax.grad(
                lambda x: elements.element_strain_energy(x, L, E, I, A)
            )(q)
        )
        scale = max(np.abs(g).max(), 1e-30)
        np.testing.assert_allclose(f, g, atol=1e-12 * scale)


class TestBandedInvariants:
    @settings(deadline=None, max_examples=20)
    @given(st.integers(2, 12), st.integers(0, 2**32 - 1))
    def test_solve_inverts_matvec(self, n_nodes, seed):
        rng = np.random.default_rng(seed)
        d = rng.normal(size=(n_nodes, 3, 3))
        d = d + np.swapaxes(d, -1, -2) + 12.0 * np.eye(3)
        up = 0.3 * rng.normal(size=(n_nodes - 1, 3, 3))
        lo = np.swapaxes(up, -1, -2).copy()
        b = rng.normal(size=(n_nodes, 3))
        dj, lj, uj = jnp.asarray(d), jnp.asarray(lo), jnp.asarray(up)
        x = banded.btd_solve(banded.btd_factor(dj, lj, uj), jnp.asarray(b))
        back = np.asarray(banded.btd_matvec(dj, lj, uj, x))
        np.testing.assert_allclose(back, b, rtol=1e-9, atol=1e-12)

    @settings(deadline=None, max_examples=20)
    @given(st.integers(2, 12), st.integers(0, 2**32 - 1))
    def test_cyclic_reduction_matches_thomas(self, n_nodes, seed):
        rng = np.random.default_rng(seed)
        d = rng.normal(size=(n_nodes, 3, 3))
        d = d + np.swapaxes(d, -1, -2) + 12.0 * np.eye(3)
        up = 0.3 * rng.normal(size=(n_nodes - 1, 3, 3))
        lo = np.swapaxes(up, -1, -2).copy()
        b = jnp.asarray(rng.normal(size=(n_nodes, 3)))
        dj, lj, uj = jnp.asarray(d), jnp.asarray(lo), jnp.asarray(up)
        x_th = banded.btd_solve(banded.btd_factor(dj, lj, uj), b)
        x_cr = banded.btd_cr_solve(banded.btd_cr_factor(dj, lj, uj), b)
        np.testing.assert_allclose(
            np.asarray(x_cr), np.asarray(x_th), rtol=1e-8, atol=1e-12
        )


class TestAdaptiveDriveInvariants:
    @settings(deadline=None, max_examples=20)
    @given(
        st.lists(st.floats(1e-4, 0.3), min_size=2, max_size=8),
        st.floats(1e-4, 1e-2),
        st.floats(0.1, 4.0),
    )
    def test_frames_land_on_uneven_grids(self, gaps, dtmax, dt0_frac):
        """For dx/dt = 1 with a deterministic order-3 error model, every
        frame of an arbitrary (uneven) output grid is hit exactly and the
        counters add up."""
        t_eval = jnp.asarray(np.concatenate([[0.0], np.cumsum(gaps)]))

        def trial(t, dt, x):
            return x + dt, (dt / dtmax) ** 3

        xf, frames, stats = integrators.adaptive_drive(
            trial, jnp.asarray(0.0, jnp.float64), t_eval,
            jnp.asarray(dt0_frac * dtmax, jnp.float64), -1.0 / 3.0,
        )
        np.testing.assert_allclose(
            np.asarray(frames), np.asarray(t_eval[1:]), rtol=1e-9,
            atol=1e-12,
        )
        assert int(stats.n_incomplete) == 0
        assert int(stats.n_steps) == int(stats.n_accepted) + int(
            stats.n_rejected
        )
        # Every interval needs at least one accepted step.
        assert int(stats.n_accepted) >= len(gaps)


class TestValidationContracts:
    """Error-contract fuzz: any nonpositive physical column value must be
    rejected by the public constructor (the reference's validation table,
    dynamic_beam_model.py:76-118)."""

    @settings(deadline=None, max_examples=15)
    @given(
        st.sampled_from(
            ["length", "elastic_modulus", "moment_inertia", "density",
             "cross_area"]
        ),
        st.floats(-1e6, 0.0),
        st.integers(0, 3),
    )
    def test_nonpositive_parameter_rejected(self, column, bad, row):
        import pandas as pd

        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam

        n = 4
        df = pd.DataFrame(
            {
                "length": [0.25] * n,
                "elastic_modulus": [75e9] * n,
                "moment_inertia": [4.9e-10] * n,
                "density": [6450.0] * n,
                "cross_area": [7.85e-5] * n,
                "type": ["linear"] * n,
                "boundary_condition": ["FIXED"] + ["NONE"] * (n - 1),
            }
        )
        df.loc[row, column] = bad
        with pytest.raises(ValueError):
            DynamicEulerBernoulliBeam(df)
