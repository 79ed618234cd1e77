"""Element-kernel tests: golden parity + structural matrix properties.

Mirrors the reference's segment-level testing idioms
(``tests/test_unified_beam_system.py:103-175``: shape, symmetry, positive
definiteness) plus golden-value parity against the reference's exact kernels
(``tests/goldens/element_kernels.npz``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import elements
from tests import helpers

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "element_kernels.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def props(golden):
    return dict(
        length=float(golden["length"]),
        elastic_modulus=helpers.E_MOD,
        moment_inertia=helpers.M_INERTIA,
        cross_area=helpers.CROSS_AREA,
    )


class TestLinearKernels:
    def test_stiffness_matches_reference(self, golden, props):
        K = np.asarray(elements.linear_stiffness_matrix(
            props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        np.testing.assert_allclose(K, golden["K_linear"], rtol=1e-13)

    def test_mass_matches_reference(self, golden, props):
        M = np.asarray(elements.consistent_mass_matrix(
            props["length"], helpers.DENSITY, props["cross_area"],
        ))
        np.testing.assert_allclose(M, golden["M_consistent"], rtol=1e-13)

    def test_shapes_symmetry_definiteness(self, props):
        K = np.asarray(elements.linear_stiffness_matrix(
            props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        M = np.asarray(elements.consistent_mass_matrix(
            props["length"], helpers.DENSITY, props["cross_area"],
        ))
        assert K.shape == (6, 6) and M.shape == (6, 6)
        np.testing.assert_allclose(K, K.T, rtol=1e-12)
        np.testing.assert_allclose(M, M.T, rtol=1e-12)
        # M is SPD; K is PSD (rigid-body nullspace).
        assert np.all(np.linalg.eigvalsh(M) > 0)
        assert np.all(np.linalg.eigvalsh(K) > -1e-6 * np.abs(K).max())

    def test_batched_matches_scalar(self, props):
        lengths = np.array([0.01, 0.05, 0.25])
        Ks = np.asarray(elements.linear_stiffness_matrix(
            lengths, props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        assert Ks.shape == (3, 6, 6)
        for i, L in enumerate(lengths):
            Ki = np.asarray(elements.linear_stiffness_matrix(
                L, props["elastic_modulus"],
                props["moment_inertia"], props["cross_area"],
            ))
            np.testing.assert_allclose(Ks[i], Ki, rtol=1e-14)


class TestNonlinearKernel:
    def test_golden_parity(self, golden, props):
        """Exact-parity kernel matches the reference polynomials pointwise.

        Tolerance 1e-10: our coefficients are exact rationals, the
        reference's are decimal-rounded (e.g. 3.8571428571413 vs 27/7).
        """
        qs = golden["q_states"]
        f_ref = golden["nonlinear_forces"]
        f_new = np.asarray(elements.nonlinear_internal_force(
            qs, props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        scale = np.abs(f_ref).max()
        np.testing.assert_allclose(f_new / scale, f_ref / scale, atol=1e-10)

    def test_zero_state_nonzero_only_via_quirk(self, props):
        """At q=0 the internal force vanishes (no prestress)."""
        f = np.asarray(elements.nonlinear_internal_force(
            np.zeros(6), props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        np.testing.assert_allclose(f, 0.0, atol=1e-12)

    def test_f5_is_minus_f3(self, props):
        """Transverse nodal forces balance: rows 1 and 4 are negatives."""
        rng = np.random.default_rng(3)
        q = rng.normal(scale=0.05, size=(64, 6))
        f = np.asarray(elements.nonlinear_internal_force(
            q, props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        np.testing.assert_allclose(f[:, 1], -f[:, 4], rtol=1e-12)

    def test_consistent_variant_linearizes_to_stiffness(self, props):
        """The energy-gradient kernel's linearization is the linear K.

        (The reference-parity kernel deliberately does NOT satisfy this —
        it reproduces the reference's variationally inconsistent f1; see
        models/elements.py docstring.)
        """
        K = np.asarray(elements.linear_stiffness_matrix(
            props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        q = np.random.default_rng(4).normal(size=(8, 6)) * 1e-8
        f = np.asarray(elements.nonlinear_internal_force_consistent(
            q, props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        lin = q @ K.T
        # atol floor: quadrature-energy gradients at q~1e-8 hit f64
        # cancellation on the smallest force components.
        np.testing.assert_allclose(f, lin, rtol=1e-4, atol=1e-5 * np.abs(lin).max())

    def test_consistent_force_is_gradient_of_energy(self, props):
        q = np.random.default_rng(5).normal(scale=0.02, size=6)
        f = np.asarray(elements.nonlinear_internal_force_consistent(
            q, props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        ))
        g = np.asarray(jax.grad(
            lambda qq: elements.element_strain_energy(
                qq, props["length"], props["elastic_modulus"],
                props["moment_inertia"], props["cross_area"],
            )
        )(jnp.asarray(q)))
        np.testing.assert_allclose(f, g, rtol=1e-12)


class TestHybridDispatch:
    def test_where_dispatch_equals_pure_paths(self, props):
        rng = np.random.default_rng(6)
        q = rng.normal(scale=0.02, size=(10, 6))
        args = (
            props["length"], props["elastic_modulus"],
            props["moment_inertia"], props["cross_area"],
        )
        f_lin = np.asarray(elements.element_internal_force(
            q, *args, nonlinear_mask=np.zeros(10, dtype=bool)))
        f_nl = np.asarray(elements.element_internal_force(
            q, *args, nonlinear_mask=np.ones(10, dtype=bool)))
        K = np.asarray(elements.linear_stiffness_matrix(*args))
        np.testing.assert_allclose(f_lin, q @ K.T, rtol=1e-12)
        np.testing.assert_allclose(
            f_nl,
            np.asarray(elements.nonlinear_internal_force(q, *args)),
            rtol=1e-12,
        )
        mask = rng.random(10) > 0.5
        f_mix = np.asarray(elements.element_internal_force(
            q, *args, nonlinear_mask=mask))
        np.testing.assert_allclose(f_mix[mask], f_nl[mask], rtol=1e-12)
        np.testing.assert_allclose(f_mix[~mask], f_lin[~mask], rtol=1e-12)


class TestPlanarForcePath:
    """Planar [u; w; theta] lane-plane assembly == interleaved assembly.

    The planar path is the TPU hot-loop layout (contiguous lane slices, two
    slice-adds per plane); it must be arithmetically identical to the
    reference-semantics interleaved path for every element-type mask.
    """

    @pytest.mark.parametrize(
        "types",
        [
            ["linear"] * 8,
            ["nonlinear"] * 8,
            ["linear"] * 3 + ["nonlinear"] * 5,
        ],
    )
    def test_matches_interleaved(self, types):
        import jax.numpy as jnp

        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
        from continuum_robot_tpu.models import assembly
        from tests.helpers import write_beam_csv

        model = DynamicEulerBernoulliBeam(
            write_beam_csv(types, include_fluid=False)
        )
        arrays = model.beam_model.arrays
        n_nodes = arrays.n_elements + 1
        rng = np.random.default_rng(11)
        q_full = rng.normal(scale=0.02, size=(5, 3 * n_nodes))

        f_ref = np.asarray(
            assembly.internal_force_full(arrays, jnp.asarray(q_full))
        )
        perm = assembly.planar_permutation(n_nodes)
        k_planar = assembly.make_planar_internal_force(arrays)
        q_p = jnp.asarray(q_full[:, perm].reshape(5, 3, n_nodes))
        f_p = np.asarray(k_planar(q_p)).reshape(5, 3 * n_nodes)
        # Un-permute the planar result back to interleaved ordering.
        f_back = np.empty_like(f_p)
        f_back[:, perm] = f_p
        np.testing.assert_allclose(f_back, f_ref, rtol=1e-11, atol=1e-13)
