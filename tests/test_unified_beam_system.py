"""Unified beam system tests: types, factory, assembly, boundary conditions.

Mirrors the reference suite's structure and idioms
(``tests/test_unified_beam_system.py:25-533``): Properties validation,
segment factory dispatch, DataFrame construction, pure/hybrid assembly,
BC apply/clear with DOF remapping, and an end-to-end hybrid workflow.
"""

import numpy as np
import pandas as pd
import pytest

from continuum_robot_tpu.models import (
    BoundaryConditionType,
    ElementType,
    EulerBernoulliBeam,
    LinearSegment,
    NonlinearSegment,
    Properties,
    SegmentFactory,
    create_properties_from_dataframe,
)
from tests import helpers


def make_df(types):
    n = len(types)
    return pd.DataFrame(
        {
            "length": [helpers.LENGTH] * n,
            "elastic_modulus": [helpers.E_MOD] * n,
            "moment_inertia": [helpers.M_INERTIA] * n,
            "density": [helpers.DENSITY] * n,
            "cross_area": [helpers.CROSS_AREA] * n,
            "type": types,
        }
    )


class TestProperties:
    def test_valid_construction(self):
        p = Properties(0.1, 75e9, 1e-10, 6450, 1e-5, 0, "linear")
        assert p.get_element_type() == ElementType.LINEAR
        assert not p.has_fluid_properties()

    @pytest.mark.parametrize(
        "field,value",
        [
            ("length", -0.1),
            ("length", 0.0),
            ("elastic_modulus", -1.0),
            ("moment_inertia", 0.0),
            ("density", -6450),
            ("cross_area", 0.0),
        ],
    )
    def test_invalid_numeric(self, field, value):
        kwargs = dict(
            length=0.1, elastic_modulus=75e9, moment_inertia=1e-10,
            density=6450, cross_area=1e-5, segment_id=0, element_type="linear",
        )
        kwargs[field] = value
        with pytest.raises(ValueError):
            Properties(**kwargs)

    def test_invalid_element_type(self):
        with pytest.raises(ValueError, match="Invalid element type"):
            Properties(0.1, 75e9, 1e-10, 6450, 1e-5, 0, "cubic")

    def test_fluid_properties(self):
        p = Properties(
            0.1, 75e9, 1e-10, 6450, 1e-5, 0, "linear",
            wetted_area=0.01, drag_coef=0.8,
        )
        assert p.has_fluid_properties()


class TestSegmentFactory:
    def test_dispatch(self):
        factory = SegmentFactory()
        p_lin = Properties(0.1, 75e9, 1e-10, 6450, 1e-5, 0, "linear")
        p_nl = Properties(0.1, 75e9, 1e-10, 6450, 1e-5, 1, "nonlinear")
        assert isinstance(factory.create_segment(p_lin), LinearSegment)
        assert isinstance(factory.create_segment(p_nl), NonlinearSegment)

    def test_type_mismatch_raises(self):
        p_nl = Properties(0.1, 75e9, 1e-10, 6450, 1e-5, 0, "nonlinear")
        with pytest.raises(ValueError, match="LINEAR"):
            LinearSegment(p_nl)
        p_lin = Properties(0.1, 75e9, 1e-10, 6450, 1e-5, 0, "linear")
        with pytest.raises(ValueError, match="NONLINEAR"):
            NonlinearSegment(p_lin)

    def test_segment_kernels(self):
        p = Properties(0.1, 75e9, 1e-10, 6450, 1e-5, 0, "linear")
        seg = LinearSegment(p)
        K = seg.get_stiffness_func()
        M = seg.get_mass_matrix()
        assert K.shape == (6, 6) and M.shape == (6, 6)
        np.testing.assert_allclose(K, K.T)
        p2 = Properties(0.1, 75e9, 1e-10, 6450, 1e-5, 0, "nonlinear")
        f = NonlinearSegment(p2).get_stiffness_func()
        assert callable(f)
        assert f(np.zeros(6)).shape == (6,)


class TestDataFrameConstruction:
    def test_properties_from_dataframe(self):
        df = make_df(["linear", "nonlinear"])
        p0 = create_properties_from_dataframe(df, 0)
        p1 = create_properties_from_dataframe(df, 1)
        assert p0.get_element_type() == ElementType.LINEAR
        assert p1.get_element_type() == ElementType.NONLINEAR

    def test_out_of_range(self):
        df = make_df(["linear"])
        with pytest.raises(IndexError):
            create_properties_from_dataframe(df, 5)


class TestBeamAssembly:
    @pytest.mark.parametrize(
        "types",
        [["linear"] * 4, ["nonlinear"] * 4, ["linear", "nonlinear"] * 2],
    )
    def test_construction_and_shapes(self, types):
        beam = EulerBernoulliBeam(make_df(types))
        n_dofs = 3 * (len(types) + 1)
        assert beam.M.shape == (n_dofs, n_dofs)
        assert beam.get_segment_count() == len(types)
        f = beam.get_stiffness_function()(np.zeros(n_dofs))
        np.testing.assert_allclose(f, 0.0, atol=1e-12)

    def test_mass_symmetric_positive_definite(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        M = beam.get_mass_matrix()
        np.testing.assert_allclose(M, M.T, rtol=1e-12)
        assert np.all(np.linalg.eigvalsh(M) > 0)

    def test_is_hybrid(self):
        assert EulerBernoulliBeam(make_df(["linear", "nonlinear"])).is_hybrid()
        assert not EulerBernoulliBeam(make_df(["linear", "linear"])).is_hybrid()

    def test_invalid_df(self):
        with pytest.raises(ValueError, match="columns"):
            EulerBernoulliBeam(pd.DataFrame({"length": [0.1]}))
        df = make_df(["linear"])
        df.loc[0, "length"] = -1.0
        with pytest.raises(ValueError, match="positive"):
            EulerBernoulliBeam(df)
        df2 = make_df(["quadratic"])
        with pytest.raises(ValueError, match="Invalid element types"):
            EulerBernoulliBeam(df2)

    def test_type_error_on_bad_input(self):
        with pytest.raises(TypeError):
            EulerBernoulliBeam(12345)

    def test_get_length(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 3))
        assert beam.get_length() == pytest.approx(3 * helpers.LENGTH)


class TestBoundaryConditions:
    def test_fixed_removes_three_dofs(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        n_dofs = beam.n_dofs_full
        beam.apply_boundary_conditions({0: BoundaryConditionType.FIXED})
        assert beam.M.shape == (n_dofs - 3, n_dofs - 3)
        assert sorted(beam.get_constrained_dofs()) == [0, 1, 2]
        assert beam.has_boundary_conditions()

    def test_pinned_removes_two_dofs(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        n_dofs = beam.n_dofs_full
        beam.apply_boundary_conditions({0: BoundaryConditionType.PINNED})
        assert beam.M.shape == (n_dofs - 2, n_dofs - 2)
        assert sorted(beam.get_constrained_dofs()) == [0, 1]

    def test_dof_remapping(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        beam.apply_boundary_conditions({0: BoundaryConditionType.FIXED})
        # After removing node 0's DOFs, reduced index 0 is node 1's u.
        assert beam.get_dof_to_node_param(0) == ("u", 1)
        assert beam.get_dof_index(1, "u") == 0
        with pytest.raises(KeyError):
            beam.get_dof_index(0, "u")  # constrained away

    def test_clear_restores(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        n_dofs = beam.n_dofs_full
        beam.apply_boundary_conditions({0: BoundaryConditionType.FIXED})
        beam.clear_boundary_conditions()
        assert beam.M.shape == (n_dofs, n_dofs)
        assert not beam.has_boundary_conditions()
        assert beam.get_dof_to_node_param(0) == ("u", 0)

    def test_invalid_node_raises(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        with pytest.raises(ValueError, match="out of range"):
            beam.apply_boundary_conditions({99: BoundaryConditionType.FIXED})

    def test_reduced_stiffness_equals_reference_semantics(self):
        """BC'd stiffness == zero-pad -> full stiffness -> extract free rows."""
        df = make_df(["linear", "nonlinear", "linear"])
        beam_bc = EulerBernoulliBeam(df)
        beam_full = EulerBernoulliBeam(df)
        beam_bc.apply_boundary_conditions({0: BoundaryConditionType.FIXED})
        free = np.asarray(beam_bc.bc_info.free_dofs)
        rng = np.random.default_rng(7)
        x_red = rng.normal(scale=0.01, size=len(free))
        x_full = np.zeros(beam_full.n_dofs_full)
        x_full[free] = x_red
        f_full = beam_full.get_stiffness_function()(x_full)
        f_red = beam_bc.get_stiffness_function()(x_red)
        np.testing.assert_allclose(f_red, f_full[free], rtol=1e-12)


class TestConstrainedStiffnessMatrix:
    def test_linear_matrix_with_bc(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        K_full = beam.get_stiffness_matrix()
        beam.apply_boundary_conditions({0: BoundaryConditionType.FIXED})
        K_red = beam.get_stiffness_matrix()
        np.testing.assert_allclose(K_red, K_full[3:, 3:], rtol=1e-12)
        # Constrained K is SPD (rigid-body modes removed).
        assert np.all(np.linalg.eigvalsh(K_red) > 0)

    def test_hybrid_rejected(self):
        beam = EulerBernoulliBeam(make_df(["linear", "nonlinear"]))
        with pytest.raises(ValueError, match="nonlinear segments"):
            beam.get_stiffness_matrix()

    def test_matrix_matches_stiffness_function(self):
        """For linear beams, K @ x == stiffness_func(x)."""
        beam = EulerBernoulliBeam(make_df(["linear"] * 5))
        K = beam.get_stiffness_matrix()
        x = np.random.default_rng(8).normal(size=K.shape[0]) * 1e-3
        np.testing.assert_allclose(
            K @ x, beam.get_stiffness_function()(x), rtol=1e-9
        )


@pytest.mark.integration
class TestHybridWorkflow:
    def test_end_to_end(self):
        """Hybrid beam: build -> BC -> stiffness eval -> finite forces."""
        df = make_df(["linear", "linear", "nonlinear", "nonlinear"])
        beam = EulerBernoulliBeam(df)
        beam.apply_boundary_conditions({0: BoundaryConditionType.FIXED})
        n_red = beam.M.shape[0]
        x = np.random.default_rng(9).normal(scale=1e-3, size=n_red)
        f = beam.get_stiffness_function()(x)
        assert f.shape == (n_red,)
        assert np.all(np.isfinite(f))
        assert beam.is_hybrid()
        assert beam.get_segment_types() == [
            ElementType.LINEAR, ElementType.LINEAR,
            ElementType.NONLINEAR, ElementType.NONLINEAR,
        ]
