"""Dynamic beam model tests: validation, system creation, physics sanity.

Mirrors the reference suite ``tests/test_dynamic_beam.py:50-588``:
initialization/validation error contracts, system/input function creation,
short integrations asserting success + finiteness, fluid-damping physics
assertions (monotonic in density), and the state-mapping contracts including
boundary-condition offsets.
"""

import os

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from continuum_robot_tpu.models import (
    DynamicEulerBernoulliBeam,
    ForceParams,
)
from continuum_robot_tpu.models.simulate import simulate
from tests import helpers


@pytest.fixture(scope="module")
def linear_file():
    return helpers.linear_csv()


@pytest.fixture(scope="module")
def nonlinear_file():
    return helpers.nonlinear_csv()


@pytest.fixture(scope="module")
def mixed_file():
    return helpers.mixed_csv()


class TestInitialization:
    def test_basic(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        assert beam.n_pos_states == 18  # 21 DOFs - 3 fixed
        assert beam.constrained_dofs == [0, 1, 2] or sorted(
            beam.constrained_dofs
        ) == [0, 1, 2]

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            DynamicEulerBernoulliBeam("/nonexistent/beam.csv")

    def test_missing_columns(self, tmp_path):
        p = tmp_path / "bad.csv"
        p.write_text("length,type\n0.1,linear\n")
        with pytest.raises(ValueError, match="columns"):
            DynamicEulerBernoulliBeam(str(p))

    def test_invalid_bc_label(self, tmp_path):
        p = tmp_path / "bad_bc.csv"
        p.write_text(
            helpers.HEADER + "\n"
            f"0.1,{helpers.E_MOD},{helpers.M_INERTIA},{helpers.DENSITY},"
            f"{helpers.CROSS_AREA},linear,CLAMPED,0.01,0.8\n"
        )
        with pytest.raises(ValueError, match="Invalid boundary conditions"):
            DynamicEulerBernoulliBeam(str(p))

    def test_fluid_requires_columns(self, tmp_path):
        p = tmp_path / "nofluid.csv"
        p.write_text(
            "length,elastic_modulus,moment_inertia,density,cross_area,type,boundary_condition\n"
            f"0.1,{helpers.E_MOD},{helpers.M_INERTIA},{helpers.DENSITY},"
            f"{helpers.CROSS_AREA},linear,FIXED\n"
        )
        with pytest.raises(ValueError, match="columns"):
            DynamicEulerBernoulliBeam(
                str(p),
                ForceParams(enable_fluid_effects=True, fluid_density=1000.0),
            )

    def test_fluid_density_validation(self):
        with pytest.raises(ValueError, match="fluid_density"):
            ForceParams(enable_fluid_effects=True, fluid_density=0.0)

    def test_negative_drag_rejected(self, tmp_path):
        p = tmp_path / "negdrag.csv"
        p.write_text(
            helpers.HEADER + "\n"
            f"0.1,{helpers.E_MOD},{helpers.M_INERTIA},{helpers.DENSITY},"
            f"{helpers.CROSS_AREA},linear,FIXED,0.01,-0.8\n"
        )
        with pytest.raises(ValueError, match="Drag coefficients"):
            DynamicEulerBernoulliBeam(
                str(p),
                ForceParams(enable_fluid_effects=True, fluid_density=1000.0),
            )


class TestSystemCreation:
    def test_funcs_must_be_created(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        with pytest.raises(RuntimeError):
            beam.get_system_func()
        with pytest.raises(RuntimeError):
            beam.get_dynamic_system()
        beam.create_system_func()
        beam.create_input_func()
        assert callable(beam.get_dynamic_system())

    def test_system_shape_and_structure(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        beam.create_system_func()
        n = beam.n_pos_states
        x = np.zeros(2 * n)
        x[n:] = 1.0  # unit velocities
        dx = np.asarray(beam.system_func(x))
        # position derivatives are the velocities
        np.testing.assert_allclose(dx[:n], 1.0, rtol=1e-12)

    def test_input_func_contracts(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        beam.create_input_func()
        n = beam.n_pos_states
        with pytest.raises(ValueError, match="1D"):
            beam.input_func(np.zeros((2, 2 * n)), np.zeros(n))
        with pytest.raises(ValueError, match="match position DOFs"):
            beam.input_func(np.zeros(2 * n), np.zeros(n + 1))
        out = np.asarray(beam.input_func(np.zeros(2 * n), np.ones(n)))
        np.testing.assert_allclose(out[:n], 0.0)  # no direct position forcing
        assert np.all(np.isfinite(out[n:])) and np.any(out[n:] != 0)


class TestIntegration:
    @pytest.mark.parametrize("fixture", ["linear_file", "nonlinear_file", "mixed_file"])
    def test_short_rollout_finite(self, fixture, request):
        beam = DynamicEulerBernoulliBeam(request.getfixturevalue(fixture))
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        u = helpers.tip_impulse(n)
        res = simulate(beam, x0, 0.02, 0.001, method="dopri5", u=u,
                       rtol=1e-8, atol=1e-10)
        ys = np.asarray(res.ys)
        assert ys.shape == (21, 2 * n)
        assert np.all(np.isfinite(ys))
        assert np.abs(ys[-1]).max() > 0  # the impulse actually moved the beam

    def test_rk4_close_to_dopri(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        u = jnp.zeros(n).at[-2].set(0.01)
        r1 = simulate(beam, x0, 0.01, 0.001, method="dopri5", u=u,
                      rtol=1e-10, atol=1e-12)
        r2 = simulate(beam, x0, 0.01, 0.001, method="rk4", u=u, substeps=200)
        err = np.abs(np.asarray(r1.ys) - np.asarray(r2.ys)).max()
        assert err / np.abs(np.asarray(r1.ys)).max() < 1e-5


class TestFluidPhysics:
    def _tip_velocity_energy(self, fluid_density, linear_file):
        fp = (
            ForceParams(enable_fluid_effects=True, fluid_density=fluid_density)
            if fluid_density > 0
            else ForceParams()
        )
        beam = DynamicEulerBernoulliBeam(linear_file, fp)
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        u = helpers.tip_impulse(n)
        res = simulate(beam, x0, 0.05, 0.001, method="dopri5", u=u,
                       rtol=1e-8, atol=1e-10)
        v = np.asarray(res.ys)[:, n:]
        return float(np.sum(v[-10:] ** 2))

    def test_fluid_changes_trajectory(self, linear_file):
        e_dry = self._tip_velocity_energy(0.0, linear_file)
        e_wet = self._tip_velocity_energy(1000.0, linear_file)
        assert e_dry != pytest.approx(e_wet)

    def test_fluid_damps_and_monotone_in_density(self, linear_file):
        """Reference physics assertions (test_dynamic_beam.py:318-390)."""
        e_dry = self._tip_velocity_energy(0.0, linear_file)
        e_low = self._tip_velocity_energy(500.0, linear_file)
        e_high = self._tip_velocity_energy(2000.0, linear_file)
        assert e_low < e_dry
        assert e_high < e_low


class TestStateMapping:
    def test_velocity_params(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        n = beam.n_pos_states
        # First free node is node 1 (node 0 fixed).
        assert beam.get_state_to_node_param(0) == ("u", 1)
        assert beam.get_state_to_node_param(n) == ("du_dt", 1)
        assert beam.get_state_index(1, "w") == 1
        assert beam.get_state_index(1, "dw_dt") == n + 1

    def test_bc_offsets(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        # Node 0 is FIXED: no state entries for it.
        with pytest.raises(KeyError):
            beam.get_state_index(0, "u")
        with pytest.raises(KeyError):
            beam.get_state_to_node_param(99999)

    def test_mapping_roundtrip(self, mixed_file):
        beam = DynamicEulerBernoulliBeam(mixed_file)
        for idx, (param, node) in beam.get_state_mapping().items():
            assert beam.get_state_index(node, param) == idx

    def test_pinned_keeps_rotation(self, tmp_path):
        path = helpers.write_beam_csv(
            ["linear"] * 3, boundary_conditions=["PINNED", "NONE", "NONE"]
        )
        beam = DynamicEulerBernoulliBeam(path)
        # Pinned base: u,w removed, phi kept -> phi(0) is state 0.
        assert beam.get_state_to_node_param(0) == ("phi", 0)
        os.unlink(path)
