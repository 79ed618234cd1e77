"""Exponential (exact LTI) propagation tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam, ForceParams
from continuum_robot_tpu.models.simulate import simulate
from continuum_robot_tpu.ops.exponential import discretize_lti, make_expm_propagator
from tests import helpers


@pytest.fixture(scope="module")
def model():
    return DynamicEulerBernoulliBeam(helpers.linear_csv())


class TestDiscretize:
    def test_scalar_decay(self):
        Phi, Gamma = discretize_lti(np.array([[-2.0]]), np.array([[1.0]]), 0.5)
        assert Phi[0, 0] == pytest.approx(np.exp(-1.0))
        # Gamma = (1 - e^{-ah})/a
        assert Gamma[0, 0] == pytest.approx((1 - np.exp(-1.0)) / 2.0)


class TestExpmPropagation:
    def test_exact_vs_tight_dopri(self, model):
        """Exact propagation matches a tight adaptive solve of the same LTI."""
        n = model.n_pos_states
        dt = 0.001
        prop = make_expm_propagator(model, dt, dtype=jnp.float64)
        x0 = np.zeros(2 * n)
        x0[n - 2] = 1e-3
        frames = 50
        u_frames = np.zeros((frames, n))
        xs = np.asarray(prop(jnp.asarray(x0), jnp.asarray(u_frames)))

        res = simulate(model, x0, frames * dt, dt, method="dopri5",
                       rtol=1e-12, atol=1e-14)
        ys = np.asarray(res.ys)
        err = np.abs(xs - ys).max() / np.abs(ys).max()
        assert err < 1e-8  # expm is exact; dopri supplies the tolerance

    def test_piecewise_constant_input_exact(self, model):
        """The tip-impulse workload (ZOH input) is propagated exactly."""
        n = model.n_pos_states
        dt = 0.001
        prop = make_expm_propagator(model, dt, dtype=jnp.float64)
        frames = 30
        u_frames = np.zeros((frames, n))
        u_frames[:10, n - 2] = 0.1  # 10 ms impulse aligned to the grid
        xs = np.asarray(prop(jnp.zeros(2 * n), jnp.asarray(u_frames)))

        u = helpers.tip_impulse(n, amplitude=0.1, t_end=0.01 - 1e-9)
        res = simulate(model, np.zeros(2 * n), frames * dt, dt,
                       method="dopri5", u=u, rtol=1e-12, atol=1e-14)
        ys = np.asarray(res.ys)
        err = np.abs(xs - ys).max() / np.abs(ys).max()
        # The residual is the *adaptive solver's* error stepping across the
        # input discontinuity (no event handling); expm switches exactly.
        assert err < 1e-5

    def test_batched(self, model):
        n = model.n_pos_states
        prop = make_expm_propagator(model, 0.001)
        x0 = np.zeros((8, 2 * n), dtype=np.float32)
        x0[:, n - 2] = np.linspace(1e-4, 8e-4, 8)
        xs = np.asarray(prop(jnp.asarray(x0), jnp.zeros((20, n))))
        assert xs.shape == (21, 8, 2 * n)
        assert np.all(np.isfinite(xs))
        assert not np.allclose(xs[:, 0], xs[:, -1])

    def test_rejects_nonlinear(self):
        beam = DynamicEulerBernoulliBeam(helpers.nonlinear_csv())
        with pytest.raises(ValueError, match="purely linear"):
            make_expm_propagator(beam, 0.001)

    def test_rejects_registry_forces(self):
        beam = DynamicEulerBernoulliBeam(
            helpers.linear_csv(),
            ForceParams(enable_fluid_effects=True, fluid_density=1000.0),
        )
        with pytest.raises(ValueError, match="state-dependent"):
            make_expm_propagator(beam, 0.001)
