"""Legacy decorator API parity + demo-surface smoke tests."""

import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.models.decorators import (
    create_forces_function,
    create_input_processor,
    force_component,
    input_component,
)
from tests import helpers
from tests.test_functional_composition import MockForce, MockInputHandler


class TestLegacyDecoratorAPI:
    """Parity with the reference's older composition style (decorators.py)."""

    def test_create_forces_function_sums_enabled(self):
        f1 = MockForce(value=1.0, index=0)
        f2 = MockForce(value=2.0, index=0)
        f3 = MockForce(value=100.0, index=0, enabled=False)
        forces = create_forces_function([f1, f2, f3])
        out = np.asarray(forces(np.zeros(12), 0.0))
        assert out[0] == pytest.approx(3.0)

    def test_empty_component_list_zero(self):
        forces = create_forces_function([])
        np.testing.assert_allclose(np.asarray(forces(np.zeros(12))), 0.0)

    def test_create_input_processor_chains(self):
        class Doubler(MockInputHandler):
            def process_input(self, x, u, t):
                return u * 2.0

        proc = create_input_processor([Doubler(), Doubler()])
        out = np.asarray(proc(np.zeros(8), np.ones(4), 0.0))
        np.testing.assert_allclose(out, 4.0)

    def test_force_component_decorator(self):
        created = []

        class AutoForce(MockForce):
            def __init__(self, beam):
                super().__init__(value=1.0, index=0)
                created.append(beam)

        class FakeBeam:
            @force_component(AutoForce)
            def create_system_func(self):
                return "ok"

        beam = FakeBeam()
        assert beam.create_system_func() == "ok"
        assert len(beam._force_components) == 1
        assert created[0] is beam

    def test_input_component_decorator(self):
        class AutoHandler(MockInputHandler):
            def __init__(self, beam):
                super().__init__()

        class FakeBeam:
            @input_component(AutoHandler)
            def create_input_func(self):
                return "ok"

        beam = FakeBeam()
        assert beam.create_input_func() == "ok"
        assert len(beam._input_components) == 1


class TestWebDemoPayload:
    def test_run_simulation_payload_shape(self):
        """The web service's JSON payload matches the Pyodide demo contract."""
        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "examples"),
        )
        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "examples", "web_demo"),
        )
        from serve import run_simulation

        payload = run_simulation(n_segments=6, t_final=0.05, dt=0.001)
        assert set(payload) == {"times", "x_coords", "y_coords", "tip_displacement"}
        assert len(payload["times"]) == len(payload["y_coords"])
        assert len(payload["x_coords"]) == 7
        assert len(payload["y_coords"][0]) == 7
        assert all(np.isfinite(payload["tip_displacement"]))
        # The impulse must actually deflect the tip.
        assert max(abs(v) for v in payload["tip_displacement"]) > 0


class TestExpmGravityAsConstantInput:
    def test_constant_force_matches_adaptive(self):
        """Gravity folded into u: expm == tight dopri5 of the same LTI system."""
        from continuum_robot_tpu.models import GravityForce
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.ops.exponential import make_expm_propagator

        beam = DynamicEulerBernoulliBeam(helpers.linear_csv())
        n = beam.n_pos_states
        g = GravityForce(beam.params[["density", "cross_area", "length"]])
        g_force = np.asarray(g.compute_forces(np.zeros(2 * n), 0.0))

        prop = make_expm_propagator(beam, 0.001, dtype=jnp.float64)
        frames = 50
        xs = np.asarray(prop(np.zeros(2 * n), np.tile(g_force, (frames, 1))))

        res = simulate(
            beam, np.zeros(2 * n), frames * 0.001, 0.001,
            method="dopri5", u=jnp.asarray(g_force), rtol=1e-12, atol=1e-14,
        )
        ys = np.asarray(res.ys)
        err = np.abs(xs - ys).max() / np.abs(ys).max()
        assert err < 1e-8


class TestSystemIdentification:
    def test_gradient_recovers_modulus_direction(self):
        """The sysid example's loss gradient points toward the true E, and a
        few Adam steps reduce both loss and parameter error."""
        import jax

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "examples"),
        )
        import system_identification as sysid

        model = sysid.build_model()
        tip_trace = sysid.make_tip_trace_fn(model)
        y_obs = tip_trace(jnp.log(jnp.asarray(sysid.TRUE_E)))
        scale = float(jnp.abs(y_obs).max())

        def loss(log_E):
            return jnp.mean(((tip_trace(log_E) - y_obs) / scale) ** 2)

        vg = jax.jit(jax.value_and_grad(loss))

        # Underestimate -> negative gradient (increase E); overestimate ->
        # positive gradient.
        _, g_lo = vg(jnp.log(jnp.asarray(0.7 * sysid.TRUE_E)))
        _, g_hi = vg(jnp.log(jnp.asarray(1.3 * sysid.TRUE_E)))
        assert float(g_lo) < 0 < float(g_hi)

        import optax

        opt = optax.adam(5e-2)
        log_E = jnp.log(jnp.asarray(0.7 * sysid.TRUE_E))
        state = opt.init(log_E)
        v0, _ = vg(log_E)
        for _ in range(20):
            v, g = vg(log_E)
            updates, state = opt.update(g, state)
            log_E = optax.apply_updates(log_E, updates)
        v1, _ = vg(log_E)
        assert float(v1) < float(v0)
        err0 = abs(0.7 * sysid.TRUE_E - sysid.TRUE_E)
        err1 = abs(float(jnp.exp(log_E)) - sysid.TRUE_E)
        assert err1 < err0
