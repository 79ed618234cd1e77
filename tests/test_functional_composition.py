"""Force/input composition tests.

Mirrors the reference suite ``tests/test_functional_composition.py:100-549``:
auto-registration from ForceParams, gravity's effect on transverse
accelerations, external/hybrid force closures, registry CRUD semantics,
input-handler aggregation algebra, error paths, and an integration
round-trip. One deliberate divergence is tested explicitly: this framework
threads the real simulation time into force functions (the reference pins
t=0.0 — ``dynamic_beam_model.py:265``, SURVEY §2.3).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from continuum_robot_tpu.models import (
    AbstractForce,
    AbstractInputHandler,
    DynamicEulerBernoulliBeam,
    FluidDragForce,
    ForceParams,
    ForceRegistry,
    GravityForce,
    InputRegistry,
)
from continuum_robot_tpu.models.simulate import simulate
from tests import helpers


class MockForce(AbstractForce):
    def __init__(self, value=1.0, enabled=True, index=0):
        self.value = value
        self.enabled = enabled
        self.index = index

    def compute_forces(self, x, t):
        n = x.shape[-1] // 2
        return jnp.zeros((*x.shape[:-1], n), dtype=x.dtype).at[..., self.index].set(
            self.value
        )

    def is_enabled(self):
        return self.enabled


class MockInputHandler(AbstractInputHandler):
    def __init__(self, scale=0.3, enabled=True):
        self.scale = scale
        self.enabled = enabled

    def compute_input(self, x, u, t):
        return self.scale * jnp.asarray(u)

    def is_enabled(self):
        return self.enabled


@pytest.fixture(scope="module")
def linear_file():
    return helpers.linear_csv()


class TestAutoRegistration:
    def test_no_forces_by_default(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        assert len(beam.force_registry) == 0

    def test_fluid_auto_registered(self, linear_file):
        beam = DynamicEulerBernoulliBeam(
            linear_file,
            ForceParams(enable_fluid_effects=True, fluid_density=1000.0),
        )
        assert len(beam.force_registry) == 1
        assert isinstance(beam.force_registry.get_registered_forces()[0], FluidDragForce)

    def test_gravity_auto_registered(self, linear_file):
        beam = DynamicEulerBernoulliBeam(
            linear_file, ForceParams(enable_gravity_effects=True)
        )
        assert len(beam.force_registry) == 1
        assert isinstance(beam.force_registry.get_registered_forces()[0], GravityForce)

    def test_both(self, linear_file):
        beam = DynamicEulerBernoulliBeam(
            linear_file,
            ForceParams(
                enable_fluid_effects=True,
                fluid_density=1000.0,
                enable_gravity_effects=True,
            ),
        )
        assert len(beam.force_registry) == 2

    def test_zero_gravity_auto_disabled(self, linear_file):
        fp = ForceParams(gravity_vector=[0.0, 0.0, 0.0], enable_gravity_effects=True)
        assert not fp.enable_gravity_effects
        beam = DynamicEulerBernoulliBeam(linear_file, fp)
        assert len(beam.force_registry) == 0


class TestGravityPhysics:
    def test_gravity_hits_w_accelerations(self, linear_file):
        """Reference assertion (test_functional_composition.py:139-169)."""
        beam = DynamicEulerBernoulliBeam(
            linear_file, ForceParams(enable_gravity_effects=True)
        )
        beam.create_system_func()
        n = beam.n_pos_states
        dx = np.asarray(beam.system_func(np.zeros(2 * n)))
        acc = dx[n:]
        w_idx = [beam.get_state_index(i, "w") for i in range(1, 7)]
        assert np.abs(acc[w_idx]).max() > 0
        # Gravity is downward: net transverse acceleration negative somewhere.
        assert acc[w_idx].min() < 0

    def test_gravity_vector_setter(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        g = GravityForce(beam.params[["density", "cross_area", "length"]])
        np.testing.assert_allclose(g.get_gravity_vector(), [0, -9.81, 0])
        g.set_gravity_vector([0, -1.62, 0])
        np.testing.assert_allclose(g.get_gravity_vector(), [0, -1.62, 0])
        with pytest.raises(ValueError):
            g.set_gravity_vector([0, -9.81])


class TestExternalForces:
    def test_external_closure(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)
        n = beam.n_pos_states

        def my_force(x, t):
            return jnp.zeros((*x.shape[:-1], n), dtype=x.dtype).at[..., 3].set(2.5)

        beam.create_system_func(forces_func=my_force)
        dx = np.asarray(beam.system_func(np.zeros(2 * n)))
        assert np.abs(dx[n:]).max() > 0

    def test_time_dependent_force_receives_real_t(self, linear_file):
        """Divergence from the reference: t is threaded through, not 0."""
        beam = DynamicEulerBernoulliBeam(linear_file)
        n = beam.n_pos_states

        def ramp(x, t):
            return jnp.full((*x.shape[:-1], n), 1.0, dtype=x.dtype) * t

        beam.create_system_func(forces_func=ramp)
        dx0 = np.asarray(beam.system_func(np.zeros(2 * n), 0.0))
        dx1 = np.asarray(beam.system_func(np.zeros(2 * n), 0.5))
        assert np.allclose(dx0, 0.0)
        assert np.abs(dx1).max() > 0

    def test_hybrid_registry_plus_external(self, linear_file):
        """Registry aggregate == manual sum of component forces."""
        beam = DynamicEulerBernoulliBeam(
            linear_file,
            ForceParams(enable_fluid_effects=True, fluid_density=1000.0),
        )
        n = beam.n_pos_states
        extra = MockForce(value=3.0, index=5)
        beam.force_registry.register(extra)
        agg = beam.force_registry.create_aggregated_function()

        fluid = beam.force_registry.get_registered_forces()[0]
        rng = np.random.default_rng(11)
        x = rng.normal(scale=0.01, size=2 * n)
        total = np.asarray(agg(x, 0.0))
        manual = np.asarray(fluid.compute_forces(x, 0.0)) + np.asarray(
            extra.compute_forces(x, 0.0)
        )
        np.testing.assert_allclose(total, manual, rtol=1e-12)


class TestRegistryCRUD:
    def test_register_unregister_clear_contains(self):
        reg = ForceRegistry()
        f1, f2 = MockForce(), MockForce()
        reg.register(f1)
        reg.register(f2)
        assert len(reg) == 2 and f1 in reg
        assert reg.unregister(f1)
        assert not reg.unregister(f1)
        assert f1 not in reg
        reg.clear()
        assert len(reg) == 0

    def test_disabled_not_registered(self):
        reg = ForceRegistry()
        reg.register(MockForce(enabled=False))
        assert len(reg) == 0

    def test_empty_registry_zero_forces(self):
        reg = ForceRegistry()
        agg = reg.create_aggregated_function()
        out = np.asarray(agg(np.zeros(12), 0.0))
        np.testing.assert_allclose(out, np.zeros(6))

    def test_input_registry(self):
        reg = InputRegistry()
        h = MockInputHandler(scale=0.3)
        reg.register(h)
        assert h in reg and len(reg) == 1
        agg = reg.create_aggregated_function()
        u = np.ones(4)
        np.testing.assert_allclose(np.asarray(agg(np.zeros(8), u, 0.0)), 1.3)
        reg.clear()
        agg2 = reg.create_aggregated_function()
        np.testing.assert_allclose(np.asarray(agg2(np.zeros(8), u, 0.0)), 1.0)


class TestErrorPaths:
    def test_raising_force_propagates(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)

        def bad_force(x, t):
            raise RuntimeError("force exploded")

        beam.create_system_func(forces_func=bad_force)
        with pytest.raises(RuntimeError, match="force exploded"):
            beam.system_func(np.zeros(2 * beam.n_pos_states))

    def test_wrong_shape_force_fails(self, linear_file):
        beam = DynamicEulerBernoulliBeam(linear_file)

        def wrong_shape(x, t):
            return jnp.ones(3)

        beam.create_system_func(forces_func=wrong_shape)
        with pytest.raises(Exception):
            np.asarray(beam.system_func(np.zeros(2 * beam.n_pos_states)))


class TestIntegrationRoundTrip:
    def test_composed_simulation(self, linear_file):
        """Full rollout with registry + external force (reference :523-549)."""
        beam = DynamicEulerBernoulliBeam(
            linear_file,
            ForceParams(enable_fluid_effects=True, fluid_density=500.0),
        )
        n = beam.n_pos_states
        res = simulate(
            beam, np.zeros(2 * n), 0.02, 0.001,
            method="dopri5", u=helpers.tip_impulse(n),
            rtol=1e-8, atol=1e-10,
        )
        ys = np.asarray(res.ys)
        assert np.all(np.isfinite(ys))
        assert np.abs(ys).max() > 0


class TracingForce(AbstractForce):
    """Force with a trace-time side effect counting XLA program traces."""

    n_traces = 0

    def __init__(self, value):
        self.value = value

    def compute_forces(self, x, t):
        type(self).n_traces += 1  # runs at trace time only
        n = x.shape[-1] // 2
        return jnp.zeros((*x.shape[:-1], n), dtype=x.dtype).at[..., 0].set(
            self.value
        )

    def is_enabled(self):
        return True


class TestRetraceCacheIdentity:
    def test_gc_recycled_force_gets_fresh_trace(self, linear_file):
        """A GC'd force replaced by a new object must retrace, never serve a
        stale program (round-1 verdict: ``id()``-keyed cache collision)."""
        import gc

        from continuum_robot_tpu.models.forces import force_trace_uid

        beam = DynamicEulerBernoulliBeam(linear_file)
        beam.create_system_func()
        n = beam.n_pos_states
        x = np.zeros(2 * n)

        TracingForce.n_traces = 0
        f1 = TracingForce(1.0)
        beam.force_registry.register(f1)
        y1 = np.asarray(beam.system_func(x))
        assert TracingForce.n_traces == 1
        uid1 = force_trace_uid(f1)

        beam.force_registry.unregister(f1)
        del f1
        gc.collect()

        # Even if this allocation lands on the recycled address, its uid —
        # and therefore the jit-cache key — must differ.
        f2 = TracingForce(2.0)
        beam.force_registry.register(f2)
        assert force_trace_uid(f2) != uid1
        y2 = np.asarray(beam.system_func(x))
        assert TracingForce.n_traces == 2, "stale compiled program served"
        assert not np.allclose(y1, y2)

    def test_uid_stable_per_object(self):
        from continuum_robot_tpu.models.forces import force_trace_uid

        f = TracingForce(1.0)
        assert force_trace_uid(f) == force_trace_uid(f)
