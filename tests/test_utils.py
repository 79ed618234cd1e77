"""Tests for the aux subsystems: guards, checkpointing, profiling, metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.models.simulate import simulate
from continuum_robot_tpu.utils import (
    StepMeter,
    divergence_flags,
    guard_rhs,
    init_health,
    load_checkpoint,
    save_checkpoint,
    step_with_guard,
)
from continuum_robot_tpu.utils.metrics import make_energy_fns, run_metrics
from tests import helpers


@pytest.fixture(scope="module")
def model():
    return DynamicEulerBernoulliBeam(helpers.linear_csv())


class TestDivergenceGuards:
    def test_flags(self):
        x = jnp.asarray([[1.0, 2.0], [jnp.nan, 0.0], [1e9, 0.0]])
        flags = np.asarray(divergence_flags(x, limit=1e3))
        np.testing.assert_array_equal(flags, [False, True, True])

    def test_freeze_semantics(self):
        """A diverged env keeps its last good state; healthy envs continue."""

        def bad_step(x):
            # env 1 explodes, others advance
            out = x + 1.0
            return out.at[1].set(jnp.inf)

        guarded = step_with_guard(bad_step, limit=1e3)
        x = jnp.zeros((3, 4))
        health = init_health(x, batch_shape=(3,))
        x1, health = guarded(x, health)
        x2, health = guarded(x1, health)
        np.testing.assert_array_equal(np.asarray(health.diverged), [False, True, False])
        np.testing.assert_allclose(np.asarray(x2)[0], 2.0)
        np.testing.assert_allclose(np.asarray(x2)[1], 0.0)  # frozen at init
        assert np.all(np.isfinite(np.asarray(x2)))

    def test_guard_rhs(self):
        def rhs(t, x, u=None):
            return x / x  # NaN at zero

        g = guard_rhs(rhs)
        out = np.asarray(g(0.0, jnp.zeros(4)))
        np.testing.assert_allclose(out, 0.0)


class TestBatchConsistency:
    def test_passes_on_consistent_fn(self):
        from continuum_robot_tpu.utils import verify_batch_consistency

        dev = verify_batch_consistency(lambda x: x * 2 + 1, jnp.ones((4, 8)))
        assert dev < 1e-7

    def test_raises_on_inconsistent_fn(self):
        from continuum_robot_tpu.utils import verify_batch_consistency

        def bad(x):
            # behaves differently for batched input (simulates a miscompile)
            if x.ndim == 2:
                return x * 3.0
            return x * 2.0

        with pytest.raises(RuntimeError, match="deviates"):
            verify_batch_consistency(bad, jnp.ones((4, 8)))

    def test_implicit_step_consistent_on_cpu(self):
        """The full fused gen-alpha step: batch == per-env on this backend."""
        from continuum_robot_tpu.models.simulate import make_newmark_operator
        from continuum_robot_tpu.ops.integrators import generalized_alpha_step
        from continuum_robot_tpu.utils import verify_batch_consistency
        from continuum_robot_tpu.models import ForceParams

        beam = DynamicEulerBernoulliBeam(
            helpers.linear_csv(),
            ForceParams(enable_fluid_effects=True, fluid_density=1000.0),
        )
        n = beam.n_pos_states
        h = 5e-5
        # No prefactored gen-alpha system -> the solve takes the full-Newton
        # (state-dependent factorization) path, the heaviest fusion.
        op = make_newmark_operator(beam, dt=None, linear_solver="btd")

        def step(x):
            q, v = x[..., :n], x[..., n : 2 * n],
            a = x[..., 2 * n :]
            q, v, a = generalized_alpha_step(
                op, 0.0, q, v, a, h, None, rho_inf=0.8, n_newton=1
            )
            return jnp.concatenate([q, v, a], axis=-1)

        x = jnp.zeros((4, 3 * n)).at[:, n - 2].set(
            jnp.linspace(1e-4, 1e-3, 4)
        )
        dev = verify_batch_consistency(step, x, rtol=1e-6)
        assert dev < 1e-6


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {"q": jnp.arange(6.0), "v": jnp.ones(6)}
        path = str(tmp_path / "ckpt.npz")
        save_checkpoint(path, state, t=0.25, rng_key=jnp.asarray([0, 1]),
                        meta={"n_envs": 4})
        restored, t, key, meta = load_checkpoint(path, treedef_like=state)
        assert t == 0.25
        np.testing.assert_allclose(np.asarray(restored["q"]), np.arange(6.0))
        np.testing.assert_allclose(np.asarray(restored["v"]), 1.0)
        assert int(meta["n_envs"]) == 4


class TestStepMeter:
    def test_measures(self):
        meter = StepMeter(n_steps=10, n_envs=2)
        fn = jax.jit(lambda x: x * 2)
        meter.measure(fn, jnp.ones(16), repeats=3)
        rep = meter.report()
        assert rep["compile_s"] > 0 and rep["run_s"] > 0
        assert rep["env_steps_per_sec"] == pytest.approx(
            2 * 10 / rep["run_s"]
        )


class TestMetrics:
    def test_energy_conservation_undamped(self, model):
        """Undamped free vibration conserves energy to solver tolerance."""
        n = model.n_pos_states
        x0 = np.zeros(2 * n)
        x0[n - 2] = 1e-4
        res = simulate(model, x0, 0.05, 0.001, method="dopri5",
                       rtol=1e-10, atol=1e-13)
        m = run_metrics(model, res)
        assert m["finite"]
        assert abs(m["energy_drift_rel"]) < 1e-6
        assert m["energy_initial"] > 0

    def test_energy_decays_with_drag(self):
        from continuum_robot_tpu.models import ForceParams

        beam = DynamicEulerBernoulliBeam(
            helpers.linear_csv(),
            ForceParams(enable_fluid_effects=True, fluid_density=2000.0),
        )
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        x0[n - 2] = 1e-3
        res = simulate(beam, x0, 0.1, 0.001, method="dopri5",
                       rtol=1e-8, atol=1e-11)
        m = run_metrics(beam, res)
        assert m["energy_drift_rel"] < -0.01  # drag removes energy

    def test_modal_analysis_matches_analytic(self):
        """FEM natural frequencies vs the closed-form cantilever solution.

        A 12-element mesh resolves the first three bending modes to <1%
        (physics-sanity idiom, same bar as the reference's FFT comparison).
        """
        from continuum_robot_tpu.utils.modal import (
            analytic_cantilever_frequencies,
            modal_analysis,
        )

        beam12 = DynamicEulerBernoulliBeam(
            helpers.linear_csv(n=12, length=helpers.LENGTH / 2)
        )
        freqs, modes = modal_analysis(beam12, n_modes=8)
        # Bending modes interleave with axial ones; compare the lowest three
        # against the analytic transverse spectrum.
        analytic = analytic_cantilever_frequencies(
            6 * helpers.LENGTH, helpers.E_MOD, helpers.M_INERTIA,
            helpers.DENSITY, helpers.CROSS_AREA, n_modes=3,
        )
        for fa in analytic:
            rel = np.abs(freqs - fa).min() / fa
            assert rel < 0.01, f"mode at {fa:.2f} Hz off by {rel:.3%}"
        assert modes.shape[0] == beam12.n_pos_states

    def test_kinetic_strain_shapes(self, model):
        kinetic, strain = make_energy_fns(model)
        n = model.n_pos_states
        batch = jnp.ones((5, n)) * 1e-4
        assert kinetic(batch).shape == (5,)
        assert strain(batch).shape == (5,)
        assert bool(jnp.all(kinetic(batch) > 0))
