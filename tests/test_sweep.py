"""Parameter-sweep and differentiability tests.

Covers the north-star capabilities with no reference counterpart: batched
beam *configurations* as one compiled program, and gradients of trajectory
losses w.r.t. physical parameters.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.models.simulate import simulate
from continuum_robot_tpu.parallel.sweep import (
    make_parametric_rhs,
    override_arrays,
    parametric_rollout,
    tile_arrays,
)
from tests import helpers


@pytest.fixture(scope="module")
def model():
    return DynamicEulerBernoulliBeam(helpers.linear_csv())


class TestOverrides:
    def test_tile_and_override(self, model):
        arrays = model.beam_model.arrays
        E = np.linspace(50e9, 100e9, 4)[:, None]
        batch = override_arrays(arrays, elastic_modulus=E)
        assert batch.elastic_modulus.shape == (4, 6)
        np.testing.assert_allclose(np.asarray(batch.elastic_modulus[:, 0]), E[:, 0])
        np.testing.assert_allclose(
            np.asarray(batch.length), np.tile(np.asarray(arrays.length), (4, 1))
        )

    def test_unknown_field_rejected(self, model):
        with pytest.raises(ValueError, match="no field"):
            override_arrays(model.beam_model.arrays, youngs=np.ones((2, 1)))


class TestParametricRhs:
    def test_matches_fixed_model(self, model):
        """Parametric RHS at the model's own arrays == the model's RHS."""
        bc = model.beam_model.bc_info
        rhs_param = make_parametric_rhs(bc)
        rhs_fixed = model.build_rhs()
        n = model.n_pos_states
        x = np.random.default_rng(0).normal(scale=1e-3, size=2 * n)
        arrays_j = jax.tree_util.tree_map(
            jnp.asarray, model.beam_model.arrays
        )
        a = np.asarray(rhs_param(0.0, jnp.asarray(x), None, arrays_j))
        b = np.asarray(rhs_fixed(0.0, jnp.asarray(x), None))
        np.testing.assert_allclose(a, b, rtol=1e-8, atol=1e-10 * np.abs(b).max())

    def test_sweep_changes_dynamics(self, model):
        bc = model.beam_model.bc_info
        arrays = model.beam_model.arrays
        E = np.array([50e9, 100e9])[:, None]
        batch = override_arrays(arrays, elastic_modulus=E)
        n = model.n_pos_states
        x0 = np.zeros((2, 2 * n))
        x0[:, n - 2] = 1e-3
        ts, ys = parametric_rollout(bc, batch, x0, 0.01, 0.001, substeps=20)
        ys = np.asarray(ys)
        assert ys.shape[1] == 2
        assert np.all(np.isfinite(ys))
        # Stiffer beam oscillates faster -> different trajectories.
        assert not np.allclose(ys[:, 0], ys[:, 1])

    def test_matches_single_env_simulate(self, model):
        """One-env parametric rollout == the fixed-model RK4 rollout."""
        bc = model.beam_model.bc_info
        n = model.n_pos_states
        x0 = np.zeros(2 * n)
        x0[n - 2] = 1e-3
        batch = tile_arrays(model.beam_model.arrays, 1)
        ts, ys = parametric_rollout(bc, batch, x0[None], 0.005, 0.001, substeps=40)
        res = simulate(model, x0, 0.005, 0.001, method="rk4", substeps=40)
        np.testing.assert_allclose(
            np.asarray(ys)[:, 0], np.asarray(res.ys), rtol=1e-7,
            atol=1e-9 * np.abs(np.asarray(res.ys)).max(),
        )


class TestDifferentiability:
    def test_gradient_wrt_elastic_modulus(self, model):
        """d(loss)/dE through a full rollout: finite, matches finite diff."""
        bc = model.beam_model.bc_info
        arrays = model.beam_model.arrays
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(1e-3)

        def loss(E_scalar):
            batch = override_arrays(arrays, elastic_modulus=E_scalar[None, None])
            ts, ys = parametric_rollout(bc, batch, x0[None], 0.002, 0.001,
                                        substeps=20)
            return jnp.sum(ys[-1, 0, :n] ** 2) * 1e6

        E0 = jnp.asarray(75e9)
        g = jax.grad(loss)(E0)
        assert np.isfinite(float(g))
        eps = 1e3  # relative 1.3e-8 step on 75e9
        fd = (loss(E0 + eps) - loss(E0 - eps)) / (2 * eps)
        assert float(g) == pytest.approx(float(fd), rel=2e-3)

    def test_gradient_wrt_initial_state(self, model):
        rhs = model.build_rhs()
        n = model.n_pos_states

        def loss(x0):
            from continuum_robot_tpu.ops.integrators import integrate_fixed

            ts, xs = integrate_fixed(rhs, x0, 0.0, 0.001, 3, substeps=20)
            return jnp.sum(xs[-1] ** 2)

        x0 = jnp.zeros(2 * n).at[n - 2].set(1e-3)
        g = jax.grad(loss)(x0)
        assert g.shape == x0.shape
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0


class TestParametricImplicit:
    """Traced implicit rollouts (``parametric_genalpha_rollout``)."""

    def _setup(self, kind="linear", n=5):
        csv = helpers.linear_csv(n) if kind == "linear" else helpers.nonlinear_csv(n)
        m = DynamicEulerBernoulliBeam(csv)
        return m, m.beam_model.bc_info, m.beam_model.arrays

    @pytest.mark.parametrize("kind", ["linear", "nonlinear"])
    def test_matches_prefactored_generalized_alpha(self, kind):
        from continuum_robot_tpu.parallel.sweep import (
            parametric_genalpha_rollout,
            tile_arrays,
        )

        m, bc, arrays = self._setup(kind)
        n = m.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(1e-4)
        u = jnp.zeros(n).at[-2].set(0.01)
        r_ref = simulate(
            m, x0, 0.01, 1e-3, method="generalized_alpha",
            linear_solver="btd", substeps=10, u=u,
        )
        batch = tile_arrays(arrays, 2)
        ts, ys = jax.jit(
            lambda b, x: parametric_genalpha_rollout(
                bc, b, x, 0.01, 1e-3, u=u, substeps=10
            )
        )(batch, jnp.stack([x0, x0]))
        scale = float(jnp.abs(r_ref.ys).max())
        np.testing.assert_allclose(
            np.asarray(ys[:, 0]), np.asarray(r_ref.ys), atol=1e-12 * scale
        )
        np.testing.assert_allclose(np.asarray(ys[:, 1]), np.asarray(ys[:, 0]))

    def test_gradient_matches_finite_difference(self):
        from continuum_robot_tpu.parallel.sweep import (
            override_arrays,
            parametric_genalpha_rollout,
        )

        m, bc, arrays = self._setup()
        n = m.n_pos_states
        x0b = jnp.zeros((1, 2 * n)).at[0, n - 2].set(1e-4)
        u = jnp.zeros(n).at[-2].set(0.01)

        def loss(E):
            b = override_arrays(arrays, elastic_modulus=E[None, None])
            ts, ys = parametric_genalpha_rollout(
                bc, b, x0b, 0.01, 1e-3, u=u, substeps=10
            )
            return jnp.sum(ys[-1, 0, :n] ** 2) * 1e6

        E0 = jnp.asarray(75e9)
        g = jax.grad(loss)(E0)
        eps = 1e3
        fd = (loss(E0 + eps) - loss(E0 - eps)) / (2 * eps)
        np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)

    def test_parameter_batch_varies_output(self):
        from continuum_robot_tpu.parallel.sweep import (
            override_arrays,
            parametric_genalpha_rollout,
        )

        m, bc, arrays = self._setup()
        n = m.n_pos_states
        E = jnp.asarray([50e9, 75e9, 100e9])
        batch = override_arrays(arrays, elastic_modulus=E[:, None])
        x0b = jnp.zeros((3, 2 * n)).at[:, n - 2].set(1e-4)
        ts, ys = parametric_genalpha_rollout(
            bc, batch, x0b, 0.01, 1e-3, substeps=10
        )
        assert bool(jnp.all(jnp.isfinite(ys)))
        # Stiffer beams ring back faster: trajectories must differ.
        assert float(jnp.abs(ys[:, 0] - ys[:, 1]).max()) > 0
        assert float(jnp.abs(ys[:, 1] - ys[:, 2]).max()) > 0

    def test_remat_gradient_matches(self):
        """Gradient checkpointing changes memory, not values."""
        from continuum_robot_tpu.parallel.sweep import (
            override_arrays,
            parametric_genalpha_rollout,
        )

        m, bc, arrays = self._setup()
        n = m.n_pos_states
        x0b = jnp.zeros((1, 2 * n)).at[0, n - 2].set(1e-4)

        def loss(E, remat):
            b = override_arrays(arrays, elastic_modulus=E[None, None])
            ts, ys = parametric_genalpha_rollout(
                bc, b, x0b, 0.01, 1e-3, substeps=10, remat=remat
            )
            return jnp.sum(ys[-1, 0, :n] ** 2) * 1e6

        E0 = jnp.asarray(75e9)
        g_plain = jax.grad(lambda E: loss(E, False))(E0)
        g_remat = jax.grad(lambda E: loss(E, True))(E0)
        np.testing.assert_allclose(float(g_remat), float(g_plain), rtol=1e-10)


class TestParametricModalROM:
    """Differentiable ROM path: gradients at ROM speed, frozen basis."""

    def test_grad_matches_finite_difference(self):
        from continuum_robot_tpu.models.simulate import make_modal_rom
        from continuum_robot_tpu.parallel.sweep import (
            override_arrays,
            parametric_modal_rom_rollout,
        )

        beam = DynamicEulerBernoulliBeam(
            helpers.nonlinear_csv(40, include_fluid=False)
        )
        n = beam.n_pos_states
        ms = make_modal_rom(beam, 1e-4, rho_inf=0.5, n_modes=16)
        bc = beam.beam_model.bc_info
        u = np.zeros(n)
        u[-2] = 2.0
        u_m = ms.project_force_host(u)
        m = ms.n_modes
        eta0 = jnp.zeros((1, m))
        etad0 = jnp.zeros((1, m))
        E0 = float(np.asarray(beam.beam_model.arrays.elastic_modulus)[0])

        def loss(scale):
            arrs = override_arrays(
                beam.beam_model.arrays,
                elastic_modulus=(scale * E0) * jnp.ones((1, 1)),
            )
            eta, _ = parametric_modal_rom_rollout(
                ms, bc, arrs, eta0, etad0, u_modal=u_m,
                n_steps=50, n_newton=2,
            )
            return jnp.sum(eta**2) * 1e6

        g = float(jax.grad(loss)(1.0))
        eps = 1e-5
        fd = float((loss(1.0 + eps) - loss(1.0 - eps)) / (2 * eps))
        assert abs(g - fd) / abs(fd) < 1e-6, f"grad {g} vs fd {fd}"

    def test_remat_matches_plain(self):
        from continuum_robot_tpu.models.simulate import make_modal_rom
        from continuum_robot_tpu.parallel.sweep import (
            override_arrays,
            parametric_modal_rom_rollout,
        )

        beam = DynamicEulerBernoulliBeam(
            helpers.nonlinear_csv(20, include_fluid=False)
        )
        n = beam.n_pos_states
        ms = make_modal_rom(beam, 1e-4, rho_inf=0.5, n_modes=8)
        bc = beam.beam_model.bc_info
        u = np.zeros(n)
        u[-2] = 1.0
        u_m = ms.project_force_host(u)
        eta0 = jnp.zeros((1, ms.n_modes))

        def loss(scale, remat):
            arrs = override_arrays(
                beam.beam_model.arrays,
                density=scale * jnp.asarray(
                    np.asarray(beam.beam_model.arrays.density)[None, :]
                ),
            )
            eta, _ = parametric_modal_rom_rollout(
                ms, bc, arrs, eta0, eta0, u_modal=u_m,
                n_steps=20, remat=remat,
            )
            return jnp.sum(eta**2) * 1e6

        g_plain = float(jax.grad(lambda s: loss(s, False))(1.0))
        g_remat = float(jax.grad(lambda s: loss(s, True))(1.0))
        np.testing.assert_allclose(g_remat, g_plain, rtol=1e-10)


class TestAdaptiveOnTracedOperator:
    """Error-controlled stepping on the autodiff-capable sweep operator.

    The traced operator's solve factors at a TRACED c = f(dt) (no
    prefactor exists for a continuum of dt), which is exactly what the
    adaptive implicit engines need — error-controlled stiff rollouts
    whose operators are differentiable in the physical parameters."""

    def test_matches_host_prefactored_adaptive(self):
        from continuum_robot_tpu.models.simulate import make_newmark_operator
        from continuum_robot_tpu.ops.integrators import (
            integrate_generalized_alpha_adaptive,
        )
        from continuum_robot_tpu.parallel.sweep import (
            make_traced_genalpha_operator,
        )

        m = DynamicEulerBernoulliBeam(helpers.linear_csv(5))
        n = m.n_pos_states
        q0 = jnp.zeros(n).at[-2].set(1e-4)
        v0 = jnp.zeros(n)
        u = jnp.zeros(n).at[-2].set(0.01)
        t_eval = jnp.asarray(np.linspace(0.0, 5e-3, 4))

        op_traced = make_traced_genalpha_operator(
            m.beam_model.bc_info, m.beam_model.arrays, dt=1e-4, rho_inf=0.9
        )
        assert op_traced.tangent_frozen  # all-linear, host-concrete mask
        qs_t, vs_t, st_t = jax.jit(
            lambda q, v: integrate_generalized_alpha_adaptive(
                op_traced, q, v, t_eval, u=u, rho_inf=0.9,
                rtol=1e-6, atol=1e-9,
            )
        )(q0, v0)

        op_host = make_newmark_operator(m, dt=None, linear_solver="btd")
        qs_h, vs_h, st_h = integrate_generalized_alpha_adaptive(
            op_host, q0, v0, t_eval, u=u, rho_inf=0.9, rtol=1e-6, atol=1e-9
        )
        np.testing.assert_allclose(np.asarray(qs_t), np.asarray(qs_h),
                                   rtol=1e-9, atol=1e-15)
        assert int(st_t.n_accepted) == int(st_h.n_accepted)
        assert int(st_t.n_incomplete) == 0

    def test_forward_sensitivities_through_adaptive(self):
        """jax.jvp through the error-controlled engine: forward parameter
        sensitivities at LSODA-grade accuracy control. (The accept/reject
        sequence is piecewise constant in the parameters, so the tangent
        is the sensitivity of the realized step sequence — smooth a.e.;
        reverse mode stays on the fixed-step rollouts, while_loop has no
        adjoint.)"""
        import dataclasses

        from continuum_robot_tpu.ops.integrators import (
            integrate_generalized_alpha_adaptive,
        )
        from continuum_robot_tpu.parallel.sweep import (
            make_traced_genalpha_operator,
        )

        m = DynamicEulerBernoulliBeam(helpers.linear_csv(5))
        bc, arrays = m.beam_model.bc_info, m.beam_model.arrays
        n = m.n_pos_states
        q0 = jnp.zeros(n).at[-2].set(1e-4)
        v0 = jnp.zeros(n)
        u = jnp.zeros(n).at[-2].set(0.01)
        t_eval = jnp.asarray(np.linspace(0.0, 5e-3, 3))

        def tip_at_end(E):
            arr = dataclasses.replace(
                arrays, elastic_modulus=E * jnp.ones(5)
            )
            op = make_traced_genalpha_operator(bc, arr, dt=1e-4,
                                               rho_inf=0.9)
            qs, _, _ = integrate_generalized_alpha_adaptive(
                op, q0, v0, t_eval, u=u, rho_inf=0.9,
                rtol=1e-7, atol=1e-10,
            )
            return qs[-1, -2]

        E0 = jnp.asarray(75e9)
        _, g = jax.jvp(tip_at_end, (E0,), (jnp.asarray(1.0),))
        h = 75e9 * 1e-5
        fd = (tip_at_end(E0 + h) - tip_at_end(E0 - h)) / (2 * h)
        assert abs(float(g) - float(fd)) / abs(float(fd)) < 1e-6
