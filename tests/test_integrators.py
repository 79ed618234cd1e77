"""Integrator tests: convergence orders, adaptivity, implicit stability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.models.simulate import simulate
from continuum_robot_tpu.ops import integrators
from tests import helpers


def decay_rhs(t, x, u=None):
    return -x


def oscillator_rhs(t, x, u=None):
    # x = [q, v], q'' = -omega^2 q with omega = 2
    return jnp.stack([x[1], -4.0 * x[0]])


class TestRK4:
    def test_exponential_decay(self):
        ts, xs = integrators.integrate_fixed(
            decay_rhs, jnp.ones(3), 0.0, 0.1, 10, substeps=10
        )
        np.testing.assert_allclose(
            np.asarray(xs[-1]), np.exp(-1.0), rtol=1e-9
        )

    def test_fourth_order_convergence(self):
        x0 = jnp.array([1.0, 0.0])
        exact = np.array([np.cos(2.0), -2 * np.sin(2.0)])
        errs = []
        for ss in [4, 8, 16]:
            _, xs = integrators.integrate_fixed(
                oscillator_rhs, x0, 0.0, 1.0, 1, substeps=ss
            )
            errs.append(np.abs(np.asarray(xs[-1]) - exact).max())
        order = np.log2(errs[0] / errs[1])
        assert 3.5 < order < 4.5


class TestRematRollout:
    def test_remat_gradient_matches_plain(self):
        """jax.checkpoint path: identical values and gradients, less memory."""

        def loss(x0, remat):
            ts, xs = integrators.integrate_fixed(
                oscillator_rhs, x0, 0.0, 0.1, 5, substeps=10, remat=remat
            )
            return jnp.sum(xs[-1] ** 2)

        x0 = jnp.array([1.0, 0.0])
        v_plain, g_plain = jax.value_and_grad(lambda x: loss(x, False))(x0)
        v_remat, g_remat = jax.value_and_grad(lambda x: loss(x, True))(x0)
        np.testing.assert_allclose(float(v_plain), float(v_remat), rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(g_plain), np.asarray(g_remat), rtol=1e-10
        )


class TestDopri5:
    def test_accuracy_and_stats(self):
        t_eval = jnp.linspace(0.0, 1.0, 11)
        xs, stats = integrators.integrate_adaptive(
            decay_rhs, jnp.ones(2), t_eval, rtol=1e-10, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(xs)[:, 0], np.exp(-np.asarray(t_eval)), rtol=1e-9
        )
        assert int(stats.n_accepted) > 0
        assert int(stats.n_steps) == int(stats.n_accepted) + int(stats.n_rejected)

    def test_tolerance_controls_error(self):
        t_eval = jnp.linspace(0.0, 2.0, 3)
        exact = np.cos(2 * np.asarray(t_eval))
        errs = []
        for rtol in [1e-4, 1e-8]:
            xs, _ = integrators.integrate_adaptive(
                oscillator_rhs, jnp.array([1.0, 0.0]), t_eval,
                rtol=rtol, atol=rtol * 1e-2,
            )
            errs.append(np.abs(np.asarray(xs)[:, 0] - exact).max())
        assert errs[1] < errs[0] * 1e-2

    def test_jittable_end_to_end(self):
        t_eval = jnp.linspace(0.0, 1.0, 5)

        @jax.jit
        def run(x0):
            xs, stats = integrators.integrate_adaptive(
                decay_rhs, x0, t_eval, rtol=1e-8, atol=1e-10
            )
            return xs

        xs = run(jnp.ones(2))
        np.testing.assert_allclose(
            np.asarray(xs)[:, 0], np.exp(-np.asarray(t_eval)), rtol=1e-6
        )


class TestNewmarkOnBeam:
    @pytest.fixture(scope="class")
    def beam(self):
        return DynamicEulerBernoulliBeam(helpers.linear_csv())

    def test_matches_dopri_on_tip_motion(self, beam):
        """Tip trajectory converges to the explicit reference at 2nd order."""
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        u = jnp.zeros(n).at[-2].set(0.05)
        ref = simulate(beam, x0, 0.01, 0.001, method="dopri5", u=u,
                       rtol=1e-11, atol=1e-13)
        tip_ref = np.asarray(ref.ys)[:, n - 2]
        errs = []
        for ss in [50, 100]:
            res = simulate(beam, x0, 0.01, 0.001, method="newmark", u=u,
                           substeps=ss)
            errs.append(np.abs(np.asarray(res.ys)[:, n - 2] - tip_ref).max())
        scale = np.abs(tip_ref).max()
        assert errs[0] / scale < 1e-2
        order = np.log2(errs[0] / errs[1])
        assert order > 1.5  # second-order convergence

    def test_unconditional_stability(self, beam):
        """Newmark stays bounded at dt far above the explicit stability limit.

        (omega_max ~ 4.6e4 rad/s for this mesh -> explicit limit ~4e-5 s;
        we step at 1e-3 s, 25x beyond it.)
        """
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        x0[n - 2] = 0.001
        res = simulate(beam, x0, 0.5, 0.001, method="newmark", substeps=1)
        ys = np.asarray(res.ys)
        assert np.all(np.isfinite(ys))
        # Positions stay bounded near the initial 1e-3 deflection scale
        # (velocities legitimately reach ~omega*q ~ 45).
        assert np.abs(ys[:, :n]).max() < 0.01

    def test_nonlinear_newmark(self):
        beam = DynamicEulerBernoulliBeam(helpers.nonlinear_csv())
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        u = jnp.zeros(n).at[-2].set(0.05)
        ref = simulate(beam, x0, 0.01, 0.001, method="dopri5", u=u,
                       rtol=1e-10, atol=1e-12)
        res = simulate(beam, x0, 0.01, 0.001, method="newmark", u=u,
                       substeps=100, n_newton=3)
        tip_ref = np.asarray(ref.ys)[:, n - 2]
        tip_new = np.asarray(res.ys)[:, n - 2]
        assert np.abs(tip_new - tip_ref).max() / np.abs(tip_ref).max() < 2e-2

    def test_generalized_alpha_accuracy_and_dissipation(self, beam):
        """Gen-alpha tracks the tip like Newmark but damps spurious high modes."""
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        u = jnp.zeros(n).at[-2].set(0.05)
        ref = simulate(beam, x0, 0.01, 0.001, method="dopri5", u=u,
                       rtol=1e-11, atol=1e-13)
        tip_ref = np.asarray(ref.ys)[:, n - 2]
        res = simulate(beam, x0, 0.01, 0.001, method="generalized_alpha",
                       u=u, substeps=100, rho_inf=0.8)
        tip = np.asarray(res.ys)[:, n - 2]
        assert np.abs(tip - tip_ref).max() / np.abs(tip_ref).max() < 1e-2

        # At coarse dt the undamped Newmark keeps the (unresolvable, ~5-26
        # kHz) axial modes ringing while gen-alpha with rho_inf=0.5
        # annihilates them: seed an axial tip displacement (the linear beam
        # decouples axial from bending) and compare late axial energy.
        x0_ax = np.zeros(2 * n)
        x0_ax[n - 3] = 1e-5  # axial tip displacement
        res_nm = simulate(beam, x0_ax, 0.2, 0.001, method="newmark", substeps=1)
        res_ga = simulate(beam, x0_ax, 0.2, 0.001, method="generalized_alpha",
                          substeps=1, rho_inf=0.5)
        u_idx = np.arange(0, n, 3)  # axial displacements
        e_nm = float(np.sum(np.asarray(res_nm.ys)[-20:, u_idx] ** 2))
        e_ga = float(np.sum(np.asarray(res_ga.ys)[-20:, u_idx] ** 2))
        assert e_ga < 0.1 * e_nm

    def test_batched_rollout(self, beam):
        """The same newmark program runs a batch via vmap."""
        n = beam.n_pos_states
        x0s = np.zeros((4, 2 * n))
        x0s[:, n - 2] = np.linspace(1e-4, 4e-4, 4)

        res = jax.vmap(
            lambda x0: simulate(beam, x0, 0.005, 0.001, method="newmark",
                                substeps=4, jit=False).ys
        )(jnp.asarray(x0s))
        ys = np.asarray(res)
        assert ys.shape == (4, 6, 2 * n)
        assert np.all(np.isfinite(ys))
        # different initial conditions -> different trajectories
        assert not np.allclose(ys[0], ys[-1])


class TestModalGenAlpha:
    """Modal-superposition generalized-alpha (``make_modal_genalpha``)."""

    def _model(self, n=8):
        return DynamicEulerBernoulliBeam(helpers.linear_csv(n))

    def test_matches_dense_generalized_alpha(self):
        """Identical recurrence, diagonalized: trajectories match the dense
        operator path to roundoff (f64)."""
        from continuum_robot_tpu.models.simulate import (
            make_modal_genalpha,
            make_newmark_operator,
        )

        model = self._model()
        nf = model.n_pos_states
        DT, RHO, NS, B = 1e-4, 0.8, 100, 3
        am = (2 * RHO - 1) / (RHO + 1)
        af = RHO / (RHO + 1)
        beta = 0.25 * (1 - am + af) ** 2
        op = make_newmark_operator(
            model, dt=None,
            extra_systems=[(1.0 - am, (1.0 - af) * beta * DT * DT)],
        )
        rng = np.random.default_rng(0)
        q0 = jnp.asarray(rng.normal(scale=1e-6, size=(B, nf)))
        v0 = jnp.zeros((B, nf))
        u = jnp.zeros(nf).at[-2].set(0.1)
        a0 = op.solve(q0, 0.0)(u - op.internal_force(q0))

        def run(q, v, a):
            def body(c, _):
                q, v, a = c
                q, v, a = integrators.generalized_alpha_step(
                    op, 0.0, q, v, a, DT, u, rho_inf=RHO, n_newton=1
                )
                return (q, v, a), None

            (q, v, a), _ = jax.lax.scan(body, (q, v, a), None, length=NS)
            return q, v

        qd, vd = jax.jit(run)(q0, v0, a0)

        ms = make_modal_genalpha(model, DT, rho_inf=RHO)
        eta, etad = ms.to_modal(q0, v0)
        e1, ed1, _ = jax.jit(
            lambda e, ed: ms.rollout(e, ed, ms.project_force(u), NS)
        )(eta, etad)
        qm, vm = ms.from_modal(e1, ed1)

        scale = float(jnp.abs(qd).max())
        np.testing.assert_allclose(np.asarray(qm), np.asarray(qd), atol=1e-9 * scale)
        vscale = float(jnp.abs(vd).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(vm), np.asarray(vd), atol=1e-8 * vscale)

    def test_roundtrip_projection(self):
        from continuum_robot_tpu.models.simulate import make_modal_genalpha

        model = self._model()
        nf = model.n_pos_states
        ms = make_modal_genalpha(model, 1e-4)
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=nf))
        v = jnp.asarray(rng.normal(size=nf))
        eta, etad = ms.to_modal(q, v)
        q2, v2 = ms.from_modal(eta, etad)
        np.testing.assert_allclose(np.asarray(q2), np.asarray(q), rtol=1e-8)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v), rtol=1e-8)

    def test_rejects_nonlinear_and_forces(self):
        from continuum_robot_tpu.models.simulate import make_modal_genalpha
        from continuum_robot_tpu.models import ForceParams

        nl = DynamicEulerBernoulliBeam(helpers.nonlinear_csv())
        with pytest.raises(ValueError, match="linear"):
            make_modal_genalpha(nl, 1e-4)

        fl = DynamicEulerBernoulliBeam(
            helpers.linear_csv(), ForceParams(enable_gravity_effects=True)
        )
        with pytest.raises(ValueError, match="forces"):
            make_modal_genalpha(fl, 1e-4)

    def test_truncated_basis(self):
        """n_modes keeps the dominant dynamics: tip trajectory of a
        low-mode excitation is reproduced by a truncated basis."""
        from continuum_robot_tpu.models.simulate import make_modal_genalpha

        model = self._model()
        nf = model.n_pos_states
        DT, NS = 1e-4, 200
        full = make_modal_genalpha(model, DT)
        # Excite only the lowest mode.
        q0 = jnp.asarray(full.Phi[:, 0] * 1e-6)
        v0 = jnp.zeros(nf)
        trunc = make_modal_genalpha(model, DT, n_modes=4)
        out = {}
        for name, ms in [("full", full), ("trunc", trunc)]:
            eta, etad = ms.to_modal(q0, v0)
            e1, ed1, _ = ms.rollout(eta, etad, None, NS)
            q1, _ = ms.from_modal(e1, ed1)
            out[name] = np.asarray(q1)
        scale = np.abs(out["full"]).max()
        np.testing.assert_allclose(out["trunc"], out["full"], atol=1e-6 * scale)

    def test_simulate_method_modal(self):
        """simulate(method='modal') == generalized_alpha for linear beams,
        including time-dependent inputs and batched initial states."""
        model = self._model(6)
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(1e-3)
        u = jnp.zeros(n).at[-2].set(0.05)

        def ut(t):
            return jnp.where(t < 0.005, u, jnp.zeros_like(u))

        for u_case in (u, ut):
            r_ga = simulate(model, x0, 0.02, 1e-3,
                            method="generalized_alpha", u=u_case, substeps=10)
            r_mo = simulate(model, x0, 0.02, 1e-3,
                            method="modal", u=u_case, substeps=10)
            scale = float(jnp.abs(r_ga.ys).max())
            np.testing.assert_allclose(
                np.asarray(r_mo.ys), np.asarray(r_ga.ys), atol=1e-9 * scale
            )
            np.testing.assert_allclose(np.asarray(r_mo.ts), np.asarray(r_ga.ts))

        x0b = jnp.stack([x0, 2 * x0])
        r_b = simulate(model, x0b, 0.01, 1e-3, method="modal", u=u, substeps=5)
        assert r_b.ys.shape == (11, 2, 2 * n)
        assert bool(jnp.all(jnp.isfinite(r_b.ys)))

    def test_simulate_modal_rejects_forces_func(self):
        model = self._model(4)
        n = model.n_pos_states
        with pytest.raises(ValueError, match="state-dependent"):
            simulate(model, jnp.zeros(2 * n), 0.01, 1e-3, method="modal",
                     forces_func=lambda x, t: x[..., :n])

    def test_rayleigh_damping_converges_to_exact(self):
        """Damped modal gen-alpha -> exact expm of the damped LTI at O(h^2),
        with the damping term in the Jacobian (stable at any dt)."""
        from scipy.linalg import expm

        from continuum_robot_tpu.models.simulate import make_modal_genalpha

        model = self._model(6)
        n = model.n_pos_states
        alpha, beta = 5.0, 1e-6
        K = model.beam_model.get_stiffness_matrix()
        M = model.beam_model.get_mass_matrix()
        Minv = np.linalg.inv(M)
        A = np.block(
            [[np.zeros((n, n)), np.eye(n)],
             [-Minv @ K, -Minv @ (alpha * M + beta * K)]]
        )
        rng = np.random.default_rng(0)
        q0 = jnp.asarray(rng.normal(scale=1e-5, size=(3, n)))
        v0 = jnp.zeros((3, n))
        x_exact = np.concatenate([np.asarray(q0), np.asarray(v0)], -1) @ expm(
            A * 40e-5
        ).T

        errs = []
        for sub in [1, 2, 4]:
            ms = make_modal_genalpha(
                model, 1e-5 / sub, rho_inf=0.9, rayleigh=(alpha, beta)
            )
            eta, etad = ms.to_modal(q0, v0)
            e, ed, _ = ms.rollout(eta, etad, None, 40 * sub)
            q_m, _ = ms.from_modal(e, ed)
            errs.append(np.abs(np.asarray(q_m) - x_exact[:, :n]).max())
        # Second-order convergence: each dt halving cuts the error ~4x.
        assert errs[0] / errs[1] > 3.0
        assert errs[1] / errs[2] > 3.0
        assert errs[2] < 1e-7

    def test_rayleigh_damping_dissipates_energy(self):
        from continuum_robot_tpu.models.simulate import make_modal_genalpha

        model = self._model(6)
        n = model.n_pos_states
        rng = np.random.default_rng(1)
        q0 = jnp.asarray(rng.normal(scale=1e-5, size=n))
        v0 = jnp.zeros(n)
        ms = make_modal_genalpha(
            model, 1e-4, rho_inf=1.0, rayleigh=(50.0, 1e-7)
        )
        eta, etad = ms.to_modal(q0, v0)
        e, ed, _ = ms.rollout(eta, etad, None, 500)
        E0 = float(jnp.sum(ms.lam * eta**2 + etad**2))
        E1 = float(jnp.sum(ms.lam * e**2 + ed**2))
        assert E1 < 0.5 * E0

    def test_rayleigh_pallas_matches_xla(self):
        from continuum_robot_tpu.models.simulate import make_modal_genalpha

        model = self._model(6)
        n = model.n_pos_states
        ms = make_modal_genalpha(
            model, 1e-5, rho_inf=0.9, rayleigh=(5.0, 1e-6)
        )
        rng = np.random.default_rng(2)
        eta = jnp.asarray(rng.normal(scale=1e-6, size=(3, n)))
        etad = jnp.asarray(rng.normal(scale=1e-4, size=(3, n)))
        u_m = ms.project_force_host(jnp.zeros(n).at[-2].set(0.1))
        e1, ed1, ea1 = ms.rollout(eta, etad, u_m, 40)
        e2, ed2, ea2 = ms.rollout_pallas(
            eta, etad, u_m, 40, tile=128, mode_tile=8, interpret=True
        )
        for a, b in [(e1, e2), (ed1, ed2), (ea1, ea2)]:
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-12 * scale
            )
        ts1, ef1, edf1 = ms.rollout_frames(eta, etad, u_m, 8, substeps=5)
        ts2, ef2, edf2 = ms.rollout_frames_pallas(
            eta, etad, u_m, 8, substeps=5, tile=128, mode_tile=8,
            interpret=True,
        )
        scale = float(jnp.abs(ef1).max())
        np.testing.assert_allclose(
            np.asarray(ef2), np.asarray(ef1), atol=1e-12 * scale
        )

    def test_rayleigh_validation(self):
        from continuum_robot_tpu.models.simulate import make_modal_genalpha

        with pytest.raises(ValueError, match="nonnegative"):
            make_modal_genalpha(self._model(4), 1e-4, rayleigh=(-1.0, 0.0))


class TestAdaptiveDrive:
    """The shared accept/reject interval driver (integrators.adaptive_drive).

    All four adaptive engines run on this one controller, so its two
    policies are unit-tested directly against a synthetic order-3 engine
    with the deterministic error model ``en = (dt / dtmax)**3`` (accepts
    exactly when dt <= dtmax) advancing ``dx/dt = 1``.
    """

    def _drive(self, n_frames, frame_len, dtmax, **kw):
        def trial(t, dt, x):
            return x + dt, (dt / dtmax) ** 3

        t_eval = jnp.asarray(np.arange(n_frames + 1) * frame_len)
        return integrators.adaptive_drive(
            trial, jnp.asarray(0.0, jnp.float64), t_eval,
            jnp.asarray(dtmax / 4.0, jnp.float64), -1.0 / 3.0, **kw
        ), t_eval

    def test_frames_exact_and_complete(self):
        (xf, frames, stats), t_eval = self._drive(10, 1.25e-3, 1e-3)
        np.testing.assert_allclose(
            np.asarray(frames), np.asarray(t_eval[1:]), rtol=1e-12
        )
        assert int(stats.n_incomplete) == 0
        assert int(stats.n_steps) == int(stats.n_accepted) + int(
            stats.n_rejected
        )

    def test_clamped_frame_end_keeps_learned_dt(self):
        """Interval-end clamping must not restart the step size.

        Frame length = 1.000001 * dtmax: every interval ends with a
        ~1e-6*dtmax clamped step. Proposing from that clamped step (the
        old behavior) caps the growth factor at 5 and pays ~log_5(1e6)
        ~ 9 recovery steps per frame; keeping the learned dt_est pays 2
        steps per frame.
        """
        F = 20
        (_, frames, stats), t_eval = self._drive(F, 1.000001e-3, 1e-3)
        np.testing.assert_allclose(
            np.asarray(frames), np.asarray(t_eval[1:]), rtol=1e-9
        )
        assert int(stats.n_incomplete) == 0
        # Steady state: one full step (~0.9 dtmax) + one clamped remainder
        # per frame. The old controller measured ~10 steps/frame here.
        assert int(stats.n_steps) <= 3 * F + 8, int(stats.n_steps)

    def test_truncated_interval_is_counted(self):
        """Step-cap exits are accounted, never silent."""
        F = 4
        (_, frames, stats), t_eval = self._drive(
            F, 10e-3, 1e-3, max_steps_per_interval=3
        )
        assert int(stats.n_incomplete) == F
        # The frame holds the partial state (less than the interval end).
        assert float(frames[0]) < float(t_eval[1])

    def test_engine_surfaces_truncation(self):
        """The gen-alpha adaptive engine reports incomplete intervals."""
        csv = helpers.write_beam_csv(["linear"] * 4)
        model = DynamicEulerBernoulliBeam(csv)
        from continuum_robot_tpu.models.simulate import make_newmark_operator

        op = make_newmark_operator(model, dt=1e-4,
                                   linear_solver="dense_inv")
        n = model.n_pos_states
        q0 = jnp.zeros(n).at[-2].set(1e-3)
        v0 = jnp.zeros(n)
        t_eval = jnp.asarray(np.linspace(0.0, 1e-2, 3))
        _, _, stats = integrators.integrate_generalized_alpha_adaptive(
            op, q0, v0, t_eval, rtol=1e-10, atol=1e-13,
            max_steps_per_interval=2,
        )
        assert int(stats.n_incomplete) > 0
        _, _, stats_ok = integrators.integrate_generalized_alpha_adaptive(
            op, q0, v0, t_eval, rtol=1e-4, atol=1e-7,
        )
        assert int(stats_ok.n_incomplete) == 0


class TestAdaptiveImplicit:
    """Error-controlled implicit stepping (the LSODA-capability engines).

    No manual dt anywhere: rtol/atol drive the step size. Oracles are the
    tight-tolerance Dopri5 trajectory (6-segment) and the exact ZOH
    exponential propagator (stiff 60-element release — zero integration
    error for an LTI free response). Horizons are short: each (method,
    rtol) pair is a fresh trace, and the per-step cost is a factorization
    at the trial dt — accuracy/step-count SCALING is what's asserted.
    """

    @pytest.fixture(scope="class")
    def beam(self):
        return DynamicEulerBernoulliBeam(helpers.linear_csv())

    @pytest.fixture(scope="class")
    def tight_ref(self, beam):
        n = beam.n_pos_states
        u = helpers.tip_impulse(n)
        res = simulate(beam, np.zeros(2 * n), 0.02, 0.001,
                       method="dopri5", u=u, rtol=1e-10, atol=1e-12)
        return np.asarray(res.ys)

    def test_genalpha_adaptive_tolerance_ladder(self, beam, tight_ref):
        n = beam.n_pos_states
        u = helpers.tip_impulse(n)
        tip_ref = tight_ref[:, n - 2]
        errs, steps = [], []
        for rtol in [1e-4, 1e-6]:
            res = simulate(beam, np.zeros(2 * n), 0.02, 0.001,
                           method="generalized_alpha_adaptive", u=u,
                           rtol=rtol, atol=rtol * 1e-3, rho_inf=0.9)
            tip = np.asarray(res.ys)[:, n - 2]
            errs.append(np.abs(tip - tip_ref).max() / np.abs(tip_ref).max())
            steps.append(int(res.stats.n_accepted))
        # tightening the tolerance must tighten the trajectory and cost more
        assert errs[1] < errs[0]
        assert steps[1] > steps[0]
        assert errs[1] < 3e-3

    def test_sdirk3_adaptive_tolerance_ladder(self, beam, tight_ref):
        # Tip-displacement error: the error norm controls DISPLACEMENT
        # (velocity weighted by dt), so unresolved damped high-mode
        # velocity phases are deliberately not tracked — the observable
        # the workloads analyze is what scales with the tolerance.
        n = beam.n_pos_states
        u = helpers.tip_impulse(n)
        tip_ref = tight_ref[:, n - 2]
        errs = []
        for rtol in [1e-3, 1e-6]:
            res = simulate(beam, np.zeros(2 * n), 0.02, 0.001,
                           method="sdirk3", u=u, rtol=rtol,
                           atol=rtol * 1e-3)
            tip = np.asarray(res.ys)[:, n - 2]
            errs.append(np.abs(tip - tip_ref).max() / np.abs(tip_ref).max())
        assert errs[1] < errs[0] / 10.0
        assert errs[1] < 1e-3

    def test_stiff_release_without_manual_dt(self):
        """A production-scale stiff mesh integrates at the requested accuracy
        with far fewer steps than the explicit stability limit allows."""
        import scipy.linalg

        from continuum_robot_tpu.ops.exponential import make_expm_propagator

        csv = helpers.linear_csv(60, length=0.025)
        beam = DynamicEulerBernoulliBeam(csv)
        n = beam.n_pos_states
        K = beam.beam_model.get_stiffness_matrix()
        M = beam.beam_model.get_mass_matrix()
        omega_max = float(np.sqrt(scipy.linalg.eigh(K, M)[0].max()))
        assert omega_max > 1e5  # genuinely stiff mesh

        # Static tip-load deflection, released (smooth low-mode response).
        f = np.zeros(n)
        f[-2] = 0.1
        q0 = np.linalg.solve(K, f)
        x0 = np.concatenate([q0, np.zeros(n)])

        t_final, dt_out = 0.02, 1e-3
        exact = make_expm_propagator(beam, dt_out, dtype=jnp.float64)
        xs_exact = np.asarray(exact(jnp.asarray(x0), jnp.zeros((20, n))))

        res = simulate(beam, x0, t_final, dt_out, method="sdirk3",
                       rtol=1e-6, atol=1e-10, linear_solver="btd")
        tip = np.asarray(res.ys)[:, n - 2]
        tip_exact = xs_exact[:, n - 2]
        err = np.abs(tip - tip_exact).max() / np.abs(tip_exact).max()
        assert err < 1e-4, f"stiff adaptive tip error {err:.2e}"

        n_explicit = t_final * omega_max / 2.8  # RK4 stability-limited count
        n_used = int(res.stats.n_accepted)
        assert n_used < n_explicit / 10, (
            f"adaptive implicit used {n_used} steps vs explicit "
            f"stability floor {n_explicit:.0f}"
        )

    def test_per_env_dt_via_vmap(self):
        """The documented per-env dt control: vmap the adaptive integrator.

        Two envs with very different response amplitudes get genuinely
        different controllers (per-env accepted-step counts), and each
        vmapped lane reproduces its solo run — the while-loop batching's
        masked extra iterations must not leak into finished lanes.
        """
        from continuum_robot_tpu.models.simulate import make_newmark_operator

        beam = DynamicEulerBernoulliBeam(helpers.linear_csv(6))
        n = beam.n_pos_states
        op = make_newmark_operator(beam, dt=None, linear_solver="dense_inv")
        t_eval = jnp.linspace(0.0, 5e-3, 3)

        us = jnp.stack([
            jnp.zeros(n).at[-2].set(0.1),
            jnp.zeros(n).at[-2].set(200.0),
        ])
        q0 = jnp.zeros((2, n))
        v0 = jnp.zeros((2, n))

        def solve_one(q, v, u):
            return integrators.integrate_generalized_alpha_adaptive(
                op, q, v, t_eval, u=u, rtol=1e-5, atol=1e-12, dt0=1e-5
            )

        qs_b, vs_b, stats_b = jax.vmap(solve_one)(q0, v0, us)
        assert qs_b.shape == (2, 3, n)
        # per-env controllers: stats are batched and genuinely different
        acc = np.asarray(stats_b.n_accepted)
        assert acc.shape == (2,)
        assert acc[0] != acc[1]
        # each lane == its solo run
        for i in range(2):
            qs_i, vs_i, stats_i = solve_one(q0[i], v0[i], us[i])
            np.testing.assert_allclose(
                np.asarray(qs_b[i]), np.asarray(qs_i), rtol=1e-10, atol=0
            )
            assert int(stats_i.n_accepted) == int(acc[i])


class TestFrozenTangentReuse:
    """NewmarkOperator.tangent_frozen: one factored effective Jacobian per
    trial step. For a state-independent tangent the reuse is exact, so
    forcing the flag off (re-solving at every Newton iterate / SDIRK
    stage) must reproduce the same trajectory to roundoff."""

    def _op_pair(self, csv, **kw):
        import dataclasses

        from continuum_robot_tpu.models.simulate import make_newmark_operator

        model = DynamicEulerBernoulliBeam(csv)
        op = make_newmark_operator(model, dt=None, **kw)
        assert op.tangent_frozen  # all-linear / modified-Newton => frozen
        return model, op, dataclasses.replace(op, tangent_frozen=False)

    def test_flag_reflects_configuration(self):
        from continuum_robot_tpu.models.simulate import make_newmark_operator

        m_nl = DynamicEulerBernoulliBeam(helpers.nonlinear_csv(4))
        full_newton = make_newmark_operator(
            m_nl, dt=None, use_modified_newton=False
        )
        assert not full_newton.tangent_frozen  # state-dependent tangent
        modified = make_newmark_operator(
            m_nl, dt=None, use_modified_newton=True
        )
        assert modified.tangent_frozen

    @pytest.mark.parametrize("integrate,extra", [
        (integrators.integrate_generalized_alpha_adaptive,
         {"rho_inf": 0.9, "n_newton": 2}),
        (integrators.integrate_sdirk3_adaptive, {"n_newton": 2}),
    ])
    def test_reuse_is_arithmetic_neutral(self, integrate, extra):
        model, op_frozen, op_refactor = self._op_pair(helpers.linear_csv(4))
        n = model.n_pos_states
        q0 = jnp.zeros(n).at[-2].set(1e-4)
        v0 = jnp.zeros(n)
        t_eval = jnp.asarray(np.linspace(0.0, 5e-3, 4))
        out_a = integrate(op_frozen, q0, v0, t_eval, rtol=1e-6,
                          atol=1e-9, **extra)
        out_b = integrate(op_refactor, q0, v0, t_eval, rtol=1e-6,
                          atol=1e-9, **extra)
        for a, b in zip(out_a[:2], out_b[:2]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-16)
        assert int(out_a[2].n_accepted) == int(out_b[2].n_accepted)


class TestAdaptiveDriveStall:
    """A time-advance stall (accepted dt below the resolution of t) must
    exit the interval immediately and count it incomplete — not burn the
    full step cap on no-op trials (the documented adaptive_drive
    contract)."""

    def test_stall_exits_fast_and_is_counted(self):
        def trial(t, dt, x):
            # Always-accept engine at en == 1: the controller shrinks dt
            # by safety=0.9 per step, so dt can never recover.
            return x + dt, jnp.asarray(1.0, jnp.float64)

        t_eval = jnp.asarray([1.0, 2.0])
        # dt0 far below ulp(1.0): the very first accepted step stalls.
        _, _, stats = integrators.adaptive_drive(
            trial, jnp.asarray(0.0, jnp.float64), t_eval,
            jnp.asarray(1e-18, jnp.float64), -1.0 / 3.0,
            max_steps_per_interval=100_000,
        )
        assert int(stats.n_incomplete) == 1
        assert int(stats.n_steps) <= 3, int(stats.n_steps)
