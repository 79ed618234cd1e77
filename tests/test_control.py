"""Control tests: stiffness-matrix extraction, LQR validation, on-device CARE.

Mirrors the reference suite ``tests/test_control.py:62-468`` (input
validation negative cases, A/B structure, gain shape, closed-loop stability,
caching, LQR+FullStateLinear integration) plus golden checks of the CARE
solver against scipy (``tests/goldens/lqr.npz``).
"""

import os

import numpy as np
import pytest

from continuum_robot_tpu.control import FullStateLinear, LinearQuadraticRegulator
from continuum_robot_tpu.models import (
    BoundaryConditionType,
    DynamicEulerBernoulliBeam,
    EulerBernoulliBeam,
)
from continuum_robot_tpu.models.simulate import simulate
from continuum_robot_tpu.ops.care import care_residual, solve_care
from tests import helpers
from tests.test_unified_beam_system import make_df

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "lqr.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def beam_matrices(golden):
    return golden["K_beam"], golden["M_beam"]


class TestStiffnessMatrixExtraction:
    def test_linear_success(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        K = beam.get_stiffness_matrix()
        assert K.shape == (15, 15)

    def test_mixed_beam_fails(self):
        beam = EulerBernoulliBeam(make_df(["linear", "nonlinear"]))
        with pytest.raises(ValueError, match="nonlinear"):
            beam.get_stiffness_matrix()

    def test_bc_reduced(self):
        beam = EulerBernoulliBeam(make_df(["linear"] * 4))
        beam.apply_boundary_conditions({0: BoundaryConditionType.FIXED})
        assert beam.get_stiffness_matrix().shape == (12, 12)


class TestLQRValidation:
    def test_non_square_stiffness(self, beam_matrices):
        K, M = beam_matrices
        with pytest.raises(ValueError, match="square"):
            LinearQuadraticRegulator(K[:, :3], M, np.eye(2 * K.shape[0]), np.eye(K.shape[0]))

    def test_mismatched_km(self, beam_matrices):
        K, M = beam_matrices
        with pytest.raises(ValueError, match="same dimensions"):
            LinearQuadraticRegulator(K[:3, :3], M, np.eye(6), np.eye(3))

    def test_q_not_square(self, beam_matrices):
        K, M = beam_matrices
        n = K.shape[0]
        with pytest.raises(ValueError, match="Q matrix must be square"):
            LinearQuadraticRegulator(K, M, np.ones((2 * n, 3)), np.eye(n))

    def test_q_not_psd(self, beam_matrices):
        K, M = beam_matrices
        n = K.shape[0]
        with pytest.raises(ValueError, match="positive semidefinite"):
            LinearQuadraticRegulator(K, M, -np.eye(2 * n), np.eye(n))

    def test_r_not_pd(self, beam_matrices):
        K, M = beam_matrices
        n = K.shape[0]
        with pytest.raises(ValueError, match="positive definite"):
            LinearQuadraticRegulator(K, M, np.eye(2 * n), np.zeros((n, n)))

    def test_q_dimension_mismatch(self, beam_matrices):
        K, M = beam_matrices
        n = K.shape[0]
        lqr = LinearQuadraticRegulator(K, M, np.eye(n), np.eye(n))  # Q too small
        with pytest.raises(ValueError, match="must match state dimension"):
            lqr.compute_gain_matrix()

    def test_r_dimension_mismatch(self, beam_matrices):
        K, M = beam_matrices
        n = K.shape[0]
        lqr = LinearQuadraticRegulator(K, M, np.eye(2 * n), np.eye(n + 1))
        with pytest.raises(ValueError, match="must match input dimension"):
            lqr.compute_gain_matrix()


class TestABStructure:
    def test_structure(self, beam_matrices):
        K, M = beam_matrices
        n = K.shape[0]
        lqr = LinearQuadraticRegulator(K, M, np.eye(2 * n), np.eye(n))
        A, B = lqr.get_A(), lqr.get_B()
        assert A.shape == (2 * n, 2 * n) and B.shape == (2 * n, n)
        np.testing.assert_allclose(A[:n, n:], np.eye(n))
        np.testing.assert_allclose(A[:n, :n], 0.0)
        np.testing.assert_allclose(A[n:, n:], 0.0)
        np.testing.assert_allclose(A[n:, :n], -np.linalg.solve(M, K), rtol=1e-9)
        np.testing.assert_allclose(B[:n, :], 0.0)
        np.testing.assert_allclose(B[n:, :], np.linalg.inv(M), rtol=1e-9)


class TestCareSolver:
    def test_random_systems_vs_scipy(self):
        from scipy.linalg import solve_continuous_are

        rng = np.random.default_rng(42)
        for n, m in [(4, 2), (12, 5)]:
            A = rng.normal(size=(n, n)) * 0.5
            B = rng.normal(size=(n, m))
            Q, R = np.eye(n), np.eye(m)
            P_ref = solve_continuous_are(A, B, Q, R)
            res = solve_care(A, B, Q, R)
            np.testing.assert_allclose(np.asarray(res.P), P_ref, rtol=1e-9, atol=1e-12)

    def test_beam_golden(self, golden):
        P = solve_care(
            _beam_A(golden), _beam_B(golden), golden["Q"], golden["R"]
        ).P
        scale = np.abs(golden["P"]).max()
        np.testing.assert_allclose(
            np.asarray(P) / scale, golden["P"] / scale, atol=1e-8
        )

    def test_residual_small(self, golden):
        A, B = _beam_A(golden), _beam_B(golden)
        res = solve_care(A, B, golden["Q"], golden["R"])
        # The beam CARE is ill-conditioned (||A|| ~ 2e9); measure the
        # residual against the sum of the terms it cancels between.
        P = np.asarray(res.P)
        G = B @ np.linalg.solve(golden["R"], B.T)
        scale = (
            np.linalg.norm(A.T @ P)
            + np.linalg.norm(P @ A)
            + np.linalg.norm(P @ G @ P)
            + np.linalg.norm(golden["Q"])
        )
        assert float(res.residual) / scale < 1e-6


def _beam_A(golden):
    K, M = golden["K_beam"], golden["M_beam"]
    n = K.shape[0]
    A = np.zeros((2 * n, 2 * n))
    A[:n, n:] = np.eye(n)
    A[n:, :n] = -np.linalg.solve(M, K)
    return A


def _beam_B(golden):
    M = golden["M_beam"]
    n = M.shape[0]
    B = np.zeros((2 * n, n))
    B[n:, :] = np.linalg.inv(M)
    return B


class TestGainComputation:
    def test_gain_vs_scipy_golden(self, golden):
        lqr = LinearQuadraticRegulator(
            golden["K_beam"], golden["M_beam"], golden["Q"], golden["R"]
        )
        K = lqr.compute_gain_matrix()
        assert K.shape == golden["K_gain"].shape
        scale = np.abs(golden["K_gain"]).max()
        np.testing.assert_allclose(K / scale, golden["K_gain"] / scale, atol=1e-4)

    def test_closed_loop_stable(self, golden):
        lqr = LinearQuadraticRegulator(
            golden["K_beam"], golden["M_beam"], golden["Q"], golden["R"]
        )
        lqr.compute_gain_matrix()
        assert np.all(np.real(lqr._E) < 0)

    def test_caching(self, golden):
        lqr = LinearQuadraticRegulator(
            golden["K_beam"], golden["M_beam"], golden["Q"], golden["R"]
        )
        K1 = lqr.compute_gain_matrix()
        K2 = lqr.get_K()
        assert K1 is K2


class TestFullStateLinear:
    def test_validation(self):
        with pytest.raises(ValueError, match="2D"):
            FullStateLinear(np.ones(4))
        h = FullStateLinear(np.ones((2, 4)))
        with pytest.raises(ValueError, match="1D"):
            h.compute_input(np.ones((2, 4)), np.ones(4), 0.0)
        with pytest.raises(ValueError, match="same length"):
            h.compute_input(np.ones(4), np.ones(3), 0.0)
        with pytest.raises(ValueError, match="column dimension"):
            h.compute_input(np.ones(5), np.ones(5), 0.0)

    def test_feedback_law(self):
        K = np.array([[1.0, 0.0], [0.0, 2.0]])
        h = FullStateLinear(K)
        u = np.asarray(h.compute_input(np.array([1.0, 1.0]), np.zeros(2), 0.0))
        np.testing.assert_allclose(u, [-1.0, -2.0])


@pytest.mark.integration
class TestClosedLoop:
    def test_lqr_stabilizes_beam(self, golden):
        """Closed-loop rollout decays vs open-loop (reference :389-468)."""
        linear_file = helpers.linear_csv()
        beam = DynamicEulerBernoulliBeam(linear_file)
        lqr = LinearQuadraticRegulator(
            golden["K_beam"], golden["M_beam"], golden["Q"], golden["R"]
        )
        K = lqr.compute_gain_matrix()
        controller = FullStateLinear(K)

        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        x0[n - 2] = 0.001  # initial tip displacement

        import jax.numpy as jnp

        Kj = jnp.asarray(K)

        # Closed loop: fold u = -K x into the forces.
        def feedback_force(x, t):
            return -jnp.einsum("ij,...j->...i", Kj, x)

        res_cl = simulate(
            beam, x0, 0.05, 0.001, method="dopri5",
            forces_func=feedback_force, rtol=1e-8, atol=1e-10,
        )
        res_ol = simulate(
            beam, x0, 0.05, 0.001, method="dopri5", rtol=1e-8, atol=1e-10,
        )
        tip_cl = np.abs(np.asarray(res_cl.ys)[-10:, n - 2]).max()
        tip_ol = np.abs(np.asarray(res_ol.ys)[-10:, n - 2]).max()
        assert np.all(np.isfinite(np.asarray(res_cl.ys)))
        assert tip_cl < tip_ol  # control damps the oscillation


# ---------------------------------------------------------------------------
# Actuator-subset LQR, Kalman-Bucy estimation (LQE), and LQG
# ---------------------------------------------------------------------------


def _small_beam_matrices(n_segments=3):
    beam = EulerBernoulliBeam(make_df(["linear"] * n_segments))
    beam.apply_boundary_conditions({0: BoundaryConditionType.FIXED})
    return beam.get_stiffness_matrix(), beam.get_mass_matrix()


class TestActuatorSubsetLQR:
    def test_input_dofs_validation(self):
        Kb, Mb = _small_beam_matrices()
        nf = Kb.shape[0]
        Q = np.eye(2 * nf)
        with pytest.raises(ValueError, match="lie in"):
            LinearQuadraticRegulator(Kb, Mb, Q, np.eye(1), input_dofs=[nf])
        with pytest.raises(ValueError, match="unique"):
            LinearQuadraticRegulator(Kb, Mb, Q, np.eye(2), input_dofs=[1, 1])
        with pytest.raises(ValueError, match="non-empty"):
            LinearQuadraticRegulator(Kb, Mb, Q, np.eye(1), input_dofs=[])

    def test_subset_B_structure(self):
        Kb, Mb = _small_beam_matrices()
        nf = Kb.shape[0]
        act = [nf - 3, nf - 2]
        lqr = LinearQuadraticRegulator(
            Kb, Mb, np.eye(2 * nf), np.eye(2), input_dofs=act
        )
        B = lqr.get_B()
        assert B.shape == (2 * nf, 2)
        np.testing.assert_allclose(B[:nf], 0.0)
        np.testing.assert_allclose(B[nf:], np.linalg.inv(Mb)[:, act])

    def test_subset_gain_stabilizes(self):
        """Tip axial+transverse actuation must stabilize the closed loop.

        (Transverse-only subsets are structurally non-stabilizable: the
        linear element decouples axial and bending, leaving the axial modes
        undamped on the imaginary axis.)
        """
        Kb, Mb = _small_beam_matrices()
        nf = Kb.shape[0]
        Q = np.diag([100.0] * nf + [10.0] * nf)
        act = [nf - 3, nf - 2]
        lqr = LinearQuadraticRegulator(
            Kb, Mb, Q, 1e-6 * np.eye(2), input_dofs=act
        )
        K = lqr.compute_gain_matrix()
        assert K.shape == (2, 2 * nf)
        ev = np.linalg.eigvals(lqr.get_A() - lqr.get_B() @ K)
        assert np.max(np.real(ev)) < 0

    def test_full_set_matches_default(self):
        """input_dofs covering every DOF reproduces the reference B."""
        Kb, Mb = _small_beam_matrices()
        nf = Kb.shape[0]
        lqr_def = LinearQuadraticRegulator(Kb, Mb, np.eye(2 * nf), np.eye(nf))
        lqr_all = LinearQuadraticRegulator(
            Kb, Mb, np.eye(2 * nf), np.eye(nf), input_dofs=np.arange(nf)
        )
        np.testing.assert_allclose(lqr_all.get_B(), lqr_def.get_B())


class TestOutputMatrix:
    def test_selection(self):
        from continuum_robot_tpu.control import output_matrix

        C = output_matrix(6, [1, 4])
        assert C.shape == (2, 6)
        x = np.arange(6.0)
        np.testing.assert_allclose(C @ x, [1.0, 4.0])

    def test_validation(self):
        from continuum_robot_tpu.control import output_matrix

        with pytest.raises(ValueError, match="lie in"):
            output_matrix(4, [4])
        with pytest.raises(ValueError, match="unique"):
            output_matrix(4, [1, 1])
        with pytest.raises(ValueError, match="non-empty"):
            output_matrix(4, [])


class TestLQE:
    def _design(self):
        from continuum_robot_tpu.control import (
            LinearQuadraticEstimator,
            output_matrix,
        )

        Kb, Mb = _small_beam_matrices()
        nf = Kb.shape[0]
        meas = [nf - 3, nf - 2, nf + nf - 3, nf + nf - 2]
        C = output_matrix(2 * nf, meas)
        lqe = LinearQuadraticEstimator(
            Kb, Mb, C, 1e-2 * np.eye(2 * nf), 1e-8 * np.eye(len(meas))
        )
        return lqe, nf

    def test_validation_contracts(self):
        from continuum_robot_tpu.control import (
            LinearQuadraticEstimator,
            output_matrix,
        )

        Kb, Mb = _small_beam_matrices()
        nf = Kb.shape[0]
        C = output_matrix(2 * nf, [0])
        with pytest.raises(ValueError, match="C matrix"):
            LinearQuadraticEstimator(
                Kb, Mb, np.eye(3), np.eye(2 * nf), np.eye(1)
            )
        with pytest.raises(ValueError, match="V matrix must be positive"):
            LinearQuadraticEstimator(
                Kb, Mb, C, -np.eye(2 * nf), np.eye(1)
            )
        with pytest.raises(ValueError, match="W matrix must be positive"):
            LinearQuadraticEstimator(
                Kb, Mb, C, np.eye(2 * nf), np.zeros((1, 1))
            )
        with pytest.raises(ValueError, match="W matrix dimension"):
            LinearQuadraticEstimator(
                Kb, Mb, C, np.eye(2 * nf), np.eye(2)
            )

    def test_estimator_error_dynamics_stable(self):
        lqe, nf = self._design()
        L = lqe.compute_gain_matrix()
        assert L.shape == (2 * nf, 4)
        ev = np.linalg.eigvals(lqe.get_A() - L @ lqe.C)
        assert np.max(np.real(ev)) < 0

    def test_dual_care_matches_scipy(self):
        from scipy.linalg import solve_continuous_are

        lqe, nf = self._design()
        lqe.compute_gain_matrix()
        A, C, V, W = lqe.get_A(), lqe.C, lqe.V, lqe.W
        P_ref = solve_continuous_are(A.T, C.T, V, W)
        np.testing.assert_allclose(
            lqe._P, P_ref, rtol=1e-5, atol=1e-8 * np.linalg.norm(P_ref)
        )

    def test_device_lqe_gain_matches_host(self):
        """Jittable on-device lqe_gain == float64 host twin (x64 CPU)."""
        import jax.numpy as jnp

        from continuum_robot_tpu.ops.care import lqe_gain, lqe_gain_numpy

        # A well-scaled synthetic system (the stiff beam needs the host
        # path's polishing; the device solver contract is scale-reasonable
        # systems — same contract as solve_care).
        rng = np.random.default_rng(7)
        n, p = 6, 2
        A = rng.normal(size=(n, n)) - 3.0 * np.eye(n)
        C = rng.normal(size=(p, n))
        V = np.eye(n)
        W = np.eye(p)
        L_host, P_host, _ = lqe_gain_numpy(A, C, V, W)
        L_dev, P_dev, res = lqe_gain(
            jnp.asarray(A), jnp.asarray(C), jnp.asarray(V), jnp.asarray(W)
        )
        np.testing.assert_allclose(np.asarray(L_dev), L_host, rtol=1e-6, atol=1e-9)
        assert float(res.residual) < 1e-8 * max(np.linalg.norm(V), 1.0)


class TestLQG:
    def _design(self):
        from continuum_robot_tpu.control import (
            LinearQuadraticEstimator,
            LinearQuadraticGaussian,
            output_matrix,
        )

        Kb, Mb = _small_beam_matrices()
        nf = Kb.shape[0]
        Q = np.diag([100.0] * nf + [10.0] * nf)
        lqr = LinearQuadraticRegulator(
            Kb, Mb, Q, 1e-6 * np.eye(2), input_dofs=[nf - 3, nf - 2]
        )
        meas = [nf - 3, nf - 2, nf + nf - 3, nf + nf - 2]
        C = output_matrix(2 * nf, meas)
        lqe = LinearQuadraticEstimator(
            Kb, Mb, C, 1e-2 * np.eye(2 * nf), 1e-8 * np.eye(len(meas))
        )
        return LinearQuadraticGaussian(lqr, lqe), nf

    def test_mismatched_plant_raises(self):
        from continuum_robot_tpu.control import (
            LinearQuadraticEstimator,
            LinearQuadraticGaussian,
            output_matrix,
        )

        Kb, Mb = _small_beam_matrices(3)
        Kb2, Mb2 = _small_beam_matrices(4)
        nf, nf2 = Kb.shape[0], Kb2.shape[0]
        lqr = LinearQuadraticRegulator(
            Kb, Mb, np.eye(2 * nf), np.eye(nf)
        )
        lqe = LinearQuadraticEstimator(
            Kb2, Mb2, output_matrix(2 * nf2, [0]),
            np.eye(2 * nf2), np.eye(1),
        )
        with pytest.raises(ValueError, match="same beam"):
            LinearQuadraticGaussian(lqr, lqe)

    def test_separation_principle(self):
        """eig(augmented) == eig(A - BK) U eig(A - LC), and all stable."""
        lqg, nf = self._design()
        ev_aug = np.sort_complex(np.linalg.eigvals(lqg.augmented_matrix()))
        ev_sep = np.sort_complex(
            np.concatenate(
                [
                    np.linalg.eigvals(lqg.A - lqg.B @ lqg.K),
                    np.linalg.eigvals(lqg.A - lqg.L @ lqg.C),
                ]
            )
        )
        scale = np.max(np.abs(ev_sep))
        assert np.max(np.abs(ev_aug - ev_sep)) < 1e-6 * scale
        assert np.max(np.real(ev_aug)) < 0

    def test_control_convention(self):
        """u = K (r - x_hat), matching FullStateLinear."""
        import jax.numpy as jnp

        lqg, nf = self._design()
        x_hat = jnp.asarray(np.random.default_rng(0).normal(size=2 * nf))
        r = jnp.asarray(np.random.default_rng(1).normal(size=2 * nf))
        u = np.asarray(lqg.control(x_hat, r))
        np.testing.assert_allclose(
            u, lqg.K @ (np.asarray(r) - np.asarray(x_hat)), rtol=1e-6
        )
        u0 = np.asarray(lqg.control(x_hat))
        np.testing.assert_allclose(u0, -lqg.K @ np.asarray(x_hat), rtol=1e-6)

    def test_closed_loop_rollout(self):
        """Exact ZOH rollout: estimator converges, plant regulates, finite."""
        import jax
        import jax.numpy as jnp

        lqg, nf = self._design()
        prop = lqg.make_closed_loop_propagator(1e-3, dtype=jnp.float64)
        z0 = jnp.zeros(4 * nf).at[nf - 2].set(1e-3)  # plant hit, observer cold
        zs = jax.jit(prop)(z0, jnp.zeros((1000, 2 * nf)))
        assert bool(jnp.all(jnp.isfinite(zs)))
        x = np.asarray(zs[:, : 2 * nf])
        e = x - np.asarray(zs[:, 2 * nf :])
        # Observer locks on: error drops by >= 2 orders of magnitude.
        assert np.linalg.norm(e[-1]) < 1e-2 * np.linalg.norm(e[0])
        # Plant is being regulated toward zero.
        assert np.abs(x[-1, nf - 2]) < 0.5 * np.abs(x[0, nf - 2])


class TestEKF:
    """Discrete EKF for nonlinear beams (``control/ekf.py``)."""

    def _nonlinear_model(self, n=2):
        import pandas as pd

        df = make_df(["nonlinear"] * n)
        df["boundary_condition"] = ["FIXED"] + ["NONE"] * (n - 1)
        return DynamicEulerBernoulliBeam(df)

    def _truth(self, model, x0, step, T):
        import jax

        def body(c, _):
            c2 = step(c)
            return c2, c2

        _, xs = jax.jit(
            lambda x: jax.lax.scan(body, x, None, length=T)
        )(x0)
        return xs

    def test_tracks_nonlinear_truth_from_cold_start(self):
        import jax
        import jax.numpy as jnp

        from continuum_robot_tpu.control import (
            make_discrete_step,
            make_ekf,
            output_matrix,
            run_ekf,
        )

        model = self._nonlinear_model()
        nf = model.n_pos_states
        dt, T = 2e-5, 150
        step = make_discrete_step(model, dt, substeps=2)
        x0 = jnp.zeros(2 * nf).at[nf - 2].set(5e-4)
        xs_true = self._truth(model, x0, step, T)

        meas = [nf - 2, 2 * nf - 2]  # tip displacement + velocity
        C = output_matrix(2 * nf, meas)
        ys = np.asarray(xs_true) @ C.T  # noise-free measurements
        ekf = make_ekf(step, C, 1e-12 * np.eye(2 * nf), 1e-12 * np.eye(2))
        (_, _), est = jax.jit(
            lambda y: run_ekf(ekf, jnp.zeros(2 * nf), 1e-6 * jnp.eye(2 * nf), y)
        )(jnp.asarray(ys))

        est = np.asarray(est)
        assert np.all(np.isfinite(est))
        err = np.linalg.norm(est - np.asarray(xs_true), axis=1)
        scale = np.linalg.norm(np.asarray(xs_true), axis=1)
        # Tracks the true nonlinear trajectory to <1% after convergence.
        assert np.all(err[T // 3 :] < 1e-2 * scale[T // 3 :])

        # And beats dead reckoning from the wrong (zero) initial state by
        # a wide margin: the open-loop prediction stays at zero.
        dead = self._truth(model, jnp.zeros(2 * nf), step, T)
        err_dead = np.linalg.norm(np.asarray(dead) - np.asarray(xs_true), axis=1)
        assert err[-1] < 0.1 * err_dead[-1]

    def test_covariance_stays_symmetric_psd(self):
        import jax
        import jax.numpy as jnp

        from continuum_robot_tpu.control import (
            EKFState,
            make_discrete_step,
            make_ekf,
            output_matrix,
        )

        model = self._nonlinear_model()
        nf = model.n_pos_states
        step = make_discrete_step(model, 2e-5)
        C = output_matrix(2 * nf, [nf - 2])
        ekf = make_ekf(step, C, 1e-10 * np.eye(2 * nf), 1e-10 * np.eye(1))
        state = EKFState(
            jnp.zeros(2 * nf).at[nf - 2].set(1e-4), 1e-8 * jnp.eye(2 * nf)
        )
        upd = jax.jit(lambda s, y: ekf(s, y, None))
        for k in range(5):
            state, _ = upd(state, jnp.asarray([1e-4]))
        P = np.asarray(state.P)
        np.testing.assert_allclose(P, P.T, atol=1e-18)
        assert np.min(np.linalg.eigvalsh(P)) > -1e-15

    def test_nonlinear_measurement_callable(self):
        """h(x) callable path: measure the squared tip displacement."""
        import jax
        import jax.numpy as jnp

        from continuum_robot_tpu.control import (
            make_discrete_step,
            make_ekf,
            run_ekf,
        )

        model = self._nonlinear_model()
        nf = model.n_pos_states
        dt, T = 2e-5, 100
        step = make_discrete_step(model, dt)
        x0 = jnp.zeros(2 * nf).at[nf - 2].set(5e-4)
        xs_true = self._truth(model, x0, step, T)

        def h(x):
            # Quadratic sensor + a linear velocity channel (keeps the
            # deflection sign observable).
            return jnp.stack([x[nf - 2] ** 2 * 1e3, x[2 * nf - 2]])

        ys = jax.vmap(h)(xs_true)
        ekf = make_ekf(step, h, 1e-12 * np.eye(2 * nf), 1e-14 * np.eye(2))
        x_init = jnp.zeros(2 * nf).at[nf - 2].set(4e-4)  # warm-ish start
        (_, _), est = jax.jit(
            lambda y: run_ekf(ekf, x_init, 1e-8 * jnp.eye(2 * nf), y)
        )(ys)
        est = np.asarray(est)
        assert np.all(np.isfinite(est))
        err_tip = np.abs(est[:, nf - 2] - np.asarray(xs_true)[:, nf - 2])
        assert err_tip[-1] < 0.05 * np.abs(np.asarray(xs_true)[-1, nf - 2]) + 1e-9
