"""Output-feedback control: Kalman-Bucy estimation + LQG.

The reference's only controller is full-state LQR
(``control/linear_quadratic_regulator.py:5-200`` + ``full_state_linear.py``),
which assumes every state is measured. A physical continuum robot measures a
few outputs (tip position, a handful of strain/curvature sensors), so this
module adds the estimation layer on top of the same design machinery:

* :class:`LinearQuadraticEstimator` — steady-state Kalman-Bucy filter gain
  ``L`` from the dual CARE (``ops/care.lqe_gain``), with the same
  validation/caching/stability-raise contracts as the LQR class.
* :class:`LinearQuadraticGaussian` — LQR + LQE composition (the separation
  principle): observer dynamics, the control law ``u = K (r - x_hat)``
  (the :class:`FullStateLinear` convention), and a traceable closed-loop RHS
  over the augmented state ``[x; x_hat]`` for on-device rollouts with
  ``ops.integrators``.

Design solves run on the host in float64 (stiff-beam Hamiltonians are out of
f32 range — see ``ops/care.solve_care_numpy``); everything evaluated in the
simulation hot loop is pure jnp.
"""

from __future__ import annotations

import numpy as np

from ..ops import care
from .lqr import LinearQuadraticRegulator


def output_matrix(n_states: int, measured_states) -> np.ndarray:
    """Selection output matrix ``C``: ``y = C x`` reads the listed state indices.

    ``measured_states`` indexes into the full ``[q; v]`` state vector (so a
    tip-displacement sensor on an ``n``-DOF beam is index ``n_pos - 2``, and
    its velocity is ``n_pos + n_pos - 2``).
    """
    measured = np.atleast_1d(np.asarray(measured_states, dtype=int))
    if measured.ndim != 1 or len(measured) == 0:
        raise ValueError("measured_states must be a non-empty 1D index array")
    if np.any(measured < 0) or np.any(measured >= n_states):
        raise ValueError(
            f"measured_states indices must lie in [0, {n_states}) (got {measured})"
        )
    if len(np.unique(measured)) != len(measured):
        raise ValueError("measured_states indices must be unique")
    C = np.zeros((len(measured), n_states))
    C[np.arange(len(measured)), measured] = 1.0
    return C


class LinearQuadraticEstimator:
    """Steady-state Kalman-Bucy filter for a linear beam system.

    Built from the same ``(K_beam, M_beam)`` pair as the LQR class (the plant
    ``A = [[0, I], [-M^-1 K, 0]]``), an output matrix ``C`` (p, 2n), process
    noise covariance ``V`` (2n, 2n, PSD) and measurement noise covariance
    ``W`` (p, p, PD). ``compute_gain_matrix()`` returns ``L`` with stable
    error dynamics ``A - L C`` (raises otherwise — the estimator twin of the
    reference's closed-loop stability contract,
    ``linear_quadratic_regulator.py:185-189``).
    """

    def __init__(self, K_beam, M_beam, C, V, W):
        K_beam = np.asarray(K_beam)
        M_beam = np.asarray(M_beam)
        C = np.asarray(C)
        V = np.asarray(V)
        W = np.asarray(W)

        if K_beam.ndim != 2 or K_beam.shape[0] != K_beam.shape[1]:
            raise ValueError("Stiffness matrix must be square")
        if M_beam.ndim != 2 or M_beam.shape != K_beam.shape:
            raise ValueError(
                "Stiffness and mass matrices must have the same dimensions"
            )
        n2 = 2 * K_beam.shape[0]
        if C.ndim != 2 or C.shape[1] != n2:
            raise ValueError(
                f"C matrix must be (n_outputs, {n2}) for this beam"
            )
        if V.shape != (n2, n2):
            raise ValueError(f"V matrix must be ({n2}, {n2})")
        if W.shape != (C.shape[0], C.shape[0]):
            raise ValueError("W matrix dimension must match the output count")
        if np.any(np.linalg.eigvals(0.5 * (V + V.T)) < -1e-10):
            raise ValueError("V matrix must be positive semidefinite")
        if np.any(np.linalg.eigvals(0.5 * (W + W.T)) <= 1e-12):
            raise ValueError("W matrix must be positive definite")

        self.K_beam = K_beam
        self.M_beam = M_beam
        self.C = C
        self.V = V
        self.W = W
        self._A = None
        self._L = None
        self._P = None

    def get_A(self) -> np.ndarray:
        if self._A is None:
            from .lqr import beam_state_matrix

            self._A = beam_state_matrix(self.K_beam, self.M_beam)
        return self._A

    def compute_gain_matrix(self) -> np.ndarray:
        """Estimator gain ``L = P C' W^-1`` via the dual CARE (cached)."""
        if self._L is not None:
            return self._L
        A = self.get_A()
        try:
            L, P, _ = care.lqe_gain_numpy(A, self.C, self.V, self.W)
        except Exception as e:
            raise ValueError(f"Failed to solve LQE problem: {e}")
        if not np.all(np.isfinite(L)):
            raise ValueError("Failed to solve LQE problem: non-finite gain")
        eigenvals = np.linalg.eigvals(A - L @ self.C)
        if np.any(np.real(eigenvals) >= 0):
            raise ValueError(
                "LQE solution results in unstable estimator error dynamics"
            )
        self._L, self._P = L, P
        return self._L

    def get_L(self) -> np.ndarray:
        return self.compute_gain_matrix()


class LinearQuadraticGaussian:
    """LQG output-feedback controller: LQR gain + Kalman-Bucy observer.

    Composes a designed :class:`LinearQuadraticRegulator` and
    :class:`LinearQuadraticEstimator` over the same plant. By the separation
    principle the closed-loop spectrum is ``eig(A - B K) U eig(A - L C)``
    (asserted in the test suite).
    """

    def __init__(
        self,
        lqr: LinearQuadraticRegulator,
        lqe: LinearQuadraticEstimator,
    ):
        if lqr.K_beam.shape != lqe.K_beam.shape:
            raise ValueError("LQR and LQE must be designed for the same beam")
        if not (
            np.allclose(lqr.K_beam, lqe.K_beam)
            and np.allclose(lqr.M_beam, lqe.M_beam)
        ):
            raise ValueError("LQR and LQE must share the same K/M matrices")
        self.lqr = lqr
        self.lqe = lqe
        self.A = lqr.get_A()
        self.B = lqr.get_B()
        self.C = lqe.C
        self.K = lqr.compute_gain_matrix()
        self.L = lqe.compute_gain_matrix()

    # -- pure traceable pieces for jitted rollouts ---------------------------

    def control(self, x_hat, r=None):
        """``u = K (r - x_hat)`` (the :class:`FullStateLinear` convention)."""
        import jax.numpy as jnp

        K = jnp.asarray(self.K, dtype=jnp.asarray(x_hat).dtype)
        err = -x_hat if r is None else jnp.asarray(r) - x_hat
        return jnp.einsum("ij,...j->...i", K, err)

    def observer_rhs(self, x_hat, y, u):
        """``d x_hat/dt = A x_hat + B u + L (y - C x_hat)``."""
        import jax.numpy as jnp

        dt_ = jnp.asarray(x_hat).dtype
        A = jnp.asarray(self.A, dtype=dt_)
        B = jnp.asarray(self.B, dtype=dt_)
        C = jnp.asarray(self.C, dtype=dt_)
        L = jnp.asarray(self.L, dtype=dt_)
        innov = jnp.asarray(y) - jnp.einsum("ij,...j->...i", C, x_hat)
        return (
            jnp.einsum("ij,...j->...i", A, x_hat)
            + jnp.einsum("ij,...j->...i", B, u)
            + jnp.einsum("ij,...j->...i", L, innov)
        )

    def closed_loop_rhs(self, r=None):
        """Traceable RHS over the augmented state ``z = [x; x_hat]``.

        The plant sees only the observer-based control; the observer sees
        only the measured output ``y = C x``. Feed to ``ops.integrators``
        (broadcasts over leading batch axes; ``u`` hook of the integrators
        is unused — the control is internal).
        """
        import jax.numpy as jnp

        n = self.A.shape[0]

        def rhs(t, z, u_ext=None):
            x, x_hat = z[..., :n], z[..., n:]
            dt_ = z.dtype
            A = jnp.asarray(self.A, dtype=dt_)
            B = jnp.asarray(self.B, dtype=dt_)
            u = self.control(x_hat, r)
            if u_ext is not None:
                u = u + (u_ext(t) if callable(u_ext) else jnp.asarray(u_ext))
            dx = jnp.einsum("ij,...j->...i", A, x) + jnp.einsum(
                "ij,...j->...i", B, u
            )
            y = jnp.einsum("ij,...j->...i", jnp.asarray(self.C, dtype=dt_), x)
            dx_hat = self.observer_rhs(x_hat, y, u)
            return jnp.concatenate([dx, dx_hat], axis=-1)

        return rhs

    def make_closed_loop_propagator(self, dt: float, dtype=None):
        """Exact discrete propagator for the augmented closed loop.

        The LQG loop is LTI, so zero-order-hold discretization via the
        matrix exponential is exact and unconditionally stable at any frame
        spacing — the right rollout tool here, since cheap-control designs
        place closed-loop poles far beyond any explicit stepper's stability
        limit (the same trick as ``ops/exponential.make_expm_propagator``).

        Returns ``propagate(z0, r_frames, n_frames=None) -> (frames+1, ...,
        4n)`` over the augmented state ``z = [x; x_hat]``; ``r_frames`` has
        shape ``(frames, 2n)`` (per-frame reference, ZOH) or ``(2n,)`` — a
        constant reference, which then requires ``n_frames``.
        """
        import jax
        import jax.numpy as jnp

        from ..ops.exponential import discretize_lti

        if dtype is None:
            dtype = jnp.float32
        A_aug = self.augmented_matrix()
        BK = self.B @ self.K
        B_aug = np.concatenate([BK, BK], axis=0)  # reference feed-in
        Phi_np, Gamma_np = discretize_lti(A_aug, B_aug, dt)
        Phi = jnp.asarray(Phi_np, dtype=dtype)
        Gamma = jnp.asarray(Gamma_np, dtype=dtype)

        def propagate(z0, r_frames, n_frames=None):
            z0 = jnp.asarray(z0, dtype=dtype)
            r_frames = jnp.asarray(r_frames, dtype=dtype)
            if r_frames.ndim == 1:
                if n_frames is None:
                    raise ValueError(
                        "a constant (2n,) reference needs n_frames to set "
                        "the rollout length"
                    )
                r_frames = jnp.broadcast_to(
                    r_frames, (n_frames, *r_frames.shape)
                )

            def step(z, r_k):
                z_next = jnp.einsum("ij,...j->...i", Phi, z) + jnp.einsum(
                    "ij,...j->...i", Gamma, r_k
                )
                return z_next, z_next

            _, zs = jax.lax.scan(step, z0, r_frames)
            return jnp.concatenate([z0[None], zs], axis=0)

        return propagate

    def augmented_matrix(self) -> np.ndarray:
        """Closed-loop matrix over ``[x; x_hat]`` (host-side analysis).

        ``[[A, -B K], [L C, A - B K - L C]]`` — its spectrum must be
        ``eig(A - B K) U eig(A - L C)`` by separation.
        """
        A, B, C, K, L = self.A, self.B, self.C, self.K, self.L
        return np.block([[A, -B @ K], [L @ C, A - B @ K - L @ C]])
