"""LQG output-feedback control demo (no reference counterpart).

Extends the LQR workload (``examples/lqr_control.py``, reference
``examples/lqr_control.py``) to the physically realizable setting: the
controller may only *measure a few outputs* (tip displacement/velocity) and
*actuate a few DOFs* (tip axial + transverse forces), instead of the
reference's full-state measurement and an actuator on every DOF.

Pipeline:
  1. actuator-subset LQR gain (``input_dofs``) via the host CARE path;
  2. Kalman-Bucy estimator gain from the dual CARE (``ops/care.lqe_gain``);
  3. exact ZOH rollout of the augmented closed loop ``[x; x_hat]`` on device
     (cheap-control poles are far beyond explicit-stepper stability limits).

Reports regulation performance (uncontrolled vs LQG) and observer
convergence from a cold start.

Usage: python examples/lqg_control.py [--plot]
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

from continuum_robot_tpu.control import (
    LinearQuadraticEstimator,
    LinearQuadraticGaussian,
    LinearQuadraticRegulator,
    output_matrix,
)
from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.ops.exponential import discretize_lti

from example_utilities import cleanup_temp_files, create_beam_parameters


def build_plant():
    files = create_beam_parameters()  # (linear, nonlinear, mixed) CSVs
    beam = DynamicEulerBernoulliBeam(files[0])
    K_beam = beam.beam_model.get_stiffness_matrix()
    M_beam = beam.beam_model.get_mass_matrix()
    cleanup_temp_files(*files)
    return K_beam, M_beam


def design_lqg(K_beam, M_beam):
    nf = K_beam.shape[0]
    # Actuators: tip axial + tip transverse force. (Transverse-only subsets
    # are structurally non-stabilizable: the linear element decouples axial
    # and bending, leaving the axial modes undamped and unreachable.)
    act = [nf - 3, nf - 2]
    Q = np.diag([100.0] * nf + [10.0] * nf)
    R = 1e-8 * np.eye(len(act))
    lqr = LinearQuadraticRegulator(K_beam, M_beam, Q, R, input_dofs=act)
    lqr.compute_gain_matrix()

    # Sensors: tip axial/transverse displacement and velocity.
    meas = [nf - 3, nf - 2, 2 * nf - 3, 2 * nf - 2]
    C = output_matrix(2 * nf, meas)
    V = 1e-2 * np.eye(2 * nf)  # process noise: unmodeled distributed load
    W = 1e-8 * np.eye(len(meas))  # measurement noise: good tip sensing
    lqe = LinearQuadraticEstimator(K_beam, M_beam, C, V, W)
    lqe.compute_gain_matrix()

    lqg = LinearQuadraticGaussian(lqr, lqe)
    ev = np.linalg.eigvals(lqg.augmented_matrix())
    print(
        f"LQG design: {len(act)} actuators, {len(meas)} sensors, "
        f"closed-loop max Re(eig) = {np.real(ev).max():.2f}"
    )
    return lqg


def main():
    K_beam, M_beam = build_plant()
    nf = K_beam.shape[0]
    lqg = design_lqg(K_beam, M_beam)

    dt, t_final = 1e-3, 2.0
    n_frames = int(round(t_final / dt))

    # Initial condition: tip deflected 1 mm; the observer starts cold (zero).
    z0 = jnp.zeros(4 * nf).at[nf - 2].set(1e-3)
    propagate = lqg.make_closed_loop_propagator(dt, dtype=jnp.float64)
    zs = jax.jit(propagate)(z0, jnp.zeros((n_frames, 2 * nf)))
    zs = np.asarray(zs)

    # Uncontrolled comparison: exact ZOH of the open-loop plant.
    Phi_ol, _ = discretize_lti(lqg.A, lqg.B, dt)
    x_ol = np.zeros((n_frames + 1, 2 * nf))
    x_ol[0, nf - 2] = 1e-3
    for k in range(n_frames):
        x_ol[k + 1] = Phi_ol @ x_ol[k]

    ts = dt * np.arange(n_frames + 1)
    x = zs[:, : 2 * nf]
    err = x - zs[:, 2 * nf :]
    tip_cl = x[:, nf - 2]
    tip_ol = x_ol[:, nf - 2]

    def settle(tip, threshold=0.02):
        bound = threshold * np.abs(tip).max()
        outside = np.where(np.abs(tip) > bound)[0]
        return 0.0 if len(outside) == 0 else float(ts[min(outside[-1] + 1, len(ts) - 1)])

    print("\nRESULTS")
    print(f"  tip |w| at t={t_final:.1f}s  uncontrolled: {abs(tip_ol[-1]):.4e} m")
    print(f"  tip |w| at t={t_final:.1f}s  LQG:          {abs(tip_cl[-1]):.4e} m")
    print(f"  settling time uncontrolled: {settle(tip_ol):.3f} s")
    print(f"  settling time LQG:          {settle(tip_cl):.3f} s")
    print(
        f"  observer error ||x - x_hat||: {np.linalg.norm(err[0]):.3e} -> "
        f"{np.linalg.norm(err[-1]):.3e}"
    )

    if "--plot" in sys.argv:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, figsize=(10, 7), sharex=True)
        axes[0].plot(ts, tip_ol, label="uncontrolled")
        axes[0].plot(ts, tip_cl, label="LQG (2 actuators, 4 sensors)")
        axes[0].set(ylabel="tip w [m]")
        axes[0].legend()
        axes[1].semilogy(ts, np.linalg.norm(err, axis=1))
        axes[1].set(xlabel="t [s]", ylabel="||x - x_hat||")
        fig.tight_layout()
        fig.savefig("lqg_control.png", dpi=120)
        print("wrote lqg_control.png")


if __name__ == "__main__":
    main()
