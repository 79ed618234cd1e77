"""LQR tip-position control demo (TPU-native).

Port of ``examples/lqr_control.py`` (reference): design an LQR controller
for the 6-segment linear cantilever with gravity (Q weights: positions x100,
velocities x10, R = I — reference :59-66), wrap the gain in
``FullStateLinear``, and compare the uncontrolled vs controlled impulse
response (settling time, peak displacement — reference :180-246).

The CARE gain solve runs on device (``ops/care.py``) instead of calling
slycot, and the closed-loop simulation folds the feedback law into the
compiled rollout.

Usage: python examples/lqr_control.py [--plot]
"""

from __future__ import annotations

import sys

import numpy as np

from example_utilities import create_beam_parameters, cleanup_temp_files

import jax.numpy as jnp

from continuum_robot_tpu.control import FullStateLinear, LinearQuadraticRegulator
from continuum_robot_tpu.models import DynamicEulerBernoulliBeam, ForceParams
from continuum_robot_tpu.models.simulate import simulate


def design_lqr_controller(beam):
    """Reference :46-84: dense K/M -> LQR -> FullStateLinear handler."""
    K_beam = beam.beam_model.get_stiffness_matrix()
    M_beam = beam.beam_model.get_mass_matrix()
    n = K_beam.shape[0]
    Q = np.eye(2 * n)
    Q[:n, :n] *= 100.0
    Q[n:, n:] *= 10.0
    R = np.eye(n)
    lqr = LinearQuadraticRegulator(K_beam, M_beam, Q, R)
    gain = lqr.compute_gain_matrix()
    print(f"LQR gain: {gain.shape}, closed-loop max Re(eig) = "
          f"{np.real(lqr._E).max():.2f}")
    return FullStateLinear(gain), lqr


def simulate_system(beam, controller, impulse_amplitude=0.1, t_final=0.5, dt=0.001):
    """Reference :87-130: impulse + optional feedback, tight-tol rollout."""
    import jax

    x64 = jax.config.jax_enable_x64
    rtol, atol = (1e-8, 1e-10) if x64 else (1e-5, 1e-8)
    n = beam.n_pos_states
    x0 = np.zeros(2 * n)
    tip = jnp.zeros(n).at[-2].set(impulse_amplitude)

    def disturbance(t):
        return jnp.where(t < 0.01, tip, jnp.zeros(n))

    if controller is None:
        forces_func = None
    else:
        Kg = jnp.asarray(controller.gain_matrix)

        def forces_func(x, t):
            # u = K (r - x) with r = 0: pure regulation.
            return -jnp.einsum("ij,...j->...i", Kg, x)

    return simulate(
        beam, x0, t_final, dt, method="dopri5", u=disturbance,
        forces_func=forces_func, rtol=rtol, atol=atol,
    )


def calculate_settling_time(ts, tip, threshold=0.02):
    """Reference :227-246: time to stay within threshold*peak."""
    peak = np.abs(tip).max()
    bound = threshold * peak
    outside = np.where(np.abs(tip) > bound)[0]
    if len(outside) == 0:
        return 0.0
    last = outside[-1]
    return float(ts[min(last + 1, len(ts) - 1)])


def main():
    linear_file, _, _ = create_beam_parameters()
    beam = DynamicEulerBernoulliBeam(
        linear_file, ForceParams(enable_gravity_effects=True)
    )

    controller, lqr = design_lqr_controller(beam)

    print("Simulating uncontrolled system...")
    res_open = simulate_system(beam, None)
    print("Simulating controlled system...")
    res_closed = simulate_system(beam, controller)

    n = beam.n_pos_states
    ts = np.asarray(res_open.ts)
    tip_open = np.asarray(res_open.ys)[:, n - 2]
    tip_closed = np.asarray(res_closed.ys)[:, n - 2]

    print("\nRESULTS")
    print(f"  peak |tip| uncontrolled: {np.abs(tip_open).max():.4e} m")
    print(f"  peak |tip| controlled:   {np.abs(tip_closed).max():.4e} m")
    print(f"  settling time uncontrolled: {calculate_settling_time(ts, tip_open):.3f} s")
    print(f"  settling time controlled:   {calculate_settling_time(ts, tip_closed):.3f} s")

    if "--plot" in sys.argv:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 5))
        ax.plot(ts, tip_open, label="uncontrolled")
        ax.plot(ts, tip_closed, label="LQR controlled")
        ax.set(xlabel="t [s]", ylabel="tip w [m]")
        ax.legend()
        fig.tight_layout()
        fig.savefig("lqr_control.png", dpi=120)
        print("wrote lqr_control.png")

    cleanup_temp_files(linear_file)


if __name__ == "__main__":
    main()
