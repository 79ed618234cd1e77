"""Generate golden parity data from the reference implementation.

Runs the pure-Python reference (``/root/reference/src``) and records:

* ``element_kernels.npz`` — reference linear K/M matrices and nonlinear
  f1..f6 outputs at random element states (``segments.py:8-472``).
* ``trajectories.npz`` — tight-tolerance LSODA trajectories
  (rtol 1e-10 / atol 1e-12) of the 6-segment Nitinol cantilever tip-impulse
  workload (``example_utilities.py:116-170``) for six force/element configs.
* ``lqr.npz`` — scipy CARE solution for the reference LQR design problem
  (``examples/lqr_control.py:59-66``; the reference's slycot backend is not
  available here, scipy's solver is the independent oracle).

The outputs are committed under ``tests/goldens/`` so the test suite never
needs the reference at runtime. Provenance: reference @ 2025-10-03.

Usage: python tools/make_goldens.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_DIR = os.path.join(REPO, "tests", "goldens")
REFERENCE_SRC = "/root/reference/src"

sys.path.insert(0, REFERENCE_SRC)
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import helpers  # noqa: E402  (tests/helpers.py — shared material constants)


def element_kernel_goldens():
    from continuum_robot.models.abstractions import Properties
    from continuum_robot.models.segments import LinearSegment, NonlinearSegment

    rng = np.random.default_rng(20251003)
    L = helpers.LENGTH / 6
    p_lin = Properties(
        L, helpers.E_MOD, helpers.M_INERTIA, helpers.DENSITY, helpers.CROSS_AREA,
        0, "linear",
    )
    p_nl = Properties(
        L, helpers.E_MOD, helpers.M_INERTIA, helpers.DENSITY, helpers.CROSS_AREA,
        0, "nonlinear",
    )
    lin = LinearSegment(p_lin)
    nl = NonlinearSegment(p_nl)
    f_nl = nl._calculate_segment_stiffness_function()

    qs = rng.normal(scale=0.02, size=(256, 6))
    fs = np.stack([f_nl(q) for q in qs])

    np.savez(
        os.path.join(GOLDEN_DIR, "element_kernels.npz"),
        length=L,
        K_linear=lin._calculate_segment_stiffness(),
        M_consistent=lin._calculate_segment_mass(),
        q_states=qs,
        nonlinear_forces=fs,
    )
    print("element_kernels.npz written")


def trajectory_goldens():
    from scipy.integrate import solve_ivp
    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as RefDyn,
    )
    from continuum_robot.models.force_params import ForceParams as RefFP

    configs = {
        "linear": (["linear"] * 6, {}),
        "nonlinear": (["nonlinear"] * 6, {}),
        "mixed": (["linear"] * 3 + ["nonlinear"] * 3, {}),
        "linear_fluid": (
            ["linear"] * 6,
            {"enable_fluid_effects": True, "fluid_density": 1000.0},
        ),
        "linear_gravity": (["linear"] * 6, {"enable_gravity_effects": True}),
        "nonlinear_fluid_gravity": (
            ["nonlinear"] * 6,
            {
                "enable_fluid_effects": True,
                "fluid_density": 1000.0,
                "enable_gravity_effects": True,
            },
        ),
    }

    t_final, dt = 0.1, 0.001
    out = {}
    for name, (types, fp_kw) in configs.items():
        csv = helpers.write_beam_csv(types)
        beam = RefDyn(csv, RefFP(**fp_kw))
        beam.create_system_func()
        beam.create_input_func()
        n = beam.beam_model.M.shape[0]
        x0 = np.zeros(2 * n)

        def u(t):
            v = np.zeros(n)
            if t < 0.01:
                v[-2] = 0.1
            return v

        dyn = beam.get_dynamic_system()
        sol = solve_ivp(
            lambda t, x: dyn(t, x, u(t)),
            (0, t_final),
            x0,
            method="LSODA",
            t_eval=np.arange(0, t_final + dt / 2, dt),
            rtol=1e-10,
            atol=1e-12,
        )
        assert sol.success
        out[f"{name}_t"] = sol.t
        out[f"{name}_y"] = sol.y
        os.unlink(csv)
        print(f"  {name}: nfev={sol.nfev} |y|max={np.abs(sol.y).max():.3e}")

    meta = dict(
        t_final=t_final,
        dt=dt,
        impulse_amplitude=0.1,
        impulse_t_end=0.01,
        rtol=1e-10,
        atol=1e-12,
        method="LSODA",
        reference="cram9030/continuum-robot @ 2025-10-03",
    )
    np.savez(os.path.join(GOLDEN_DIR, "trajectories.npz"), **out)
    with open(os.path.join(GOLDEN_DIR, "trajectories_meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print("trajectories.npz written")


def lqr_goldens():
    from scipy.linalg import solve_continuous_are
    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as RefDyn,
    )

    csv = helpers.write_beam_csv(["linear"] * 6)
    beam = RefDyn(csv)
    Kb = beam.beam_model.get_stiffness_matrix()
    Mb = beam.beam_model.get_mass_matrix()
    n = Kb.shape[0]
    # The reference LQR workload weights (examples/lqr_control.py:59-66).
    Q = np.eye(2 * n)
    Q[:n, :n] *= 100.0
    Q[n:, n:] *= 10.0
    R = np.eye(n)

    Minv = np.linalg.inv(Mb)
    A = np.zeros((2 * n, 2 * n))
    A[:n, n:] = np.eye(n)
    A[n:, :n] = -Minv @ Kb
    B = np.zeros((2 * n, n))
    B[n:, :] = Minv

    P = solve_continuous_are(A, B, Q, R)
    K = np.linalg.solve(R, B.T @ P)
    np.savez(
        os.path.join(GOLDEN_DIR, "lqr.npz"),
        K_beam=Kb, M_beam=Mb, Q=Q, R=R, P=P, K_gain=K,
    )
    os.unlink(csv)
    print("lqr.npz written")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    element_kernel_goldens()
    trajectory_goldens()
    lqr_goldens()
