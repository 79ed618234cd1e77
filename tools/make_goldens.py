"""Generate golden parity data from the reference implementation.

Runs the pure-Python reference (``/root/reference/src``) and records:

* ``element_kernels.npz`` — reference linear K/M matrices and nonlinear
  f1..f6 outputs at random element states (``segments.py:8-472``).
* ``trajectories.npz`` — tight-tolerance LSODA trajectories
  (rtol 1e-12 / atol 1e-14) of the Nitinol cantilever tip-impulse workload
  at the reference's FULL horizon — 1 s @ 1 ms output grid
  (``example_utilities.py:20-21, 153-159``) — for six 6-segment
  force/element configs PLUS one production-scale stiff config: the same
  1.5 m beam meshed with 60 elements (10x finer -> ~100x higher omega_max),
  exposing stiffness-accumulation effects the 6-segment configs cannot.
  The LTI configs (``linear``, ``stiff60``) are recorded via the exact ZOH
  flow of the reference-assembled system rather than LSODA (see
  ``exact_zoh_golden``).
* ``lqr.npz`` — scipy CARE solution for the reference LQR design problem
  (``examples/lqr_control.py:59-66``; the reference's slycot backend is not
  available here, scipy's solver is the independent oracle).
* ``lqr_closed_loop.npz`` — the full reference LQR workload trajectories
  (``examples/lqr_control.py:87-130``: 6-segment linear beam + gravity,
  10 N tip impulse, u = K(0 - x) feedback), uncontrolled AND controlled,
  integrated by the reference dynamics under LSODA at tight tolerance
  (the example itself runs rtol 1e-8; the golden is generated tighter so
  comparison error is ours, not the oracle's).

The outputs are committed under ``tests/goldens/`` so the test suite never
needs the reference at runtime. Provenance: reference @ 2025-10-03.

Usage: python tools/make_goldens.py [elements] [trajectories] [lqr] [lqr_cl]
(no args = all sections).
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


# Oracle tolerances. Measured: at rtol 1e-10 LSODA's own accumulated phase
# error on the undamped 1 s configs is ~5e-6 — ABOVE the 1e-6 parity bar the
# goldens exist to demonstrate (our Dopri5 self-converges to 4e-8 there).
# At 1e-12 the oracle error drops ~100x below the bar; Adams-order cost
# grows only ~ tol^(-1/k), so the runs stay tractable.
RTOL, ATOL = 1e-12, 1e-14
T_FINAL, DT = 1.0, 0.001  # the reference workload horizon/grid
# The stiff config: same 1.5 m Nitinol beam, 10x finer mesh.
STIFF_N = 60
STIFF_LEN = 6 * helpers.LENGTH / STIFF_N

TRAJ_CONFIGS = {
    "linear": (["linear"] * 6, {}, helpers.LENGTH),
    "nonlinear": (["nonlinear"] * 6, {}, helpers.LENGTH),
    "mixed": (["linear"] * 3 + ["nonlinear"] * 3, {}, helpers.LENGTH),
    "linear_fluid": (
        ["linear"] * 6,
        {"enable_fluid_effects": True, "fluid_density": 1000.0},
        helpers.LENGTH,
    ),
    "linear_gravity": (["linear"] * 6, {"enable_gravity_effects": True},
                       helpers.LENGTH),
    "nonlinear_fluid_gravity": (
        ["nonlinear"] * 6,
        {
            "enable_fluid_effects": True,
            "fluid_density": 1000.0,
            "enable_gravity_effects": True,
        },
        helpers.LENGTH,
    ),
    "stiff60": (["linear"] * STIFF_N, {}, STIFF_LEN),
}


def trajectory_goldens(only=None):
    """Generate trajectory goldens; each config CHECKPOINTS to its own
    ``_part_<name>.npz`` as soon as it finishes (multi-hour LSODA runs must
    not lose everything to a late failure), then all parts merge into
    ``trajectories.npz``. Re-running skips configs whose part file exists.
    """
    import time

    from scipy.integrate import solve_ivp
    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as RefDyn,
    )
    from continuum_robot.models.force_params import ForceParams as RefFP

    for name, (types, fp_kw, seg_len) in TRAJ_CONFIGS.items():
        if only is not None and name not in only:
            continue
        part = os.path.join(GOLDEN_DIR, f"_part_{name}.npz")
        if os.path.exists(part):
            print(f"  {name}: part exists, skipping", flush=True)
            continue
        if name in EXACT_ZOH_CONFIGS:
            exact_zoh_golden(name, types, seg_len)
            continue
        csv = helpers.write_beam_csv(types, length=seg_len)
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
        t0 = time.time()
        sol = solve_ivp(
            lambda t, x: dyn(t, x, u(t)),
            (0, T_FINAL),
            x0,
            method="LSODA",
            t_eval=np.arange(0, T_FINAL + DT / 2, DT),
            rtol=RTOL,
            atol=ATOL,
        )
        assert sol.success, f"{name}: {sol.message}"
        # Embed the oracle settings: merge refuses parts from an older
        # generation (a stale part silently mixed into trajectories.npz
        # once shipped an rtol-1e-10 golden whose own LSODA phase drift
        # exceeded the parity bar).
        np.savez(part, t=sol.t, y=sol.y, rtol=RTOL, atol=ATOL,
                 t_final=T_FINAL)
        os.unlink(csv)
        print(
            f"  {name}: nfev={sol.nfev} |y|max={np.abs(sol.y).max():.3e} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )

    merge_trajectory_parts()


# Configs whose reference dynamics are exactly LTI (all-linear elements,
# no registry forces): the golden is the exact ZOH flow, not LSODA.
EXACT_ZOH_CONFIGS = ("linear", "stiff60")


def exact_zoh_golden(name, types, seg_len):
    """Golden via the exact ZOH flow of the reference-assembled system.

    For an all-linear config with no registry forces the reference dynamics
    are exactly LTI: ``dx/dt = A x + B u`` with ``A = [[0, I], [-M^-1 K, 0]]``
    and ``B = [0; M^-1]`` built from the reference's own constrained matrices
    (``euler_bernoulli_beam.py:422-511`` stiffness, ``:358-362`` mass,
    ``dynamic_beam_model.py:294-330`` input map). The tip impulse is
    piecewise-constant on the 1 ms output grid (0.01 s = exactly 10
    frames), so the zero-order-hold discretization

        x_{k+1} = Phi x_k + Gamma u_k,  [Phi, Gamma] = expm([[A,B],[0,0]] h)

    samples the continuous reference solution EXACTLY (float64 expm
    roundoff only). This is a strictly tighter oracle than LSODA at any
    tolerance — and for the stiff60 mesh the only feasible one: its
    fastest mode (~1e6 rad/s) is undamped, so an error-controlled stepper
    must resolve every one of its ~160k oscillations over the 1 s horizon
    (measured: LSODA at rtol 1e-10 ran >2 h without completing 1 s).
    """
    import time

    from scipy.linalg import expm
    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as RefDyn,
    )

    part = os.path.join(GOLDEN_DIR, f"_part_{name}.npz")
    if os.path.exists(part):
        print(f"  {name}: part exists, skipping", flush=True)
        return
    t0 = time.time()
    csv = helpers.write_beam_csv(types, length=seg_len)
    beam = RefDyn(csv)
    K = beam.beam_model.get_stiffness_matrix()
    M = beam.beam_model.get_mass_matrix()
    os.unlink(csv)
    n = K.shape[0]
    Minv = np.linalg.inv(M)
    A = np.zeros((2 * n, 2 * n))
    A[:n, n:] = np.eye(n)
    A[n:, :n] = -Minv @ K
    B = np.zeros((2 * n, n))
    B[n:, :] = Minv
    aug = np.zeros((3 * n, 3 * n))
    aug[: 2 * n, : 2 * n] = A
    aug[: 2 * n, 2 * n :] = B
    E = expm(aug * DT)
    Phi, Gamma = E[: 2 * n, : 2 * n], E[: 2 * n, 2 * n :]

    n_frames = int(round(T_FINAL / DT))
    n_imp = int(round(0.01 / DT))
    u_imp = np.zeros(n)
    u_imp[-2] = 0.1
    g_imp = Gamma @ u_imp
    xs = np.zeros((n_frames + 1, 2 * n))
    for k in range(n_frames):
        xs[k + 1] = Phi @ xs[k] + (g_imp if k < n_imp else 0.0)
    t = np.arange(n_frames + 1) * DT
    np.savez(part, t=t, y=xs.T, method="exact_zoh", t_final=T_FINAL)
    print(
        f"  {name}: exact ZOH |y|max={np.abs(xs).max():.3e} "
        f"({time.time() - t0:.0f}s)",
        flush=True,
    )


def stiff_damped_golden():
    """Exact ZOH golden for the DAMPED stiff mesh: ``stiff60_damped.npz``.

    Same 60-element reference-assembled beam as ``stiff60``, with Rayleigh
    structural damping ``C = alpha M + beta K`` added to the reference's
    own constrained matrices. The reference has no structural damping
    (its only velocity coupling is the nonlinear fluid drag), so this
    golden validates the repo's ``rayleigh=(alpha, beta)`` extension — but
    the oracle construction is identical to :func:`exact_zoh_golden`:
    the system is exactly LTI (``A = [[0, I], [-M^-1 K, -M^-1 C]]``) and
    the tip impulse is piecewise-constant on the output grid, so the ZOH
    discretization samples the continuous flow exactly (f64 expm roundoff
    only). Written standalone (not merged into trajectories.npz) because
    the damped config is a repo extension, not a reference workload.
    """
    import time

    from scipy.linalg import expm
    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as RefDyn,
    )

    alpha, beta = 5.0, 1e-8  # zeta ~ 0.9% at the first mode, 0.5% at 1e6 rad/s
    t0 = time.time()
    csv = helpers.write_beam_csv(["linear"] * STIFF_N, length=STIFF_LEN)
    beam = RefDyn(csv)
    K = beam.beam_model.get_stiffness_matrix()
    M = beam.beam_model.get_mass_matrix()
    os.unlink(csv)
    n = K.shape[0]
    C = alpha * M + beta * K
    Minv = np.linalg.inv(M)
    A = np.zeros((2 * n, 2 * n))
    A[:n, n:] = np.eye(n)
    A[n:, :n] = -Minv @ K
    A[n:, n:] = -Minv @ C
    B = np.zeros((2 * n, n))
    B[n:, :] = Minv
    aug = np.zeros((3 * n, 3 * n))
    aug[: 2 * n, : 2 * n] = A
    aug[: 2 * n, 2 * n :] = B
    E = expm(aug * DT)
    Phi, Gamma = E[: 2 * n, : 2 * n], E[: 2 * n, 2 * n :]

    n_frames = int(round(T_FINAL / DT))
    n_imp = int(round(0.01 / DT))
    u_imp = np.zeros(n)
    u_imp[-2] = 0.1
    g_imp = Gamma @ u_imp
    xs = np.zeros((n_frames + 1, 2 * n))
    for k in range(n_frames):
        xs[k + 1] = Phi @ xs[k] + (g_imp if k < n_imp else 0.0)
    t = np.arange(n_frames + 1) * DT
    np.savez(
        os.path.join(GOLDEN_DIR, "stiff60_damped.npz"),
        t=t, y=xs.T, method="exact_zoh", t_final=T_FINAL, dt=DT,
        rayleigh_alpha=alpha, rayleigh_beta=beta,
        n_elements=STIFF_N, segment_length=STIFF_LEN,
        impulse_amplitude=0.1, impulse_t_end=0.01,
    )
    print(
        f"  stiff60_damped: exact ZOH |y|max={np.abs(xs).max():.3e} "
        f"({time.time() - t0:.0f}s)",
        flush=True,
    )


def merge_trajectory_parts():
    """Combine the per-config part files into trajectories.npz (+ meta)."""
    out = {}
    missing = []
    for name in TRAJ_CONFIGS:
        part = os.path.join(GOLDEN_DIR, f"_part_{name}.npz")
        if not os.path.exists(part):
            missing.append(name)
            continue
        d = np.load(part)
        # Generation guard: refuse parts whose recorded oracle settings
        # don't match this module's (or legacy parts with none recorded).
        if "method" in d:  # exact-ZOH part
            stale = float(d["t_final"]) != T_FINAL
        elif "rtol" in d:
            stale = (float(d["rtol"]) != RTOL or float(d["atol"]) != ATOL
                     or float(d["t_final"]) != T_FINAL)
        else:
            stale = True
        if stale:
            raise SystemExit(
                f"merge: {part} was generated with different oracle "
                "settings (or none recorded) — delete it and regenerate"
            )
        out[f"{name}_t"] = d["t"]
        out[f"{name}_y"] = d["y"]
    if missing:
        print(f"merge: waiting on parts for {missing}; trajectories.npz "
              "not written", flush=True)
        return

    meta = dict(
        t_final=T_FINAL,
        dt=DT,
        impulse_amplitude=0.1,
        impulse_t_end=0.01,
        rtol=RTOL,
        atol=ATOL,
        method="LSODA",
        stiff_n_elements=STIFF_N,
        stiff_segment_length=STIFF_LEN,
        exact_zoh_configs=list(EXACT_ZOH_CONFIGS),  # see exact_zoh_golden
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


def lqr_closed_loop_goldens():
    """Reference LQR workload trajectories (``examples/lqr_control.py``).

    Gain from the scipy CARE oracle (the reference's ``ct.lqr``/slycot path
    is just a CARE solve); dynamics are the actual reference beam WITH
    gravity; disturbance is the example's 10 N / 10 ms tip impulse; control
    is ``u = K (0 - x)`` (``full_state_linear.py:58``). Integrated at the
    module RTOL/ATOL (far tighter than the example's 1e-8 so the oracle
    error sits well below the parity bar).
    """
    import time

    from scipy.integrate import solve_ivp
    from scipy.linalg import solve_continuous_are
    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as RefDyn,
    )
    from continuum_robot.models.force_params import ForceParams as RefFP

    csv = helpers.write_beam_csv(["linear"] * 6)
    beam = RefDyn(csv, RefFP(enable_gravity_effects=True))
    beam.create_system_func()
    beam.create_input_func()
    Kb = beam.beam_model.get_stiffness_matrix()
    Mb = beam.beam_model.get_mass_matrix()
    n = Kb.shape[0]
    # Reference weights (lqr_control.py:59-66).
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
    K_gain = np.linalg.solve(R, B.T @ P)

    amplitude, duration = 10.0, 0.01  # lqr_control.py:282
    dyn = beam.get_dynamic_system()

    def rhs(t, x, controlled):
        u_vec = np.zeros(n)
        if t < duration:
            u_vec[-2] = amplitude
        if controlled:
            u_vec = u_vec + K_gain @ (np.zeros(2 * n) - x)
        return dyn(t, x, u_vec)

    out = {"K_gain": K_gain}
    for tag, controlled in [("uncontrolled", False), ("controlled", True)]:
        t0 = time.time()
        sol = solve_ivp(
            lambda t, x: rhs(t, x, controlled),
            (0, T_FINAL),
            np.zeros(2 * n),
            method="LSODA",
            t_eval=np.arange(0, T_FINAL + DT / 2, DT),
            rtol=RTOL,
            atol=ATOL,
        )
        assert sol.success, f"{tag}: {sol.message}"
        out[f"{tag}_t"] = sol.t
        out[f"{tag}_y"] = sol.y
        print(
            f"  lqr {tag}: nfev={sol.nfev} |y|max={np.abs(sol.y).max():.3e} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
    os.unlink(csv)
    np.savez(os.path.join(GOLDEN_DIR, "lqr_closed_loop.npz"), **out)
    print("lqr_closed_loop.npz written")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    sections = set(sys.argv[1:]) or {
        "elements", "trajectories", "stiff_damped", "lqr", "lqr_cl"
    }
    if "elements" in sections:
        element_kernel_goldens()
    for s in list(sections):
        if s.startswith("traj:"):  # e.g. traj:nonlinear,stiff60
            trajectory_goldens(only=s[5:].split(","))
    if "trajectories" in sections:
        trajectory_goldens()
    if "merge" in sections:
        merge_trajectory_parts()
    if "stiff_damped" in sections:
        stiff_damped_golden()
    if "lqr" in sections:
        lqr_goldens()
    if "lqr_cl" in sections:
        lqr_closed_loop_goldens()
