"""One-command parity report: this framework vs the reference implementation.

Runs on the CPU backend in float64 and prints a table of:

1. element-kernel max relative errors (linear K/M, nonlinear f1..f6),
2. full dynamic-system RHS errors on six force/element configurations,
3. golden trajectory errors (on-device Dopri5 vs committed tight-tolerance
   reference LSODA solutions),
4. LQR gain error vs the scipy CARE oracle.

Requires the reference checkout at /root/reference for (1)-(2); (3)-(4) use
committed goldens only. Usage: python tools/parity_report.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import helpers  # noqa: E402

REF = "/root/reference/src"
HAVE_REF = os.path.isdir(REF)
if HAVE_REF:
    sys.path.insert(0, REF)

ROWS = []


def row(section, name, value, bar=None):
    ok = "" if bar is None else ("  PASS" if value < bar else "  FAIL")
    ROWS.append(f"{section:<22} {name:<42} {value:.3e}{ok}")


def element_parity():
    g = np.load(os.path.join(REPO, "tests", "goldens", "element_kernels.npz"))
    from continuum_robot_tpu.models import elements

    K = np.asarray(elements.linear_stiffness_matrix(
        float(g["length"]), helpers.E_MOD, helpers.M_INERTIA, helpers.CROSS_AREA))
    row("element kernels", "linear stiffness vs reference",
        np.abs(K - g["K_linear"]).max() / np.abs(g["K_linear"]).max(), 1e-12)
    M = np.asarray(elements.consistent_mass_matrix(
        float(g["length"]), helpers.DENSITY, helpers.CROSS_AREA))
    row("element kernels", "consistent mass vs reference",
        np.abs(M - g["M_consistent"]).max() / np.abs(g["M_consistent"]).max(), 1e-12)
    f = np.asarray(elements.nonlinear_internal_force(
        g["q_states"], float(g["length"]), helpers.E_MOD, helpers.M_INERTIA,
        helpers.CROSS_AREA))
    row("element kernels", "nonlinear f1..f6 vs reference (256 states)",
        np.abs(f - g["nonlinear_forces"]).max() / np.abs(g["nonlinear_forces"]).max(),
        1e-9)


def rhs_parity():
    if not HAVE_REF:
        ROWS.append("rhs parity          (skipped: /root/reference not present)")
        return
    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as RefDyn,
    )
    from continuum_robot.models.force_params import ForceParams as RefFP
    from continuum_robot_tpu.models import (
        DynamicEulerBernoulliBeam as NewDyn,
        ForceParams as NewFP,
    )

    configs = [
        ("linear", ["linear"] * 6, {}),
        ("nonlinear", ["nonlinear"] * 6, {}),
        ("mixed", ["linear"] * 3 + ["nonlinear"] * 3, {}),
        ("linear+fluid", ["linear"] * 6,
         {"enable_fluid_effects": True, "fluid_density": 1000.0}),
        ("linear+gravity", ["linear"] * 6, {"enable_gravity_effects": True}),
        ("nonlinear+both", ["nonlinear"] * 6,
         {"enable_fluid_effects": True, "fluid_density": 1000.0,
          "enable_gravity_effects": True}),
    ]
    rng = np.random.default_rng(42)
    for name, types, fp in configs:
        csv = helpers.write_beam_csv(types)
        ref = RefDyn(csv, RefFP(**fp)); ref.create_system_func(); ref.create_input_func()
        new = NewDyn(csv, NewFP(**fp)); new.create_system_func(); new.create_input_func()
        n = ref.beam_model.M.shape[0]
        x = rng.normal(scale=1e-3, size=2 * n)
        u = rng.normal(scale=1e-2, size=n)
        a = ref.get_dynamic_system()(0.5, x, u)
        b = np.asarray(new.get_dynamic_system()(0.5, x, u))
        row("full RHS", name, np.abs(b - a).max() / np.abs(a).max(), 1e-10)
        os.unlink(csv)


def trajectory_parity():
    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam, ForceParams
    from continuum_robot_tpu.models.simulate import simulate

    data = np.load(os.path.join(REPO, "tests", "goldens", "trajectories.npz"))
    with open(os.path.join(REPO, "tests", "goldens", "trajectories_meta.json")) as f:
        meta = json.load(f)
    configs = {
        "linear": (["linear"] * 6, {}),
        "nonlinear": (["nonlinear"] * 6, {}),
        "mixed": (["linear"] * 3 + ["nonlinear"] * 3, {}),
        "linear_fluid": (["linear"] * 6,
                         {"enable_fluid_effects": True, "fluid_density": 1000.0}),
        "linear_gravity": (["linear"] * 6, {"enable_gravity_effects": True}),
        "nonlinear_fluid_gravity": (
            ["nonlinear"] * 6,
            {"enable_fluid_effects": True, "fluid_density": 1000.0,
             "enable_gravity_effects": True}),
    }
    horizon = meta["t_final"]
    for name, (types, fp) in configs.items():
        csv = helpers.write_beam_csv(types)
        beam = DynamicEulerBernoulliBeam(csv, ForceParams(**fp))
        n = beam.n_pos_states
        u = helpers.tip_impulse(n, meta["impulse_amplitude"], meta["impulse_t_end"])
        res = simulate(beam, np.zeros(2 * n), horizon, meta["dt"],
                       method="dopri5", u=u, rtol=1e-11, atol=1e-13)
        y_ref = data[f"{name}_y"]
        y_new = np.asarray(res.ys).T[:, : y_ref.shape[1]]
        row(f"trajectory ({horizon:g}s)", name,
            np.abs(y_new - y_ref).max() / np.abs(y_ref).max(), 1e-6)
        os.unlink(csv)

    # Production-scale stiff config: the same 1.5 m beam at 60 elements
    # (~100x higher omega_max). NOTE what this row checks: the repo's expm
    # propagator uses the same ZOH recurrence that generated the golden
    # (scipy expm of the assembled system), so its INTEGRATION error is
    # tautologically ~0. Its real content is that the repo's 60-element
    # K/M assembly + input map bit-match the reference's — independent
    # stepper validation on this mesh lives in stiff_stepper_parity().
    if "stiff60_y" in data:
        from continuum_robot_tpu.ops.exponential import make_expm_propagator
        import jax.numpy as jnp

        n_el = int(meta["stiff_n_elements"])
        csv = helpers.write_beam_csv(
            ["linear"] * n_el, length=meta["stiff_segment_length"]
        )
        beam = DynamicEulerBernoulliBeam(csv)
        n = beam.n_pos_states
        prop = make_expm_propagator(beam, meta["dt"], dtype=jnp.float64)
        n_frames = int(round(horizon / meta["dt"]))
        u_frames = np.zeros((n_frames, n))
        n_imp = int(round(meta["impulse_t_end"] / meta["dt"]))
        u_frames[:n_imp, -2] = meta["impulse_amplitude"]
        ys = np.asarray(prop(jnp.zeros(2 * n), jnp.asarray(u_frames)))
        y_ref = data["stiff60_y"]
        y_new = ys.T[:, : y_ref.shape[1]]
        row("assembly (60 el)", "stiff60 K/M + input map (same-recurrence ZOH)",
            np.abs(y_new - y_ref).max() / np.abs(y_ref).max(), 1e-6)
        os.unlink(csv)


def lqr_closed_loop_parity():
    """Full reference LQR workload: gravity beam, CARE gain, closed loop.

    Matches ``examples/lqr_control.py:87-130`` — uncontrolled and
    controlled trajectories vs the committed tight-tolerance LSODA golden
    (``tools/make_goldens.lqr_closed_loop_goldens``).
    """
    import jax.numpy as jnp

    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam, ForceParams
    from continuum_robot_tpu.models.simulate import simulate

    path = os.path.join(REPO, "tests", "goldens", "lqr_closed_loop.npz")
    if not os.path.exists(path):
        ROWS.append("LQR closed loop      (skipped: golden not present)")
        return
    g = np.load(path)
    csv = helpers.write_beam_csv(["linear"] * 6)
    beam = DynamicEulerBernoulliBeam(
        csv, ForceParams(enable_gravity_effects=True)
    )
    n = beam.n_pos_states
    K_gain = jnp.asarray(g["K_gain"])
    amplitude, duration = 10.0, 0.01
    base = jnp.zeros(n)
    tip = base.at[-2].set(amplitude)

    rhs = beam.build_rhs()
    from continuum_robot_tpu.ops import integrators

    for tag, controlled in [("uncontrolled", False), ("controlled", True)]:
        # The feedback force is state-dependent, so it rides inside the
        # rhs rather than through the t-only ``u`` channel.
        def rhs_cl(t, x, _u=None, controlled=controlled):
            dist = jnp.where(t < duration, tip, base)
            u_vec = dist
            if controlled:
                u_vec = u_vec - jnp.einsum("ij,...j->...i", K_gain, x)
            return rhs(t, x, u_vec)

        t_eval = jnp.arange(0.0, 1.0 + 5e-4, 1e-3)
        xs, _ = jax.jit(
            lambda x0, f=rhs_cl: integrators.integrate_adaptive(
                f, x0, t_eval, rtol=1e-11, atol=1e-13
            )
        )(jnp.zeros(2 * n, jnp.float64))
        y_ref = g[f"{tag}_y"]
        y_new = np.asarray(xs).T[:, : y_ref.shape[1]]
        row("LQR closed loop (1s)", tag,
            np.abs(y_new - y_ref).max() / np.abs(y_ref).max(), 1e-6)
    os.unlink(csv)


def modal_engine_parity():
    """Production stepping engines vs the reference LSODA goldens.

    Fixed-step generalized-alpha at h = 1e-5 s, measured on the TIP
    DISPLACEMENT trajectory — the observable the reference's own examples
    analyze (``extract_beam_shapes`` / FFT of the tip track). A full-state
    max-norm is dominated by the velocity phases of near-Nyquist modes
    (omega h ~ 0.5) that the impulse discontinuity excites; neither a
    fixed-step method nor LSODA resolves those modes, they only dissipate
    them differently (measured: 3e-2 full-state vs 7e-5 tip). ``modal`` is
    the exact diagonalized recurrence (linear beams); ``modal_rom`` runs
    the full basis (similarity of the dense modified-Newton path).
    """
    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
    from continuum_robot_tpu.models.simulate import simulate

    data = np.load(os.path.join(REPO, "tests", "goldens", "trajectories.npz"))
    with open(os.path.join(REPO, "tests", "goldens", "trajectories_meta.json")) as f:
        meta = json.load(f)
    for name, types, method in [
        ("linear tip track (modal engine)", ["linear"] * 6, "modal"),
        ("nonlinear tip track (modal-ROM)", ["nonlinear"] * 6, "modal_rom"),
    ]:
        csv = helpers.write_beam_csv(types)
        beam = DynamicEulerBernoulliBeam(csv)
        n = beam.n_pos_states
        u = helpers.tip_impulse(n, meta["impulse_amplitude"], meta["impulse_t_end"])
        res = simulate(beam, np.zeros(2 * n), meta["t_final"], meta["dt"],
                       method=method, u=u, substeps=100, n_newton=3,
                       rho_inf=0.95)
        key = "linear" if method == "modal" else "nonlinear"
        tip_ref = data[f"{key}_y"][n - 2, :]
        tip_new = np.asarray(res.ys).T[n - 2, : tip_ref.shape[0]]
        row("engine vs LSODA", name,
            np.abs(tip_new - tip_ref).max() / np.abs(tip_ref).max(), 5e-4)
        os.unlink(csv)


def adaptive_engine_parity():
    """Error-controlled engines vs the reference LSODA goldens.

    The direct LSODA-capability parity claim: no manual dt anywhere —
    ``generalized_alpha_adaptive`` (linear config) and
    ``modal_rom_adaptive`` (nonlinear config) integrate the reference
    workload to its 1 s horizon with rtol/atol as the only accuracy
    dials, measured on the tip-displacement track (see
    ``modal_engine_parity`` for why the tip is the right observable).
    """
    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
    from continuum_robot_tpu.models.simulate import simulate

    data = np.load(os.path.join(REPO, "tests", "goldens", "trajectories.npz"))
    with open(os.path.join(REPO, "tests", "goldens",
                           "trajectories_meta.json")) as f:
        meta = json.load(f)
    for name, types, method, kw in [
        ("linear tip track (adaptive gen-alpha)", ["linear"] * 6,
         "generalized_alpha_adaptive",
         dict(rtol=1e-8, atol=1e-11, rho_inf=0.95, n_newton=2,
              linear_solver="dense_inv")),
        ("nonlinear tip track (adaptive modal-ROM)", ["nonlinear"] * 6,
         "modal_rom_adaptive",
         dict(rtol=1e-8, atol=1e-11, rho_inf=0.95, n_newton=3)),
    ]:
        csv = helpers.write_beam_csv(types)
        beam = DynamicEulerBernoulliBeam(csv)
        n = beam.n_pos_states
        u = helpers.tip_impulse(n, meta["impulse_amplitude"],
                                meta["impulse_t_end"])
        res = simulate(beam, np.zeros(2 * n), meta["t_final"], meta["dt"],
                       method=method, u=u, **kw)
        key = "linear" if types[0] == "linear" else "nonlinear"
        tip_ref = data[f"{key}_y"][n - 2, :]
        tip_new = np.asarray(res.ys).T[n - 2, : tip_ref.shape[0]]
        row("adaptive vs LSODA", name,
            np.abs(tip_new - tip_ref).max() / np.abs(tip_ref).max(), 5e-4)
        os.unlink(csv)


def stiff_stepper_parity():
    """Independent validation of the production steppers on the stiff mesh.

    The stiff60 golden is the exact ZOH flow of the reference-assembled
    LTI system — a legitimate *independent* oracle for the steppers (they
    discretize the ODE; the golden samples its continuous flow exactly).
    Rows, all on the tip-displacement track:

    * adaptive generalized-alpha / SDIRK3 / fixed-step modal vs the
      undamped stiff60 golden at the full 1 s horizon;
    * modal + modal-ROM with Rayleigh damping vs the damped exact-ZOH
      golden (``stiff60_damped.npz``, the repo's damping extension on the
      reference-assembled matrices);
    * the NONLINEAR stiff mesh (consistent von Karman element — the
      reference's variationally inconsistent polynomials are linearly
      UNSTABLE at this refinement, max Re(eig) = +7.8e3 at q = 0; see
      PARITY.md): SDIRK3 tolerance self-convergence and gen-alpha
      cross-method agreement at 0.05 s. Explicit Dopri5 is NOT the oracle
      here — on the linear stiff60 mesh, Dopri5 at rtol 1e-10 shows ~47%
      tip error vs the exact ZOH flow (the error norm washes out the
      small-amplitude near-Nyquist ringing the tip impulse excites and the
      step settles at the stability boundary, where per-period phase error
      accumulates over ~40k periods) — printed as an informational row:
      the measured reason the implicit engines are the stiff answer.
    """
    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
    from continuum_robot_tpu.models.simulate import simulate

    data = np.load(os.path.join(REPO, "tests", "goldens", "trajectories.npz"))
    with open(os.path.join(REPO, "tests", "goldens",
                           "trajectories_meta.json")) as f:
        meta = json.load(f)
    n_el = int(meta["stiff_n_elements"])
    seg = meta["stiff_segment_length"]

    # --- undamped stiff60: steppers vs the exact ZOH golden, 1 s ---
    csv = helpers.write_beam_csv(["linear"] * n_el, length=seg)
    beam = DynamicEulerBernoulliBeam(csv)
    n = beam.n_pos_states
    u = helpers.tip_impulse(n, meta["impulse_amplitude"],
                            meta["impulse_t_end"])
    tip_ref = data["stiff60_y"][n - 2, :]
    sc = np.abs(tip_ref).max()
    for name, method, bar, kw in [
        ("stiff60 tip via adaptive gen-alpha (1s)",
         "generalized_alpha_adaptive", 1e-4,
         dict(rtol=1e-8, atol=1e-11, rho_inf=0.95, n_newton=2,
              linear_solver="dense_inv")),
        ("stiff60 tip via SDIRK3 (1s)", "sdirk3", 1e-4,
         dict(rtol=1e-8, atol=1e-11, n_newton=2)),
        ("stiff60 tip via modal h=1e-5 (1s)", "modal", 2e-3,
         dict(substeps=100, rho_inf=0.95)),
        ("stiff60 tip via explicit Dopri5@1e-10 (FYI: why implicit)",
         "dopri5", None, dict(rtol=1e-10, atol=1e-14)),
    ]:
        res = simulate(beam, np.zeros(2 * n), meta["t_final"], meta["dt"],
                       method=method, u=u, **kw)
        tip = np.asarray(res.ys).T[n - 2, : tip_ref.shape[0]]
        row("stiff steppers", name, np.abs(tip - tip_ref).max() / sc, bar)
    os.unlink(csv)

    # --- damped stiff60 (Rayleigh extension) vs its exact ZOH golden ---
    gpath = os.path.join(REPO, "tests", "goldens", "stiff60_damped.npz")
    if os.path.exists(gpath):
        g = np.load(gpath)
        csv = helpers.write_beam_csv(["linear"] * int(g["n_elements"]),
                                     length=float(g["segment_length"]))
        beam = DynamicEulerBernoulliBeam(csv)
        n = beam.n_pos_states
        u = helpers.tip_impulse(n, float(g["impulse_amplitude"]),
                                float(g["impulse_t_end"]))
        ray = (float(g["rayleigh_alpha"]), float(g["rayleigh_beta"]))
        tip_ref = g["y"][n - 2, :]
        sc = np.abs(tip_ref).max()
        for name, method in [
            ("stiff60 damped tip via modal+Rayleigh (1s)", "modal"),
            ("stiff60 damped tip via modal-ROM+Rayleigh (1s)", "modal_rom"),
        ]:
            res = simulate(beam, np.zeros(2 * n), float(g["t_final"]),
                           float(g["dt"]), method=method, u=u, rayleigh=ray,
                           substeps=100, rho_inf=0.95)
            tip = np.asarray(res.ys).T[n - 2, : tip_ref.shape[0]]
            row("stiff steppers", name, np.abs(tip - tip_ref).max() / sc, 1e-3)
        os.unlink(csv)

    # --- nonlinear stiff mesh (consistent element): cross-method ---
    csv = helpers.write_beam_csv(["nonlinear"] * n_el, length=seg)
    beam = DynamicEulerBernoulliBeam(csv, use_consistent_nonlinear=True)
    n = beam.n_pos_states
    u = helpers.tip_impulse(n, meta["impulse_amplitude"],
                            meta["impulse_t_end"])
    hz = 0.05
    runs = {}
    for tag, method, kw in [
        ("sdirk3@1e-8", "sdirk3", dict(rtol=1e-8, atol=1e-11, n_newton=3)),
        ("sdirk3@1e-10", "sdirk3", dict(rtol=1e-10, atol=1e-13, n_newton=3)),
        ("genalpha@1e-8", "generalized_alpha_adaptive",
         dict(rtol=1e-8, atol=1e-11, rho_inf=0.95, n_newton=3,
              linear_solver="dense_inv")),
    ]:
        res = simulate(beam, np.zeros(2 * n), hz, meta["dt"],
                       method=method, u=u, **kw)
        runs[tag] = np.asarray(res.ys).T[n - 2, :]
    ref = runs["sdirk3@1e-10"]
    sc = np.abs(ref).max()
    row("stiff steppers", "stiff60nl SDIRK3 self-convergence (0.05s)",
        np.abs(runs["sdirk3@1e-8"] - ref).max() / sc, 5e-5)
    row("stiff steppers", "stiff60nl gen-alpha vs SDIRK3 (0.05s)",
        np.abs(runs["genalpha@1e-8"] - ref).max() / sc, 5e-5)
    os.unlink(csv)


def lqr_parity():
    from continuum_robot_tpu.control import LinearQuadraticRegulator

    g = np.load(os.path.join(REPO, "tests", "goldens", "lqr.npz"))
    lqr = LinearQuadraticRegulator(g["K_beam"], g["M_beam"], g["Q"], g["R"])
    K = lqr.compute_gain_matrix()
    row("LQR", "gain vs scipy CARE oracle",
        np.abs(K - g["K_gain"]).max() / np.abs(g["K_gain"]).max(), 1e-3)
    row("LQR", "closed-loop max Re(eig) (must be < 0)",
        float(np.real(lqr._E).max()), 0.0)


if __name__ == "__main__":
    element_parity()
    rhs_parity()
    trajectory_parity()
    modal_engine_parity()
    adaptive_engine_parity()
    stiff_stepper_parity()
    lqr_parity()
    lqr_closed_loop_parity()
    print("\nPARITY REPORT — continuum-robot-tpu vs reference")
    print("=" * 86)
    for r in ROWS:
        print(r)
    print("=" * 86)
    n_fail = sum("FAIL" in r for r in ROWS)
    print(f"{len(ROWS)} checks, {n_fail} failures")
    sys.exit(1 if n_fail else 0)
