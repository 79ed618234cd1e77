"""Headline benchmark: batched implicit stepping of a 1k-element beam on TPU.

Workload (BASELINE.json): a 1000-element linear Euler-Bernoulli cantilever
(the reference's Nitinol material at matching total length), 4096 concurrent
environments, implicit Newmark-beta stepping at dt=1e-4 s with the effective
Jacobian prefactored to a dense inverse applied on the MXU. This is the
production rollout configuration — unconditionally stable at a dt four
orders of magnitude above the mesh's explicit stability limit.

Baseline: the reference evaluates its ODE right-hand side in pure Python
(sequential per-segment loop, ``euler_bernoulli_beam.py:181-195``) at
57.6 ms/eval for 1000 linear elements on this host (measured 2026-08-16;
single env, one eval is the *cheapest possible* reference step — LSODA takes
several evals plus dense LU factorizations per accepted step). We compare
env-steps/sec: ours = envs x steps / wall, baseline = 17.4 eval/s x 1 env.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Reference single-env RHS throughput at 1000 linear elements (evals/sec),
# measured on this host (see module docstring). One implicit step >= one RHS
# eval, so this favors the reference. `python bench.py --measure-baseline`
# (or BENCH_MEASURE_BASELINE=1) re-measures this in-situ by importing and
# timing the actual reference RHS from /root/reference/src, making
# `vs_baseline` self-verifying instead of frozen.
REF_EVALS_PER_SEC = 17.4

N_ELEMENTS = int(os.environ.get("BENCH_ELEMENTS", 1000))
N_ENVS = int(os.environ.get("BENCH_ENVS", 4096))
# 2000 steps = a 0.2 s span at dt=1e-4 (the reference's sims run 1 s
# horizons, example_utilities.py:20-21); long spans amortize the one-time
# modal layout transforms the way real rollouts do.
N_STEPS = int(os.environ.get("BENCH_STEPS", 2000))
BEAM_TYPE = os.environ.get("BENCH_TYPE", "linear")  # linear | nonlinear
# "highest" = true f32 (default, parity-grade); "high" = 3-pass bf16, ~1.9x
# faster at a measured ~1.4%/400-step trajectory drift (sweep-grade).
PRECISION = os.environ.get("BENCH_PRECISION", "highest")
# ROM basis size for ENGINE=modal_rom (nonlinear reduced-order engine).
N_MODES = int(os.environ.get("BENCH_MODES", 256))
# MXU precision of the ROM's correction-force basis transforms alone (the
# per-step cost). The linear force rides the exact diagonal reduced operator
# (force split, ModalROMGenAlpha), so transform rounding errors scale with
# the small nonlinear correction, not the full force. Measured on TPU at a
# LARGE deflection (0.32 m tip, 2000 steps), XLA engine: "high" (3-pass
# bf16) tracks "highest" to 3.8e-5 relative at 7.90M env-steps/s (default);
# "default" (1-pass bf16) hits 10.7M at 9.7e-2 — the sweep-grade dial;
# "highest" disables the dial (5.73M). ENGINE=modal_rom_pallas (fused
# whole-span kernel, 256-lane env tiles): 11.7M at "high" (manual
# hi/lo-bf16 3-pass, 1.1e-5), 19.4M at "default", 8.5M at "highest" —
# 1.5-1.8x the XLA engine per tier.
NL_PRECISION = os.environ.get("BENCH_NL_PRECISION", "high")
# Stepping engine for the linear benchmark:
#   "modal_power" (default) — the composed-propagator drive: the linear
#     gen-α step is an exact per-mode affine map, so K steps compose
#     (host f64, memoized per instance) into ONE map applied per K steps
#     — ~K-fold less arithmetic for the SAME discrete trajectory; the
#     whole-span deviation vs the bit-exact stepper is measured per run
#     and reported as vs_stepper_rel (1.8e-05 on the bench workload).
#     BENCH_K sets the depth (default 64 — the measured optimum).
#   "modal_pallas" — the per-step recurrence as a fused Pallas kernel
#     with the modal state resident in VMEM across all steps
#     (bit-identical to "modal" on hardware; 46x the dense path).
#   "modal" — the same diagonalized recurrence via XLA (one HBM roundtrip
#     per step; 10.5x dense). Exact modal superposition either way — the
#     same recurrence, not an approximation: 4.2e-4 relative f32 agreement
#     with "dense" over 400 steps.
#   "dense" — the general-operator path (always used for nonlinear).
ENGINE = os.environ.get(
    "BENCH_ENGINE", "modal_power" if BEAM_TYPE == "linear" else "dense"
)
DT = 1e-4
# Reference nonlinear RHS: 129.2 ms/eval (7.7 evals/s), same host/date.
REF_EVALS_PER_SEC_NONLINEAR = 7.7
# Nonlinear FULL-ORDER rows (dense / sharded-SPIKE / adaptive) integrate the
# variationally CONSISTENT von Karman element (use_consistent_nonlinear) by
# default. The reference-parity polynomials are non-conservative (f != dU/dq
# — a reference quirk preserved by design, PARITY.md) and under the bench's
# sustained tip load the resulting ODE is GENUINELY unstable: the reference
# itself, our dopri5 at rtol=1e-8, the dense gen-alpha, and the sharded
# SPIKE engine all diverge on the same trajectory (engine-independent to
# 1e-7; root-caused in tools/repros/diag_nl_{matrix,reference}.py — this
# was round 3's FAILED sharded-NL hardware row reaching f32 overflow).
# A throughput row must integrate a well-posed ODE to be meaningful over
# arbitrary horizons; the consistent element has the same cubic polynomial
# structure and cost class. BENCH_CONSISTENT=0 restores the parity element
# (bounded-horizon runs only). ROM rows keep the parity element: their
# basis truncation + dissipation keep the bench horizon bounded.
BENCH_CONSISTENT = os.environ.get("BENCH_CONSISTENT", "1") == "1"


def beam_tag(model) -> str:
    """Row label for the element variant actually integrated."""
    if getattr(model, "use_consistent_nonlinear", False):
        return f"{BEAM_TYPE} (consistent-vK)"
    return BEAM_TYPE
# BENCH_TOL=<rtol>: run the ERROR-CONTROLLED implicit engine instead of the
# fixed-dt recurrence — adaptive generalized-alpha (Zienkiewicz-Xie estimate
# + PI control) picks every step size from the tolerance; dt above becomes
# just the output-frame grid. The verdict's answer to "dt=1e-4 with no
# evidence mechanism": state a tolerance, get the dt that meets it.
BENCH_TOL = os.environ.get("BENCH_TOL")
# Steps fused per scan iteration on the XLA engines (modal / modal_rom).
# The scan carry roundtrips HBM once per ITERATION, so on the memory-bound
# engines (XLA modal at 0.77 of HBM, ECSW at 0.87 — NOTES_r2) unrolling
# divides the compulsory carry traffic by this factor. Identical per-step
# arithmetic; no effect on the fused-Pallas engines (carry already
# VMEM-resident).
UNROLL = int(os.environ.get("BENCH_UNROLL", 1))

# BENCH_CARRY=bf16 stores the XLA-engine scan carry in bfloat16 (compute
# stays f32): halves the compulsory carry traffic at one bf16 rounding of
# the state per UNROLL steps. The bench quantifies the cost alongside the
# gain: the JSON gains carry_drift_rel = relative endpoint deviation vs
# the f32-carry run over the same 2 x N_STEPS horizon.
CARRY = os.environ.get("BENCH_CARRY")

# BENCH_FORCES=1 registers the reference's flagship force pair (fluid drag
# at 1000 kg/m^3 + gravity, reference beam_comparison_fluid.py /
# beam_comparison_gravity.py) on the benchmark beam. On the modal-ROM
# engine they ride the split fast path as exact reduced corrections
# (``ext_modal``), so this row measures the reference's core force-coupled
# use case at the throughput tier instead of the dense fallback
# (VERDICT r3 item 4). XLA split engine only — the fused Pallas kernel
# refuses external forces by contract.
FORCES = os.environ.get("BENCH_FORCES") == "1"


def roofline_fields(cost, wall_s, tier="f32", model_tag="xla"):
    """Utilization block for the bench JSON (verdict: auditable FLOP/s).

    ``cost``: {"flops", "bytes"} for the WHOLE timed program (one rollout
    call), from XLA cost analysis or an analytic count; ``model_tag`` says
    which. Ceilings are measured on-device right here (BENCH_ROOFLINE=0
    skips the whole block). Returns {} when skipped or unavailable.
    """
    if os.environ.get("BENCH_ROOFLINE", "1") != "1" or cost is None:
        return {}
    from continuum_robot_tpu.utils.roofline import (
        measure_ceilings,
        utilization,
    )

    ceilings = measure_ceilings(quick=os.environ.get("BENCH_QUICK") == "1")
    util = utilization(cost["flops"], cost["bytes"], wall_s, ceilings, tier)
    extra_bytes = (
        {"hbm_gbps_logical": round(cost["bytes_logical"] / wall_s / 1e9, 2)}
        if "bytes_logical" in cost
        else {}
    )
    return {
        "flops_per_sec": round(util["flops_per_sec"], 1),
        "hbm_gbps": round(util["hbm_gbps"], 2),
        **extra_bytes,
        "roofline_frac": round(util["roofline_frac"], 4),
        "bound": util["bound"],
        "cost_model": model_tag,
        "ceiling_mxu_f32_tflops": round(ceilings["mxu_f32_flops"] / 1e12, 2),
        "ceiling_mxu_bf16_tflops": round(
            ceilings["mxu_bf16_flops"] / 1e12, 2
        ),
        "ceiling_vpu_f32_tflops": round(ceilings["vpu_f32_flops"] / 1e12, 2),
        "ceiling_hbm_gbps": round(ceilings["hbm_bytes_per_sec"] / 1e9, 1),
    }


def measure_baseline(n_elements: int, beam_type: str):
    """Time the actual reference RHS (``/root/reference/src``) on this host.

    Builds the same ``n_elements``-element cantilever the benchmark runs
    (reference ``dynamic_beam_model.py`` / ``euler_bernoulli_beam.py:181-195``
    sequential-loop RHS) and returns measured single-env evals/sec, or None
    when the reference checkout is absent (frozen constants then apply).
    """
    ref_src = os.environ.get("REFERENCE_SRC", "/root/reference/src")
    if not os.path.isdir(ref_src):
        print(
            f"# --measure-baseline: no reference at {ref_src}; "
            "using frozen constants",
            file=sys.stderr,
        )
        return None
    sys.path.insert(0, ref_src)
    import tempfile

    import pandas as pd
    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as RefDyn,
    )

    L_el, E, r, rho = 0.25 / 6, 75e9, 0.005, 6450.0
    I = np.pi * r**4 / 4
    A = np.pi * r**2
    df = pd.DataFrame(
        {
            "length": [L_el] * n_elements,
            "elastic_modulus": [E] * n_elements,
            "moment_inertia": [I] * n_elements,
            "density": [rho] * n_elements,
            "cross_area": [A] * n_elements,
            "type": [beam_type] * n_elements,
            "boundary_condition": ["FIXED"] + ["NONE"] * (n_elements - 1),
        }
    )
    t_build = time.time()
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        df.to_csv(f.name, index=False)
        csv_path = f.name
    try:
        model = RefDyn(csv_path)
    finally:
        os.unlink(csv_path)
    model.create_system_func()
    model.create_input_func()
    dyn = model.get_dynamic_system()
    n = model.beam_model.M.shape[0]
    rng = np.random.default_rng(0)
    x = rng.normal(scale=1e-6, size=2 * n)
    u = np.zeros(n)
    u[-2] = 0.1
    t_build = time.time() - t_build

    dyn(0.0, x, u)  # warm caches
    n_evals, t0 = 0, time.time()
    while (time.time() - t0 < 3.0 or n_evals < 3) and n_evals < 100:
        dyn(0.0, x, u)
        n_evals += 1
    wall = time.time() - t0
    evals_per_sec = n_evals / wall
    print(
        f"# --measure-baseline: reference {beam_type} RHS at {n_elements} "
        f"elements: {1e3 * wall / n_evals:.1f} ms/eval = "
        f"{evals_per_sec:.2f} evals/s ({n_evals} evals; model build "
        f"{t_build:.1f} s)",
        file=sys.stderr,
    )
    return evals_per_sec


def run_modal(jax, jnp, model, n_red, use_pallas=True):
    """Linear benchmark on the modal generalized-alpha engine.

    Identical recurrence to the dense path, diagonalized per mode: the
    per-step work is 8 fused multiply-adds per element on (envs, modes)
    arrays (mode_coeffs substituted update) instead of three
    (3N x 3N) @ (3N x envs) matmuls. With ``use_pallas`` the whole
    span runs as one fused kernel with the modal state resident in VMEM
    (bit-identical results; HBM touched once per span instead of per step).
    """
    import time as _time

    from continuum_robot_tpu.models.simulate import make_modal_genalpha

    RHO_INF = 0.8
    ms = make_modal_genalpha(model, DT, rho_inf=RHO_INF)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(scale=1e-6, size=(N_ENVS, n_red)), jnp.float32)
    v = jnp.zeros((N_ENVS, n_red), jnp.float32)
    u = jnp.zeros(n_red, jnp.float32).at[-2].set(0.1)

    eta, etad = jax.jit(ms.to_modal)(q, v)
    u_m = ms.project_force(u)
    if use_pallas:
        # Interpret on CPU so BENCH_PLATFORM=cpu smoke runs work.
        interp = jax.default_backend() == "cpu"

        def roll(e, ed):
            return ms.rollout_pallas(e, ed, u_m, N_STEPS, interpret=interp)

    else:
        roll = jax.jit(
            lambda e, ed: ms.rollout(e, ed, u_m, N_STEPS, unroll=UNROLL)
        )

    # Sync via a scalar host read: on the axon backend block_until_ready()
    # does NOT await Pallas custom-call completion (measured: it reports
    # ~1 ms for a 2000-step kernel whose true device time is ~250 ms), so
    # every timing here forces a value to the host instead.
    e1, ed1, _ = roll(eta, etad)
    float(jnp.sum(e1))
    t0 = _time.time()
    e2, ed2, _ = roll(e1, ed1)
    float(jnp.sum(e2))
    wall = _time.time() - t0

    q2, _ = jax.jit(ms.from_modal)(e2, ed2)
    assert bool(jnp.all(jnp.isfinite(q2))), "non-finite states in benchmark"

    env_steps_per_sec = N_STEPS * N_ENVS / wall
    engine = "fused-Pallas modal" if use_pallas else "modal"
    # Work model: XLA's cost analysis of ONE STEP of the identical-
    # recurrence XLA engine, scaled by the step count (cost_analysis counts
    # a scan body once regardless of trip count — see scan_program_cost).
    # The Pallas kernel is a custom call XLA cannot analyze; it runs the
    # same arithmetic with fewer HBM roundtrips, so the XLA count is a
    # faithful FLOP model and a conservative byte model.
    from continuum_robot_tpu.utils.roofline import scan_program_cost

    step = ms._step_fn(jnp.asarray(eta).dtype, u_m)
    cost = scan_program_cost(
        step, (e1, ed1, e1), jnp.asarray(0.0, jnp.asarray(eta).dtype), N_STEPS
    )
    model_tag = "xla" if not use_pallas else "xla-twin"
    if cost is not None:
        state_bytes = 3 * int(np.prod(jnp.asarray(eta).shape)) * eta.dtype.itemsize
        if use_pallas:
            # The fused kernel keeps the (eta, etad, etadd) carry in VMEM
            # for the whole span: actual HBM traffic is the carry in + out
            # once per ROLLOUT (plus O(modes) constants), not once per
            # step. The per-step byte model is the XLA twin's — ~1000x
            # overstated here — so swap in the analytic traffic.
            cost = {"flops": cost["flops"], "bytes": 2.0 * state_bytes}
            model_tag = "xla-twin-flops/analytic-bytes"
        else:
            # XLA cost_analysis bytes are logical accesses (fusion keeps
            # most off HBM); use the per-step compulsory IO (carry in+out
            # + coefficient columns) as the physical floor and report the
            # logical count alongside (see run_modal_rom for rationale).
            col_bytes = 3 * int(jnp.asarray(eta).shape[-1]) * 4
            # With unroll=K the carry roundtrips HBM once per K fused
            # steps; the coefficient columns still stream once per body.
            cost = {
                "flops": cost["flops"],
                "bytes": (2.0 * state_bytes + col_bytes) * N_STEPS / UNROLL,
                "bytes_logical": cost["bytes"],
            }
            model_tag = "xla-flops/io-bytes"
    # The modal recurrence is pure elementwise work: its compute ceiling
    # is the VPU, not the MXU.
    extra = roofline_fields(cost, wall, tier="vpu", model_tag=model_tag)
    print(
        json.dumps(
            {
                "metric": (
                    f"implicit generalized-alpha ({engine} superposition) env-steps/sec/chip, "
                    f"{N_ELEMENTS}-element linear beam, {N_ENVS} envs, f32"
                ),
                "value": round(env_steps_per_sec, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(env_steps_per_sec / REF_EVALS_PER_SEC, 1),
                **extra,
            }
        )
    )


def run_modal_power(jax, jnp, model, n_red):
    """BENCH_ENGINE=modal_power: the composed-propagator modal engine.

    The linear gen-α step is an exact per-mode affine map on (eta, etad,
    etadd); K steps compose on the host (f64) into ONE 3x3 map whose
    application costs 18 VPU ops per element — vs 8 FMAs *per step* for
    the stepper kernels, i.e. ~K-fold less arithmetic for the SAME
    discrete trajectory (roundoff-level deviation, quantified per run in
    the vs_stepper_rel field against the bit-exact fused stepper over the
    same timed span). The discrete analogue of the ZOH expm propagator.
    BENCH_K sets the composition depth (default 64).
    """
    import time as _time

    from continuum_robot_tpu.models.simulate import make_modal_genalpha

    K = int(os.environ.get("BENCH_K", 64))
    ms = make_modal_genalpha(model, DT, rho_inf=0.8)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(scale=1e-6, size=(N_ENVS, n_red)), jnp.float32)
    v = jnp.zeros((N_ENVS, n_red), jnp.float32)
    u = np.zeros(n_red, np.float32)
    u[-2] = 0.1

    eta, etad = jax.jit(ms.to_modal)(q, v)
    # Host-side force: rollout_power keys its map/upload memos off the
    # HOST value, so passing numpy (not a device array) spares one
    # device->host tunnel round trip per call.
    u_m = np.asarray(ms.project_force_host(u), np.float32)
    interp = jax.default_backend() == "cpu"
    unroll = UNROLL if UNROLL > 1 else 8

    def roll(e, ed):
        return ms.rollout_power(e, ed, u_m, N_STEPS, K=K, unroll=unroll,
                                interpret=interp)

    e2, ed2, _ = roll(eta, etad)  # compile + warm (maps memoized here)
    float(jnp.sum(e2))
    # Best-of-3: at 2000 steps the call is ~30 ms of which most is
    # per-dispatch tunnel latency with a measured 29-73 ms spread across
    # identical calls — a single sample can under-report 2.5x. Each trial
    # advances the state (the recurrence is stable), so this times the
    # exact production call, not a replay.
    walls = []
    for _ in range(3):
        e1, ed1 = e2, ed2
        t0 = _time.time()
        e2, ed2, _ = roll(e1, ed1)
        float(jnp.sum(e2))
        walls.append(_time.time() - t0)
    wall = min(walls)

    q2, _ = jax.jit(ms.from_modal)(e2, ed2)
    assert bool(jnp.all(jnp.isfinite(q2))), "non-finite states in benchmark"

    # Accuracy vs the production stepper over the SAME (last) timed span:
    # the fused Pallas stepper is bit-equal to the XLA modal engine, so
    # this is the composed map's whole-span drift, not kernel noise.
    er, edr, _ = ms.rollout_pallas(e1, ed1, u_m, N_STEPS, interpret=interp)
    num = jnp.sqrt(jnp.sum((e2 - er) ** 2) + jnp.sum((ed2 - edr) ** 2))
    den = jnp.sqrt(jnp.sum(er**2) + jnp.sum(edr**2))
    drift = float(num / den)

    env_steps_per_sec = N_STEPS * N_ENVS / wall
    # Analytic cost model: 18 VPU ops per element per map application
    # (9 mul + 9 add), n_apps = ceil-ish applications incl. remainder,
    # + 3 ops/element initial accel; HBM traffic = carry in + out once
    # per call + the 12 coefficient columns.
    m = int(jnp.asarray(eta).shape[-1])
    B = int(jnp.asarray(eta).shape[0])
    n_apps = N_STEPS // K + (1 if N_STEPS % K else 0)
    state_bytes = 3 * B * m * 4
    cost = {
        "flops": (18.0 * n_apps + 3.0) * m * B,
        "bytes": 2.0 * state_bytes + 12 * m * 4,
    }
    extra = roofline_fields(cost, wall, tier="vpu", model_tag="analytic")
    print(
        json.dumps(
            {
                "metric": (
                    f"implicit generalized-alpha (composed-propagator modal, "
                    f"K={K}) env-steps/sec/chip, {N_ELEMENTS}-element linear "
                    f"beam, {N_ENVS} envs, f32"
                ),
                "value": round(env_steps_per_sec, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(env_steps_per_sec / REF_EVALS_PER_SEC, 1),
                "vs_stepper_rel": round(drift, 9),
                "timing": "best-of-3",
                "wall_spread_ms": [round(w * 1e3, 2) for w in sorted(walls)],
                **extra,
            }
        )
    )


def run_modal_rom(jax, jnp, model, n_red):
    """Nonlinear benchmark on the Petrov-Galerkin modal-reduction engine.

    The exact vectorized element force stays in the residual; the two basis
    transforms are (3N x m) instead of the dense path's (3N x 3N) matmuls
    (``ModalROMGenAlpha``). Accuracy vs the dense path is measured in
    tests/test_modal_rom.py and reported by tools/parity_report.py.
    """
    import time as _time

    from continuum_robot_tpu.models.simulate import make_modal_rom

    RHO_INF = 0.5  # same dissipation as the dense nonlinear benchmark
    ms = make_modal_rom(model, DT, rho_inf=RHO_INF, n_modes=N_MODES)

    # Optional ECSW hyper-reduction: BENCH_ECSW_TAU sets the training
    # tolerance; the sample is trained on a short impulse rollout of the
    # same beam. Works with both engines — the fused kernel consumes the
    # gathered-sample layout directly (rom_rollout.py).
    ecsw_tau = os.environ.get("BENCH_ECSW_TAU")
    ecsw_tag = ""
    if ecsw_tau is not None:
        u_tr = np.zeros(n_red, np.float32)
        u_tr[-2] = 3.0
        u_tr_m = jnp.asarray(ms.project_force_host(u_tr), jnp.float32)
        z = jnp.zeros((1, ms.n_modes), jnp.float32)
        _, etas_tr, _ = ms.rollout_frames(z, z, u_tr_m, 30, substeps=20,
                                          n_newton=2)
        snaps = np.asarray(etas_tr[::3, 0, :])
        ms, info = ms.hyper_reduce(snaps, tau=float(ecsw_tau),
                                   return_info=True)
        ecsw_tag = f", ECSW s={info['n_sampled']}/{N_ELEMENTS}"
        print(
            f"# ECSW: {info['n_sampled']} elements, train residual "
            f"{info['train_residual']:.2e}", file=sys.stderr,
        )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(scale=1e-6, size=(N_ENVS, n_red)), jnp.float32)
    v = jnp.zeros((N_ENVS, n_red), jnp.float32)
    u = np.zeros(n_red, np.float32)
    u[-2] = 0.1

    eta, etad = jax.jit(ms.to_modal)(q, v)
    u_m = jnp.asarray(ms.project_force_host(u), jnp.float32)
    prec = (
        jax.lax.Precision.HIGH if PRECISION == "high"
        else jax.lax.Precision.HIGHEST
    )
    nl_prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[NL_PRECISION]
    if ENGINE == "modal_rom_pallas":
        fused = ms.make_pallas_rollout(tile=int(os.environ.get("BENCH_TILE", 256)))
        interp = jax.default_backend() == "cpu"

        def roll(e, ed):
            # BENCH_UNROLL here drives the IN-KERNEL step unroll (the same
            # loop transformation that fixed the fused modal kernel's
            # fori_loop-overhead limiter), not the XLA scan unroll.
            return fused(e, ed, u_m, N_STEPS, n_newton=1,
                         precision=prec, nl_precision=nl_prec,
                         interpret=interp, unroll=UNROLL)

    else:
        carry_dt = jnp.bfloat16 if CARRY == "bf16" else None
        roll = jax.jit(
            lambda e, ed: ms.rollout(e, ed, u_m, N_STEPS, n_newton=1,
                                     precision=prec, nl_precision=nl_prec,
                                     unroll=UNROLL, carry_dtype=carry_dt)
        )

    e1, ed1, _ = roll(eta, etad)
    float(jnp.sum(e1))
    t0 = _time.time()
    e2, ed2, _ = roll(e1, ed1)
    float(jnp.sum(e2))
    wall = _time.time() - t0

    # Accuracy cost of the narrow carry, measured on the benchmark horizon
    # itself: endpoint deviation vs the f32-carry run (the bit-exact
    # engine) over the same 2 x N_STEPS trajectory.
    carry_drift = None
    if ENGINE != "modal_rom_pallas" and CARRY == "bf16":
        roll_f32 = jax.jit(
            lambda e, ed: ms.rollout(e, ed, u_m, N_STEPS, n_newton=1,
                                     precision=prec, nl_precision=nl_prec,
                                     unroll=UNROLL)
        )
        r1, rd1, _ = roll_f32(eta, etad)
        r2, rd2, _ = roll_f32(r1, rd1)
        num = jnp.sqrt(jnp.sum((e2 - r2) ** 2) + jnp.sum((ed2 - rd2) ** 2))
        den = jnp.sqrt(jnp.sum(r2**2) + jnp.sum(rd2**2))
        carry_drift = float(num / den)

    q2, _ = jax.jit(ms.from_modal)(e2, ed2)
    assert bool(jnp.all(jnp.isfinite(q2))), "non-finite states in benchmark"

    env_steps_per_sec = N_STEPS * N_ENVS / wall
    # Single-step XLA cost x step count (see scan_program_cost: XLA's
    # cost_analysis counts a scan body once regardless of trip count).
    from continuum_robot_tpu.utils.roofline import scan_program_cost

    step = ms._step_fn(jnp.float32, u_m, 1, prec, nl_prec)
    cost = scan_program_cost(
        step, (e1, ed1, e1), jnp.asarray(0.0, jnp.float32), N_STEPS
    )
    model_tag = "xla" if ENGINE == "modal_rom" else "xla-twin"
    if cost is not None:
        state_bytes = 3 * N_ENVS * ms.n_modes * 4
        # Constants the split fast path actually streams per step: the
        # planar (or ECSW-gathered) bases, the diagonal linear operator,
        # and the Newton inverse (diagonal column when the engine records
        # one — counting the unused dense Sinv put the IO floor above the
        # measured HBM ceiling on the ECSW run).
        step_consts = [
            ms.Phi_planar, ms.PhiW_planar, ms.lam,
            ms.Sinv_diag if ms.Sinv_diag is not None else ms.Sinv,
        ]
        const_bytes = sum(
            int(np.prod(np.shape(a))) * 4
            for a in step_consts if a is not None
        )
        if ENGINE == "modal_rom_pallas":
            # The fused kernel keeps states AND bases/operators
            # VMEM-resident across the whole span; per-rollout HBM traffic
            # is the state carry in+out plus one read of the constants —
            # not the XLA twin's per-step roundtrips (which overstated
            # bytes ~N_STEPS x and put the reported bandwidth 5x above the
            # measured ceiling).
            cost = {
                "flops": cost["flops"],
                "bytes": 2.0 * state_bytes + const_bytes,
            }
            model_tag = "xla-twin-flops/analytic-bytes"
        else:
            # XLA cost_analysis "bytes" counts LOGICAL buffer accesses of
            # every op — fusion keeps most of those out of HBM, so using
            # it as traffic reported 3.5x the measured ceiling. The
            # physical floor is the per-step compulsory IO: scan carry
            # in+out plus one stream of the reduced operators. Real
            # traffic sits in [io, logical]; roofline_frac uses the floor
            # (a LOWER bound on memory-side utilization) and the logical
            # count is reported alongside.
            # With unroll=K the scan carry roundtrips HBM once per K fused
            # steps; the reduced operators still stream once per body.
            # BENCH_CARRY=bf16 halves the carry bytes (2 B/elt vs 4).
            carry_bytes = state_bytes * (0.5 if CARRY == "bf16" else 1.0)
            cost = {
                "flops": cost["flops"],
                "bytes": (2.0 * carry_bytes + const_bytes)
                * N_STEPS / UNROLL,
                "bytes_logical": cost["bytes"],
            }
            model_tag = "xla-flops/io-bytes"
    # Tier: the ROM step's matmuls run at PRECISION (linear/solve) and
    # NL_PRECISION (element-force transforms). Unless both are HIGHEST,
    # passes execute on the bf16 MXU datapath, so the bf16 ceiling is the
    # only sound comparator (the f32 ceiling put roofline_frac > 1);
    # roofline_frac is then a LOWER bound on utilization of the true
    # mixed-precision ceiling.
    rom_tier = (
        "f32" if PRECISION == "highest" and NL_PRECISION == "highest"
        else "bf16"
    )
    extra = roofline_fields(cost, wall, tier=rom_tier, model_tag=model_tag)
    if carry_drift is not None:
        extra["carry_drift_rel"] = round(carry_drift, 9)
    carry_tag = (
        f", carry={CARRY}"
        if CARRY and ENGINE != "modal_rom_pallas" else ""
    )
    forces_tag = ", fluid+gravity" if ms.ext_modal is not None else ""
    print(
        json.dumps(
            {
                "metric": (
                    f"implicit generalized-alpha "
                    f"({'fused-Pallas ' if ENGINE == 'modal_rom_pallas' else ''}"
                    f"modal-ROM m={N_MODES}{ecsw_tag}{carry_tag}"
                    f"{forces_tag}) "
                    f"env-steps/sec/chip, "
                    f"{N_ELEMENTS}-element {BEAM_TYPE} beam, {N_ENVS} envs, f32"
                ),
                "value": round(env_steps_per_sec, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(
                    env_steps_per_sec / REF_EVALS_PER_SEC_NONLINEAR, 1
                ),
                **extra,
            }
        )
    )


def run_sharded(jax, jnp, model, n_red):
    """BENCH_ENGINE=sharded_genalpha: the distributed-SPIKE generalized-α
    engine on a 1-device ``sp`` mesh (VERDICT r2 item 6b).

    Same beam, envs, steps, dissipation, and Newton count as the dense
    row, so the row-to-row ratio IS the cost model of the multi-chip
    machinery at sp=1: shard_map tracing/dispatch, halo ppermutes, the
    SPIKE banded solve (vs the dense row's prefactored dense-inverse
    matmul), and the 6-float interface all_gathers — everything a real
    multi-chip run pays except the inter-chip wire time. BENCH_SP>1
    shards the beam across that many real devices when available.
    """
    import time as _time

    from jax.sharding import Mesh

    from continuum_robot_tpu.parallel import make_spatial_beam
    from continuum_robot_tpu.parallel.facade import _node_force
    from continuum_robot_tpu.parallel.spatial_implicit import (
        build_spatial_genalpha,
    )

    RHO_INF = 0.8 if BEAM_TYPE == "linear" else 0.5
    n_newton = 1 if BEAM_TYPE == "linear" else 2
    sp = int(os.environ.get("BENCH_SP", 1))
    mesh = Mesh(np.array(jax.devices()[:sp]), ("sp",))
    beam = make_spatial_beam(
        model.beam_model.arrays,
        model.beam_model.bc_info.free_mask.reshape(-1, 3),
        mesh, axis="sp",
    )
    Np = beam.n_nodes
    # BENCH_LOCAL_SOLVER: within-shard solve lowering (thomas|cr|dense).
    # Default = the engine's platform default (dense on TPU): the
    # scan-lowered Thomas sweeps are the axon backend's all-scan
    # batched-fusion miscompile shape (docs/design.md pitfall 4) —
    # root-caused round 5 as the round-3/4 sharded-NL failure: one
    # hardware substep of the 4096-env Thomas program returned
    # finite-but-wrong states (q rel dev ~1e2 vs CPU) while the dense
    # lowering AGREES with CPU to 2e-6 at the identical configuration.
    # All three are exact (TestSpikeLocalSolvers).
    local_solver = os.environ.get("BENCH_LOCAL_SOLVER") or None
    roll = build_spatial_genalpha(
        beam, DT, rho_inf=RHO_INF, n_newton=n_newton,
        use_consistent=getattr(model, "use_consistent_nonlinear", False),
        local_solver=local_solver,
    )
    from continuum_robot_tpu.parallel.spatial_implicit import (
        _resolve_local_solver,
    )

    local_solver = _resolve_local_solver(local_solver)

    # Same initial state / tip force as the dense row, in node layout.
    bc = model.beam_model.bc_info
    free = np.asarray(bc.free_dofs)
    n_full = bc.n_dofs_full
    nn = n_full // 3
    rng = np.random.default_rng(0)
    qf = np.zeros((N_ENVS, n_full), np.float32)
    qf[:, free] = rng.normal(scale=1e-6, size=(N_ENVS, n_red))
    x0 = np.zeros((N_ENVS, 2, Np, 3), np.float32)
    x0[:, 0, :nn, :] = qf.reshape(N_ENVS, nn, 3)
    x0 = jnp.asarray(x0)
    u_red = np.zeros(n_red, np.float32)
    u_red[-2] = 0.1
    u_node = _node_force(model, u_red, Np, jnp.float32)

    # One frame of N_STEPS substeps: the same 2000-step span as the dense
    # row with no per-step frame materialization.
    # BENCH_CHUNK=K drives the span as exact-carry chunks of K substeps
    # (bit-identical recurrence — TestShardedChunkedCarry): the axon
    # worker's execution watchdog kills device calls around the ~60 s
    # mark and a killed call can surface as garbage output buffers (the
    # non-finite-only-on-hardware signature of the round-3/4 nonlinear
    # sharded row, whose single 2000-substep call is the longest-running
    # execution in the matrix; CPU runs the identical program bounded —
    # NOTES_r4.md session 4).
    chunk = int(os.environ.get("BENCH_CHUNK", 0))
    if chunk:
        n_chunks, rem = divmod(N_STEPS, chunk)
        assert rem == 0, "BENCH_CHUNK must divide BENCH_STEPS"

        step_c = jax.jit(
            lambda x: roll(
                x, 1, u=u_node, substeps=chunk, return_carry=True
            )[2]
        )

        def run(x):
            # (2, Np, 3) initial state or (3, Np, 3) exact carry in; each
            # chunk forces a scalar so no device call outlives the chunk.
            for _ in range(n_chunks):
                x = step_c(x)
                float(jnp.sum(x))
            return x
    else:
        run = jax.jit(
            lambda x: roll(x, 1, u=u_node, substeps=N_STEPS)[1][-1]
        )
    x1 = run(x0)
    float(jnp.sum(x1))
    t0 = _time.time()
    x2 = run(x1)
    float(jnp.sum(x2))
    wall = _time.time() - t0
    assert bool(jnp.all(jnp.isfinite(x2))), "non-finite states in benchmark"

    env_steps_per_sec = N_STEPS * N_ENVS / wall
    ref = (
        REF_EVALS_PER_SEC if BEAM_TYPE == "linear"
        else REF_EVALS_PER_SEC_NONLINEAR
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"implicit generalized-alpha (distributed-SPIKE, "
                    f"sp={sp} mesh, local={local_solver}"
                    f") env-steps/sec/chip, {N_ELEMENTS}-element "
                    f"{beam_tag(model)} beam, {N_ENVS} envs, f32"
                ),
                "value": round(env_steps_per_sec, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(env_steps_per_sec / ref, 1),
            }
        )
    )


def run_adaptive(jax, jnp, model, n_red, rtol):
    """BENCH_TOL mode: error-controlled implicit stepping, no manual dt.

    Adaptive generalized-alpha over the same batched workload; the step
    size comes from the tolerance (shared across the env batch — the error
    norm contracts over all envs). env-steps/s counts ACCEPTED steps x
    envs, so the number is directly comparable to the fixed-dt engines at
    whatever dt the controller actually earned.
    """
    import time as _time

    from continuum_robot_tpu.models.simulate import make_newmark_operator
    from continuum_robot_tpu.ops.integrators import (
        integrate_generalized_alpha_adaptive,
    )

    # Mixed operator set: dense mass/stiffness applies (MXU), per-step
    # banded factorization at the trial dt (prefactoring is impossible for
    # a traced dt). Keeping one dense component also dodges the all-btd
    # fusion miscompile (docs/design.md pitfall 4).
    op = make_newmark_operator(model, dt=None, linear_solver="dense_inv")

    span = N_STEPS * DT
    n_frames = 20
    t_eval = jnp.linspace(0.0, span, n_frames + 1)

    # Rest ICs for BOTH beam types (the reference's impulse-from-rest
    # workload shape). White-noise ICs are wrong for an error-controlled
    # run in two different ways, both measured:
    # - nonlinear: they excite the parity element's energy-pumping
    #   high-frequency band — physics a coarse fixed dt + rho_inf crushes
    #   unseen, but that an error-controlled integrator honestly RESOLVES:
    #   the trajectory blows up (|q| ~ 1e12 within the span, f64, any
    #   rho_inf/n_newton) and the run dies on the n_incomplete guard.
    # - linear: they put tolerance-relevant amplitude in EVERY mode, so the
    #   controller must resolve the whole spectrum — dt collapses ~30x
    #   (measured: 11457 vs 385 accepted steps for the same span at 100
    #   elements).
    q = jnp.zeros((N_ENVS, n_red), jnp.float32)
    v = jnp.zeros((N_ENVS, n_red), jnp.float32)
    u = jnp.zeros(n_red, jnp.float32).at[-2].set(0.1)

    # Same dissipation split as every fixed-dt path (NOTES_r1: the parity
    # nonlinear element needs rho_inf=0.5).
    rho = 0.8 if BEAM_TYPE == "linear" else 0.5

    # Chunked driving: ONE jitted call per output interval, warm-started
    # from the controller's own proposal (stats.dt_next), instead of one
    # call over the whole span. Numerically identical trajectory and step
    # sequence — dt_next makes the restart seamless — but no single device
    # execution runs longer than a few seconds. That matters on axon: the
    # linear beam at rho_inf=0.8 legitimately needs ~5x the trial steps of
    # the rho_inf=0.5 nonlinear run (measured: 9281 vs 1858 accepted at
    # 100 elements, rest ICs), and at 1000 elements the single whole-span
    # while_loop ran past the remote worker's execution watchdog, which
    # kills the worker ("TPU worker process crashed or restarted",
    # round-3 session, row 13 — twice, deterministic).
    ts_host = np.linspace(0.0, span, n_frames + 1, dtype=np.float32)
    run_chunk = jax.jit(
        lambda q, v, ta, tb, dt0: integrate_generalized_alpha_adaptive(
            op, q, v, jnp.stack([ta, tb]), u=u, rho_inf=rho,
            rtol=rtol, atol=rtol * 1e-3, n_newton=1, dt0=dt0,
        )
    )

    def drive(check_frames):
        qc, vc = q, v
        dt = np.float32(1e-5)
        n_acc = n_rej = n_inc = 0
        for i in range(n_frames):
            qs_c, vs_c, stats = run_chunk(
                qc, vc, ts_host[i], ts_host[i + 1], dt
            )
            qc, vc = qs_c[-1], vs_c[-1]
            # Host-side counter reads double as the per-chunk completion
            # force (the house timing rule: scalars to the host).
            n_acc += int(stats.n_accepted)
            n_rej += int(stats.n_rejected)
            n_inc += int(stats.n_incomplete)
            dt = stats.dt_next
            if check_frames:
                assert bool(jnp.all(jnp.isfinite(qs_c))), (
                    "non-finite states in benchmark"
                )
        return qc, vc, n_acc, n_rej, n_inc

    drive(check_frames=True)  # compile + correctness pass (untimed)
    t0 = _time.time()
    qf, vf, n_acc, n_rej, n_inc = drive(check_frames=False)
    float(jnp.sum(qf))
    wall = _time.time() - t0

    assert bool(jnp.all(jnp.isfinite(qf))), "non-finite states in benchmark"
    assert n_inc == 0, (
        "adaptive benchmark truncated an output interval — the reported "
        "trajectory is not converged at this tolerance"
    )
    env_steps_per_sec = n_acc * N_ENVS / wall
    # Utilization: XLA's cost_analysis counts the adaptive while-loop body
    # (one TRIAL step: factorization at the trial dt + gen-alpha update +
    # error estimate) exactly once, like a scan body — so the whole-program
    # cost IS the per-trial-step cost (plus one-off setup, amortized over
    # ~1e3 steps). Scale by the measured accepted+rejected trial count.
    from continuum_robot_tpu.utils.roofline import program_cost

    cost = program_cost(
        lambda q0, v0: integrate_generalized_alpha_adaptive(
            op, q0, v0, t_eval, u=u, rho_inf=rho,
            rtol=rtol, atol=rtol * 1e-3, n_newton=1, dt0=1e-5,
        ),
        q, v,
    )
    if cost is not None:
        n_trial = max(n_acc + n_rej, 1)
        cost = {
            "flops": cost["flops"] * n_trial,
            "bytes": cost["bytes"] * n_trial,
            "bytes_logical": cost["bytes"] * n_trial,
        }
    extra = roofline_fields(
        cost, wall,
        tier="bf16" if PRECISION == "default" else "f32",
        model_tag="xla-per-trial-step",
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"ERROR-CONTROLLED implicit generalized-alpha (rtol={rtol:g}, "
                    f"ZX estimate + PI control, no manual dt) env-steps/sec/chip, "
                    f"{N_ELEMENTS}-element {beam_tag(model)} beam, "
                    f"{N_ENVS} envs, f32"
                ),
                "value": round(env_steps_per_sec, 1),
                "unit": "env_steps/s",
                # Baseline constant matches the workload's element type
                # (every other bench path selects by BEAM_TYPE too).
                "vs_baseline": round(
                    env_steps_per_sec
                    / (
                        REF_EVALS_PER_SEC
                        if BEAM_TYPE == "linear"
                        else REF_EVALS_PER_SEC_NONLINEAR
                    ),
                    1,
                ),
                "accepted_steps": n_acc,
                "rejected_steps": n_rej,
                "mean_dt": round(span / max(n_acc, 1), 9),
                **extra,
            }
        )
    )


def main():
    global REF_EVALS_PER_SEC, REF_EVALS_PER_SEC_NONLINEAR
    if (
        "--measure-baseline" in sys.argv
        or os.environ.get("BENCH_MEASURE_BASELINE") == "1"
    ):
        measured = measure_baseline(N_ELEMENTS, BEAM_TYPE)
        if measured is not None:
            if BEAM_TYPE == "linear":
                REF_EVALS_PER_SEC = measured
            else:
                REF_EVALS_PER_SEC_NONLINEAR = measured

    import jax

    # BENCH_PLATFORM=cpu: smoke-test escape hatch (the axon plugin ignores
    # the JAX_PLATFORMS env var, and a wedged remote worker hangs backend
    # init forever — see CLAUDE.md). Numbers from a CPU run are not
    # benchmarks; the driver never sets this.
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # TPU matmuls default to bfloat16 multiplication; the implicit solve
    # needs real f32 (verified: bf16 accumulates to NaN within 400 steps).
    jax.config.update("jax_default_matmul_precision", "float32")
    from continuum_robot_tpu.utils import enable_persistent_cache
    enable_persistent_cache()  # sharded compiles take minutes; replay from disk

    # Backend-init watchdog: a wedged axon remote worker hangs
    # make_c_api_client FOREVER (SIGINT-proof — see CLAUDE.md). Emit one
    # diagnostic JSON line and hard-exit instead of hanging the caller.
    import threading

    backend_ready = threading.Event()
    init_timeout = float(os.environ.get("BENCH_INIT_TIMEOUT", 600))

    def _watchdog():
        if not backend_ready.wait(init_timeout):
            diag = {
                "metric": "benchmark unavailable: TPU backend init "
                f"timed out after {init_timeout:.0f}s (axon worker "
                "unreachable/wedged)",
                "value": 0,
                "unit": "env_steps/s",
                "vs_baseline": 0,
            }
            # Context, clearly marked stale: the most recent hardware
            # measurement this repo recorded (NOT this run's result).
            for prev in ("BENCH_r01.json",):
                try:
                    with open(
                        os.path.join(os.path.dirname(__file__), prev)
                    ) as f:
                        parsed = json.load(f).get("parsed")
                    if parsed:
                        diag["last_hardware_measurement_stale"] = {
                            "from": prev, **parsed
                        }
                        break
                except Exception:
                    pass
            print(json.dumps(diag), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    jax.devices()  # blocks here (not mid-benchmark) if the worker is wedged
    backend_ready.set()

    import jax.numpy as jnp
    import pandas as pd

    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
    from continuum_robot_tpu.models.simulate import make_newmark_operator
    from continuum_robot_tpu.ops.integrators import generalized_alpha_step

    # Element size matches the reference workload's segments (0.25/6 m,
    # example_utilities.py:19-34): the 1000-element benchmark beam is a
    # 41.7 m continuum. Shrinking the same 0.25 m beam to 1000 segments
    # would be a degenerate mesh (0.25 mm elements, omega_max ~ 1e7 rad/s,
    # 14 decades of dynamic range — unrepresentable in f32).
    L_el, E, r, rho = 0.25 / 6, 75e9, 0.005, 6450.0
    I = np.pi * r**4 / 4
    A = np.pi * r**2
    n = N_ELEMENTS
    df = pd.DataFrame(
        {
            "length": [L_el] * n,
            "elastic_modulus": [E] * n,
            "moment_inertia": [I] * n,
            "density": [rho] * n,
            "cross_area": [A] * n,
            "type": [BEAM_TYPE] * n,
            "boundary_condition": ["FIXED"] + ["NONE"] * (n - 1),
        }
    )
    # Consistent element on the full-order nonlinear rows (see the
    # BENCH_CONSISTENT comment at the top): ROM engines keep the parity
    # element (their basis truncation bounds the horizon; the sharded ROM
    # tier is parity-element-only by construction).
    full_order_nl = BEAM_TYPE == "nonlinear" and (
        BENCH_TOL is not None or ENGINE in ("dense", "sharded_genalpha")
    )
    use_consistent = BENCH_CONSISTENT and full_order_nl
    force_params = None
    if FORCES:
        if ENGINE != "modal_rom" or BEAM_TYPE != "nonlinear":
            raise SystemExit(
                "BENCH_FORCES=1 benchmarks the reduced-correction force "
                "path: BENCH_TYPE=nonlinear BENCH_ENGINE=modal_rom (the "
                "fused Pallas kernel refuses external forces; dense-tier "
                "forced numbers come from the workload ports)"
            )
        from continuum_robot_tpu.models import ForceParams

        force_params = ForceParams(
            enable_fluid_effects=True,
            fluid_density=1000.0,
            enable_gravity_effects=True,
        )
        # Fluid columns per element (reference example_utilities.py:35-56:
        # cylinder wetted area, Cd=1.2).
        df["wetted_area"] = 2 * np.pi * r * L_el
        df["drag_coef"] = 1.2
    model = DynamicEulerBernoulliBeam(
        df, force_params, use_consistent_nonlinear=use_consistent
    )
    n_red = model.n_pos_states

    if BENCH_TOL is not None:
        return run_adaptive(jax, jnp, model, n_red, float(BENCH_TOL))
    if ENGINE in ("modal", "modal_pallas") and BEAM_TYPE == "linear":
        return run_modal(jax, jnp, model, n_red, use_pallas=(ENGINE == "modal_pallas"))
    if ENGINE == "modal_power":
        if BEAM_TYPE != "linear":
            raise SystemExit(
                "BENCH_ENGINE=modal_power requires BENCH_TYPE=linear "
                "(step composition is exact only for the affine modal "
                "recurrence)"
            )
        return run_modal_power(jax, jnp, model, n_red)
    if ENGINE == "modal_rom_pallas" and BEAM_TYPE == "linear":
        raise SystemExit(
            "BENCH_ENGINE=modal_rom_pallas requires BENCH_TYPE=nonlinear "
            "(the fused kernel exists for the nonlinear correction force; "
            "linear beams use BENCH_ENGINE=modal_pallas, the exact modal "
            "engine)"
        )
    if ENGINE in ("modal_rom", "modal_rom_pallas"):
        return run_modal_rom(jax, jnp, model, n_red)
    if ENGINE == "sharded_genalpha":
        return run_sharded(jax, jnp, model, n_red)

    # Generalized-alpha: at omega_max*dt ~ 1e3 the undamped Newmark keeps
    # unit-circle high modes where f32 roundoff slowly destabilizes them;
    # gen-alpha's spectral radius < 1 absorbs that. The reference-parity
    # nonlinear element is non-variational (f != grad U — it can pump
    # energy), so the nonlinear benchmark runs with stronger dissipation.
    RHO_INF = 0.8 if BEAM_TYPE == "linear" else 0.5
    am = (2.0 * RHO_INF - 1.0) / (RHO_INF + 1.0)
    af = RHO_INF / (RHO_INF + 1.0)
    beta_ga = 0.25 * (1.0 - am + af) ** 2
    # Nonlinear beams use modified Newton (zero-state tangent prefactored
    # as a dense inverse) with the exact vectorized element force in the
    # residual; 2 corrections/step.
    prec = (
        jax.lax.Precision.HIGH if PRECISION == "high"
        else jax.lax.Precision.HIGHEST
    )
    op = make_newmark_operator(
        model, dt=None, linear_solver="dense_inv",
        extra_systems=[(1.0 - am, (1.0 - af) * beta_ga * DT * DT)],
        matmul_precision=prec,
    )
    n_newton = 1 if BEAM_TYPE == "linear" else 2

    def run(q, v, a, u):
        def body(carry, _):
            q, v, a = carry
            q, v, a = generalized_alpha_step(
                op, 0.0, q, v, a, DT, u, rho_inf=RHO_INF, n_newton=n_newton
            )
            return (q, v, a), None

        (q, v, a), _ = jax.lax.scan(body, (q, v, a), None, length=N_STEPS)
        return q, v, a

    run = jax.jit(run)

    dtype = jnp.float32
    key_q = np.random.default_rng(0).normal(scale=1e-6, size=(N_ENVS, n_red))
    q = jnp.asarray(key_q, dtype)
    v = jnp.zeros((N_ENVS, n_red), dtype)
    u = jnp.zeros(n_red, dtype).at[-2].set(0.1)
    a = op.solve(q, 0.0)(u - op.internal_force(q))

    # Warm-up / compile. Sync via scalar host reads (see run_modal: on this
    # backend block_until_ready does not await Pallas custom calls; plain
    # XLA executables measure identically either way, verified).
    q1, v1, a1 = run(q, v, a, u)
    float(jnp.sum(q1))

    t0 = time.time()
    q2, v2, a2 = run(q1, v1, a1, u)
    float(jnp.sum(q2))
    wall = time.time() - t0

    assert bool(jnp.all(jnp.isfinite(q2))), "non-finite states in benchmark"

    steps_per_sec = N_STEPS / wall
    env_steps_per_sec = steps_per_sec * N_ENVS
    ref = REF_EVALS_PER_SEC if BEAM_TYPE == "linear" else REF_EVALS_PER_SEC_NONLINEAR
    vs_baseline = env_steps_per_sec / ref

    # Single-step XLA cost x step count (see scan_program_cost: XLA's
    # cost_analysis counts a scan body once regardless of trip count).
    from continuum_robot_tpu.utils.roofline import scan_program_cost

    def one_step(carry, _t):
        qq, vv, aa = carry
        qq, vv, aa = generalized_alpha_step(
            op, 0.0, qq, vv, aa, DT, u, rho_inf=RHO_INF, n_newton=n_newton
        )
        return (qq, vv, aa), None

    cost = scan_program_cost(
        one_step, (q1, v1, a1), jnp.zeros((), dtype), N_STEPS
    )
    extra = roofline_fields(
        cost, wall,
        tier="bf16" if PRECISION == "default" else "f32",
        model_tag="xla",
    )
    print(
        json.dumps(
            {
                "metric": (
                    f"implicit generalized-alpha env-steps/sec/chip, "
                    f"{N_ELEMENTS}-element {beam_tag(model)} "
                    f"beam, {N_ENVS} envs, f32/{PRECISION}"
                ),
                "value": round(env_steps_per_sec, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(vs_baseline, 1),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
