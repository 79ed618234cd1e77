"""Work-precision curves: error vs throughput per engine on the benchmark
workload.

Every point is ONE hardware run of the 1000-element benchmark beam
(bench.py's exact configuration: 0.25/6 m Nitinol elements, 4096 envs,
constant 0.1 tip force, rest ICs, 0.2 s span, f32) that yields BOTH axes of
the classic work-precision diagram at once:

* **error** — relative L2 error of the endpoint displacement vector
  ``q(T)`` on env 0, against the config's oracle;
* **work** — env-steps/s (accepted steps for the adaptive engines), the
  same convention as bench.py, so points are directly comparable to the
  session matrix (``BENCH_SESSION.jsonl``).

The dial is the engine's own accuracy knob: step size ``h`` for the
fixed-step engines, ``rtol`` for the error-controlled ones. Because the
runs execute in f32 on the TPU, the curves include the f32 floor users
actually hit — this is deliberate (the f64 *method* error in isolation is
characterized by tests/test_stiff_validation.py and the parity report).

Oracles (documented per record in the JSON):

* linear beam — the EXACT continuous flow: eigendecomposition of the
  assembled ``(K, M)`` in float64 on the host; each mode's step response
  to the constant tip force is analytic
  (``eta_i(t) = (f_i / lam_i)(1 - cos(omega_i t))``). Independent of every
  engine under test.
* nonlinear beam, consistent track — the dense generalized-alpha path at
  ``h = 1e-5`` (20x below the tightest ladder point, ``n_newton=2``,
  B=1) on the variationally consistent element: independent of the ROM
  basis, so the consistent-ROM points include basis-truncation error.
* nonlinear beam, parity track (the bench ROM-tier configs:
  modal_rom_pallas / ECSW / modal_rom_adaptive run the reference-parity
  element's split fast path) — the SAME m=256 parity ROM stepped at
  ``h = 1e-5``: the error isolates time-discretization error within the
  ROM (plus hyper-reduction sampling error for ECSW). The full-order
  parity ODE diverges on this workload/span (PARITY.md divergence 10),
  so no basis-independent parity reference exists here; basis-truncation
  accuracy of the parity ROM is characterized separately
  (tests/test_modal_rom.py).

Usage:
    python tools/work_precision.py run   [--quick] [--out work_precision.json]
    python tools/work_precision.py render [work_precision.json]

``run`` requires the TPU (one process at a time — do not run while another
TPU job is active, CLAUDE.md); ``render`` prints the markdown table
docs/design.md quotes. Runtime: ~25 min (dominated by per-point compiles
and the dense-oracle run).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPAN = 0.2           # bench.py: N_STEPS=2000 at DT=1e-4
N_ENVS = 4096        # bench.py batch
N_MODES = 256        # bench.py ROM basis
ECSW_TAU = 1e-3      # bench.py ECSW training tolerance
TIP_FORCE = 0.1


def _beam_df(beam_type: str):
    import pandas as pd

    L_el, E, r, rho = 0.25 / 6, 75e9, 0.005, 6450.0
    I = np.pi * r**4 / 4
    A = np.pi * r**2
    n = 1000
    return pd.DataFrame(
        {
            "length": [L_el] * n,
            "elastic_modulus": [E] * n,
            "moment_inertia": [I] * n,
            "density": [rho] * n,
            "cross_area": [A] * n,
            "type": [beam_type] * n,
            "boundary_condition": ["FIXED"] + ["NONE"] * (n - 1),
        }
    )


def build_model(beam_type: str):
    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam

    # Nonlinear: the VARIATIONALLY CONSISTENT element (bench.py's
    # full-order disposition since round 4, BENCH_CONSISTENT=1). The
    # reference-parity polynomials are non-conservative and the bench
    # workload's sustained tip load makes that ODE genuinely unstable
    # over this 0.2 s span (PARITY.md divergence 10) — with the parity
    # element the h=1e-5 oracle itself diverges and every error column
    # is NaN (observed in the round-5 phase-3 hardware run; the --quick
    # 0.02 s span was short enough to mask it). A work-precision curve
    # needs a well-posed ODE. The parity element keeps its own track
    # (build_parity_model) with a bounded ROM oracle.
    return DynamicEulerBernoulliBeam(
        _beam_df(beam_type),
        use_consistent_nonlinear=(beam_type == "nonlinear"),
    )


def build_parity_model():
    """The reference-parity nonlinear element (bench's ROM-tier config)."""
    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam

    return DynamicEulerBernoulliBeam(_beam_df("nonlinear"))


def exact_linear_endpoint(model, T: float) -> np.ndarray:
    """Exact q(T) of the undamped LTI step response, float64 on host.

    eta(t) = (f / lam) (1 - cos(sqrt(lam) t)) per mass-orthonormal mode —
    the continuous flow itself, no discretization anywhere.
    """
    from scipy.linalg import eigh

    K = np.asarray(model.beam_model.get_stiffness_matrix(), np.float64)
    M = np.asarray(model.beam_model.get_mass_matrix(), np.float64)
    lam, Phi = eigh(K, M)  # Phi^T M Phi = I
    n = K.shape[0]
    u = np.zeros(n)
    u[-2] = TIP_FORCE
    f = Phi.T @ u
    eta_T = (f / lam) * (1.0 - np.cos(np.sqrt(lam) * T))
    return Phi @ eta_T


def rel_l2(q_new: np.ndarray, q_ref: np.ndarray) -> float:
    return float(np.linalg.norm(q_new - q_ref) / np.linalg.norm(q_ref))


def _timed(roll, args, sync):
    """Run twice (warm-up = compile), time the second, sync via host scalar
    (CLAUDE.md: block_until_ready does not await Pallas custom calls)."""
    out = roll(*args)
    sync(out)
    t0 = time.time()
    out = roll(*args)
    sync(out)
    return out, time.time() - t0


def run_points(quick: bool = False):
    import jax

    jax.config.update("jax_default_matmul_precision", "float32")
    from continuum_robot_tpu.utils import enable_persistent_cache
    enable_persistent_cache()  # sharded compiles take minutes; replay from disk
    import jax.numpy as jnp

    from continuum_robot_tpu.models.simulate import (
        make_modal_genalpha,
        make_modal_rom,
        make_newmark_operator,
    )
    from continuum_robot_tpu.ops.integrators import (
        generalized_alpha_step,
        integrate_generalized_alpha_adaptive,
    )

    backend = jax.default_backend()
    interp = backend == "cpu"  # Pallas interpret-mode for CPU smoke runs
    b = 8 if quick else N_ENVS
    span = 0.02 if quick else SPAN
    records = []

    def record(**kw):
        kw.setdefault("beam", "linear")
        kw.setdefault("envs", b)
        kw.setdefault("span_s", span)
        records.append(kw)
        print(f"# {kw}", file=sys.stderr, flush=True)

    # ---------------- linear beam ----------------
    model = build_model("linear")
    n_red = model.n_pos_states
    q_exact = exact_linear_endpoint(model, span)

    h_ladder = [1e-4, 5e-5, 2e-5] if quick else [1e-4, 5e-5, 2e-5, 1e-5]
    rho = 0.8  # bench.py dissipation for the linear workload
    u_np = np.zeros(n_red, np.float32)
    u_np[-2] = TIP_FORCE

    ms_base = make_modal_genalpha(model, h_ladder[0], rho_inf=rho)
    for engine in ("modal_pallas", "modal_xla_u4", "modal_power_k64"):
        for h in h_ladder:
            ms = ms_base.with_dt(h)
            n_steps = int(round(span / h))
            q0 = jnp.zeros((b, n_red), jnp.float32)
            eta, etad = jax.jit(ms.to_modal)(q0, q0)
            u_m = jnp.asarray(ms.project_force_host(u_np), jnp.float32)
            if engine == "modal_pallas":
                def roll(e, ed, _n=n_steps, _u=u_m, _ms=ms):
                    return _ms.rollout_pallas(e, ed, _u, _n, interpret=interp)
            elif engine == "modal_power_k64":
                # Composed-propagator tier: same gen-α discretization, so
                # the error axis should match the steppers at each h while
                # the work axis runs ~K-fold faster — the curve that shows
                # step composition is accuracy-free throughput.
                def roll(e, ed, _n=n_steps, _u=u_m, _ms=ms):
                    return _ms.rollout_power(e, ed, _u, _n, K=64,
                                             interpret=interp)
            else:
                roll = jax.jit(
                    lambda e, ed, _n=n_steps, _u=u_m, _ms=ms:
                    _ms.rollout(e, ed, _u, _n, unroll=4)
                )
            (e2, ed2, _), wall = _timed(
                roll, (eta, etad), lambda o: float(jnp.sum(o[0]))
            )
            qT, _ = jax.jit(ms.from_modal)(e2, ed2)
            err = rel_l2(np.asarray(qT[0], np.float64), q_exact)
            record(engine=engine, dial="h", value=h, steps=n_steps,
                   error=err, env_steps_per_s=round(n_steps * b / wall, 1),
                   wall_s=round(wall, 3), oracle="exact-modal-flow-f64")

    # Error-controlled dense engine: rtol ladder (bench.py BENCH_TOL path).
    # Chunk-driven exactly like bench.run_adaptive — ONE jitted call per
    # output interval, warm-started from (q, v, a) + stats.dt_next — so no
    # single device execution outlives the axon worker's ~60 s watchdog
    # (at rtol=1e-8 x 4096 envs the whole-span while_loop would; CLAUDE.md,
    # NOTES_r4 session 4). Step sequence identical to the monolithic call
    # (tests/test_simulate_chunked.py pins this equivalence).
    op = make_newmark_operator(model, dt=None, linear_solver="dense_inv")
    n_ivals = 20
    ts_host = np.linspace(0.0, span, n_ivals + 1, dtype=np.float32)
    u_j = jnp.asarray(u_np)
    rtol_ladder = [1e-4, 1e-6] if quick else [1e-4, 1e-6, 1e-8]
    for rtol in rtol_ladder:
        q0 = jnp.zeros((b, n_red), jnp.float32)
        run_chunk = jax.jit(
            lambda q, v, a, ta, tb, dt, _r=rtol:
            integrate_generalized_alpha_adaptive(
                op, q, v, jnp.stack([ta, tb]), u=u_j, rho_inf=rho,
                rtol=_r, atol=_r * 1e-3, n_newton=1, dt0=dt, a0=a,
                return_final=True,
            )
        )
        a0 = op.solve(q0, 0.0)(u_j - op.internal_force(q0))

        def drive(_a0=a0, _rc=run_chunk):
            qc, vc, ac = q0, q0, _a0
            dt = jnp.asarray(1e-5, jnp.float32)
            n_acc = n_rej = 0
            for i in range(n_ivals):
                qs_c, vs_c, stats, (qc, vc, ac) = _rc(
                    qc, vc, ac, ts_host[i], ts_host[i + 1], dt
                )
                n_acc += int(stats.n_accepted)  # host read = chunk sync
                n_rej += int(stats.n_rejected)
                dt = stats.dt_next
            return qc, n_acc, n_rej

        drive()  # warm-up (compile)
        t0 = time.time()
        qT, n_acc, n_rej = drive()
        float(jnp.sum(qT))
        wall = time.time() - t0
        err = rel_l2(np.asarray(qT[0], np.float64), q_exact)
        record(engine="genalpha_adaptive", dial="rtol", value=rtol,
               steps=n_acc, rejected=n_rej, error=err,
               env_steps_per_s=round(n_acc * b / wall, 1),
               wall_s=round(wall, 3), oracle="exact-modal-flow-f64")

    # ---------------- nonlinear beam ----------------
    model_nl = build_model("nonlinear")
    rho_nl = 0.5  # bench.py: the parity element needs stronger dissipation

    # Dense-path oracle at h = 1e-5 (B=1): independent of the ROM basis.
    h_oracle = 1e-4 if quick else 1e-5
    am = (2.0 * rho_nl - 1.0) / (rho_nl + 1.0)
    af = rho_nl / (rho_nl + 1.0)
    beta_ga = 0.25 * (1.0 - am + af) ** 2
    op_nl = make_newmark_operator(
        model_nl, dt=None, linear_solver="dense_inv",
        extra_systems=[(1.0 - am, (1.0 - af) * beta_ga * h_oracle * h_oracle)],
    )
    n_steps_oracle = int(round(span / h_oracle))
    u_j = jnp.asarray(u_np)

    # Watchdog-safe oracle: the 20k-step scan is split into host-driven
    # chunks carrying (q, v, a) exactly — bit-identical recurrence, but no
    # single device call near the axon ~60 s execution kill (CLAUDE.md).
    oracle_chunk = max(1, n_steps_oracle // 20)

    def dense_chunk(q, v, a):
        def body(carry, _):
            q, v, a = carry
            q, v, a = generalized_alpha_step(
                op_nl, 0.0, q, v, a, h_oracle, u_j,
                rho_inf=rho_nl, n_newton=2,
            )
            return (q, v, a), None

        (q, v, a), _ = jax.lax.scan(
            body, (q, v, a), None, length=oracle_chunk)
        return q, v, a

    dense_chunk = jax.jit(dense_chunk)
    q0 = jnp.zeros((1, n_red), jnp.float32)
    a0 = op_nl.solve(q0, 0.0)(u_j - op_nl.internal_force(q0))
    t0 = time.time()
    qo, vo, ao = q0, q0, a0
    done = 0
    while done < n_steps_oracle:
        qo, vo, ao = dense_chunk(qo, vo, ao)
        float(jnp.sum(qo))  # per-chunk completion force
        done += oracle_chunk
    q_oracle = np.asarray(qo[0], np.float64)
    print(f"# nonlinear dense oracle: h={h_oracle:g}, "
          f"{n_steps_oracle} steps, {time.time() - t0:.0f}s",
          file=sys.stderr, flush=True)

    h_ladder_nl = [1e-4, 5e-5] if quick else [1e-4, 5e-5, 2e-5]

    # TWO nonlinear tracks (round-5 redesign — the first hardware run
    # produced NaN error columns because the parity element's ODE is
    # genuinely unstable on this span, PARITY.md divergence 10):
    #
    # 1. CONSISTENT track: the variationally consistent element — a
    #    stable, well-posed ODE — measured against the dense h=1e-5
    #    oracle above. Covers the full-order engines and the consistent
    #    modal ROM (interleaved force path; the split/Pallas/adaptive
    #    fast paths are parity-only by construction).
    # 2. PARITY track: the bench's split-path ROM tier
    #    (modal_rom_pallas / ECSW / modal_rom_adaptive on the parity
    #    element, whose 256-mode truncation bounds this horizon even
    #    though the full-order parity ODE diverges). Oracle = the SAME
    #    m=256 parity ROM stepped at h=1e-5: the error column isolates
    #    time-discretization error within the ROM — plus hyper-reduction
    #    sampling error for the ECSW points — which is exactly the
    #    engine-choice information; the basis-truncation error of the
    #    parity ROM itself has no finite full-order reference on this
    #    workload.
    model_par = build_parity_model()
    ms_par = make_modal_rom(
        model_par, h_ladder_nl[0], rho_inf=rho_nl, n_modes=N_MODES)
    # ECSW training (bench.py's protocol: short impulse rollout), once —
    # the trained sample is dt-independent; with_dt re-prefactors per h.
    u_tr = np.zeros(n_red, np.float32)
    u_tr[-2] = 3.0
    u_tr_m = jnp.asarray(ms_par.project_force_host(u_tr), jnp.float32)
    z = jnp.zeros((1, ms_par.n_modes), jnp.float32)
    _, etas_tr, _ = ms_par.rollout_frames(
        z, z, u_tr_m, 30, substeps=20, n_newton=2)
    ms_ecsw_base, ecsw_info = ms_par.hyper_reduce(
        np.asarray(etas_tr[::3, 0, :]), tau=ECSW_TAU, return_info=True)
    print(f"# ECSW sample: {ecsw_info['n_sampled']}/1000 elements",
          file=sys.stderr, flush=True)

    # Parity-ROM time-discretization oracle: same basis, h = h_oracle.
    ms_par_fine = ms_par.with_dt(h_oracle)
    u_m_par = jnp.asarray(ms_par_fine.project_force_host(u_np), jnp.float32)
    z1 = jnp.zeros((1, ms_par.n_modes), jnp.float32)
    e_o, ed_o, _ = jax.jit(
        lambda e, ed: ms_par_fine.rollout(
            e, ed, u_m_par, n_steps_oracle, n_newton=2)
    )(z1, z1)
    q_par_o, _ = jax.jit(ms_par_fine.from_modal)(e_o, ed_o)
    q_oracle_par = np.asarray(q_par_o[0], np.float64)
    assert np.isfinite(q_oracle_par).all(), (
        "parity-ROM oracle non-finite — truncation no longer bounds "
        "this horizon; shorten the span or raise dissipation"
    )
    print(f"# parity-ROM oracle: m={N_MODES}, h={h_oracle:g}, finite",
          file=sys.stderr, flush=True)

    for engine in ("modal_rom_consistent", "modal_rom_pallas", "ecsw"):
        for h in h_ladder_nl:
            if engine == "modal_rom_consistent":
                # The consistent-element reduced Jacobian is not diagonal
                # (no split path, no Sinv_diag) — with_dt refuses; rebuild
                # the engine at each h instead.
                ms = make_modal_rom(
                    model_nl, h, rho_inf=rho_nl, n_modes=N_MODES)
                q_ref, oracle_tag = (
                    q_oracle, f"dense-genalpha-h{h_oracle:g}")
            elif engine == "ecsw":
                ms = ms_ecsw_base.with_dt(h)
                q_ref, oracle_tag = (
                    q_oracle_par, f"parity-rom-m{N_MODES}-h{h_oracle:g}")
            else:
                ms = ms_par.with_dt(h)
                q_ref, oracle_tag = (
                    q_oracle_par, f"parity-rom-m{N_MODES}-h{h_oracle:g}")
            extra = (
                {"ecsw_sampled": int(ecsw_info["n_sampled"])}
                if engine == "ecsw" else {}
            )
            n_steps = int(round(span / h))
            q0 = jnp.zeros((b, n_red), jnp.float32)
            eta, etad = jax.jit(ms.to_modal)(q0, q0)
            u_m = jnp.asarray(ms.project_force_host(u_np), jnp.float32)
            prec = jax.lax.Precision.HIGHEST
            nl_prec = jax.lax.Precision.HIGH  # bench.py default dial
            if engine == "modal_rom_pallas":
                fused = ms.make_pallas_rollout(tile=min(256, b))

                def roll(e, ed, _n=n_steps, _u=u_m, _f=fused):
                    return _f(e, ed, _u, _n, n_newton=1, precision=prec,
                              nl_precision=nl_prec, interpret=interp)
            else:
                roll = jax.jit(
                    lambda e, ed, _n=n_steps, _u=u_m, _ms=ms:
                    _ms.rollout(e, ed, _u, _n, n_newton=1, precision=prec,
                                nl_precision=nl_prec,
                                unroll=8 if engine == "ecsw" else 1)
                )
            (e2, ed2, _), wall = _timed(
                roll, (eta, etad), lambda o: float(jnp.sum(o[0]))
            )
            qT, _ = jax.jit(ms.from_modal)(e2, ed2)
            err = rel_l2(np.asarray(qT[0], np.float64), q_ref)
            record(beam="nonlinear", engine=engine, dial="h", value=h,
                   steps=n_steps, error=err,
                   env_steps_per_s=round(n_steps * b / wall, 1),
                   wall_s=round(wall, 3),
                   oracle=oracle_tag, **extra)

    # Error-controlled ROM: rtol ladder. Chunk-driven like the dense
    # adaptive ladder above (one jitted call per output interval,
    # etadd/dt_next warm restart) — same watchdog rationale.
    ts_host_nl = np.linspace(0.0, span, n_ivals + 1, dtype=np.float32)
    for rtol in rtol_ladder:
        ms = ms_par  # adaptive needs the diagonal reduced Jacobian (parity)
        q0 = jnp.zeros((b, n_red), jnp.float32)
        eta0r, etad0r = jax.jit(ms.to_modal)(q0, q0)
        u_m = jnp.asarray(ms.project_force_host(u_np), jnp.float32)
        run_chunk = jax.jit(
            lambda e, ed, edd, ta, tb, dt, _r=rtol, _ms=ms:
            _ms.rollout_adaptive(
                e, ed, u_m, jnp.stack([ta, tb]), rtol=_r, atol=_r * 1e-3,
                n_newton=2, dt0=dt, etadd0=edd, return_final=True,
            )
        )
        edd0 = jax.jit(ms.initial_accel)(eta0r, etad0r, u_m, 0.0)

        def drive(_e0=eta0r, _ed0=etad0r, _edd0=edd0, _rc=run_chunk):
            ec, edc, eddc = _e0, _ed0, _edd0
            dt = jnp.asarray(span / n_ivals / 16.0, jnp.float32)
            n_acc = n_rej = 0
            for i in range(n_ivals):
                _, _, stats, (ec, edc, eddc) = _rc(
                    ec, edc, eddc, ts_host_nl[i], ts_host_nl[i + 1], dt
                )
                n_acc += int(stats.n_accepted)  # host read = chunk sync
                n_rej += int(stats.n_rejected)
                dt = stats.dt_next
            return ec, edc, n_acc, n_rej

        drive()  # warm-up (compile)
        t0 = time.time()
        eT, edT, n_acc, n_rej = drive()
        float(jnp.sum(eT))
        wall = time.time() - t0
        qs, _ = jax.jit(ms.from_modal)(eT, edT)
        err = rel_l2(np.asarray(qs[0], np.float64), q_oracle_par)
        record(beam="nonlinear", engine="modal_rom_adaptive", dial="rtol",
               value=rtol, steps=n_acc, rejected=n_rej,
               error=err, env_steps_per_s=round(n_acc * b / wall, 1),
               wall_s=round(wall, 3),
               oracle=f"parity-rom-m{N_MODES}-h{h_oracle:g}")

    return records


def render(path: str):
    with open(path) as f:
        data = json.load(f)
    meta = data["meta"]
    print(f"Work-precision on the benchmark workload "
          f"(1000-element beam, {meta['envs']} envs, {meta['span_s']} s "
          f"span, f32, backend={meta['backend']}, {meta['date']}):\n")
    print("| beam | engine | dial | error (rel L2, q(T)) | env-steps/s | "
          "steps | oracle |")
    print("|---|---|---|---|---|---|---|")
    for r in data["records"]:
        dial = f"{r['dial']}={r['value']:g}"
        extra = f" (s={r['ecsw_sampled']})" if "ecsw_sampled" in r else ""
        rej = f" (+{r['rejected']} rej)" if "rejected" in r else ""
        print(
            f"| {r['beam']} | {r['engine']}{extra} | {dial} "
            f"| {r['error']:.2e} | {r['env_steps_per_s'] / 1e6:.2f}M "
            f"| {r['steps']}{rej} | {r['oracle']} |"
        )


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "render":
        render(sys.argv[2] if len(sys.argv) > 2
               else os.path.join(REPO, "work_precision.json"))
        return
    if not (len(sys.argv) > 1 and sys.argv[1] == "run"):
        raise SystemExit(__doc__)
    quick = "--quick" in sys.argv
    out = os.path.join(REPO, "work_precision.json")
    if "--out" in sys.argv:
        out = sys.argv[sys.argv.index("--out") + 1]

    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    records = run_points(quick=quick)
    payload = {
        "meta": {
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "envs": 8 if quick else N_ENVS,
            "span_s": 0.02 if quick else SPAN,
            "date": time.strftime("%Y-%m-%d"),
            "quick": quick,
        },
        "records": records,
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"# wrote {out} ({len(records)} points)", file=sys.stderr)


if __name__ == "__main__":
    main()
