"""Hardware validation: one command to qualify a TPU backend.

Runs every kernel-level cross-check that has caught a real backend bug on
this project (SURVEY-era findings are in docs/design.md "Backend pitfalls"),
printing one PASS/FAIL line per check and exiting nonzero on any failure.
Run it when bringing up a new chip generation, libtpu, or JAX version:

    python tools/hw_validate.py            # on the TPU
    JAX_PLATFORMS=cpu python tools/hw_validate.py   # CPU smoke (interpret)

Checks:
  1. batch-consistency of the default implicit step (fusion-miscompile
     guard, design.md pitfall 4);
  2. Pallas block-tridiagonal solve == XLA Thomas solve;
  3. fused-Pallas modal steps == XLA modal engine (bit-level expected);
  4. fused-Pallas modal frames == XLA modal frames;
  4b. fused-Pallas modal-ROM rollout == XLA ROM engine (nonlinear beam,
     large-amplitude states so the correction force is leading-order);
  5. fused small-beam rollout == generalized-alpha integrator;
  6. cyclic-reduction solve == Thomas solve;
  7. sync-method probe: flags when ``block_until_ready`` returns far sooner
     than a host read for a Pallas kernel (design.md pitfall 6) — WARN, not
     FAIL, since timings (not results) are what it corrupts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _honor_platform_env():
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


FAILURES = []


def report(name: str, ok: bool, detail: str):
    tag = "PASS" if ok else "FAIL"
    print(f"[{tag}] {name}: {detail}")
    if not ok:
        FAILURES.append(name)


def build_model(n_elements: int, kind: str = "linear"):
    import pandas as pd

    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam

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
            "type": [kind] * n_elements,
            "boundary_condition": ["FIXED"] + ["NONE"] * (n_elements - 1),
        }
    )
    return DynamicEulerBernoulliBeam(df)


def main():
    _honor_platform_env()
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() != "cpu"
    interpret = not on_tpu
    print(f"backend: {jax.default_backend()} ({jax.devices()[0]})")
    jax.config.update("jax_default_matmul_precision", "float32")
    from continuum_robot_tpu.utils import enable_persistent_cache
    enable_persistent_cache()  # sharded compiles take minutes; replay from disk

    from continuum_robot_tpu.models.simulate import (
        make_modal_genalpha,
        make_newmark_operator,
    )
    from continuum_robot_tpu.ops import banded
    from continuum_robot_tpu.ops.integrators import generalized_alpha_step
    from continuum_robot_tpu.ops.pallas import btd_solve_pallas, fused_rollout
    from continuum_robot_tpu.utils.checks import verify_batch_consistency

    rng = np.random.default_rng(0)
    B_small = 64 if on_tpu else 8
    N = 200 if on_tpu else 40

    # ---- shared fixtures -------------------------------------------------
    model = build_model(N)
    nf = model.n_pos_states
    DT, RHO = 1e-4, 0.8
    q0 = jnp.asarray(rng.normal(scale=1e-6, size=(B_small, nf)), jnp.float32)
    v0 = jnp.zeros((B_small, nf), jnp.float32)
    u = jnp.zeros(nf, jnp.float32).at[-2].set(0.1)

    # 1. batch consistency of the default implicit step
    am = (2 * RHO - 1) / (RHO + 1)
    af = RHO / (RHO + 1)
    beta = 0.25 * (1 - am + af) ** 2
    op = make_newmark_operator(
        model, dt=None, extra_systems=[(1.0 - am, (1.0 - af) * beta * DT * DT)]
    )
    a0 = op.solve(q0, 0.0)(u - op.internal_force(q0))

    def step(x):
        q, v, a = x[..., :nf], x[..., nf : 2 * nf], x[..., 2 * nf :]
        q, v, a = generalized_alpha_step(
            op, 0.0, q, v, a, DT, u, rho_inf=RHO, n_newton=1
        )
        return jnp.concatenate([q, v, a], axis=-1)

    try:
        dev = verify_batch_consistency(
            step, jnp.concatenate([q0, v0, a0], axis=-1)
        )
        report("batch-consistency (implicit step)", True, f"max dev {dev:.2e}")
    except RuntimeError as e:
        report("batch-consistency (implicit step)", False, str(e))

    # 1b. batch consistency of the SHARDED implicit step (the nonlinear
    # SPIKE program whose hardware rows went non-finite in rounds 3-4).
    # Same pitfall-4 detector as check 1, applied to the shard_map tier:
    # the batched vmap program must agree with itself run per-env — a
    # CPU-golden-free on-hardware miscompile probe. Skippable because the
    # sharded-family compile is the slowest in the repo
    # (HW_VALIDATE_SKIP_SHARDED=1).
    #
    # NOTE the default scale (N=200, B=8) does NOT reach the defect: the
    # round-5 bisection measured the Thomas-lowered program WRONG at
    # B=4096/N=1000 (q rel dev ~1e2 after one substep) while B=8 agrees
    # with CPU to 7e-07 — the miscompile is batch-width dependent.
    # HW_VALIDATE_DEEP=1 runs this probe at the failing scale with the
    # scan (Thomas) lowering to re-check the backend after upgrades
    # (~35-70 min of compiles in degraded worker states; the engines'
    # TPU default 'dense' lowering is unaffected either way).
    if not os.environ.get("HW_VALIDATE_SKIP_SHARDED"):
        from jax.sharding import Mesh

        from continuum_robot_tpu.parallel import make_spatial_beam
        from continuum_robot_tpu.parallel.facade import _node_force
        from continuum_robot_tpu.parallel.spatial_implicit import (
            build_spatial_genalpha,
        )

        deep = bool(os.environ.get("HW_VALIDATE_DEEP"))
        N_sh = 1000 if deep else N
        solver_sh = "thomas" if deep else None  # deep probes the scans
        model_sh = build_model(N_sh, kind="nonlinear")
        n_sh = model_sh.n_pos_states
        mesh_sh = Mesh(np.array(jax.devices()[:1]), ("sp",))
        beam_sh = make_spatial_beam(
            model_sh.beam_model.arrays,
            model_sh.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh_sh, axis="sp",
        )
        roll_sh = build_spatial_genalpha(
            beam_sh, DT, rho_inf=0.5, n_newton=2, use_consistent=True,
            local_solver=solver_sh,
        )
        bc_sh = model_sh.beam_model.bc_info
        free_sh = np.asarray(bc_sh.free_dofs)
        nn_sh = bc_sh.n_dofs_full // 3
        Bsh = 4096 if deep else 8
        qf_sh = np.zeros((Bsh, bc_sh.n_dofs_full), np.float32)
        qf_sh[:, free_sh] = rng.normal(scale=1e-6, size=(Bsh, n_sh))
        x_sh = np.zeros((Bsh, 2, beam_sh.n_nodes, 3), np.float32)
        x_sh[:, 0, :nn_sh, :] = qf_sh.reshape(Bsh, nn_sh, 3)
        u_red_sh = np.zeros(n_sh, np.float32)
        u_red_sh[-2] = 0.1
        u_sh = _node_force(model_sh, u_red_sh, beam_sh.n_nodes, jnp.float32)
        sub_sh = 1 if deep else 10
        run_sh = jax.jit(lambda x: roll_sh(
            x, 1, u=u_sh, substeps=sub_sh, return_carry=True)[2])
        xb = np.asarray(run_sh(jnp.asarray(x_sh)))
        devs = []
        for i in (0, Bsh // 2, Bsh - 1):
            xi = np.asarray(run_sh(jnp.asarray(x_sh[i:i + 1])))[0]
            denom = max(np.abs(xi).max(), 1e-30)
            devs.append(np.abs(xb[i] - xi).max() / denom)
        dev_sh = float(max(devs))
        finite_sh = bool(np.isfinite(xb).all())
        report(
            "batch-consistency (sharded nonlinear SPIKE step"
            + (", DEEP thomas B=4096" if deep else "") + ")",
            finite_sh and dev_sh < 1e-4,
            f"max dev {dev_sh:.2e}, finite={finite_sh}",
        )

    # 2. Pallas btd solve vs XLA Thomas
    d = rng.normal(size=(N + 1, 3, 3)).astype(np.float32)
    d = d + np.swapaxes(d, -1, -2) + 10 * np.eye(3, dtype=np.float32)
    up = (0.3 * rng.normal(size=(N, 3, 3))).astype(np.float32)
    lo = np.swapaxes(up, -1, -2).copy()
    f = jax.jit(banded.btd_factor)(jnp.asarray(d), jnp.asarray(lo), jnp.asarray(up))
    b = jnp.asarray(rng.normal(size=(B_small, N + 1, 3)).astype(np.float32))
    x_pal = btd_solve_pallas(f, b, interpret=interpret)
    x_xla = jax.jit(lambda r: banded.btd_solve(f, r))(b)
    dev = float(jnp.abs(x_pal - x_xla).max() / jnp.abs(x_xla).max())
    report("pallas btd_solve vs XLA Thomas", dev < 1e-5, f"rel dev {dev:.2e}")

    # 3./4. fused modal kernels vs XLA modal engine
    ms = make_modal_genalpha(model, DT, rho_inf=RHO)
    eta, etad = jax.jit(ms.to_modal)(q0, v0)
    u_m = ms.project_force_host(u)
    NS = 100
    e_x, ed_x, _ = jax.jit(lambda a_, b_: ms.rollout(a_, b_, u_m, NS))(eta, etad)
    e_p, ed_p, _ = ms.rollout_pallas(
        eta, etad, u_m, NS, tile=128, mode_tile=8 if interpret else 256,
        interpret=interpret,
    )
    dev = float(jnp.abs(e_p - e_x).max() / jnp.abs(e_x).max())
    report("fused modal steps vs XLA modal", dev < 1e-6, f"rel dev {dev:.2e}")

    # 3b. damped variant (Rayleigh structural damping column)
    ms_d = make_modal_genalpha(model, DT, rho_inf=RHO, rayleigh=(5.0, 1e-7))
    e_xd, _, _ = jax.jit(lambda a_, b_: ms_d.rollout(a_, b_, u_m, NS))(
        eta, etad
    )
    e_pd, _, _ = ms_d.rollout_pallas(
        eta, etad, u_m, NS, tile=128, mode_tile=8 if interpret else 256,
        interpret=interpret,
    )
    dev = float(jnp.abs(e_pd - e_xd).max() / jnp.abs(e_xd).max())
    report("fused damped-modal steps vs XLA", dev < 1e-6, f"rel dev {dev:.2e}")

    # 3b2. composed-propagator engine vs the stepper: K steps as one
    # host-precomputed affine map. Roundoff-grade agreement (composition
    # reassociates f32 arithmetic), not bit-equality.
    e_pw, _, _ = ms.rollout_power(
        eta, etad, u_m, NS, K=16, tile=128,
        mode_tile=8 if interpret else 16, interpret=interpret,
    )
    dev = float(jnp.abs(e_pw - e_x).max() / jnp.abs(e_x).max())
    report("composed-propagator vs XLA modal", dev < 1e-4,
           f"rel dev {dev:.2e}")

    # 3c. scan-unroll neutrality on this backend: unroll=8 fuses 8 steps
    # per scan iteration (the HBM-carry dial) and must not change results.
    e_u, ed_u, _ = jax.jit(
        lambda a_, b_: ms.rollout(a_, b_, u_m, NS, unroll=8)
    )(eta, etad)
    dev = float(jnp.abs(e_u - e_x).max() / jnp.abs(e_x).max())
    report("unrolled modal scan vs unroll=1", dev < 1e-6, f"rel dev {dev:.2e}")

    tsx, ex_f, _ = jax.jit(
        lambda a_, b_: ms.rollout_frames(a_, b_, u_m, 10, substeps=10)
    )(eta, etad)
    tsp, ep_f, _ = ms.rollout_frames_pallas(
        eta, etad, u_m, 10, substeps=10, tile=128,
        mode_tile=8 if interpret else 256, interpret=interpret,
    )
    dev = float(jnp.abs(ep_f - ex_f).max() / jnp.abs(ex_f).max())
    report("fused modal frames vs XLA frames", dev < 1e-6, f"rel dev {dev:.2e}")

    # 4b. fused ROM rollout vs XLA ROM engine (nonlinear beam, split path)
    from continuum_robot_tpu.models.simulate import make_modal_rom

    model_nl = build_model(N, kind="nonlinear")
    nf_nl = model_nl.n_pos_states
    m_rom = 64 if on_tpu else 12
    ms_rom = make_modal_rom(model_nl, DT, rho_inf=0.5, n_modes=m_rom)
    # Amplitude set by physical deflection (~1% of beam length), not modal
    # units: mass-orthonormal mode shapes scale with the mesh, and an
    # over-large state sends the von Karman cubic (both engines) to NaN.
    # Excite only the lowest modes — the same displacement amplitude in a
    # high mode carries ~k^2 the curvature, and the membrane (dw/dx)^2 term
    # diverges physically (both engines) if all m_rom modes carry it.
    L_total = float(N) * 0.25 / 6.0
    amp = 0.01 * L_total / float(np.abs(ms_rom.Phi).max())
    n_excited = min(8, m_rom)
    eta_np = np.zeros((B_small, m_rom), np.float32)
    eta_np[:, :n_excited] = rng.normal(scale=amp, size=(B_small, n_excited))
    eta_r = jnp.asarray(eta_np)
    etad_r = jnp.zeros((B_small, m_rom), jnp.float32)
    u_nl = np.zeros(nf_nl, np.float32)
    u_nl[-2] = 5.0
    u_rm = jnp.asarray(ms_rom.project_force_host(u_nl), jnp.float32)
    P = jax.lax.Precision
    e_rx, _, _ = jax.jit(
        lambda a_, b_: ms_rom.rollout(
            a_, b_, u_rm, NS, n_newton=2, precision=P.HIGHEST,
            nl_precision=P.HIGHEST,
        )
    )(eta_r, etad_r)
    fused_rom = ms_rom.make_pallas_rollout(tile=128)
    e_rp, _, _ = fused_rom(
        eta_r, etad_r, u_rm, NS, n_newton=2,
        precision=P.HIGHEST, nl_precision=P.HIGHEST, interpret=interpret,
    )
    dev = float(jnp.abs(e_rp - e_rx).max() / jnp.abs(e_rx).max())
    report("fused ROM rollout vs XLA ROM", dev < 1e-4, f"rel dev {dev:.2e}")

    # 4c. ECSW gathered-sample fused kernel vs the XLA gathered engine —
    # the hyper-reduced layout (six basis blocks, sample-only element
    # columns, diagonal Newton) on real hardware.
    z = jnp.zeros((1, m_rom), jnp.float32)
    _, etas_tr, _ = ms_rom.rollout_frames(z, z, u_rm, 20, substeps=5,
                                          n_newton=2)
    red = ms_rom.hyper_reduce(np.asarray(etas_tr[::2, 0, :]), tau=1e-8)
    e_gx, _, _ = jax.jit(
        lambda a_, b_: red.rollout(
            a_, b_, u_rm, NS, n_newton=2, precision=P.HIGHEST,
            nl_precision=P.HIGHEST,
        )
    )(eta_r, etad_r)
    fused_g = red.make_pallas_rollout(tile=128)
    e_gp, _, _ = fused_g(
        eta_r, etad_r, u_rm, NS, n_newton=2,
        precision=P.HIGHEST, nl_precision=P.HIGHEST, interpret=interpret,
    )
    dev = float(jnp.abs(e_gp - e_gx).max() / jnp.abs(e_gx).max())
    report("ECSW gathered fused kernel vs XLA", dev < 1e-4,
           f"rel dev {dev:.2e}")

    # 5. fused small-beam rollout vs integrator
    small = build_model(6)
    ns = small.n_pos_states
    x0s = jnp.zeros((B_small, 2 * ns), jnp.float32).at[:, ns - 2].set(1e-3)
    ts, ys = fused_rollout(
        small, x0s, t_final=0.01, dt=1e-3, substeps=10, interpret=interpret
    )
    from continuum_robot_tpu.models.simulate import simulate

    res = simulate(
        small, x0s, 0.01, 1e-3, method="generalized_alpha", substeps=10
    )
    y_ref = res.ys  # (frames+1, B, 2n) — same layout as fused_rollout's ys
    dev = float(jnp.abs(ys - y_ref).max() / jnp.abs(y_ref).max())
    report("fused small-beam rollout vs integrator", dev < 1e-4,
           f"rel dev {dev:.2e}")

    # 6. cyclic reduction vs Thomas
    f_cr = jax.jit(banded.btd_cr_factor)(
        jnp.asarray(d), jnp.asarray(lo), jnp.asarray(up)
    )
    x_cr = jax.jit(lambda r: banded.btd_cr_solve(f_cr, r))(b)
    dev = float(jnp.abs(x_cr - x_xla).max() / jnp.abs(x_xla).max())
    report("cyclic-reduction solve vs Thomas", dev < 1e-4, f"rel dev {dev:.2e}")

    # 7. sync probe (WARN only): does block_until_ready track a host read?
    # Needs enough device work to stand clear of the ~30 ms call overhead:
    # ~20k steps x 2k envs here is ~0.5 s of true kernel time.
    if on_tpu:
        B_probe, NS_probe = 2048, 20000
        eta_p = jnp.asarray(
            rng.normal(scale=1e-6, size=(B_probe, nf)), jnp.float32
        )
        etad_p = jnp.zeros((B_probe, nf), jnp.float32)
        e1, _, _ = ms.rollout_pallas(eta_p, etad_p, u_m, NS_probe)
        float(jnp.sum(e1))  # warm
        t0 = time.time()
        e1, _, _ = ms.rollout_pallas(eta_p, etad_p, u_m, NS_probe)
        e1.block_until_ready()
        t_block = time.time() - t0
        t0 = time.time()
        e1, _, _ = ms.rollout_pallas(eta_p, etad_p, u_m, NS_probe)
        float(jnp.sum(e1))
        t_host = time.time() - t0
        lying = t_host > 5 * t_block and t_host > 0.01
        tag = "WARN" if lying else "OK  "
        print(
            f"[{tag}] block_until_ready probe: block={t_block*1e3:.1f} ms, "
            f"host-read={t_host*1e3:.1f} ms"
            + (" — block_until_ready is NOT awaiting Pallas custom calls; "
               "never use it for timing" if lying else "")
        )

    print()
    if FAILURES:
        print(f"{len(FAILURES)} check(s) FAILED: {', '.join(FAILURES)}")
        sys.exit(1)
    print("all hardware checks passed")


if __name__ == "__main__":
    main()
