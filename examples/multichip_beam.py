"""Multi-chip workflow: a beam too long for one chip, batched over envs.

The reference scales by `multiprocessing.Pool` over host processes
(`/root/reference/examples/` perf tables); this framework scales over a
`jax.sharding.Mesh` instead. This example drives every sharded tier on a
dp x sp device grid:

* **explicit** — `spatial_rollout`: RK4 over node-sharded state, 3-DOF
  `ppermute` halo exchange + psum-CG mass solves;
* **implicit** — `build_spatial_genalpha`: distributed-SPIKE solves of the
  block-tridiagonal effective Jacobian (the stiff production engine);
* **error-controlled** — `build_spatial_sdirk3`: the L-stable embedded
  engine; rtol/atol pick every step, the psum-contracted error norm makes
  all shards take identical accept/reject decisions;
* **reduced-order** — `build_spatial_modal_rom`: basis rows node-sharded,
  per-Newton correction local + one `(m,)` psum; ECSW hyper-reduction
  composes, with the trained-envelope audit sharded over the beam axis.

On this machine it runs on 8 FAKE CPU devices (the same fake mesh the test
suite uses) — the programs are identical on real multi-chip TPU hardware;
only the mesh construction changes (`jax.devices()` picks up real chips).

Usage: python examples/multichip_beam.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The fake-device flag must be set before the first jax import.
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU via the
# config (this example targets the fake mesh — see module docstring).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import pandas as pd

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.parallel import (
    build_spatial_genalpha,
    build_spatial_modal_rom,
    build_spatial_sdirk3,
    make_mesh,
    make_spatial_beam,
    spatial_rollout,
)


def make_long_beam(n_elements=96):
    """Hybrid (linear root / nonlinear tip) Nitinol cantilever."""
    L, E, r, rho = 1.0, 75e9, 0.005, 6450.0
    I = np.pi * r**4 / 4
    A = np.pi * r**2
    n = n_elements
    df = pd.DataFrame({
        "length": [L / n] * n,
        "elastic_modulus": [E] * n,
        "moment_inertia": [I] * n,
        "density": [rho] * n,
        "cross_area": [A] * n,
        "type": ["linear"] * (n // 2) + ["nonlinear"] * (n - n // 2),
        "boundary_condition": ["FIXED"] + ["NONE"] * (n - 1),
        "wetted_area": [2 * np.pi * r * L / n] * n,
        "drag_coef": [0.82] * n,
    })
    return DynamicEulerBernoulliBeam(df)


def main():
    n_el = 96
    model = make_long_beam(n_el)
    mesh = make_mesh({"dp": 2, "sp": 4})
    print(f"device mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"over {jax.device_count()} devices "
          f"({jax.devices()[0].platform})")
    print(f"beam: {n_el} elements, {model.n_pos_states} free DOFs, "
          "root half linear / tip half nonlinear\n")

    beam = make_spatial_beam(
        model.beam_model.arrays,
        model.beam_model.bc_info.free_mask.reshape(-1, 3),
        mesh,
    )
    Np = beam.n_nodes
    B = 2  # env batch over dp

    # Constant transverse tip load, node layout, per-env scaled.
    tip = beam.n_nodes_real - 1
    u = np.zeros((Np, 3))
    u[tip, 1] = 0.5
    u_j = jnp.asarray(u)
    x0 = jnp.zeros((B, 2, Np, 3))

    # --- explicit tier: RK4 + psum-CG mass solves --------------------
    t0 = time.perf_counter()
    ts, xs = spatial_rollout(beam, x0, 2e-4, 1e-6, u=u_j, substeps=20)
    tip_w = np.asarray(xs)[-1, :, 0, tip, 1]
    print(f"explicit RK4      frames={len(np.asarray(ts))} "
          f"tip w={tip_w[0]:+.3e} m  wall={time.perf_counter() - t0:.1f}s")

    # --- implicit tier: distributed-SPIKE generalized-alpha ----------
    t0 = time.perf_counter()
    rollout_ga = build_spatial_genalpha(beam, 1e-5, rho_inf=0.8, n_newton=1)
    ts, xs = rollout_ga(x0, 10, u=u_j, substeps=20)
    tip_w = np.asarray(xs)[-1, :, 0, tip, 1]
    print(f"implicit gen-α    frames={len(np.asarray(ts))} "
          f"tip w={tip_w[0]:+.3e} m  wall={time.perf_counter() - t0:.1f}s "
          "(dt=1e-5, 200 steps)")

    # --- error-controlled tier: sharded SDIRK3 -----------------------
    t0 = time.perf_counter()
    rollout_s3 = build_spatial_sdirk3(beam, n_newton=2)
    t_eval = np.linspace(0.0, 2e-3, 5)
    xs, stats = rollout_s3(x0, t_eval, u=u_j, rtol=1e-6, atol=1e-9)
    acc = np.asarray(stats.n_accepted)
    rej = np.asarray(stats.n_rejected)
    tip_w = np.asarray(xs)[-1, :, 0, tip, 1]
    print(f"adaptive SDIRK3   acc={acc.tolist()} rej={rej.tolist()} "
          f"(per env)  tip w={tip_w[0]:+.3e} m  "
          f"wall={time.perf_counter() - t0:.1f}s (rtol=1e-6 — no manual dt)")

    # --- reduced-order tier: sharded modal-ROM + ECSW guard ----------
    t0 = time.perf_counter()
    sm = build_spatial_modal_rom(model, mesh, 1e-5, rho_inf=0.5, n_modes=24)
    n = model.n_pos_states
    u_red = np.zeros(n)
    u_red[-2] = 0.5
    u_m = jnp.asarray(sm.ms.project_force_host(u_red))
    z = jnp.zeros((1, sm.n_modes))
    _, etas_tr, _ = sm.rollout_frames(z, z, u_m, 20, substeps=10,
                                      n_newton=2)
    print(f"sharded modal-ROM m={sm.n_modes} training rollout "
          f"wall={time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    red, info = sm.hyper_reduce(np.asarray(etas_tr[::2, 0, :]), tau=1e-3,
                                return_info=True)
    _, es, _eds, guard = red.rollout_frames_guarded(
        jnp.asarray(etas_tr[-1, 0]), jnp.zeros(sm.n_modes), u_m,
        6, substeps=10,
    )
    print(f"ECSW sample s={info['n_sampled']}/{n_el} elements "
          f"(train residual {info['train_residual']:.1e})")
    print(f"guarded rollout   max envelope residual "
          f"{float(guard['max_residual']):.2e} "
          f"(tol {guard['guard_tol']:.0e}) flagged={bool(guard['flagged'])} "
          f"wall={time.perf_counter() - t0:.1f}s")

    # Out-of-envelope content is detected, not silently wrong: force the
    # clamp region, which the tip-load training never excited.
    u_bad = np.zeros(n)
    u_bad[1] = 0.5
    u_bad_m = jnp.asarray(sm.ms.project_force_host(u_bad))
    _, _, _, g_bad = red.rollout_frames_guarded(
        z[0], z[0], u_bad_m, 6, substeps=10,
    )
    print(f"out-of-envelope   max residual "
          f"{float(g_bad['max_residual']):.2e} "
          f"flagged={bool(g_bad['flagged'])}  <- the audit catches it")

    # Physical frames reconstruct shard-locally: the full (frames, Np, 3)
    # trajectory never materializes on one device.
    qs, _vs = red.physical_frames(es, _eds)
    print(f"\nphysical frames: {tuple(qs.shape)} node-sharded over "
          f"'{red.axis}'; tip deflection {float(qs[-1, tip, 1]):+.3e} m")

    # --- differentiable tier: system ID on the sharded beam ----------
    # rollout(..., arrays=...) rebuilds mass bands / element fields inside
    # the trace, so jax.grad flows through the distributed-SPIKE rollout:
    # identify the elastic modulus of a beam too long for one chip from a
    # "measured" tip trace (examples/system_identification.py is the
    # single-chip version of this workflow).
    import dataclasses

    t0 = time.perf_counter()
    x1 = jnp.zeros((2, Np, 3))
    arrs0 = jax.tree_util.tree_map(jnp.asarray, beam.arrays)
    E0 = jnp.asarray(beam.arrays.elastic_modulus)

    def tip_trace(s):
        arrs = dataclasses.replace(arrs0, elastic_modulus=s * E0)
        _, xs = rollout_ga(x1, 4, u=u_j, substeps=5, arrays=arrs)
        return xs[:, 0, tip, 1]

    target = tip_trace(jnp.asarray(1.0))  # "measured" data (true E)

    @jax.jit
    def loss_grad(s):
        def loss(s):
            d = tip_trace(s) - target
            return jnp.sum(d * d) / jnp.sum(target * target)

        return jax.value_and_grad(loss)(s)

    # Secant iteration on dloss/ds = 0 (1-D problem; each evaluation is
    # one reverse-mode pass through the whole sharded rollout).
    s_prev, s = 0.7, 0.8  # start from a 30% misestimate
    _, g_prev = loss_grad(jnp.asarray(s_prev))
    g_prev = float(g_prev)
    for it in range(8):
        val, g = loss_grad(jnp.asarray(s))
        g = float(g)
        if g == g_prev or abs(g) < 1e-18:
            break
        s, s_prev, g_prev = s - g * (s - s_prev) / (g - g_prev), s, g
    val, _ = loss_grad(jnp.asarray(s))
    print(f"sharded system ID: recovered E scale {s:.6f} "
          f"(true 1.0, started 0.7, loss {float(val):.1e}) "
          f"wall={time.perf_counter() - t0:.1f}s "
          "— jax.grad through the distributed-SPIKE rollout")


if __name__ == "__main__":
    main()
