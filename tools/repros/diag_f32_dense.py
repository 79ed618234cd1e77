"""Discriminator for the sharded-NL blowup: same config on other engines.

Runs the exact diag_f32_cpu.py workload (240 elements, tip force 0.1,
noise-1e-6 ICs, dt=1e-4, rho_inf=0.5, n_newton=2) on:
  a) the SINGLE-CHIP dense generalized-alpha engine (f64), and
  b) the sharded SPIKE engine with a LINEAR beam (f64),
to isolate whether the instability lives in the gen-alpha formulation, the
nonlinear element path, or the sharded machinery.

Run:  python tools/repros/diag_f32_dense.py [--steps 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--elements", type=int, default=240)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                    "tests"))
    import helpers

    from continuum_robot_tpu.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam,
    )
    from continuum_robot_tpu.models.simulate import make_newmark_operator
    from continuum_robot_tpu.ops import integrators

    # --- a) dense single-chip nonlinear -------------------------------
    model = DynamicEulerBernoulliBeam(
        helpers.write_beam_csv(["nonlinear"] * args.elements))
    n = model.n_pos_states
    rng = np.random.default_rng(0)
    q0 = rng.normal(scale=1e-6, size=n)
    v0 = np.zeros(n)
    u = np.zeros(n)
    u[-2] = 0.1

    op = make_newmark_operator(model, dt=None, linear_solver="btd",
                               extra_systems=None)
    roll = jax.jit(lambda q, v: integrators.integrate_generalized_alpha(
        op, q, v, 0.0, args.chunk * 1e-4, 1, u=jnp.asarray(u),
        rho_inf=0.5, n_newton=2, substeps=args.chunk))

    print("# DENSE nonlinear f64")
    q, v = jnp.asarray(q0), jnp.asarray(v0)
    for k in range(args.steps // args.chunk):
        _, qs, vs = roll(q, v)
        q, v = qs[-1], vs[-1]
        qm, vm = float(jnp.abs(q).max()), float(jnp.abs(v).max())
        print(f"{(k + 1) * args.chunk:6d}  {qm:.5e}  {vm:.5e}")
        if not np.isfinite(qm):
            break

    # --- b) sharded LINEAR --------------------------------------------
    from jax.sharding import Mesh

    from continuum_robot_tpu.parallel.facade import _node_force
    from continuum_robot_tpu.parallel.spatial import make_spatial_beam
    from continuum_robot_tpu.parallel.spatial_implicit import (
        build_spatial_genalpha,
    )

    model_l = DynamicEulerBernoulliBeam(
        helpers.write_beam_csv(["linear"] * args.elements))
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    beam = make_spatial_beam(
        model_l.beam_model.arrays,
        model_l.beam_model.bc_info.free_mask.reshape(-1, 3),
        mesh, axis="sp",
    )
    Np = beam.n_nodes
    rollS = build_spatial_genalpha(beam, 1e-4, rho_inf=0.5, n_newton=2)
    bc = model_l.beam_model.bc_info
    free = np.asarray(bc.free_dofs)
    n_full = bc.n_dofs_full
    nn = n_full // 3
    qf = np.zeros(n_full)
    qf[free] = q0
    x0 = np.zeros((2, Np, 3))
    x0[0, :nn, :] = qf.reshape(nn, 3)
    u_node = _node_force(model_l, u, Np, jnp.float64)
    runS = jax.jit(lambda s: rollS(
        s, 1, u=u_node, substeps=args.chunk, return_carry=True)[2])

    print("# SHARDED linear f64")
    x = jnp.asarray(x0)
    for k in range(args.steps // args.chunk):
        x = runS(x)
        h = np.asarray(x)
        print(f"{(k + 1) * args.chunk:6d}  {np.abs(h[0]).max():.5e}  "
              f"{np.abs(h[1]).max():.5e}")
        if not np.isfinite(h).all():
            break


if __name__ == "__main__":
    main()
