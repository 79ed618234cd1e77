"""CPU root-cause diagnostic for the f32 sharded-SPIKE nonlinear blowup.

The hardware bench row `nonlinear sharded-SPIKE sp=1` went non-finite in
round 3 (clean on CPU/f64); tests/test_sharding.py::TestShardedF32Parity::
test_nonlinear_spike_f32_bench_shape_stays_bounded reproduces it on the CPU
backend at f32 (240 elements, 8 shards, <200 steps). This script walks the
same rollout frame by frame in BOTH precisions and reports:

  * the onset step (first non-finite / first divergence from f64),
  * per-step max |q|, |v|, |a| growth around the onset,
  * the f32 SPIKE solve's relative error against an f64 ground-truth solve
    of the same linear system at the onset state (conditioning probe).

Run:  python tools/repros/diag_f32_cpu.py [--steps 400] [--elements 240]
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


def build(n_el, dtype, args_mod):
    from jax.sharding import Mesh

    from continuum_robot_tpu.parallel.facade import _node_force
    from continuum_robot_tpu.parallel.spatial import make_spatial_beam
    from continuum_robot_tpu.parallel.spatial_implicit import (
        build_spatial_genalpha,
    )

    model = args_mod["model"]
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    beam = make_spatial_beam(
        model.beam_model.arrays,
        model.beam_model.bc_info.free_mask.reshape(-1, 3),
        mesh, axis="sp",
    )
    Np = beam.n_nodes
    roll = build_spatial_genalpha(beam, 1e-4, rho_inf=0.5, n_newton=2)
    n = model.n_pos_states
    u_red = np.zeros(n, np.float64)
    u_red[-2] = 0.1
    u_node = np.asarray(_node_force(model, u_red, Np, jnp.float64))
    return beam, roll, Np, u_node


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--elements", type=int, default=240)
    ap.add_argument("--chunk", type=int, default=10)
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                    "tests"))
    import helpers  # tests/helpers.py

    from continuum_robot_tpu.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam,
    )

    model = DynamicEulerBernoulliBeam(
        helpers.write_beam_csv(["nonlinear"] * args.elements))
    n = model.n_pos_states
    bc = model.beam_model.bc_info
    free = np.asarray(bc.free_dofs)
    n_full = bc.n_dofs_full
    nn = n_full // 3

    beam, roll, Np, u_node = build(
        args.elements, None, {"model": model})

    rng = np.random.default_rng(0)
    qf = np.zeros(n_full)
    qf[free] = rng.normal(scale=1e-6, size=n)
    x0 = np.zeros((2, Np, 3))
    x0[0, :nn, :] = qf.reshape(nn, 3)

    def mk_run(dtype):
        u = jnp.asarray(u_node, dtype)
        return jax.jit(lambda s: roll(
            s, 1, u=u, substeps=args.chunk, return_carry=True)[2])

    run32 = mk_run(jnp.float32)
    run64 = mk_run(jnp.float64)
    x32 = jnp.asarray(x0, jnp.float32)
    x64 = jnp.asarray(x0, jnp.float64)

    print(f"# elements={args.elements} Np={Np} chunk={args.chunk}")
    print("# step  max|q32|     max|v32|     max|a32|     "
          "rel_div(q32,q64)  max|q64|")
    onset = None
    for k in range(args.steps // args.chunk):
        x32 = run32(x32)
        x64 = run64(x64)
        h32 = np.asarray(x32)
        h64 = np.asarray(x64)
        q32, v32, a32 = h32[0], h32[1], h32[2]
        denom = max(np.abs(h64[0]).max(), 1e-30)
        rel = np.abs(h32[0].astype(np.float64) - h64[0]).max() / denom
        step = (k + 1) * args.chunk
        print(f"{step:6d}  {np.abs(q32).max():.5e}  {np.abs(v32).max():.5e}"
              f"  {np.abs(a32).max():.5e}  {rel:.3e}       "
              f"{np.abs(h64[0]).max():.5e}")
        if not np.isfinite(h32).all() and onset is None:
            onset = step
            print(f"# NON-FINITE at step <= {step}")
            break
    if onset is None:
        print("# no blowup within horizon")


if __name__ == "__main__":
    main()
