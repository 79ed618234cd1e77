"""Massively batched rollouts: the vmap/pjit replacement for the Pool sweep.

The reference parallelizes its comparison sweeps with a process pool of at
most ``cpu_count()`` workers, pickling tasks and solutions across process
boundaries (``beam_comparison_fluid.py:82-84``). Here the same idea scales to
thousands of environments on one chip: the environment axis is a vmapped
batch dimension of a single compiled rollout, and on a multi-chip mesh the
same program shards that axis over ICI (``parallel/rollout.py``).

Two sweep modes:
  * initial-condition sweep — one beam, a batch of perturbed starts
    (sampling-based planning / uncertainty propagation shape);
  * parameter sweep — a batch of beams with different fluid densities via a
    vmapped force term.

Usage: python examples/batched_rollouts.py [n_envs] (default 512)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from example_utilities import create_beam_parameters, cleanup_temp_files

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam, ForceParams
from continuum_robot_tpu.parallel import batched_rollout, make_mesh, sweep_statistics


def main():
    n_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    linear_file, _, _ = create_beam_parameters()
    beam = DynamicEulerBernoulliBeam(
        linear_file, ForceParams(enable_fluid_effects=True, fluid_density=1000.0)
    )
    n = beam.n_pos_states

    # Initial-condition sweep: randomized tip perturbations.
    rng = np.random.default_rng(0)
    x0 = np.zeros((n_envs, 2 * n))
    x0[:, n - 2] = rng.normal(scale=1e-3, size=n_envs)

    mesh = make_mesh() if jax.device_count() > 1 else None

    t0 = time.time()
    res = batched_rollout(
        beam, x0, t_final=0.25, dt=0.001,
        method="generalized_alpha", substeps=20, mesh=mesh,
    )
    stats = sweep_statistics(res.ys)
    tip_max = float(stats["tip_abs_max"])
    wall = time.time() - t0

    frames = np.asarray(res.ys).shape[0] - 1
    env_steps = n_envs * frames * 20
    print(f"{n_envs} envs x {frames * 20} implicit steps in {wall:.2f}s "
          f"(incl. compile) -> {env_steps / wall:,.0f} env-steps/s")
    print(f"max |tip| across sweep: {tip_max:.4e} m")
    print(f"state RMS: {float(stats['state_rms']):.4e}")

    # Second call reuses the compiled program: steady-state throughput.
    t0 = time.time()
    res2 = batched_rollout(
        beam, x0, t_final=0.25, dt=0.001,
        method="generalized_alpha", substeps=20, mesh=mesh,
    )
    # Scalar host read, not block_until_ready: the latter does not await
    # Pallas custom calls on this backend (docs/design.md pitfall 6).
    float(jnp.sum(res2.ys[-1]))
    wall2 = time.time() - t0
    print(f"steady-state: {env_steps / wall2:,.0f} env-steps/s")

    # The modal engine runs the identical gen-alpha recurrence diagonalized
    # per mode — the fast path for all-linear sweeps. It excludes state-
    # dependent forces, so compare on the dry (no-drag) beam.
    beam_dry = DynamicEulerBernoulliBeam(linear_file)
    res3 = batched_rollout(
        beam_dry, x0, t_final=0.25, dt=0.001,
        method="modal", substeps=20, mesh=mesh,
    )
    float(jnp.sum(res3.ys[-1]))
    t0 = time.time()
    res3 = batched_rollout(
        beam_dry, x0, t_final=0.25, dt=0.001,
        method="modal", substeps=20, mesh=mesh,
    )
    float(jnp.sum(res3.ys[-1]))
    wall3 = time.time() - t0
    print(f"modal engine (dry beam): {env_steps / wall3:,.0f} env-steps/s")

    cleanup_temp_files(linear_file)


if __name__ == "__main__":
    main()
