"""Sampling-based planning: random-shooting MPC over batched rollouts.

The BASELINE north star calls for "thousands of beam rollouts batched via
vmap for parameter sweeps and sampling-based path planning". This example
plans tip motion with the simplest strong baseline — random shooting MPC:

  1. sample K candidate input sequences (piecewise-constant tip forces),
  2. roll all K out in ONE compiled batched simulation,
  3. apply the first segment of the best candidate, repeat (receding horizon).

Every MPC iteration is two device calls (rollout batch + argmin); on a mesh
the candidate axis shards like any environment batch.

Usage: python examples/sampling_planner.py [n_candidates] (default 256)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from example_utilities import cleanup_temp_files, create_beam_parameters

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.ops.integrators import integrate_fixed


def main():
    n_candidates = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    horizon_segments = 4  # piecewise-constant segments per horizon
    seg_time = 0.05  # seconds per segment
    dt = 0.001
    substeps = 10
    n_mpc_rounds = 6
    target_tip = 2e-3  # desired tip transverse displacement [m]

    linear_file, _, _ = create_beam_parameters()
    model = DynamicEulerBernoulliBeam(linear_file)
    n = model.n_pos_states
    rhs = model.build_rhs()
    steps_per_seg = int(round(seg_time / dt))

    def rollout_candidate(x0, forces_seq):
        """forces_seq: (horizon_segments,) tip-force amplitudes."""

        def seg(x, f_amp):
            u = jnp.zeros(n).at[-2].set(f_amp)
            _, xs = integrate_fixed(
                rhs, x, 0.0, dt, steps_per_seg, u=u, substeps=substeps
            )
            return xs[-1], xs[-1, n - 2]

        x_final, tips = jax.lax.scan(seg, x0, forces_seq)
        return x_final, tips

    def plan_cost(x0, forces_seq):
        x_final, tips = rollout_candidate(x0, forces_seq)
        track = jnp.sum((tips - target_tip) ** 2)
        effort = 1e-4 * jnp.sum(forces_seq**2)
        terminal_v = 1e-4 * jnp.sum(x_final[n:] ** 2)
        return track + effort + terminal_v

    batched_cost = jax.jit(jax.vmap(plan_cost, in_axes=(None, 0)))

    key = jax.random.PRNGKey(0)
    x = jnp.zeros(2 * n)
    print(f"target tip: {target_tip:.1e} m; {n_candidates} candidates, "
          f"{horizon_segments}x{seg_time}s horizon")

    t0 = time.time()
    for rnd in range(n_mpc_rounds):
        key, sub = jax.random.split(key)
        candidates = 0.3 * jax.random.normal(
            sub, (n_candidates, horizon_segments)
        )
        costs = batched_cost(x, candidates)
        best = jnp.argmin(costs)
        chosen = candidates[best]
        # Apply only the first segment (receding horizon).
        u = jnp.zeros(n).at[-2].set(chosen[0])
        _, xs = jax.jit(
            lambda x, u: integrate_fixed(rhs, x, 0.0, dt, steps_per_seg,
                                         u=u, substeps=substeps)
        )(x, u)
        x = xs[-1]
        print(f"  round {rnd}: best cost {float(costs[best]):.3e}, "
              f"applied force {float(chosen[0]):+.3f} N, "
              f"tip = {float(x[n - 2]):+.4e} m")
    wall = time.time() - t0

    err = abs(float(x[n - 2]) - target_tip) / target_tip
    total_rollouts = n_mpc_rounds * n_candidates
    print(f"\nfinal tip {float(x[n - 2]):.4e} m (target {target_tip:.1e}, "
          f"err {err * 100:.1f}%)")
    print(f"{total_rollouts} full rollouts in {wall:.2f}s "
          f"(incl. compile) -> {total_rollouts / wall:.0f} rollouts/s")
    cleanup_temp_files(linear_file)


if __name__ == "__main__":
    main()
