"""Gravity beam comparison sweep (TPU-native).

Port of ``examples/beam_comparison_gravity.py`` (reference): linear /
nonlinear / mixed cantilevers sagging under standard gravity with a tip
impulse, followed by the performance table and tip statistics.

Usage: python examples/beam_comparison_gravity.py [--plot] [--animate]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from example_utilities import (
    DT,
    N_SEGMENTS,
    SimulationTask,
    animate_beam_shapes,
    calculate_natural_frequencies,
    cleanup_temp_files,
    create_beam_parameters,
    extract_beam_shapes,
    get_material_properties,
    print_performance_table,
    simulate_single_beam,
)

from continuum_robot_tpu.models import ForceParams


def main():
    linear_file, nonlinear_file, mixed_file = create_beam_parameters()
    gravity = ForceParams(enable_gravity_effects=True)

    tasks = [
        SimulationTask("Linear (Gravity)", linear_file, gravity),
        SimulationTask("Nonlinear (Gravity)", nonlinear_file, gravity),
        SimulationTask("Mixed Lin-Base/Nonlin-Tip (Gravity)", mixed_file, gravity),
    ]

    t0 = time.time()
    results, times, stats = {}, {}, {}
    for task in tasks:
        name, res, wall, st = simulate_single_beam(task)
        results[name], times[name], stats[name] = res, wall, st
        print(f"  {name}: {wall:.2f}s")
    print(f"\nTotal sweep time: {time.time() - t0:.2f}s")

    print_performance_table(times, stats)

    props = get_material_properties()
    print("\nAnalytic frequencies (Hz):",
          [f"{f:.2f}" for f in calculate_natural_frequencies(
              props['length'] * N_SEGMENTS, props['E'], props['MInertia'],
              props['rho'], props['A'])])
    for name, res in results.items():
        ys = np.asarray(res.ys)
        n = ys.shape[-1] // 2
        tip = ys[:, n - 2]
        print(f"  {name}: final tip sag {tip[-1]:.4e} m, max |tip| {np.abs(tip).max():.4e} m")

    if "--plot" in sys.argv:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 5))
        for name, res in results.items():
            ys = np.asarray(res.ys)
            n = ys.shape[-1] // 2
            ax.plot(np.asarray(res.ts), ys[:, n - 2], label=name)
        ax.set(xlabel="t [s]", ylabel="tip w [m]")
        ax.legend(fontsize=8)
        fig.tight_layout()
        fig.savefig("beam_comparison_gravity.png", dpi=120)
        print("wrote beam_comparison_gravity.png")

    # Beam-shape animation parity (reference drives FuncAnimation; headless
    # parity writes the same frames as a GIF).
    if "--animate" in sys.argv:
        shapes = {
            name: extract_beam_shapes(res, N_SEGMENTS, props["length"])
            for name, res in results.items()
        }
        animate_beam_shapes(shapes, "beam_comparison_gravity.gif", dt=DT)

    cleanup_temp_files(linear_file, nonlinear_file, mixed_file)


if __name__ == "__main__":
    main()
