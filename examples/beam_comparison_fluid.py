"""Fluid-drag beam comparison sweep (TPU-native).

Port of ``examples/beam_comparison_fluid.py`` (reference): six tasks —
linear / nonlinear / mixed x {no fluid, water} — each a tip-impulse rollout,
followed by the per-solver performance table and an FFT of the tip
displacement against the analytic cantilever natural frequencies.

Where the reference farms tasks to ``multiprocessing.Pool`` (:82-84), the
tasks here run sequentially as compiled rollouts (already ~100x faster each),
and the genuinely parallel version — all variants as one vmapped batch — is
in ``examples/batched_rollouts.py``.

Usage: python examples/beam_comparison_fluid.py [--plot] [--animate]
"""

from __future__ import annotations

import sys
import time

import numpy as np

from example_utilities import (
    DT,
    N_SEGMENTS,
    SimulationTask,
    T_FINAL,
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

FLUID_DENSITY = 1000.0  # water


def main():
    linear_file, nonlinear_file, mixed_file = create_beam_parameters()

    fluid = ForceParams(enable_fluid_effects=True, fluid_density=FLUID_DENSITY)
    tasks = [
        SimulationTask("Linear (No Fluid)", linear_file),
        SimulationTask("Linear (Fluid)", linear_file, fluid),
        SimulationTask("Nonlinear (No Fluid)", nonlinear_file),
        SimulationTask("Nonlinear (Fluid)", nonlinear_file, fluid),
        SimulationTask("Mixed Lin-Base/Nonlin-Tip (No Fluid)", mixed_file),
        SimulationTask("Mixed Lin-Base/Nonlin-Tip (Fluid)", mixed_file, fluid),
    ]

    t0 = time.time()
    results, times, stats = {}, {}, {}
    for task in tasks:
        name, res, wall, st = simulate_single_beam(task)
        results[name], times[name], stats[name] = res, wall, st
        print(f"  {name}: {wall:.2f}s")
    total = time.time() - t0
    print(f"\nTotal sweep time: {total:.2f}s for {len(tasks)} simulations")

    print_performance_table(times, stats)

    # FFT of tip displacement vs analytic natural frequencies (ref :167-222).
    props = get_material_properties()
    freqs_analytic = calculate_natural_frequencies(
        props["length"] * N_SEGMENTS, props["E"], props["MInertia"],
        props["rho"], props["A"],
    )
    print("\nAnalytic cantilever natural frequencies (Hz):",
          [f"{f:.2f}" for f in freqs_analytic])

    for name, res in results.items():
        ys = np.asarray(res.ys)
        n = ys.shape[-1] // 2
        tip = ys[:, n - 2]
        spectrum = np.abs(np.fft.rfft(tip - tip.mean()))
        freqs = np.fft.rfftfreq(len(tip), DT)
        peak = freqs[np.argmax(spectrum[1:]) + 1]
        damp = "damped" if "(Fluid)" in name else "undamped"
        print(f"  {name}: dominant tip frequency {peak:.2f} Hz ({damp}), "
              f"max |tip| {np.abs(tip).max():.4e} m")

    if "--plot" in sys.argv:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, figsize=(10, 8))
        for name, res in results.items():
            ys = np.asarray(res.ys)
            n = ys.shape[-1] // 2
            style = "--" if "(Fluid)" in name else "-"
            axes[0].plot(np.asarray(res.ts), ys[:, n - 2], style, label=name)
            spec = np.abs(np.fft.rfft(ys[:, n - 2] - ys[:, n - 2].mean()))
            axes[1].semilogy(np.fft.rfftfreq(ys.shape[0], DT), spec, style, label=name)
        for f in calculate_natural_frequencies(
            props["length"] * N_SEGMENTS, props["E"], props["MInertia"],
            props["rho"], props["A"],
        ):
            axes[1].axvline(f, color="k", alpha=0.3)
        axes[0].set(xlabel="t [s]", ylabel="tip w [m]")
        axes[1].set(xlabel="f [Hz]", ylabel="|FFT|", xlim=(0, 300))
        axes[0].legend(fontsize=7)
        fig.tight_layout()
        fig.savefig("beam_comparison_fluid.png", dpi=120)
        print("wrote beam_comparison_fluid.png")

    # Beam-shape animation (reference FuncAnimation, :224-239): headless
    # parity writes a GIF of the same frames instead of a live window.
    if "--animate" in sys.argv:
        shapes = {
            name: extract_beam_shapes(res, N_SEGMENTS, props["length"])
            for name, res in results.items()
        }
        animate_beam_shapes(shapes, "beam_comparison_fluid.gif", dt=DT)
    else:
        # beam shapes extraction exercised for parity with the reference API
        extract_beam_shapes(results["Linear (No Fluid)"], N_SEGMENTS, props["length"])
    cleanup_temp_files(linear_file, nonlinear_file, mixed_file)


if __name__ == "__main__":
    main()
