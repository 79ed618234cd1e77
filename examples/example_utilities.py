"""Shared workload utilities for the comparison examples.

TPU-native port of the reference harness (``examples/example_utilities.py``):
same Nitinol material constants (:24-34), same 6-segment cantilever configs
(:37-113), same tip-impulse workload and 1 s / 1 ms output grid (:116-170) —
but simulations run as single compiled XLA rollouts (adaptive Dopri5 or
implicit Newmark) instead of ``scipy.solve_ivp`` re-entering Python per RHS
eval, and parameter sweeps batch via ``vmap`` instead of ``multiprocessing``.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from dataclasses import dataclass
from typing import Any, Optional, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam, ForceParams
from continuum_robot_tpu.models.simulate import simulate

# Simulation parameters (reference example_utilities.py:19-25)
T_FINAL = 1.0
DT = 0.001
N_SEGMENTS = 6

# Material properties: Nitinol (reference :24-34)
MATERIAL_PROPS = {"length": 0.25, "E": 75e9, "r": 0.005, "rho": 6450, "drag_coef": 0.82}


def get_material_properties():
    props = MATERIAL_PROPS.copy()
    props["MInertia"] = np.pi * props["r"] ** 4 / 4
    props["A"] = np.pi * props["r"] ** 2
    props["wetted_area"] = 2 * np.pi * props["r"] * props["length"]
    return props


def create_csv_file(beam_types, boundary_conditions):
    """Write a parameter CSV (reference :37-73)."""
    props = get_material_properties()
    with tempfile.NamedTemporaryFile(mode="w", delete=False, suffix=".csv") as f:
        f.write(
            "length,elastic_modulus,moment_inertia,density,cross_area,"
            "type,boundary_condition,wetted_area,drag_coef\n"
        )
        for beam_type, bc in zip(beam_types, boundary_conditions):
            f.write(
                f"{props['length']},{props['E']},{props['MInertia']},"
                f"{props['rho']},{props['A']},{beam_type},{bc},"
                f"{props['wetted_area']},{props['drag_coef']}\n"
            )
        return f.name


@dataclass
class SimulationTask:
    """One sweep entry (reference :76-87)."""

    name: str
    param_file: str
    force_params: Optional[ForceParams] = None

    def __post_init__(self):
        if self.force_params is None:
            self.force_params = ForceParams()


def create_beam_parameters() -> Tuple[str, str, str]:
    """Linear / nonlinear / mixed 6-segment cantilevers (reference :90-113)."""
    boundary_conditions = ["FIXED"] + ["NONE"] * (N_SEGMENTS - 1)
    linear_file = create_csv_file(["linear"] * N_SEGMENTS, boundary_conditions)
    nonlinear_file = create_csv_file(["nonlinear"] * N_SEGMENTS, boundary_conditions)
    mixed_types = ["linear"] * (N_SEGMENTS // 2) + ["nonlinear"] * (
        N_SEGMENTS - N_SEGMENTS // 2
    )
    mixed_file = create_csv_file(mixed_types, boundary_conditions)
    return linear_file, nonlinear_file, mixed_file


def tip_impulse_input(n_pos, amplitude=0.1, t_end=0.01):
    """Traceable tip impulse (reference :144-148)."""
    import jax.numpy as jnp

    base = jnp.zeros(n_pos)
    tip = base.at[-2].set(amplitude)

    def u(t):
        return jnp.where(t < t_end, tip, base)

    return u


def simulate_single_beam(
    task: SimulationTask,
    t_final: float = T_FINAL,
    dt: float = DT,
    method: str = "dopri5",
    rtol: float = None,
    atol: float = None,
) -> Tuple[str, Any, float, dict]:
    """One rollout, fully on device (reference :116-170).

    Returns ``(name, result, wall_time, solver_stats)`` where ``result`` has
    ``.ts``/``.ys`` and stats carries the RHS-eval counters (the reference's
    nfev/njev/nlu meter, SURVEY §5).
    """
    import jax

    # Tolerances below the working precision make the adaptive controller
    # thrash (reject ~30% of steps); pick dtype-appropriate defaults.
    if rtol is None:
        rtol = 1e-8 if jax.config.jax_enable_x64 else 1e-5
    if atol is None:
        atol = 1e-10 if jax.config.jax_enable_x64 else 1e-8

    start = time.time()
    beam = DynamicEulerBernoulliBeam(task.param_file, force_params=task.force_params)
    n = beam.n_pos_states
    x0 = np.zeros(2 * n)
    u = tip_impulse_input(n)
    res = simulate(
        beam, x0, t_final, dt, method=method, u=u, rtol=rtol, atol=atol,
        substeps=50 if method == "newmark" else 1,
    )
    np.asarray(res.ys)  # materialize
    wall = time.time() - start
    if res.stats is not None:
        stats = {
            "nfev": 7 * int(res.stats.n_steps),  # 7 RHS evals per dopri5 step
            "n_accepted": int(res.stats.n_accepted),
            "n_rejected": int(res.stats.n_rejected),
        }
    else:
        stats = {"nfev": 0, "n_accepted": 0, "n_rejected": 0}
    return task.name, res, wall, stats


def extract_beam_shapes(res, n_segments: int, dx: float):
    """Beam (x, y) coordinates over time (reference :173-205 semantics)."""
    ys = np.asarray(res.ys)
    n_pos = ys.shape[-1] // 2
    w = ys[:, 1:n_pos:3]  # transverse displacements of free nodes
    n_frames = ys.shape[0]
    x = np.tile(np.arange(n_segments + 1) * dx, (n_frames, 1))
    y = np.zeros((n_frames, n_segments + 1))
    y[:, 1:] = w[:, :n_segments]
    return x, y


def animate_beam_shapes(
    shapes: dict,
    filename: str = "beam_animation.gif",
    dt: float = None,
    stride: int = 10,
    fps: int = 25,
):
    """Animated beam deflection shapes (reference ``beam_comparison_fluid.py:224-239``).

    ``shapes``: ``{name: (x (frames, nodes), y (frames, nodes))}`` from
    :func:`extract_beam_shapes`. The reference drives a live
    ``FuncAnimation`` window; headless parity here renders the same
    animation with the Agg backend and writes a GIF (``PillowWriter``).
    ``stride`` subsamples frames (the 1 ms grid is far above GIF rates).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.animation import FuncAnimation, PillowWriter

    fig, ax = plt.subplots(figsize=(8, 4))
    lines = {}
    y_max = max(np.abs(y).max() for _, y in shapes.values()) or 1e-6
    x_max = max(x.max() for x, _ in shapes.values())
    for name, (x, y) in shapes.items():
        (lines[name],) = ax.plot(x[0], y[0], lw=2, label=name)
    ax.set(
        xlim=(0, 1.05 * x_max),
        ylim=(-1.2 * y_max, 1.2 * y_max),
        xlabel="x [m]",
        ylabel="w [m]",
        title="Beam deflection",
    )
    ax.grid(True, alpha=0.3)
    ax.legend(fontsize=7)

    n_frames = min(len(x) for x, _ in shapes.values())
    frame_ids = range(0, n_frames, max(1, stride))

    def animate(frame):
        for name, (x, y) in shapes.items():
            lines[name].set_data(x[frame], y[frame])
        return list(lines.values())

    anim = FuncAnimation(
        fig, animate, frames=frame_ids,
        interval=(dt or 0.001) * 1000 * stride, blit=True,
    )
    anim.save(filename, writer=PillowWriter(fps=fps))
    plt.close(fig)
    print(f"wrote {filename} ({len(list(frame_ids))} frames)")
    return anim


def calculate_natural_frequencies(
    length, elastic_modulus, moment_inertia, density, cross_area
):
    """Analytic cantilever frequencies (reference :208-240)."""
    beta_L = [0.596864 * np.pi, 1.49418 * np.pi, 2.50025 * np.pi, 3.49999 * np.pi]
    return [
        (bl**2)
        * np.sqrt(elastic_modulus * moment_inertia / (density * cross_area * length**4))
        / (2 * np.pi)
        for bl in beta_L
    ]


def cleanup_temp_files(*file_paths):
    for p in file_paths:
        if p and os.path.exists(p):
            os.unlink(p)


def print_performance_table(computation_times, solver_statistics):
    """Formatted perf table (reference :298-329)."""
    print("\nDETAILED SOLVER PERFORMANCE:")
    print("=" * 100)
    header = (
        f"{'Configuration':<35} {'Time (s)':<10} {'nfev':<8} "
        f"{'accepted':<10} {'rejected':<10} {'nfev/s':<12}"
    )
    print(header)
    print("-" * 100)
    for name, t in computation_times.items():
        s = solver_statistics[name]
        nfev_s = s["nfev"] / t if t > 0 else 0.0
        print(
            f"{name:<35} {t:<10.3f} {s['nfev']:<8} {s['n_accepted']:<10} "
            f"{s['n_rejected']:<10} {nfev_s:<12.0f}"
        )
    print("-" * 100)
