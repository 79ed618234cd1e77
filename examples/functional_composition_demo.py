"""Force-composition patterns demo (TPU-native).

Port of ``examples/functional_composition_demo.py`` (reference :66-147):
the four wiring patterns — registry-only, external closure, hybrid
registry+external, and post-hoc dynamic registration — all feeding the same
compiled dynamics.

Usage: python examples/functional_composition_demo.py
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from example_utilities import create_beam_parameters, cleanup_temp_files

from continuum_robot_tpu.models import (
    AbstractForce,
    DynamicEulerBernoulliBeam,
    ForceParams,
    GravityForce,
)


class TipLoadForce(AbstractForce):
    """A user-defined traceable force: constant transverse tip load."""

    def __init__(self, magnitude, enabled=True):
        self.magnitude = magnitude
        self.enabled = enabled

    def compute_forces(self, x, t):
        n = x.shape[-1] // 2
        return jnp.zeros((*x.shape[:-1], n), dtype=x.dtype).at[..., n - 2].set(
            self.magnitude
        )

    def is_enabled(self):
        return self.enabled


def main():
    linear_file, _, _ = create_beam_parameters()
    x = np.zeros(36)

    # Pattern 1: registry-only (auto-registered from ForceParams).
    beam = DynamicEulerBernoulliBeam(
        linear_file,
        ForceParams(enable_fluid_effects=True, fluid_density=1000.0),
    )
    beam.create_system_func()
    print("1. registry-only:", np.abs(np.asarray(beam.system_func(x))).max())

    # Pattern 2: external closure (bypasses the registry entirely).
    def external_forces(x, t):
        n = x.shape[-1] // 2
        return jnp.full((*x.shape[:-1], n), 0.5, dtype=x.dtype)

    beam.create_system_func(forces_func=external_forces)
    print("2. external closure:", np.abs(np.asarray(beam.system_func(x))).max())

    # Pattern 3: hybrid — registry aggregate + external term summed manually.
    registry_forces = beam.force_registry.create_aggregated_function()

    def hybrid(x, t):
        return registry_forces(x, t) + external_forces(x, t)

    beam.create_system_func(forces_func=hybrid)
    print("3. hybrid:", np.abs(np.asarray(beam.system_func(x))).max())

    # Pattern 4: post-hoc dynamic registration — the jitted system re-
    # specializes when the enabled-force set changes.
    beam.create_system_func()  # back to registry-only
    before = np.abs(np.asarray(beam.system_func(x))).max()
    tip_load = TipLoadForce(2.0)
    beam.force_registry.register(tip_load)
    after = np.abs(np.asarray(beam.system_func(x))).max()
    tip_load.enabled = False
    disabled = np.abs(np.asarray(beam.system_func(x))).max()
    print(f"4. dynamic registration: before={before}, after={after}, "
          f"disabled={disabled}")

    # Bonus: gravity registered post-hoc with a custom vector.
    g = GravityForce(
        beam.params[["density", "cross_area", "length"]],
        gravity_vector=[0.0, -1.62, 0.0],  # lunar
    )
    beam.force_registry.register(g)
    print("5. lunar gravity added:", np.abs(np.asarray(beam.system_func(x))).max())

    cleanup_temp_files(linear_file)


if __name__ == "__main__":
    main()
