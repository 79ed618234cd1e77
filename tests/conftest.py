"""Test configuration: CPU backend, float64, 8-device fake mesh.

Must run before any jax backend initialization:

* ``XLA_FLAGS=--xla_force_host_platform_device_count=8`` fakes an 8-device
  topology for sharding tests (the idiomatic JAX "fake cluster", SURVEY §4).
* ``jax.config.update('jax_platforms', 'cpu')`` — NOTE: the env var
  ``JAX_PLATFORMS=cpu`` is ignored by the experimental axon TPU plugin on
  this machine; only the config call works (see .claude/skills/verify).
* x64 for golden-accuracy comparisons against the float64 reference numerics.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
