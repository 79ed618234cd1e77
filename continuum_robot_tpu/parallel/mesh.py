"""Device mesh construction helpers.

The scaling axes of this framework (SURVEY §2.2):

* ``dp`` — data/environment parallelism: independent rollouts sharded across
  chips (replaces the reference's ``multiprocessing.Pool`` task farm,
  ``beam_comparison_fluid.py:82-84``).
* ``sp`` — spatial/beam-axis parallelism: nodes of one very long beam
  sharded across chips with 3-DOF halo exchange per step — the structural
  analogue of context/sequence parallelism (``parallel/spatial.py``).

Collectives ride ICI within a slice; no custom transport exists or is needed
(jax collectives + XLA SPMD partitioner).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(
    axis_sizes: Optional[dict] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a mesh over available devices.

    ``axis_sizes``: e.g. ``{"dp": 4, "sp": 2}``; defaults to a 1-D ``dp``
    mesh over all devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"dp": len(devices)}
    names = tuple(axis_sizes)
    sizes = tuple(axis_sizes[n] for n in names)
    if int(np.prod(sizes)) != len(devices):
        raise ValueError(
            f"Mesh axes {axis_sizes} need {int(np.prod(sizes))} devices, "
            f"got {len(devices)}"
        )
    dev_array = np.array(devices).reshape(sizes)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding that splits the leading (environment) axis across ``axis``."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
