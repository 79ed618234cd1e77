"""Checkpoint/resume for long sweeps (orbax-backed, stdlib fallback).

The reference keeps everything in memory (SURVEY §5: checkpointing ABSENT;
sims are seconds long). Long batched sweeps on TPU warrant snapshots of
``(state batch, t, prng key, metadata)``; this module saves/restores that
tuple via orbax when available, else ``numpy.savez``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def save_checkpoint(path: str, state, t: float, rng_key=None, meta: Optional[dict] = None):
    """Snapshot a rollout: flattened pytree leaves + scalars."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["t"] = np.asarray(t)
    if rng_key is not None:
        arrays["rng_key"] = np.asarray(rng_key)
    if meta:
        for k, v in meta.items():
            arrays[f"meta_{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, n_leaves=len(leaves), **arrays)
    return path


def load_checkpoint(path: str, treedef_like: Any = None):
    """Restore ``(state, t, rng_key, meta)``; ``state`` uses the layout of
    ``treedef_like`` when given, else a list of leaves."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    n = int(data["n_leaves"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    if treedef_like is not None:
        treedef = jax.tree_util.tree_structure(treedef_like)
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    else:
        state = leaves
    t = float(data["t"])
    rng_key = data["rng_key"] if "rng_key" in data else None
    meta = {
        k[len("meta_"):]: data[k] for k in data.files if k.startswith("meta_")
    }
    return state, t, rng_key, meta


def try_orbax_save(path: str, state) -> bool:
    """Persist via orbax if installed (preferred for sharded arrays)."""
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return False
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()
    return True


def try_orbax_load(path: str, like):
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        return None
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
