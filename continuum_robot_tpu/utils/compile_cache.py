"""Persistent XLA compilation cache for slow-compile backends.

On the axon TPU stack, first compiles of the sharded (shard_map + SPIKE)
programs take minutes — up to ~35 min in degraded worker states
(NOTES_r5.md) — and are re-paid by every process. JAX's persistent
compilation cache works on this backend (measured round 5: a 12.5 s
compile replays in 0.8 s from a fresh process), so the benchmark and the
hardware tools opt in via :func:`enable_persistent_cache`.

Deliberately NOT enabled at package import: a process-global on-disk
cache is an operational decision for the embedding application (same
reasoning as the matmul-precision pin's embedder note, docs/design.md
§Precision).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str = None) -> str | None:
    """Enable JAX's on-disk compilation cache; returns the directory.

    ``path`` defaults to ``$JAX_COMPILE_CACHE_DIR`` or ``.jax_cache/``
    next to the package's repository root. Set
    ``JAX_COMPILE_CACHE_DIR=0`` to disable. Safe to call multiple times.
    """
    if path is None:
        path = os.environ.get("JAX_COMPILE_CACHE_DIR")
    if path is None:
        repo = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        path = os.path.join(repo, ".jax_cache")
    if not path or path == "0":
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    return path
