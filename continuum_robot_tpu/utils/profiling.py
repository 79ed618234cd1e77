"""Profiling & metering utilities.

The reference's observability is wall-clock timing plus SciPy's nfev/njev/nlu
counters printed as a table (``example_utilities.py:127-170, 298-329``).
Equivalents here:

* :class:`StepMeter` — steps/sec/chip and env-steps/sec with compile-time vs
  run-time split (first call isolates compilation).
* :func:`trace` — context manager around ``jax.profiler`` for on-device
  traces viewable in TensorBoard/Perfetto.
* RHS-eval counters ride along in :class:`AdaptiveStats`
  (``ops/integrators.py``) for nfev-style parity tables.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def force_completion(out):
    """Synchronize by pulling a scalar reduction of every leaf to the host.

    The correct way to end a timed region on this TPU stack:
    ``block_until_ready()`` does NOT await Pallas custom-call completion on
    the axon backend (it reported ~1 ms for a fused kernel whose true device
    time is ~250 ms — see docs/design.md pitfall 6), while a host transfer
    cannot complete before the producing computation does.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            float(jnp.sum(jnp.abs(leaf[..., :1])))
    return out


@dataclasses.dataclass
class StepMeter:
    """Throughput meter separating compile time from steady-state run time."""

    n_steps: int
    n_envs: int = 1
    compile_time: Optional[float] = None
    run_time: Optional[float] = None

    def measure(self, fn: Callable, *args, repeats: int = 1):
        """Time ``fn(*args)`` once cold (compile) and ``repeats`` warm.

        Synchronizes with :func:`force_completion` (host scalar reads), not
        ``block_until_ready`` — the latter returns early for Pallas custom
        calls on the axon backend.
        """
        t0 = time.perf_counter()
        out = force_completion(fn(*args))
        self.compile_time = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(repeats):
            out = force_completion(fn(*args))
        self.run_time = (time.perf_counter() - t0) / repeats
        return out

    @property
    def steps_per_sec(self) -> float:
        return self.n_steps / self.run_time if self.run_time else 0.0

    @property
    def env_steps_per_sec(self) -> float:
        return self.steps_per_sec * self.n_envs

    def report(self) -> dict:
        return {
            "compile_s": self.compile_time,
            "run_s": self.run_time,
            "steps_per_sec": self.steps_per_sec,
            "env_steps_per_sec": self.env_steps_per_sec,
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an on-device profiler trace (TensorBoard/Perfetto format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def compile_time_breakdown(fn: Callable, *args) -> dict:
    """Split tracing (Python) from XLA compilation for a jitted callable."""
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_trace = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    return {"trace_s": t_trace, "xla_compile_s": t_compile}
