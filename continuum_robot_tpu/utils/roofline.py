"""Utilization accounting: measured hardware ceilings + program cost models.

The round-1 bench reported env-steps/s only; claims like "~2.4 TFLOP/s" had
no recorded methodology. This module makes utilization auditable:

* :func:`measure_ceilings` — on-device microbenchmarks of the two rooflines:
  MXU matmul throughput (f32-accurate HIGHEST and bf16 DEFAULT tiers) and
  HBM streaming bandwidth. Run ONCE per bench invocation on the actual
  device; all timings sync by forcing a scalar to the host (never
  ``block_until_ready`` — see docs/design.md pitfall 6).
* :func:`program_cost` — FLOP/byte counts of a compiled XLA program via
  ``compiled.cost_analysis()`` (the compiler's own numbers, not hand
  estimates). Pallas custom calls are opaque to XLA's analyzer, so fused
  kernels pass an analytic cost instead and say so.
* :func:`utilization` — combines the two into
  ``{flops_per_sec, hbm_gbps, roofline_frac, bound}``: achieved rates and
  the fraction of whichever measured ceiling binds.

No reference counterpart (the reference publishes no performance
accounting, SURVEY §6).
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    """Force device completion by reading a scalar back to the host."""
    return float(jnp.sum(x))


def measure_matmul_ceiling(
    n: int = 4096, precision=None, dtype=jnp.float32, iters: int = 8
) -> float:
    """Measured matmul FLOP/s at the given precision tier (one device).

    ``iters`` chained matmuls amortize dispatch; 2 n^3 FLOPs each. The
    HIGHEST tier is the ceiling for this framework's solve path (true-f32
    accumulate); DEFAULT is the bf16 headline the sweep-grade dials can
    reach.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    a = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, n)) / np.sqrt(n), dtype
    )

    @jax.jit
    def chain(x):
        def body(c, _):
            return jnp.dot(c, x, precision=precision), None

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return out

    _sync(chain(a))  # compile + warm
    t0 = time.perf_counter()
    _sync(chain(a))
    wall = time.perf_counter() - t0
    return 2.0 * n**3 * iters / wall


def measure_hbm_ceiling(mbytes: int = 512, iters: int = 8) -> float:
    """Measured HBM streaming bandwidth (bytes/s, read+write of a copy)."""
    n = mbytes * 1024 * 1024 // 4
    x = jnp.zeros((n,), jnp.float32)

    @jax.jit
    def chain(v):
        def body(c, _):
            return c + 1.0, None  # one read + one write per element

        out, _ = jax.lax.scan(body, v, None, length=iters)
        return out

    _sync(chain(x))
    t0 = time.perf_counter()
    _sync(chain(x))
    wall = time.perf_counter() - t0
    return 2.0 * 4 * n * iters / wall


def measure_ceilings(quick: bool = False) -> dict:
    """Both rooflines, measured on the current default device."""
    n = 2048 if quick else 4096
    mb = 128 if quick else 512
    return {
        "mxu_f32_flops": measure_matmul_ceiling(n, jax.lax.Precision.HIGHEST),
        "mxu_bf16_flops": measure_matmul_ceiling(n, jax.lax.Precision.DEFAULT),
        "hbm_bytes_per_sec": measure_hbm_ceiling(mb),
    }


def program_cost(fn: Callable, *args, static_argnums=()) -> Optional[dict]:
    """FLOP/byte counts of ``jit(fn)(*args)`` from XLA's own cost analysis.

    Returns ``{"flops": float, "bytes": float}`` or None when the backend
    provides no analysis (or the program is dominated by custom calls the
    analyzer cannot see — callers supply analytic counts there).
    """
    try:
        compiled = (
            jax.jit(fn, static_argnums=static_argnums).lower(*args).compile()
        )
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if not ca:
            return None
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        if flops <= 0.0:
            return None
        return {"flops": flops, "bytes": nbytes}
    except Exception:
        return None


def utilization(
    flops: float,
    nbytes: float,
    wall_s: float,
    ceilings: dict,
    precision_tier: str = "f32",
) -> dict:
    """Achieved rates vs measured ceilings.

    ``roofline_frac`` is achieved/ceiling on the binding resource: compute
    (against the tier's MXU ceiling) or memory (against HBM), whichever
    fraction is higher — i.e. how close the program is to SOME hardware
    limit.
    """
    mxu_key = "mxu_bf16_flops" if precision_tier == "bf16" else "mxu_f32_flops"
    flops_per_sec = flops / wall_s
    bytes_per_sec = nbytes / wall_s
    frac_compute = flops_per_sec / ceilings[mxu_key]
    frac_memory = (
        bytes_per_sec / ceilings["hbm_bytes_per_sec"] if nbytes > 0 else 0.0
    )
    bound = "compute" if frac_compute >= frac_memory else "memory"
    return {
        "flops_per_sec": flops_per_sec,
        "hbm_gbps": bytes_per_sec / 1e9,
        "roofline_frac": max(frac_compute, frac_memory),
        "bound": bound,
        "frac_compute": frac_compute,
        "frac_memory": frac_memory,
    }
