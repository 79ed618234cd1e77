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


def _timed(fn, arg, reps=2) -> float:
    """Best-of-``reps`` wall time of one synced call (fn must be warm)."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(fn(arg))
        best = min(best, time.perf_counter() - t0)
    return best


def _autoscale_rate(build, work_per_iter, iters0=8, min_wall=0.5, rounds=4):
    """Differential rate of ``build(iters) -> (jitted_fn, arg)`` programs.

    On the axon backend every jitted call carries a fixed multi-ms tunnel
    overhead (measured ~40 ms), which contaminates any single-call timing:
    short runs under-report by up to 10x (the 8-iter HBM copy reported
    66 GB/s for an ~800 GB/s part) and near-threshold runs mis-report
    unpredictably. Two steps make the ceiling honest:

    1. Grow the scan length until one call's wall clock reaches
       ``min_wall`` (so the marginal times below are overhead-dominated
       by real work); ``rounds`` bounds the recompiles.
    2. Time the program at ``iters`` and ``2*iters`` and return the
       MARGINAL rate ``iters*work_per_iter / (wall2 - wall1)`` — the
       fixed per-call overhead cancels exactly.
    """
    iters, wall = iters0, 0.0
    for _ in range(rounds):
        fn, arg = build(iters)
        _sync(fn(arg))  # compile + warm
        wall = _timed(fn, arg, reps=1)
        if wall >= min_wall:
            break
        # At least 2x, at most 64x per round; aim 1.5x past the target so
        # one growth round usually suffices.
        scale = min(max(1.5 * min_wall / max(wall, 1e-4), 2.0), 64.0)
        iters = int(np.ceil(iters * scale))
    wall1 = _timed(fn, arg)
    fn2, arg2 = build(2 * iters)
    _sync(fn2(arg2))
    wall2 = _timed(fn2, arg2)
    return work_per_iter * iters / max(wall2 - wall1, 1e-6)


def measure_matmul_ceiling(
    n: int = 4096, precision=None, dtype=jnp.float32, min_wall: float = 0.5
) -> float:
    """Measured matmul FLOP/s at the given precision tier (one device).

    Chained matmuls (2 n^3 FLOPs each) inside one scan amortize dispatch;
    the chain length auto-scales until the run is long enough to swamp the
    axon tunnel overhead (see ``_autoscale_rate``). The HIGHEST tier is
    the ceiling for this framework's solve path (true-f32 accumulate);
    DEFAULT is the bf16 headline the sweep-grade dials can reach.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    a = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, n)) / np.sqrt(n), dtype
    )

    def build(iters):
        @jax.jit
        def chain(x):
            def body(c, _):
                return jnp.dot(c, x, precision=precision), None

            out, _ = jax.lax.scan(body, x, None, length=iters)
            return out

        return chain, a

    return _autoscale_rate(build, 2.0 * n**3, min_wall=min_wall)


def measure_hbm_ceiling(mbytes: int = 512, min_wall: float = 0.5) -> float:
    """Measured HBM streaming bandwidth (bytes/s, read+write of a copy)."""
    n = mbytes * 1024 * 1024 // 4
    x = jnp.zeros((n,), jnp.float32)

    def build(iters):
        @jax.jit
        def chain(v):
            def body(c, _):
                return c + 1.0, None  # one read + one write per element

            out, _ = jax.lax.scan(body, v, None, length=iters)
            return out

        return chain, x

    return _autoscale_rate(build, 2.0 * 4 * n, min_wall=min_wall)


def measure_vpu_ceiling(
    mbytes: int = 64, chain: int = 256, min_wall: float = 0.5
) -> float:
    """Measured elementwise (VPU) f32 FLOP/s.

    The modal engines are pure elementwise recurrences — their compute
    ceiling is the vector unit, not the MXU. The probe is a ``chain``-long
    dependent elementwise chain ``y <- y*y + eps`` fused over one array:
    one FMA per element per link, counted as 2 FLOPs (the standard FMA
    convention — the earlier 3-FLOP count of ``y*y*eps + y`` overcounted
    what the VPU issues as mul+FMA). Arithmetic intensity is
    ``2*chain/8`` FLOP/byte — far above the HBM knee, so the measurement
    is genuinely compute-bound; an outer scan auto-scales total work past
    the tunnel overhead.
    """
    n = mbytes * 1024 * 1024 // 4
    x = jnp.full((n,), 0.5, jnp.float32)
    eps = jnp.float32(1e-7)

    def build(iters):
        @jax.jit
        def run(y):
            def body(c, _):
                for _ in range(chain):
                    c = c * c + eps
                return c, None

            out, _ = jax.lax.scan(body, y, None, length=iters)
            return out

        return run, x

    return _autoscale_rate(build, 2.0 * n * chain, iters0=2, min_wall=min_wall)


def measure_ceilings(quick: bool = False) -> dict:
    """All rooflines, measured on the current default device.

    ``quick`` shrinks the per-iteration problem, not the total timed work
    — auto-scaling keeps even quick runs past the tunnel-overhead floor
    (at a shorter 0.15 s target), so quick ceilings stay within ~10% of
    full ones instead of 10x under.
    """
    n = 2048 if quick else 4096
    mb = 128 if quick else 512
    mw = 0.15 if quick else 0.5
    return {
        "mxu_f32_flops": measure_matmul_ceiling(
            n, jax.lax.Precision.HIGHEST, min_wall=mw
        ),
        "mxu_bf16_flops": measure_matmul_ceiling(
            n, jax.lax.Precision.DEFAULT, min_wall=mw
        ),
        "vpu_f32_flops": measure_vpu_ceiling(16 if quick else 64, min_wall=mw),
        "hbm_bytes_per_sec": measure_hbm_ceiling(mb, min_wall=mw),
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


def scan_program_cost(step_fn, carry, xs_elt, n_steps: int) -> Optional[dict]:
    """Cost of ``n_steps`` iterations of a scan body.

    XLA's ``cost_analysis()`` counts a while/scan body ONCE regardless of
    trip count (verified on this backend: scan lengths 10/100/1000 report
    identical flops), so analyzing a whole rollout under-reports the work
    by the step count. This analyzes the jitted SINGLE-STEP program
    ``step_fn(carry, xs_elt)`` and scales by ``n_steps`` — the honest model
    for step-dominated rollouts. Bytes are per-step state+constant traffic
    times steps, which matches the one-HBM-roundtrip-per-step XLA engines
    exactly and is deliberately conservative for fused kernels that keep
    the carry in VMEM.
    """
    c = program_cost(step_fn, carry, xs_elt)
    if c is None:
        return None
    return {
        "flops": c["flops"] * n_steps,
        "bytes": c["bytes"] * n_steps,
    }


def utilization(
    flops: float,
    nbytes: float,
    wall_s: float,
    ceilings: dict,
    precision_tier: str = "f32",
) -> dict:
    """Achieved rates vs measured ceilings.

    ``roofline_frac`` is achieved/ceiling on the binding resource: compute
    (against the tier's compute-unit ceiling — MXU for matmul-dominated
    programs, VPU for elementwise recurrences via ``precision_tier="vpu"``)
    or memory (against HBM), whichever fraction is higher — i.e. how close
    the program is to SOME hardware limit.
    """
    mxu_key = {
        "bf16": "mxu_bf16_flops",
        "vpu": "vpu_f32_flops",
    }.get(precision_tier, "mxu_f32_flops")
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
