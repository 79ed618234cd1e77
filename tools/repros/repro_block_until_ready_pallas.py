"""Repro: ``block_until_ready()`` does not await Pallas custom-call completion.

On the axon TPU backend, ``Array.block_until_ready()`` can return long before
the device finishes a ``tpu_custom_call`` emitted by a Pallas kernel: a fused
kernel whose true device time is ~250 ms reports ~1 ms when timed with
``block_until_ready()``, while forcing a scalar to the host (a real device
round trip) reports the true time. Plain XLA executables time identically
either way. This inflated two early round-1 benchmark claims (NOTES_r1.md,
"Timing-methodology correction"); every benchmark in this repo now syncs via
``float(jnp.sum(out))``.

Standalone: builds a deliberately long-running self-contained Pallas kernel
(a fori_loop of MXU dots resident in VMEM), times it both ways, and reports
the ratio. A ratio >> 1 (host-sync time / block_until_ready time) reproduces
the bug; ~1 means the current process state (or backend) tracks correctly.

Exit code is always 0; prints one RESULT line.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 512  # matrix side (MXU-friendly)
INNER = 2000  # dot iterations inside the kernel


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend == "cpu":
        print("RESULT: NOT-REPRODUCED (CPU backend has no tpu_custom_call)")
        return

    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        def body(i, acc):
            # Keep the dependency chain serial so the loop cannot collapse.
            return jnp.dot(acc, x_ref[...], preferred_element_type=jnp.float32)

        o_ref[...] = jax.lax.fori_loop(0, INNER, body, x_ref[...])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        )(x)

    # Near-identity input keeps the iterated product finite.
    x = jnp.asarray(
        np.eye(N, dtype=np.float32)
        + np.random.default_rng(0).normal(scale=1e-6, size=(N, N)).astype(np.float32)
    )

    # Warm-up / compile (synced by a host read).
    float(jnp.sum(run(x)))

    t0 = time.perf_counter()
    out = run(x)
    out.block_until_ready()
    t_block = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = run(x)
    float(jnp.sum(out))  # true device-completion sync: forces a host scalar
    t_host = time.perf_counter() - t0

    ratio = t_host / max(t_block, 1e-9)
    print(f"block_until_ready: {t_block * 1e3:8.2f} ms")
    print(f"host-scalar sync:  {t_host * 1e3:8.2f} ms")
    print(f"ratio (host/block): {ratio:.1f}x")
    if ratio > 5.0:
        print(
            "RESULT: REPRODUCED — block_until_ready returned "
            f"{ratio:.0f}x early for a Pallas custom call"
        )
    else:
        print(
            "RESULT: NOT-REPRODUCED in this process state (both syncs agree; "
            "the failure is intermittent across process states — see "
            "tools/hw_validate.py check 7, which probes it at session start)"
        )


if __name__ == "__main__":
    main()
