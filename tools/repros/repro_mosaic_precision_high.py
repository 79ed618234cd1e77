"""Repro: Mosaic rejects/hangs ``jax.lax.Precision.HIGH`` on in-kernel dots.

Outside Pallas, XLA:TPU accepts all three ``jax.lax.Precision`` levels on a
matmul (DEFAULT = 1-pass bf16, HIGH = 3-pass bf16, HIGHEST = 6-pass f32).
Inside a Pallas TPU kernel, lowering a ``dot_general`` with
``precision=Precision.HIGH`` fails in the Mosaic compiler — on the axon
remote-compile stack the failure presents as a compile-service HANG rather
than a clean error (observed 2026-08-17: the compile RPC never returns; the
same script's DEFAULT/HIGHEST cases compile in seconds). Kernels therefore
cannot express the 3-pass bf16 accuracy tier directly; this repo's fused ROM
kernel re-implements it manually as a hi/lo-bf16 split product
(``ops/pallas/rom_rollout.py``, "manual 3-pass").

Standalone: compiles the same 2-line dot kernel at each precision level in a
SUBPROCESS with a timeout (so a hanging compile is classified, not
inherited), and reports which lower. Exit code is always 0; prints one
RESULT line.
"""

import subprocess
import sys

N = 256
TIMEOUT_S = 150

CHILD = r"""
import sys
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

name = sys.argv[1]
prec = getattr(jax.lax.Precision, name)
N = %d

def kernel(x_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], x_ref[...], (((1,), (0,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )

x = jnp.asarray(np.random.default_rng(0).normal(size=(N, N)), jnp.float32)
out = jax.jit(lambda a: pl.pallas_call(
    kernel, out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32))(a))(x)
print("CHILD-OK", float(jnp.sum(out)))
""" % N


def main():
    import jax

    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend == "cpu":
        print("RESULT: NOT-REPRODUCED (Pallas on CPU interprets, no Mosaic)")
        return

    results = {}
    for name in ["DEFAULT", "HIGH", "HIGHEST"]:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", CHILD, name],
                capture_output=True,
                text=True,
                timeout=TIMEOUT_S,
            )
            if proc.returncode == 0 and "CHILD-OK" in proc.stdout:
                results[name] = "ok"
            else:
                tail = (proc.stderr or proc.stdout).strip().splitlines()
                results[name] = f"FAILED: {tail[-1][:160] if tail else 'rc=' + str(proc.returncode)}"
        except subprocess.TimeoutExpired:
            results[name] = f"FAILED: compile hang (> {TIMEOUT_S}s, subprocess killed)"

    for name, r in results.items():
        print(f"precision={name}: {r}")

    if results["HIGH"] != "ok" and results["DEFAULT"] == "ok":
        print(
            "RESULT: REPRODUCED — Mosaic lowers DEFAULT but not "
            "Precision.HIGH on an in-kernel dot "
            f"({results['HIGH'][:80]})"
        )
    elif all(r == "ok" for r in results.values()):
        print("RESULT: NOT-REPRODUCED (all precision levels lower)")
    else:
        print("RESULT: PARTIAL — see per-precision lines above")


if __name__ == "__main__":
    main()
