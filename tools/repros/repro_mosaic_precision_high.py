"""Repro: Mosaic rejects ``jax.lax.Precision.HIGH`` on in-kernel dots.

Outside Pallas, XLA:TPU accepts all three ``jax.lax.Precision`` levels on a
matmul (DEFAULT = 1-pass bf16, HIGH = 3-pass bf16, HIGHEST = 6-pass f32).
Inside a Pallas TPU kernel, lowering a ``dot_general`` with
``precision=Precision.HIGH`` fails in the Mosaic compiler, so kernels cannot
express the 3-pass bf16 accuracy tier directly — this repo's fused ROM kernel
re-implements it manually as a hi/lo-bf16 split-product
(``ops/pallas/rom_rollout.py``, "manual 3-pass").

Standalone: compiles the same 2-line dot kernel at each precision level and
reports which lower. Exit code is always 0; prints one RESULT line.
"""

import jax
import jax.numpy as jnp
import numpy as np

N = 256


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend == "cpu":
        print("RESULT: NOT-REPRODUCED (Pallas on CPU interprets, no Mosaic)")
        return

    from jax.experimental import pallas as pl

    x = jnp.asarray(np.random.default_rng(0).normal(size=(N, N)), jnp.float32)

    results = {}
    for name, prec in [
        ("DEFAULT", jax.lax.Precision.DEFAULT),
        ("HIGH", jax.lax.Precision.HIGH),
        ("HIGHEST", jax.lax.Precision.HIGHEST),
    ]:

        def kernel(x_ref, o_ref, _prec=prec):
            o_ref[...] = jax.lax.dot_general(
                x_ref[...],
                x_ref[...],
                (((1,), (0,)), ((), ())),
                precision=_prec,
                preferred_element_type=jnp.float32,
            )

        try:
            out = jax.jit(
                lambda a: pl.pallas_call(
                    kernel,
                    out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
                )(a)
            )(x)
            float(jnp.sum(out))
            results[name] = "ok"
        except Exception as e:  # Mosaic lowering error
            results[name] = f"FAILED: {type(e).__name__}: {str(e)[:160]}"

    for name, r in results.items():
        print(f"precision={name}: {r}")

    if results["HIGH"] != "ok" and results["DEFAULT"] == "ok":
        print(
            "RESULT: REPRODUCED — Mosaic lowers DEFAULT/HIGHEST but rejects "
            "Precision.HIGH on an in-kernel dot"
        )
    elif all(r == "ok" for r in results.values()):
        print("RESULT: NOT-REPRODUCED (all precision levels lower)")
    else:
        print("RESULT: PARTIAL — see per-precision lines above")


if __name__ == "__main__":
    main()
