"""Repro: in-kernel bf16 dot breaks under ``jax_default_matmul_precision=float32``.

With ``jax.config.update('jax_default_matmul_precision', 'float32')`` set —
the standard guard against TPU's silent bf16 matmul default, which this
framework needs for its stiffness-scale solves — a Pallas-kernel
``dot_general`` on **bfloat16** operands with ``precision=None`` inherits an
fp32 contract precision that Mosaic rejects with "Bad lhs type". The same
dot with an explicit ``precision=Precision.DEFAULT`` lowers fine, as does the
same program outside Pallas. Kernels taking bf16 inputs must therefore pin an
explicit precision on every dot instead of relying on the config default
(``ops/pallas/rom_rollout.py`` does).

Standalone: runs the same bf16 dot kernel with precision=None vs an explicit
DEFAULT, under the float32 config default. Exit code is always 0; prints one
RESULT line.
"""

import jax

jax.config.update("jax_default_matmul_precision", "float32")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N = 256


def main():
    backend = jax.default_backend()
    print(f"backend: {backend}")
    if backend == "cpu":
        print("RESULT: NOT-REPRODUCED (Pallas on CPU interprets, no Mosaic)")
        return

    from jax.experimental import pallas as pl

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(N, N)), jnp.bfloat16
    )

    results = {}
    for name, prec in [("None", None), ("DEFAULT", jax.lax.Precision.DEFAULT)]:

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
        except Exception as e:
            results[name] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"

    for name, r in results.items():
        print(f"bf16 dot, precision={name}: {r}")

    if results["None"] != "ok" and results["DEFAULT"] == "ok":
        print(
            "RESULT: REPRODUCED — precision=None inherits the fp32 config "
            "default and Mosaic rejects it on bf16 operands; explicit "
            "DEFAULT lowers fine"
        )
    elif all(r == "ok" for r in results.values()):
        print("RESULT: NOT-REPRODUCED (both forms lower)")
    else:
        print("RESULT: PARTIAL — see per-form lines above")


if __name__ == "__main__":
    main()
