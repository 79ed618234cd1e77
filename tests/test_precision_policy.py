"""Matmul-precision policy guards (NOTES_r4.md session 4).

On TPU, f32 contractions without an explicit ``precision=`` run the MXU
with bfloat16 inputs. For this framework's stiff operators that is not a
speed/accuracy dial, it is a correctness cliff: the round-3 FAILED
nonlinear sharded-SPIKE hardware row (non-finite states, clean on CPU)
was a missing precision annotation — CPU f32 matmuls are true f32, so no
CPU test can observe the difference directly. These tests pin the two
defenses that CAN be checked off-hardware:

* the package import installs ``jax_default_matmul_precision='highest'``
  (unless the user/env set one), so linalg internals and any future
  unannotated contraction are covered;
* the sharded solver hot paths carry explicit ``Precision.HIGHEST``
  annotations and do not silently regress to the default.
"""

import ast
import os

import jax


def test_package_import_pins_default_matmul_precision():
    import continuum_robot_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == "highest"


def test_sharded_solver_modules_annotate_every_contraction():
    """Every einsum in the sharded solve paths names a precision.

    Static check (AST): parallel/spatial.py, spatial_implicit.py and
    spatial_modal.py must not contain a bare ``jnp.einsum`` call — the
    engines stay correct even standalone (a user clearing the global
    default gets the annotated hot path, not bf16 SPIKE solves).
    """
    import continuum_robot_tpu.parallel as par

    pkg_dir = os.path.dirname(par.__file__)
    offenders = []
    for fname in ("spatial.py", "spatial_implicit.py", "spatial_modal.py"):
        tree = ast.parse(open(os.path.join(pkg_dir, fname)).read())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            if isinstance(fn, ast.Attribute) and fn.attr == "einsum":
                if not any(kw.arg == "precision" for kw in node.keywords):
                    offenders.append(f"{fname}:{node.lineno}")
    assert not offenders, (
        "bare jnp.einsum (no precision=) in sharded solver paths: "
        + ", ".join(offenders)
    )
