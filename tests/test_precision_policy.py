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
    """Every contraction in the sharded/parametric solve paths names a
    precision.

    Static check (AST) over parallel/spatial.py, spatial_implicit.py,
    spatial_modal.py and sweep.py: no bare ``jnp.einsum``/``matmul``/
    ``dot``/``tensordot`` call (missing ``precision=``) and no ``@``
    (``ast.MatMult``) operator at all — the engines stay correct even
    standalone (a user clearing the global default still gets full-f32
    MXU inputs on the hot paths, not bf16 SPIKE/Newton solves). The ``@``
    operator takes no precision argument, so it is banned outright in
    these modules; use the local ``_mm``/annotated einsum helpers.
    """
    import continuum_robot_tpu.parallel as par

    pkg_dir = os.path.dirname(par.__file__)
    contraction_attrs = {"einsum", "matmul", "dot", "tensordot"}
    offenders = []
    for fname in (
        "spatial.py", "spatial_implicit.py", "spatial_modal.py", "sweep.py"
    ):
        tree = ast.parse(open(os.path.join(pkg_dir, fname)).read())
        for node in ast.walk(tree):
            if isinstance(node, ast.BinOp) and isinstance(
                node.op, ast.MatMult
            ):
                offenders.append(f"{fname}:{node.lineno} (@ operator)")
            if not isinstance(node, ast.Call):
                continue
            fn = node.func
            if (
                isinstance(fn, ast.Attribute)
                and fn.attr in contraction_attrs
            ):
                if not any(kw.arg == "precision" for kw in node.keywords):
                    offenders.append(f"{fname}:{node.lineno} ({fn.attr})")
    assert not offenders, (
        "unannotated contraction in sharded/parametric solver paths: "
        + ", ".join(offenders)
    )
