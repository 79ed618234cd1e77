"""continuum-robot-tpu: TPU-native continuum robot dynamics framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``cram9030/continuum-robot`` (Euler-Bernoulli FEM beam simulation, composable
force system, dynamic ODE models, LQR control) engineered for TPU hardware:
vmapped element kernels, ``lax.scan`` time-steppers, batched rollouts across
device meshes, and on-device control design.

Public surface parity: reference ``src/continuum_robot/__init__.py:1-9``.
"""

import os as _os

import jax as _jax

# Numerically-load-bearing default: on TPU, f32 matmuls/einsums without an
# explicit ``precision=`` run the MXU with bfloat16 INPUTS (8-bit mantissa).
# The stiff FEM operators here (condition numbers 1e6+) lose implicit solves
# entirely at that precision — measured as hardware-only NaN blowups of the
# sharded nonlinear SPIKE engine while the identical f32 program is bounded
# on CPU (NOTES_r4.md session 4; CPU f32 matmuls are true f32, so no CPU
# test can catch a missing annotation). Engines that deliberately trade
# precision for speed pass it explicitly (``nl_precision``, bf16-carry
# kernels), so they are unaffected by this default. An explicit user/env
# setting wins.
if (_os.environ.get("JAX_DEFAULT_MATMUL_PRECISION") is None
        and _jax.config.jax_default_matmul_precision is None):
    _jax.config.update("jax_default_matmul_precision", "highest")

from .control import FullStateLinear, LinearQuadraticRegulator
from .models import (
    BoundaryConditionType,
    DynamicEulerBernoulliBeam,
    ElementType,
    EulerBernoulliBeam,
    ForceParams,
    GravityForce,
    IBeam,
    ISegment,
    Properties,
)

__version__ = "0.1.0"

__all__ = [
    "BoundaryConditionType",
    "DynamicEulerBernoulliBeam",
    "ElementType",
    "EulerBernoulliBeam",
    "ForceParams",
    "FullStateLinear",
    "GravityForce",
    "IBeam",
    "ISegment",
    "LinearQuadraticRegulator",
    "Properties",
    "__version__",
]
