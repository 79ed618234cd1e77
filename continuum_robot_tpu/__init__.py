"""continuum-robot-tpu: TPU-native continuum robot dynamics framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``cram9030/continuum-robot`` (Euler-Bernoulli FEM beam simulation, composable
force system, dynamic ODE models, LQR control) engineered for TPU hardware:
vmapped element kernels, ``lax.scan`` time-steppers, batched rollouts across
device meshes, and on-device control design.

Public surface parity: reference ``src/continuum_robot/__init__.py:1-9``.
"""

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
