"""Control layer: LQR design (on-device CARE), LQG/Kalman estimation,
state-feedback handlers."""

from .full_state_linear import FullStateLinear
from .lqg import (
    LinearQuadraticEstimator,
    LinearQuadraticGaussian,
    output_matrix,
)
from .lqr import LinearQuadraticRegulator

__all__ = [
    "FullStateLinear",
    "LinearQuadraticEstimator",
    "LinearQuadraticGaussian",
    "LinearQuadraticRegulator",
    "output_matrix",
]
