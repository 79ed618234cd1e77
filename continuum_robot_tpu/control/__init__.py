"""Control layer: LQR design (on-device CARE) + state-feedback handlers."""

from .full_state_linear import FullStateLinear
from .lqr import LinearQuadraticRegulator

__all__ = ["FullStateLinear", "LinearQuadraticRegulator"]
