"""Full-state feedback input handler.

Parity surface: reference ``control/full_state_linear.py:5-64`` — an
:class:`AbstractInputHandler` computing ``u = K (r - x)`` with the same
dimension-validation contracts. The feedback law itself is a pure traceable
expression, so the handler composes into jitted closed-loop rollouts
(``parallel/rollout.py`` / ``examples/lqr_control.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.abstractions import AbstractInputHandler


class FullStateLinear(AbstractInputHandler):
    """State-feedback input: ``compute_input(x, r, t) = K (r - x)``."""

    def __init__(self, gain_matrix, enabled: bool = True):
        gain_matrix = np.asarray(gain_matrix)
        if gain_matrix.ndim != 2:
            raise ValueError("Gain matrix must be a 2D array.")
        self.gain_matrix = gain_matrix
        self.enabled = enabled

    def compute_input(self, x, r, t):
        x = jnp.asarray(x)
        r = jnp.asarray(r)
        if r.ndim != 1:
            raise ValueError("Input vector r must be a 1D array.")
        if x.ndim != 1:
            raise ValueError("State vector x must be a 1D array.")
        if x.shape[0] != r.shape[0]:
            raise ValueError(
                "State vector and refrence vector must have the same length."
            )
        if self.gain_matrix.shape[1] != x.shape[0]:
            raise ValueError(
                "Gain matrix column dimension must match state vector length."
            )
        return jnp.asarray(self.gain_matrix, dtype=x.dtype) @ (r - x)

    def feedback(self, x, r):
        """Broadcast-friendly pure form (no validation) for jitted rollouts."""
        K = jnp.asarray(self.gain_matrix)
        return jnp.einsum("ij,...j->...i", K, jnp.asarray(r) - jnp.asarray(x))

    def is_enabled(self) -> bool:
        return self.enabled
