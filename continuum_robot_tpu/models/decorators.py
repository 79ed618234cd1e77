"""Legacy decorator-based force/input composition API.

Parity surface for the reference's older composition style
(``decorators.py:7-137``): ``force_component`` / ``input_component`` class
decorators plus the free aggregation helpers. The registry API
(``models/forces.py``) is the primary path; this module is kept so
reference-style user code ports unchanged.
"""

from __future__ import annotations

from functools import wraps
from typing import Callable, List

import jax.numpy as jnp

from .abstractions import AbstractForce, AbstractInputHandler


def force_component(*force_classes: AbstractForce):
    """Attach force component classes to a ``create_system_func`` method."""

    def decorator(func: Callable) -> Callable:
        @wraps(func)
        def wrapper(self, *args, **kwargs):
            if not hasattr(self, "_force_components"):
                self._force_components = []
            for force_class in force_classes:
                if hasattr(force_class, "__call__"):
                    force_instance = force_class(self)
                    if force_instance.is_enabled():
                        self._force_components.append(force_instance)
            return func(self, *args, **kwargs)

        return wrapper

    return decorator


def input_component(*input_classes: AbstractInputHandler):
    """Attach input handler classes to a ``create_input_func`` method."""

    def decorator(func: Callable) -> Callable:
        @wraps(func)
        def wrapper(self, *args, **kwargs):
            if not hasattr(self, "_input_components"):
                self._input_components = []
            for input_class in input_classes:
                if hasattr(input_class, "__call__"):
                    input_instance = input_class(self)
                    if input_instance.is_enabled():
                        self._input_components.append(input_instance)
            return func(self, *args, **kwargs)

        return wrapper

    return decorator


def create_forces_function(force_components: List[AbstractForce]) -> Callable:
    """Aggregate a component list into ``forces(x, t)`` (sum of enabled)."""

    def forces(x, t: float = 0.0):
        x = jnp.asarray(x)
        total = None
        for comp in force_components:
            if comp.is_enabled():
                contrib = jnp.asarray(comp.compute_forces(x, t))
                total = contrib if total is None else total + contrib
        if total is None:
            return jnp.zeros((*x.shape[:-1], x.shape[-1] // 2), dtype=x.dtype)
        return total

    return forces


def create_input_processor(input_components: List[AbstractInputHandler]) -> Callable:
    """Chain input components into ``process_input(x, u, t)``."""

    def process_input(x, u, t: float = 0.0):
        processed = jnp.asarray(u)
        for comp in input_components:
            if comp.is_enabled():
                processed = comp.process_input(x, processed, t)
        return processed

    return process_input
