"""Numerical operators: banded linear algebra, integrators, control solves."""

from . import banded, integrators

__all__ = ["banded", "integrators"]
