"""Pallas TPU kernels for the hot structured-linear-algebra ops."""

from .btd_solve import btd_solve_pallas

__all__ = ["btd_solve_pallas"]
