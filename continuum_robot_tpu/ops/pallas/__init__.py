"""Pallas TPU kernels for the hot structured-linear-algebra ops."""

from .btd_solve import btd_solve_pallas
from .fused_rollout import drag_coefficient_vector, fused_gen_alpha_steps, fused_rollout
from .modal_rollout import fused_modal_frames, fused_modal_steps
from .rom_rollout import FusedROMRollout

__all__ = [
    "FusedROMRollout",
    "btd_solve_pallas",
    "drag_coefficient_vector",
    "fused_gen_alpha_steps",
    "fused_modal_frames",
    "fused_modal_steps",
    "fused_rollout",
]
