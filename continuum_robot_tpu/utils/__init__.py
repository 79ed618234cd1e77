"""Utilities: profiling meters, numerical guards, checkpointing."""

from .checks import (
    divergence_flags,
    guard_rhs,
    init_health,
    step_with_guard,
    verify_batch_consistency,
)
from .checkpoint import load_checkpoint, save_checkpoint
from .compile_cache import enable_persistent_cache
from .profiling import StepMeter, compile_time_breakdown, force_completion, trace

__all__ = [
    "StepMeter",
    "compile_time_breakdown",
    "divergence_flags",
    "enable_persistent_cache",
    "force_completion",
    "guard_rhs",
    "init_health",
    "load_checkpoint",
    "save_checkpoint",
    "step_with_guard",
    "trace",
    "verify_batch_consistency",
]
