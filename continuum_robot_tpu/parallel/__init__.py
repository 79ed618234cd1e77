"""Parallelism layer: device meshes, batched/sharded rollouts, spatial sharding."""

from .facade import simulate_sharded
from .mesh import batch_sharding, make_mesh, replicated
from .rollout import batched_rollout, build_rollout_fn, sweep_statistics
from .spatial import (
    SpatialBeam,
    build_spatial_rhs,
    make_spatial_beam,
    reduced_to_node_layout,
    spatial_rollout,
)
from .spatial_implicit import (
    build_spatial_genalpha,
    build_spatial_genalpha_adaptive,
    build_spatial_sdirk3,
    spike_prepare,
    spike_solve,
)
from .spatial_modal import (
    SpatialModal,
    SpatialModalROM,
    build_spatial_modal,
    build_spatial_modal_rom,
)
from .sweep import (
    make_parametric_rhs,
    make_traced_genalpha_operator,
    override_arrays,
    parametric_genalpha_rollout,
    parametric_modal_rom_rollout,
    parametric_rollout,
    tile_arrays,
)

__all__ = [
    "SpatialBeam",
    "SpatialModal",
    "SpatialModalROM",
    "build_spatial_modal",
    "build_spatial_modal_rom",
    "batch_sharding",
    "batched_rollout",
    "build_rollout_fn",
    "build_spatial_genalpha",
    "build_spatial_genalpha_adaptive",
    "build_spatial_rhs",
    "build_spatial_sdirk3",
    "make_mesh",
    "spike_prepare",
    "spike_solve",
    "make_parametric_rhs",
    "make_spatial_beam",
    "make_traced_genalpha_operator",
    "override_arrays",
    "parametric_genalpha_rollout",
    "parametric_modal_rom_rollout",
    "parametric_rollout",
    "reduced_to_node_layout",
    "replicated",
    "simulate_sharded",
    "spatial_rollout",
    "sweep_statistics",
    "tile_arrays",
]
