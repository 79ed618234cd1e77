"""Beam configuration: CSV/DataFrame -> array pytrees + force parameters.

Two-tier config shape mirroring the reference (SURVEY §5): (1) a CSV/DataFrame
parameter table with one row per segment and the exact reference column schema
(``dynamic_beam_model.py:76-118``), and (2) a :class:`ForceParams` dataclass
for force toggles (``force_params.py:7-69``).

The TPU-side representation is :class:`BeamArrays` — a pytree of per-element
parameter arrays consumed by the vmapped element kernels. Anything that
affects shapes (element count, constrained DOF set) stays host-side/static.
"""

from __future__ import annotations

import dataclasses
import pathlib
from dataclasses import dataclass, field
from typing import List, Union

import jax
import numpy as np
import pandas as pd

from .abstractions import (
    BoundaryConditionType,
    ElementType,
    boundary_conditions_from_dataframe,
    dofs_constrained_by,
    validate_beam_dataframe,
)


def default_dtype():
    """float64 when x64 is enabled (CPU golden tests), else float32 (TPU)."""
    return np.float64 if jax.config.jax_enable_x64 else np.float32


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BeamArrays:
    """Per-element parameter arrays, shape ``(n_elements,)`` each.

    This is the traced pytree handed to jitted kernels; it may be batched
    (leading axes) for parameter sweeps via ``jax.vmap``.
    """

    length: object  # np.ndarray (host/setup) or jax.Array (traced sweeps)
    elastic_modulus: object
    moment_inertia: object
    density: object
    cross_area: object
    wetted_area: object
    drag_coef: object
    nonlinear_mask: object  # bool array

    @property
    def n_elements(self) -> int:
        return self.length.shape[-1]

    @property
    def EI(self) -> jax.Array:
        return self.elastic_modulus * self.moment_inertia

    @property
    def EA(self) -> jax.Array:
        return self.elastic_modulus * self.cross_area

    @property
    def rhoA(self) -> jax.Array:
        return self.density * self.cross_area

    @property
    def segment_mass(self) -> jax.Array:
        return self.density * self.cross_area * self.length


def beam_arrays_from_dataframe(df: pd.DataFrame, dtype=None) -> BeamArrays:
    """Flatten a validated parameter table into :class:`BeamArrays`.

    Optional fluid columns default to zero when absent (they are only read
    when fluid effects are enabled, matching ``dynamic_beam_model.py:89-90``).

    Leaves are host NumPy arrays: setup-time math stays on the host (eager
    device ops are expensive on the axon TPU backend) and jitted programs
    close over them as baked-in constants. Batched parameter sweeps may
    substitute jnp arrays (the kernels dispatch on input type).
    """
    dtype = dtype or default_dtype()
    n = len(df)

    def col(name):
        if name in df.columns:
            return np.asarray(df[name].to_numpy(dtype=float), dtype=dtype)
        return np.zeros((n,), dtype=dtype)

    nonlinear = np.asarray(
        df["type"].str.lower().to_numpy() == ElementType.NONLINEAR.value
    )
    return BeamArrays(
        length=col("length"),
        elastic_modulus=col("elastic_modulus"),
        moment_inertia=col("moment_inertia"),
        density=col("density"),
        cross_area=col("cross_area"),
        wetted_area=col("wetted_area"),
        drag_coef=col("drag_coef"),
        nonlinear_mask=nonlinear,
    )


def load_beam_dataframe(
    parameters: Union[str, pathlib.Path, pd.DataFrame],
) -> pd.DataFrame:
    """Load a parameter table from CSV path or copy a DataFrame.

    Error contracts match the reference (``euler_bernoulli_beam.py:43-52``).
    """
    if isinstance(parameters, (str, pathlib.Path)):
        try:
            return pd.read_csv(parameters)
        except FileNotFoundError:
            raise FileNotFoundError(f"Parameter file {parameters} not found")
    if isinstance(parameters, pd.DataFrame):
        return parameters.copy()
    raise TypeError("Parameters must be filepath or pandas DataFrame")


@dataclass
class ForceParams:
    """Unified force configuration (parity: ``force_params.py:7-69``).

    Validation semantics preserved: gravity auto-disables when the vector is
    ~zero; enabling fluid effects requires a positive fluid density.
    """

    fluid_density: float = 0.0
    enable_fluid_effects: bool = False
    gravity_vector: List[float] = field(default_factory=lambda: [0.0, -9.81, 0.0])
    enable_gravity_effects: bool = False

    def __post_init__(self):
        self.gravity_vector = np.array(self.gravity_vector, dtype=float)
        if np.allclose(self.gravity_vector, [0.0, 0.0, 0.0]):
            self.enable_gravity_effects = False
        if len(self.gravity_vector) != 3:
            raise ValueError(
                "gravity_vector must have exactly 3 components [gx, gy, gz]"
            )
        if self.enable_fluid_effects and self.fluid_density <= 0:
            raise ValueError(
                "fluid_density must be positive when fluid effects are enabled"
            )

    def __bool__(self) -> bool:
        return self.enable_fluid_effects or self.enable_gravity_effects

    def get_gravity_vector(self) -> np.ndarray:
        return self.gravity_vector.copy()

    def set_gravity_vector(self, gravity_vector: List[float]) -> None:
        if len(gravity_vector) != 3:
            raise ValueError(
                "gravity_vector must have exactly 3 components [gx, gy, gz]"
            )
        self.gravity_vector = np.array(gravity_vector, dtype=float)
        if np.allclose(self.gravity_vector, [0.0, 0.0, 0.0]):
            self.enable_gravity_effects = False


@dataclass(frozen=True)
class BCInfo:
    """Static (host-side) boundary-condition bookkeeping.

    The reference *removes* constrained DOFs, changing array shapes
    (``euler_bernoulli_beam.py:257-295``). Under jit shapes must be static, so
    we precompute the free-DOF index array once on the host; reduced<->full
    mapping is then a static gather/scatter that XLA folds into the program.
    """

    n_nodes: int
    constrained_dofs: tuple  # sorted tuple of removed global DOF indices
    free_dofs: np.ndarray  # sorted int array of kept global DOF indices

    @property
    def n_dofs_full(self) -> int:
        return 3 * self.n_nodes

    @property
    def n_free(self) -> int:
        return len(self.free_dofs)

    @property
    def free_mask(self) -> np.ndarray:
        m = np.zeros(self.n_dofs_full, dtype=bool)
        m[self.free_dofs] = True
        return m


def make_bc_info(n_elements: int, conditions: dict) -> BCInfo:
    """Build :class:`BCInfo` from a node->BoundaryConditionType dict.

    Validation parity: node range check and all-constrained rejection
    (``euler_bernoulli_beam.py:230-262``).
    """
    n_nodes = n_elements + 1
    constrained = set()
    for node_idx, bc_type in conditions.items():
        if node_idx < 0 or node_idx >= n_nodes:
            raise ValueError(f"Node index {node_idx} out of range [0, {n_nodes - 1}]")
        constrained.update(dofs_constrained_by(bc_type, node_idx))

    all_dofs = set(range(3 * n_nodes))
    free = sorted(all_dofs - constrained)
    if not free:
        raise ValueError("Cannot constrain all degrees of freedom")
    return BCInfo(
        n_nodes=n_nodes,
        constrained_dofs=tuple(sorted(constrained)),
        free_dofs=np.asarray(free, dtype=np.int32),
    )


__all__ = [
    "BeamArrays",
    "BCInfo",
    "ForceParams",
    "beam_arrays_from_dataframe",
    "boundary_conditions_from_dataframe",
    "default_dtype",
    "load_beam_dataframe",
    "make_bc_info",
    "validate_beam_dataframe",
    "BoundaryConditionType",
]
