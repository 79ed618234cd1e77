"""Composable force system: pure, traceable force components + registries.

Parity surface (reference ``fluid_forces.py``, ``gravity_forces.py``,
``force_registry.py``): the same class names, constructor signatures,
registration semantics (enabled-check at registration *and* evaluation), and
aggregation algebra (sum of enabled components, zero-vector fallback).

TPU design: every built-in force's ``compute_forces`` is a pure jax.numpy
program over the *reduced* state vector with statically precomputed index
arrays — no Python loops over nodes/segments (the reference loops per node,
``fluid_forces.py:129-140``, and per segment, ``gravity_forces.py:97-146``).
That makes the same objects usable from the jitted scan/vmap hot path and
from reference-style eager NumPy code.

Reference quirks preserved deliberately (trajectory-parity bar):

* Gravity indexes the reduced state as if it were unreduced — segment i reads
  rotations at reduced indices ``3i+2``/``3(i+1)+2`` and applies forces at
  ``3i``/``3i+1``/``3(i+1)``/``3(i+1)+1`` with bounds checks against the
  reduced length (``gravity_forces.py:104-146``). After a FIXED base this
  shifts every segment's load one node tipward and drops the tip share.
* Fluid drag applies only at nodes whose ``w`` and ``dw_dt`` both survive
  constraint reduction, with the last node reusing the last segment's wetted
  area/drag coefficient (``fluid_forces.py:60-61, 83-90``).

Unlike the reference, aggregated forces receive the *real* simulation time
(the reference hard-wires ``t=0.0`` — ``dynamic_beam_model.py:265``; fix
noted in SURVEY §2.3).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from .abstractions import AbstractForce, AbstractInputHandler


class FluidDynamicsParams:
    """Legacy fluid parameter container (parity: ``fluid_forces.py:5-21``)."""

    def __init__(self, fluid_density: float = 0.0, enable_fluid_effects: bool = False):
        self.fluid_density = fluid_density
        self.enable_fluid_effects = enable_fluid_effects

    def __bool__(self) -> bool:
        return self.enable_fluid_effects


class FluidDragForce(AbstractForce):
    """Quadratic transverse drag ``F_w = -1/2 rho C_d A_w v_w |v_w|``.

    Constructor parity: ``fluid_forces.py:27-44``. The per-node drag factors
    and the reduced-state gather/scatter indices are precomputed once; the
    evaluation is a fully vectorized, jit-traceable expression batched over
    arbitrary leading axes.
    """

    def __init__(self, fluid_data, state_mapping, fluid_density, enabled=True):
        self.fluid_data = fluid_data
        self.state_mapping = state_mapping
        self.fluid_density = fluid_density
        self.enabled = enabled
        self.fluid_coefficients = None
        if self.is_enabled():
            self._precompute_fluid_coefficients()

    def is_enabled(self) -> bool:
        return self.enabled

    def _precompute_fluid_coefficients(self) -> None:
        wetted = np.asarray(self.fluid_data["wetted_area"], dtype=float)
        drag = np.asarray(self.fluid_data["drag_coef"], dtype=float)
        # Final node reuses the last segment's values (fluid_forces.py:60-61).
        wetted = np.append(wetted, wetted[-1])
        drag = np.append(drag, drag[-1])
        n_nodes = len(wetted)

        node_to_vel = {}
        node_to_pos = {}
        for idx, (param, node) in self.state_mapping.items():
            if param == "dw_dt" and node < n_nodes:
                node_to_vel[node] = idx
            elif param == "w" and node < n_nodes:
                node_to_pos[node] = idx

        vel_idx, pos_idx, factors = [], [], []
        for node in sorted(set(node_to_vel) & set(node_to_pos)):
            vel_idx.append(node_to_vel[node])
            pos_idx.append(node_to_pos[node])
            factors.append(0.5 * self.fluid_density * drag[node] * wetted[node])

        self.fluid_coefficients = {
            "w_vel_indices": np.asarray(vel_idx, dtype=np.int32),
            "w_pos_indices": np.asarray(pos_idx, dtype=np.int32),
            "drag_factors": np.asarray(factors, dtype=float),
            "n_pos_states": len(self.state_mapping) // 2,
        }

    def compute_forces(self, x, t):
        x = jnp.asarray(x)
        n_pos = x.shape[-1] // 2
        if not self.is_enabled() or self.fluid_coefficients is None:
            return jnp.zeros((*x.shape[:-1], n_pos), dtype=x.dtype)

        c = self.fluid_coefficients
        v = x[..., c["w_vel_indices"]]
        factors = jnp.asarray(c["drag_factors"], dtype=x.dtype)
        drag = -factors * v * jnp.abs(v)
        out = jnp.zeros((*x.shape[:-1], n_pos), dtype=x.dtype)
        return out.at[..., c["w_pos_indices"]].set(drag)

    def make_reduced_modal(self, Phi, PhiW):
        """Reduced-basis drag closure for the modal-ROM split fast path.

        Drag reads velocities at the wetted ``w`` rows and writes forces at
        the same nodes' ``w`` rows — so in a modal engine (``q = Phi eta``,
        ``v = Phi etad``, test projection ``PhiW^T``) its exact modal
        contribution is ``W_out^T @ d(Phi_v @ etad)`` with ``Phi_v``/
        ``W_out`` the ~N/3 wetted rows of the bases: two restricted
        ``(k, m)`` transforms per evaluation instead of the full
        ``(3N, m)`` pair, algebraically identical to
        ``PhiW^T compute_forces(x, t)`` (unit-tested).

        Returns ``(eta, etad, t, precision) -> (..., m)`` modal force, or
        ``None`` when the basis does not match this force's state mapping
        (callers then fall back to the full-transform path). Enablement is
        honored at trace time, like the aggregated registry function.
        """
        if self.fluid_coefficients is None:
            return None
        c = self.fluid_coefficients
        Phi = np.asarray(Phi, np.float64)
        PhiW = np.asarray(PhiW, np.float64)
        if Phi.shape[0] != c["n_pos_states"]:
            return None
        vel_rows = np.asarray(c["w_vel_indices"], np.int64) - c["n_pos_states"]
        if vel_rows.size == 0:
            return lambda eta, etad, t, precision=None: jnp.zeros(
                (*jnp.asarray(eta).shape[:-1], Phi.shape[1]),
                dtype=jnp.asarray(eta).dtype,
            )
        Phi_v = np.ascontiguousarray(Phi[vel_rows])  # (k, m)
        W_out = np.ascontiguousarray(PhiW[np.asarray(c["w_pos_indices"])])
        factors_h = np.asarray(c["drag_factors"], np.float64)

        def reduced(eta, etad, t, precision=None):
            dtype = jnp.asarray(etad).dtype
            if not self.is_enabled():  # trace-time, like the registry
                return jnp.zeros(
                    (*jnp.asarray(eta).shape[:-1], Phi_v.shape[1]), dtype
                )
            Pv = jnp.asarray(Phi_v, dtype)
            Wo = jnp.asarray(W_out, dtype)
            v = jnp.einsum("km,...m->...k", Pv, etad, precision=precision)
            drag = -jnp.asarray(factors_h, dtype) * v * jnp.abs(v)
            return jnp.einsum("km,...k->...m", Wo, drag, precision=precision)

        return reduced


class GravityForce(AbstractForce):
    """Deformation-aware distributed gravity (parity: ``gravity_forces.py``).

    Per segment: rotate the global ``(gx, gy)`` by the segment's average nodal
    rotation into local axial/transverse components, then split half the
    segment weight onto each end node's ``u``/``w`` DOFs — vectorized over
    segments with precomputed (per reduced-state-size) index/weight arrays.
    """

    def __init__(
        self,
        beam_params,
        gravity_vector: Optional[List[float]] = None,
        enabled: bool = True,
    ):
        self.beam_params = beam_params
        self.gravity_vector = np.array(
            gravity_vector if gravity_vector is not None else [0.0, -9.81, 0.0]
        )
        self.enabled = enabled
        if len(self.gravity_vector) != 3:
            raise ValueError(
                "Gravity vector must have exactly 3 components [gx, gy, gz]"
            )
        self._precompute_segment_masses()
        self._index_cache = {}

    def _precompute_segment_masses(self):
        if not self.enabled:
            self._segment_masses = []
            return
        self._segment_masses = [
            float(row["density"] * row["cross_area"] * row["length"])
            for _, row in self.beam_params.iterrows()
        ]

    def _indices_for(self, n_pos: int):
        """Static reduced-coordinate index plan for a given state size.

        Replicates the reference's bounds-checked reduced indexing
        (``gravity_forces.py:104-146``) as gather weights + a scatter table.
        """
        if n_pos in self._index_cache:
            return self._index_cache[n_pos]
        n_seg = len(self._segment_masses)

        phi_a = np.zeros(n_seg, dtype=np.int32)
        phi_b = np.zeros(n_seg, dtype=np.int32)
        wa = np.zeros(n_seg)
        wb = np.zeros(n_seg)
        for i in range(n_seg):
            s_idx, e_idx = 3 * i + 2, 3 * (i + 1) + 2
            s_ok, e_ok = s_idx < n_pos, e_idx < n_pos
            if s_ok and e_ok:
                phi_a[i], phi_b[i], wa[i], wb[i] = s_idx, e_idx, 0.5, 0.5
            elif s_ok:
                phi_a[i], wa[i] = s_idx, 1.0
            elif e_ok:
                phi_b[i], wb[i] = e_idx, 1.0
            # else both weights stay 0 -> phi_avg = 0

        seg_ids, targets, comps = [], [], []
        for i in range(n_seg):
            for tgt, comp in (
                (3 * i, 0),
                (3 * i + 1, 1),
                (3 * (i + 1), 0),
                (3 * (i + 1) + 1, 1),
            ):
                if tgt < n_pos:
                    seg_ids.append(i)
                    targets.append(tgt)
                    comps.append(comp)

        plan = {
            "phi_a": phi_a,
            "phi_b": phi_b,
            "wa": wa,
            "wb": wb,
            "seg_ids": np.asarray(seg_ids, dtype=np.int32),
            "targets": np.asarray(targets, dtype=np.int32),
            "axial_sel": np.asarray(comps, dtype=np.int32) == 0,
            "masses": np.asarray(self._segment_masses),
        }
        self._index_cache[n_pos] = plan
        return plan

    def compute_forces(self, x, t):
        x = jnp.asarray(x)
        n_pos = x.shape[-1] // 2
        if not self._segment_masses:
            raise RuntimeError(
                "Cannot compute gravity forces: beam instance does not have "
                "segments available or segment masses were not pre-computed."
            )
        plan = self._indices_for(n_pos)
        positions = x[..., :n_pos]
        gx, gy = self.gravity_vector[0], self.gravity_vector[1]

        phi_avg = (
            jnp.asarray(plan["wa"], x.dtype) * positions[..., plan["phi_a"]]
            + jnp.asarray(plan["wb"], x.dtype) * positions[..., plan["phi_b"]]
        )
        cos_phi = jnp.cos(phi_avg)
        sin_phi = jnp.sin(phi_avg)
        masses = jnp.asarray(plan["masses"], x.dtype)
        f_axial = (cos_phi * gx + sin_phi * gy) * masses * 0.5
        f_trans = (-sin_phi * gx + cos_phi * gy) * masses * 0.5

        vals = jnp.where(
            jnp.asarray(plan["axial_sel"]),
            f_axial[..., plan["seg_ids"]],
            f_trans[..., plan["seg_ids"]],
        )
        out = jnp.zeros((*x.shape[:-1], n_pos), dtype=x.dtype)
        return out.at[..., plan["targets"]].add(vals)

    def make_reduced_modal(self, Phi, PhiW):
        """Reduced-basis gravity closure for the modal-ROM split fast path.

        Gravity reads one averaged rotation per segment (a LINEAR map of
        ``q``, so ``phi_avg = G_in @ eta`` with ``G_in`` the weighted
        ``phi_a``/``phi_b`` rows of ``Phi``) and writes per-segment
        axial/transverse half-weights to at most four target rows; grouping
        the test-basis rows by segment folds the scatter into two
        ``(n_seg, m)`` output transforms: ``WA^T f_axial + WT^T f_trans``.
        Algebraically identical to ``PhiW^T compute_forces(x, t)`` incl.
        the reference's reduced-index quirk (the index plan is shared).

        Returns ``(eta, etad, t, precision) -> (..., m)``, or ``None`` when
        the basis doesn't match the plan. The gravity vector and enablement
        are read at trace time (``set_gravity_vector`` takes effect on the
        next trace, like the dense aggregated path).
        """
        if not self._segment_masses:
            return None
        Phi = np.asarray(Phi, np.float64)
        PhiW = np.asarray(PhiW, np.float64)
        n_pos = Phi.shape[0]
        plan = self._indices_for(n_pos)
        G_in = (
            plan["wa"][:, None] * Phi[plan["phi_a"]]
            + plan["wb"][:, None] * Phi[plan["phi_b"]]
        )  # (n_seg, m)
        n_seg = len(self._segment_masses)
        m = Phi.shape[1]
        WA = np.zeros((n_seg, m))
        WT = np.zeros((n_seg, m))
        ax = np.asarray(plan["axial_sel"])
        np.add.at(WA, plan["seg_ids"][ax], PhiW[plan["targets"][ax]])
        np.add.at(WT, plan["seg_ids"][~ax], PhiW[plan["targets"][~ax]])
        masses_h = np.asarray(plan["masses"], np.float64)

        def reduced(eta, etad, t, precision=None):
            dtype = jnp.asarray(eta).dtype
            if not self.is_enabled():  # trace-time, like the registry
                return jnp.zeros((*jnp.asarray(eta).shape[:-1], m), dtype)
            gx = float(self.gravity_vector[0])
            gy = float(self.gravity_vector[1])
            Gi = jnp.asarray(G_in, dtype)
            phi_avg = jnp.einsum("sm,...m->...s", Gi, eta,
                                 precision=precision)
            cos_phi = jnp.cos(phi_avg)
            sin_phi = jnp.sin(phi_avg)
            mass = jnp.asarray(masses_h, dtype)
            f_ax = (cos_phi * gx + sin_phi * gy) * mass * 0.5
            f_tr = (-sin_phi * gx + cos_phi * gy) * mass * 0.5
            return jnp.einsum(
                "sm,...s->...m", jnp.asarray(WA, dtype), f_ax,
                precision=precision,
            ) + jnp.einsum(
                "sm,...s->...m", jnp.asarray(WT, dtype), f_tr,
                precision=precision,
            )

        return reduced

    def is_enabled(self) -> bool:
        return self.enabled

    def set_enabled(self, enabled: bool) -> None:
        self.enabled = enabled

    def set_gravity_vector(self, gravity_vector: List[float]) -> None:
        if len(gravity_vector) != 3:
            raise ValueError(
                "Gravity vector must have exactly 3 components [gx, gy, gz]"
            )
        self.gravity_vector = np.array(gravity_vector)

    def get_gravity_vector(self) -> np.ndarray:
        return self.gravity_vector.copy()


# ---------------------------------------------------------------------------
# Registries (parity: force_registry.py)
# ---------------------------------------------------------------------------


import itertools

# Process-wide monotone counter stamping every registered force with a
# never-reused identity token. jit-cache keys built from these tokens stay
# collision-free even when a garbage-collected force's address is recycled
# by a new object (``id()`` alone is NOT unique across lifetimes — keying
# on it can serve a stale compiled program).
_FORCE_UID = itertools.count(1)


def force_trace_uid(force) -> int:
    """Stable, never-reused identity token for jit-cache keys."""
    uid = getattr(force, "_trace_uid", None)
    if uid is None:
        uid = next(_FORCE_UID)
        try:
            force._trace_uid = uid
        except AttributeError:  # __slots__ objects: fall back per-call
            return id(force)
    return uid


class ForceRegistry:
    """Runtime-composable force list (parity: ``force_registry.py:6-89``)."""

    def __init__(self):
        self._forces: List[AbstractForce] = []

    def register(self, force_instance: AbstractForce) -> None:
        if force_instance.is_enabled():
            force_trace_uid(force_instance)
            self._forces.append(force_instance)

    def unregister(self, force_instance: AbstractForce) -> bool:
        if force_instance in self._forces:
            self._forces.remove(force_instance)
            return True
        return False

    def clear(self) -> None:
        self._forces.clear()

    def get_registered_forces(self) -> List[AbstractForce]:
        return self._forces.copy()

    def create_aggregated_function(self) -> Callable:
        """Sum of enabled components; zero-vector fallback when empty.

        The enabled-check happens at every evaluation, so disabling a
        registered force takes effect immediately (reference semantics,
        ``force_registry.py:67``).
        """

        def aggregate_forces(x, t: float = 0.0):
            x = jnp.asarray(x)
            n_pos = x.shape[-1] // 2
            total = None
            for force in self._forces:
                if force.is_enabled():
                    contrib = jnp.asarray(force.compute_forces(x, t))
                    total = contrib if total is None else total + contrib
            if total is None:
                return jnp.zeros((*x.shape[:-1], n_pos), dtype=x.dtype)
            return total

        return aggregate_forces

    def __len__(self) -> int:
        return len(self._forces)

    def __contains__(self, force_instance: AbstractForce) -> bool:
        return force_instance in self._forces


class InputRegistry:
    """Runtime-composable input-handler list (parity: ``force_registry.py:92-173``)."""

    def __init__(self):
        self._input_handlers: List[AbstractInputHandler] = []

    def register(self, input_handler: AbstractInputHandler) -> None:
        if input_handler.is_enabled():
            self._input_handlers.append(input_handler)

    def unregister(self, input_handler: AbstractInputHandler) -> bool:
        if input_handler in self._input_handlers:
            self._input_handlers.remove(input_handler)
            return True
        return False

    def clear(self) -> None:
        self._input_handlers.clear()

    def get_registered_handlers(self) -> List[AbstractInputHandler]:
        return self._input_handlers.copy()

    def create_aggregated_function(self) -> Callable:
        """``u + sum(handler deltas)`` (reference ``force_registry.py:145-163``)."""

        def aggregate_input_processing(x, u, t: float = 0.0):
            if not self._input_handlers:
                return jnp.asarray(u)
            total = jnp.asarray(u)
            for handler in self._input_handlers:
                if handler.is_enabled():
                    total = total + jnp.asarray(handler.compute_input(x, u, t))
            return total

        return aggregate_input_processing

    def __len__(self) -> int:
        return len(self._input_handlers)

    def __contains__(self, input_handler: AbstractInputHandler) -> bool:
        return input_handler in self._input_handlers
