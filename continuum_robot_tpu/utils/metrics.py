"""Structured per-run metrics: energies, tip trajectory, drift diagnostics.

The reference's observability is print statements and matplotlib plots
(SURVEY §5). This module computes the physical diagnostics as traced
reductions that can run inside the rollout scan (no trajectory
materialization needed at scale):

* kinetic energy ``1/2 v^T M v`` via the block-tridiagonal mass matvec,
* strain energy via the *consistent* element energy (well-defined even when
  simulating with the reference-parity kernel, which is non-variational —
  for that kernel "energy drift" is a diagnostic, not a conservation law),
* tip trajectory extraction matching the reference's
  ``sol.y[n_pos+1::3]`` convention (``example_utilities.py:196``).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import assembly, elements
from ..ops import banded


def make_energy_fns(model):
    """Build traced ``kinetic(v_red)`` and ``strain(q_red)`` functions."""
    arrays = model.beam_model.arrays
    bc = model.beam_model.bc_info
    free = bc.free_dofs
    n_full = bc.n_dofs_full
    n_nodes = bc.n_nodes
    mask_nodes = bc.free_mask.reshape(n_nodes, 3)

    m_diag, m_off = assembly.mass_block_tridiagonal(arrays)
    m_lower = np.swapaxes(np.asarray(m_off), -1, -2)
    md, ml, mu = banded.btd_apply_bc(
        np.asarray(m_diag), m_lower, np.asarray(m_off), mask_nodes
    )

    def kinetic(v_red):
        v_nodes = assembly.pad_to_full(v_red, free, n_full).reshape(
            *v_red.shape[:-1], n_nodes, 3
        )
        mv = banded.btd_matvec(md, ml, mu, v_nodes)
        return 0.5 * jnp.sum(mv * v_nodes, axis=(-1, -2))

    def strain(q_red):
        q_full = assembly.pad_to_full(q_red, free, n_full)
        q6 = assembly.gather_element_states(q_full)
        e_nl = elements.element_strain_energy(
            q6, arrays.length, arrays.elastic_modulus,
            arrays.moment_inertia, arrays.cross_area,
        )
        # Linear elements carry the quadratic energy 1/2 q^T K q — using the
        # von Karman energy for them would report spurious "drift" of the
        # order of the neglected cubic terms.
        Ke = elements.linear_stiffness_matrix(
            arrays.length, arrays.elastic_modulus,
            arrays.moment_inertia, arrays.cross_area,
        )
        e_lin = 0.5 * jnp.einsum("...ei,eij,...ej->...e", q6, jnp.asarray(Ke), q6)
        e = jnp.where(jnp.asarray(arrays.nonlinear_mask), e_nl, e_lin)
        return jnp.sum(e, axis=-1)

    return kinetic, strain


def run_metrics(model, result) -> Dict[str, float]:
    """Summary metrics for a :class:`SimulationResult` (host-side)."""
    ys = jnp.asarray(result.ys)
    n = ys.shape[-1] // 2
    kinetic, strain = make_energy_fns(model)
    ke = jax.jit(kinetic)(ys[..., n:])
    se = jax.jit(strain)(ys[..., :n])
    total = np.asarray(ke + se)
    tip = np.asarray(ys[..., n - 2])
    out = {
        "tip_final": float(np.ravel(tip[-1:])[0]),
        "tip_abs_max": float(np.abs(tip).max()),
        "energy_initial": float(total.flat[0]),
        "energy_final": float(np.ravel(total[-1:])[0]),
        "energy_max": float(total.max()),
        "n_frames": int(ys.shape[0]),
        "finite": bool(np.all(np.isfinite(np.asarray(ys)))),
    }
    e0 = max(abs(out["energy_max"]), 1e-300)
    out["energy_drift_rel"] = (out["energy_final"] - out["energy_initial"]) / e0
    return out


def tip_trajectory(result):
    """Tip transverse displacement over time (reference extraction shape)."""
    ys = np.asarray(result.ys)
    n = ys.shape[-1] // 2
    return np.asarray(result.ts), ys[..., n - 2]
