"""Parameter sweeps: batched beam configurations as traced pytrees.

The reference sweeps configurations by writing one CSV per variant and
farming separate processes (``beam_comparison_*.py``). Here
:class:`~continuum_robot_tpu.models.config.BeamArrays` is a pytree, so a
*batch of beams* is just the same pytree with a leading axis — one compiled
rollout vmapped over both the configuration and the initial state. Because
everything is traced, the rollout is also **differentiable in the physical
parameters**: ``jax.grad`` of a trajectory loss w.r.t. elastic modulus,
lengths, drag coefficients, etc. comes for free (design optimization /
system identification — no reference counterpart).

The mass operator depends on the swept parameters, so each environment
factors its own block-tridiagonal mass on device (``banded.btd_factor`` is
traceable and vmaps); there is no host-side precomputation in this path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import assembly
from ..models.config import BeamArrays
from ..ops import banded, integrators


def tile_arrays(arrays: BeamArrays, n: int) -> BeamArrays:
    """Replicate a host config into an ``(n, E)`` batched jnp pytree."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x), (n, *np.shape(x))), arrays
    )


def override_arrays(arrays: BeamArrays, **columns) -> BeamArrays:
    """Batched copies of ``arrays`` with some fields replaced.

    Each keyword maps a field name to an array of shape ``(n_envs, E)`` or
    ``(n_envs, 1)`` (broadcast over elements). Example::

        sweep = override_arrays(model.beam_model.arrays,
                                elastic_modulus=E_samples[:, None])
    """
    n = None
    for v in columns.values():
        n = np.shape(v)[0]
        break
    if n is None:
        raise ValueError("provide at least one override column")
    batched = tile_arrays(arrays, n)
    updates = {}
    for k, v in columns.items():
        if not hasattr(arrays, k):
            raise ValueError(f"BeamArrays has no field {k!r}")
        v = jnp.asarray(v)
        tgt = getattr(batched, k)
        updates[k] = jnp.broadcast_to(v, tgt.shape).astype(tgt.dtype)
    import dataclasses

    return dataclasses.replace(batched, **updates)


def make_parametric_rhs(
    bc_info,
    forces_func: Optional[Callable] = None,
    use_consistent: bool = False,
) -> Callable:
    """Pure ``rhs(t, x_red, u, arrays)`` — beam parameters are an argument.

    Unlike ``DynamicEulerBernoulliBeam.build_rhs`` (which closes over one
    fixed configuration with a prefactored mass inverse), this evaluates the
    mass solve from the given ``arrays`` every call via an on-device
    block-tridiagonal factorization, so it can be vmapped over configuration
    batches and differentiated w.r.t. every physical parameter.
    """
    free = np.asarray(bc_info.free_dofs)
    n_full = bc_info.n_dofs_full
    n_nodes = bc_info.n_nodes
    mask_nodes = jnp.asarray(bc_info.free_mask.reshape(n_nodes, 3))

    def rhs(t, x, u, arrays: BeamArrays):
        n = x.shape[-1] // 2
        q, v = x[..., :n], x[..., n:]

        q_full = assembly.pad_to_full(q, free, n_full)
        k_full = assembly.internal_force_full(
            arrays, q_full, use_consistent=use_consistent
        )
        f = -assembly.reduce_from_full(k_full, free)
        if forces_func is not None:
            f = f + forces_func(x, t, arrays)
        if u is not None:
            f = f + (u(t) if callable(u) else u)

        diag, off = assembly.mass_block_tridiagonal(arrays)
        lower = jnp.swapaxes(off, -1, -2)
        diag, lower, upper = banded.btd_apply_bc(diag, lower, off, mask_nodes)
        factors = banded.btd_factor(diag, lower, upper)
        f_nodes = assembly.pad_to_full(f, free, n_full).reshape(
            *f.shape[:-1], n_nodes, 3
        )
        acc_full = banded.btd_solve(factors, f_nodes).reshape(
            *f.shape[:-1], n_full
        )
        acc = assembly.reduce_from_full(acc_full, free)
        return jnp.concatenate([v, acc], axis=-1)

    return rhs


def parametric_rollout(
    bc_info,
    arrays_batch: BeamArrays,
    x0_batch,
    t_final: float,
    dt: float,
    u=None,
    forces_func: Optional[Callable] = None,
    substeps: int = 1,
    use_consistent: bool = False,
):
    """Batched RK4 rollout over ``(configuration, initial state)`` pairs.

    Returns ``(ts, ys (frames, envs, state))``. Fully differentiable w.r.t.
    ``arrays_batch`` and ``x0_batch``.
    """
    rhs = make_parametric_rhs(bc_info, forces_func, use_consistent)
    n_steps = int(round(t_final / dt))

    def one(arrays, x0):
        def rhs_fixed(t, x, uu):
            return rhs(t, x, uu, arrays)

        return integrators.integrate_fixed(
            rhs_fixed, x0, 0.0, dt, n_steps, u=u, substeps=substeps
        )

    ts, ys = jax.vmap(one)(arrays_batch, jnp.asarray(x0_batch))
    return ts[0], jnp.swapaxes(ys, 0, 1)
