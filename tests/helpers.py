"""Shared test fixtures: CSV builders with the reference's Nitinol workload.

Material constants match the reference example harness
(``examples/example_utilities.py:24-34``): 0.25 m segments, E = 75 GPa,
r = 5 mm, rho = 6450 kg/m^3, C_d = 0.82.
"""

from __future__ import annotations

import tempfile

import numpy as np

LENGTH = 0.25
E_MOD = 75e9
RADIUS = 0.005
DENSITY = 6450.0
DRAG_COEF = 0.82
M_INERTIA = np.pi * RADIUS**4 / 4
CROSS_AREA = np.pi * RADIUS**2
WETTED_AREA = 2 * np.pi * RADIUS * LENGTH

HEADER = (
    "length,elastic_modulus,moment_inertia,density,cross_area,"
    "type,boundary_condition,wetted_area,drag_coef"
)


def write_beam_csv(
    types,
    boundary_conditions=None,
    length=LENGTH,
    include_fluid=True,
    path=None,
):
    """Create a temp CSV for the given element types; returns the path."""
    n = len(types)
    if boundary_conditions is None:
        boundary_conditions = ["FIXED"] + ["NONE"] * (n - 1)
    header = HEADER if include_fluid else HEADER.rsplit(",", 2)[0]
    f = (
        open(path, "w")
        if path
        else tempfile.NamedTemporaryFile(mode="w", delete=False, suffix=".csv")
    )
    with f:
        f.write(header + "\n")
        for t, bc in zip(types, boundary_conditions):
            row = f"{length},{E_MOD},{M_INERTIA},{DENSITY},{CROSS_AREA},{t},{bc}"
            if include_fluid:
                row += f",{WETTED_AREA},{DRAG_COEF}"
            f.write(row + "\n")
    return path or f.name


def linear_csv(n=6, **kw):
    return write_beam_csv(["linear"] * n, **kw)


def nonlinear_csv(n=6, **kw):
    return write_beam_csv(["nonlinear"] * n, **kw)


def mixed_csv(n=6, **kw):
    return write_beam_csv(["linear"] * (n // 2) + ["nonlinear"] * (n - n // 2), **kw)


def tip_impulse(n_pos, amplitude=0.1, t_end=0.01):
    """The reference's tip-impulse input (``example_utilities.py:144-148``).

    Returns a traceable callable t -> force vector (impulse on the tip's
    transverse DOF, index -2 of the position block).
    """
    import jax.numpy as jnp

    base = jnp.zeros(n_pos)
    tip = base.at[-2].set(amplitude)

    def u(t):
        return jnp.where(t < t_end, tip, base)

    return u
