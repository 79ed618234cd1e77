"""Does the REFERENCE blow up on the same nonlinear workload? (It should:
our nonlinear element reproduces its polynomials to <=9e-12.)

Runs /root/reference's DynamicEulerBernoulliBeam on the 240-element
tip-force workload of diag_nl_matrix.py with solve_ivp(RK45) over 1.2 ms
and prints max|v| per output frame — growth mirroring our dopri5 run
confirms the instability is the reference model's own physics
(variationally-inconsistent von Karman force can pump energy), not a bug
in this repo.

Run:  python tools/repros/diag_nl_reference.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/reference/src")


def main():
    import pandas as pd
    from scipy.integrate import solve_ivp

    from continuum_robot.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam as Ref,
    )

    n_el = 240
    L, E, r, rho = 0.25, 75e9, 0.005, 6450.0
    I = np.pi * r**4 / 4
    A = np.pi * r**2
    df = pd.DataFrame(
        {
            "length": [L] * n_el,
            "elastic_modulus": [E] * n_el,
            "moment_inertia": [I] * n_el,
            "density": [rho] * n_el,
            "cross_area": [A] * n_el,
            "type": ["nonlinear"] * n_el,
            "boundary_condition": ["FIXED"] + ["NONE"] * (n_el - 1),
        }
    )
    with tempfile.NamedTemporaryFile("w", suffix=".csv", delete=False) as f:
        df.to_csv(f.name, index=False)
        path = f.name
    try:
        model = Ref(path)
    finally:
        os.unlink(path)
    model.create_system_func()
    model.create_input_func()
    dyn = model.get_dynamic_system()

    n = model.beam_model.M.shape[0]
    rng = np.random.default_rng(0)
    q0 = rng.normal(scale=1e-6, size=n)
    x0 = np.concatenate([q0, np.zeros(n)])
    u = np.zeros(n)
    u[-2] = 0.1

    sol = solve_ivp(
        lambda t, x: dyn(t, x, u),
        (0.0, 1.2e-3),
        x0,
        method="RK45",
        t_eval=np.linspace(0, 1.2e-3, 13),
        rtol=1e-6,
        atol=1e-10,
    )
    vm = np.abs(sol.y[n:, :]).max(axis=0)
    print("success:", sol.success, " nfev:", sol.nfev)
    print("max|v| per 0.1 ms frame:")
    print(" ".join(f"{x:.2e}" for x in vm))
    print("VERDICT:", "BLOWUP (matches repo dopri5)" if vm[-1] > 1.0
          else "bounded")


if __name__ == "__main__":
    main()
