"""Instability discriminator matrix for the 240-element nonlinear blowup.

diag_f32_dense.py showed the blowup is engine-independent (dense == sharded
to 1e-7 all the way into the NaN). This sweeps the candidate causes on the
dense engine:

  * n_newton (modified-Newton convergence),
  * full Newton (re-linearized tangent),
  * use_consistent_nonlinear (variationally consistent vs reference-parity
    polynomials),
  * rho_inf (numerical dissipation),
  * dt (stiff-mode amplification),
  * dopri5 explicit reference (is the MODEL itself unstable?).

Run:  python tools/repros/diag_nl_matrix.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def run_case(label, model, q0, v0, u, dt, steps, chunk, **kw):
    from continuum_robot_tpu.models.simulate import make_newmark_operator
    from continuum_robot_tpu.ops import integrators

    op = make_newmark_operator(
        model, dt=None, linear_solver="btd",
        use_modified_newton=kw.get("use_modified_newton", True),
    )
    rho = kw.get("rho_inf", 0.5)
    nn_ = kw.get("n_newton", 2)
    roll = jax.jit(lambda q, v: integrators.integrate_generalized_alpha(
        op, q, v, 0.0, chunk * dt, 1, u=jnp.asarray(u),
        rho_inf=rho, n_newton=nn_, substeps=chunk))
    q, v = jnp.asarray(q0), jnp.asarray(v0)
    vmax_hist = []
    for k in range(steps // chunk):
        _, qs, vs = roll(q, v)
        q, v = qs[-1], vs[-1]
        vm = float(jnp.abs(v).max())
        vmax_hist.append(vm)
        if not np.isfinite(vm) or vm > 1e4:
            break
    tail = " ".join(f"{x:.2e}" for x in vmax_hist[-6:])
    verdict = "BLOWUP" if (not np.isfinite(vmax_hist[-1])
                           or vmax_hist[-1] > 1.0) else "ok"
    print(f"{label:46s} {verdict:7s} v: {tail}")


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..",
                                    "tests"))
    import helpers

    from continuum_robot_tpu.models.dynamic_beam_model import (
        DynamicEulerBernoulliBeam,
    )

    n_el = 240
    model = DynamicEulerBernoulliBeam(
        helpers.write_beam_csv(["nonlinear"] * n_el))
    n = model.n_pos_states
    rng = np.random.default_rng(0)
    q0 = rng.normal(scale=1e-6, size=n)
    v0 = np.zeros(n)
    u = np.zeros(n)
    u[-2] = 0.1
    dt = 1e-4
    steps, chunk = 120, 10

    run_case("baseline rho=0.5 nN=2 modNewton", model, q0, v0, u,
             dt, steps, chunk)
    run_case("n_newton=6", model, q0, v0, u, dt, steps, chunk, n_newton=6)
    run_case("full Newton nN=3", model, q0, v0, u, dt, steps, chunk,
             n_newton=3, use_modified_newton=False)
    run_case("rho_inf=0.9", model, q0, v0, u, dt, steps, chunk, rho_inf=0.9)
    run_case("dt=1e-5", model, q0, v0, u, 1e-5, steps, chunk)
    run_case("dt=1e-6", model, q0, v0, u, 1e-6, steps, chunk)

    model_c = DynamicEulerBernoulliBeam(
        helpers.write_beam_csv(["nonlinear"] * n_el))
    model_c.use_consistent_nonlinear = True
    run_case("consistent polynomials", model_c, q0, v0, u, dt, steps, chunk)

    # Explicit high-accuracy reference on the same model: does the
    # TRAJECTORY itself blow up, or only the implicit recurrence?
    from continuum_robot_tpu.models.simulate import simulate

    res = simulate(model, np.concatenate([q0, v0]), 12e-4, 1e-4,
                   method="dopri5", u=jnp.asarray(u), rtol=1e-8, atol=1e-12)
    ys = np.asarray(res.ys)
    vm = np.abs(ys[:, n:]).max(axis=-1)
    print(f"{'dopri5 rtol=1e-8 (ground truth, 1.2 ms)':46s} "
          f"{'BLOWUP' if vm[-1] > 1.0 else 'ok':7s} "
          f"v: {' '.join(f'{x:.2e}' for x in vm[-6:])}")


if __name__ == "__main__":
    main()
