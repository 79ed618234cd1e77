"""Independent stiff-mesh validation of the production steppers.

The 60-element stiff mesh (``tools/make_goldens.py STIFF_N/STIFF_LEN``,
omega_max ~ 8e5 rad/s) is where the implicit engines earn their keep — the
reference's own answer to such systems is LSODA
(``/root/reference/examples/example_utilities.py:157``). The committed
``stiff60`` golden is the exact ZOH flow of the reference-assembled LTI
system, which makes it an *independent* oracle for every stepper here
(they discretize the ODE; the golden samples the continuous flow exactly).

Also characterized, because it shapes which configs are valid stiff
benchmarks at all:

* the reference's variationally inconsistent von Karman polynomials are
  linearly UNSTABLE under mesh refinement (max Re(eig) of the q=0
  linearization grows from ~0 at 20 elements to +7.8e3 at 60 — any
  trajectory blows up regardless of solver); the repo's
  ``use_consistent_nonlinear=True`` element stays neutrally stable.
  See PARITY.md "Mesh-refinement instability".
* explicit Dopri5 at rtol 1e-10 shows ~47% tip error on this mesh vs the
  exact flow (error-norm washout of the small-amplitude near-Nyquist
  ringing + phase drift at the stability boundary) while the implicit
  engines land at ~1e-5: the measured reason stiff workloads need the
  implicit/adaptive tier.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.models.simulate import simulate

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def stiff_meta():
    with open(os.path.join(GOLDEN_DIR, "trajectories_meta.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def stiff_golden(stiff_meta):
    data = np.load(os.path.join(GOLDEN_DIR, "trajectories.npz"))
    return data["stiff60_y"]


@pytest.fixture(scope="module")
def stiff_beam(stiff_meta):
    csv = helpers.write_beam_csv(
        ["linear"] * int(stiff_meta["stiff_n_elements"]),
        length=stiff_meta["stiff_segment_length"],
    )
    beam = DynamicEulerBernoulliBeam(csv)
    yield beam
    os.unlink(csv)


def _tip_error(res, golden_y, n, n_frames):
    tip_new = np.asarray(res.ys).T[n - 2, : n_frames + 1]
    tip_ref = golden_y[n - 2, : n_frames + 1]
    return np.abs(tip_new - tip_ref).max() / np.abs(tip_ref).max()


class TestStiffSteppersVsExactZOH:
    """Production steppers vs the exact ZOH flow (independent oracle)."""

    HORIZON = 0.05  # measured at 1 s in tools/parity_report.py

    def test_adaptive_genalpha(self, stiff_beam, stiff_meta, stiff_golden):
        n = stiff_beam.n_pos_states
        u = helpers.tip_impulse(n, stiff_meta["impulse_amplitude"],
                                stiff_meta["impulse_t_end"])
        res = simulate(stiff_beam, np.zeros(2 * n), self.HORIZON,
                       stiff_meta["dt"], method="generalized_alpha_adaptive",
                       u=u, rtol=1e-8, atol=1e-11, rho_inf=0.95, n_newton=2,
                       linear_solver="dense_inv")
        nf = int(round(self.HORIZON / stiff_meta["dt"]))
        assert _tip_error(res, stiff_golden, n, nf) < 5e-5  # measured 4.1e-6

    def test_sdirk3(self, stiff_beam, stiff_meta, stiff_golden):
        n = stiff_beam.n_pos_states
        u = helpers.tip_impulse(n, stiff_meta["impulse_amplitude"],
                                stiff_meta["impulse_t_end"])
        res = simulate(stiff_beam, np.zeros(2 * n), self.HORIZON,
                       stiff_meta["dt"], method="sdirk3", u=u,
                       rtol=1e-8, atol=1e-11, n_newton=2)
        nf = int(round(self.HORIZON / stiff_meta["dt"]))
        assert _tip_error(res, stiff_golden, n, nf) < 5e-5  # measured 5.5e-6

    def test_modal(self, stiff_beam, stiff_meta, stiff_golden):
        n = stiff_beam.n_pos_states
        u = helpers.tip_impulse(n, stiff_meta["impulse_amplitude"],
                                stiff_meta["impulse_t_end"])
        res = simulate(stiff_beam, np.zeros(2 * n), self.HORIZON,
                       stiff_meta["dt"], method="modal", u=u,
                       substeps=100, rho_inf=0.95)
        nf = int(round(self.HORIZON / stiff_meta["dt"]))
        assert _tip_error(res, stiff_golden, n, nf) < 5e-4  # measured 7.9e-5

    def test_explicit_dopri5_washout(self, stiff_beam, stiff_meta,
                                     stiff_golden):
        """Tight explicit Dopri5 FAILS where the implicit engines pass.

        Characterization, not a defect: the step-size controller's norm
        washes out the tiny-amplitude near-Nyquist ringing the tip impulse
        excites, the step settles at the stability boundary, and per-period
        phase error accumulates over ~10^4 periods. This is the measured
        justification for the implicit/adaptive tier on stiff meshes.
        """
        n = stiff_beam.n_pos_states
        u = helpers.tip_impulse(n, stiff_meta["impulse_amplitude"],
                                stiff_meta["impulse_t_end"])
        res = simulate(stiff_beam, np.zeros(2 * n), self.HORIZON,
                       stiff_meta["dt"], method="dopri5", u=u,
                       rtol=1e-10, atol=1e-14)
        nf = int(round(self.HORIZON / stiff_meta["dt"]))
        assert _tip_error(res, stiff_golden, n, nf) > 0.05  # measured ~0.47


class TestDampedStiffVsExactZOH:
    """Rayleigh-damped stiff mesh vs its exact damped-ZOH golden."""

    @pytest.fixture(scope="class")
    def damped(self):
        return np.load(os.path.join(GOLDEN_DIR, "stiff60_damped.npz"))

    @pytest.mark.parametrize("method", ["modal", "modal_rom"])
    def test_modal_rayleigh(self, damped, method):
        g = damped
        csv = helpers.write_beam_csv(["linear"] * int(g["n_elements"]),
                                     length=float(g["segment_length"]))
        beam = DynamicEulerBernoulliBeam(csv)
        n = beam.n_pos_states
        u = helpers.tip_impulse(n, float(g["impulse_amplitude"]),
                                float(g["impulse_t_end"]))
        horizon = 0.1  # 1 s in tools/parity_report.py
        res = simulate(beam, np.zeros(2 * n), horizon, float(g["dt"]),
                       method=method, u=u,
                       rayleigh=(float(g["rayleigh_alpha"]),
                                 float(g["rayleigh_beta"])),
                       substeps=100, rho_inf=0.95)
        nf = int(round(horizon / float(g["dt"])))
        assert _tip_error(res, g["y"], n, nf) < 1e-3  # measured 1.2e-4 @ 1 s
        os.unlink(csv)


class TestNonlinearMeshRefinementStability:
    """The q=0 linearization spectrum under mesh refinement.

    The reference's inconsistent polynomials
    (``/root/reference/src/continuum_robot/models/segments.py``, f1..f6)
    produce a non-Hamiltonian linear part whose real eigenvalue grows
    unboundedly with refinement; the consistent variant stays neutral.
    """

    TOTAL = 1.5  # the reference beam length (6 x 0.25 m)

    def _max_re(self, n_el, consistent):
        csv = helpers.write_beam_csv(["nonlinear"] * n_el,
                                     length=self.TOTAL / n_el)
        beam = DynamicEulerBernoulliBeam(
            csv, use_consistent_nonlinear=consistent)
        n = beam.n_pos_states
        rhs = beam.build_rhs()
        J = jax.jacobian(lambda x: rhs(0.0, x, jnp.zeros(n)))(
            jnp.zeros(2 * n))
        os.unlink(csv)
        return float(np.linalg.eigvals(np.asarray(J)).real.max())

    def test_reference_element_unstable_at_fine_mesh(self):
        # measured: +1.56 at 40 elements (and +7.8e3 at 60)
        assert self._max_re(40, consistent=False) > 0.1

    def test_consistent_element_stable_at_fine_mesh(self):
        # measured: 3.9e-10 at 40 elements, 6.8e-10 at 60
        assert self._max_re(40, consistent=True) < 1e-6


class TestNonlinearStiffCrossMethod:
    """Consistent-element nonlinear stiff mesh: cross-method oracle.

    No exact flow exists for the nonlinear system and explicit Dopri5 is
    disqualified on this mesh (see TestStiffSteppersVsExactZOH), so the
    oracle is agreement between the two structurally different implicit
    engines (L-stable 3-stage SDIRK vs one-stage gen-alpha with ZX+PI
    control). Parity-report horizon: 0.05 s with a tolerance ladder.
    """

    def test_sdirk3_vs_genalpha(self, stiff_meta):
        csv = helpers.write_beam_csv(
            ["nonlinear"] * int(stiff_meta["stiff_n_elements"]),
            length=stiff_meta["stiff_segment_length"])
        beam = DynamicEulerBernoulliBeam(csv, use_consistent_nonlinear=True)
        n = beam.n_pos_states
        u = helpers.tip_impulse(n, stiff_meta["impulse_amplitude"],
                                stiff_meta["impulse_t_end"])
        hz = 0.01
        tips = {}
        for method, kw in [
            ("sdirk3", dict(rtol=1e-8, atol=1e-11, n_newton=3)),
            ("generalized_alpha_adaptive",
             dict(rtol=1e-8, atol=1e-11, rho_inf=0.95, n_newton=3,
                  linear_solver="dense_inv")),
        ]:
            res = simulate(beam, np.zeros(2 * n), hz, stiff_meta["dt"],
                           method=method, u=u, **kw)
            tips[method] = np.asarray(res.ys).T[n - 2, :]
        a = tips["sdirk3"]
        b = tips["generalized_alpha_adaptive"]
        err = np.abs(a - b).max() / np.abs(a).max()
        assert err < 5e-5  # measured 3.8e-6 at the 0.05 s horizon
        os.unlink(csv)
