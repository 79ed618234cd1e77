"""Reduced external forces (fluid drag / gravity) on the modal-ROM tier.

VERDICT r3 item 2: the reference's flagship workloads are force-coupled
(fluid comparison ``/root/reference/examples/beam_comparison_fluid.py``,
gravity comparison ``beam_comparison_gravity.py``), so the throughput
engines must carry them. The mechanism: each built-in force projects onto
the Petrov-Galerkin basis through restricted rows
(``FluidDragForce.make_reduced_modal`` / ``GravityForce.make_reduced_modal``)
and enters ``ModalROMGenAlpha._force_modal``'s split fast path as an exact
reduced correction (``ext_modal``) — exactly like the von Karman
correction, without forcing the full ``(3N, m)`` transforms.

Test strategy (reference idioms, SURVEY §4):

* algebra — the reduced closure equals ``PhiW^T compute_forces(x, t)`` to
  roundoff (the restriction is exact, incl. the reference's gravity
  reduced-index quirk, which rides the shared index plan);
* path equivalence — registry forces via ``ext_modal`` reproduce the same
  engine driven through the general full-transform ``external_force`` path;
* workload parity — the fluid / gravity / combined comparison configs run
  on ``method='modal_rom'`` and match the LSODA goldens
  (``tests/goldens/trajectories.npz``);
* error contracts — engines that cannot evaluate forces refuse loudly.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam, ForceParams
from continuum_robot_tpu.models.simulate import make_modal_rom, simulate
from tests import helpers

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _model(csv_path, force_params=None):
    return DynamicEulerBernoulliBeam(csv_path, force_params)


def _random_state(n, rng, scale=1e-2):
    return jnp.asarray(rng.normal(size=2 * n) * scale)


class TestReducedClosureAlgebra:
    """ext_modal == PhiW^T aggregate(x, t) exactly (f64 roundoff)."""

    def _check(self, fp_kw, csv_fn=helpers.nonlinear_csv, batch=False):
        fp = ForceParams(**fp_kw)
        model = _model(csv_fn(6), fp)
        n = model.n_pos_states
        ms = make_modal_rom(model, 1e-4, n_modes=None)
        assert ms.ext_modal is not None
        assert ms.external_force is None
        agg = model.force_registry.create_aggregated_function()
        rng = np.random.default_rng(3)
        shape = (4, 2 * n) if batch else (2 * n,)
        x = jnp.asarray(rng.normal(size=shape) * 1e-2)
        q, v = x[..., :n], x[..., n:]
        eta, etad = ms.to_modal(q, v)
        # Round-trip: evaluate the closure at the state the basis actually
        # reproduces (full basis -> Phi eta == q to roundoff).
        got = ms.ext_modal(eta, etad, 0.0)
        q_r, v_r = ms.from_modal(eta, etad)
        want = ms.project_force(
            agg(jnp.concatenate([q_r, v_r], axis=-1), 0.0)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-10, atol=1e-18
        )

    def test_fluid(self):
        self._check({"enable_fluid_effects": True, "fluid_density": 1000.0})

    def test_gravity(self):
        self._check({"enable_gravity_effects": True})

    def test_fluid_and_gravity_batched(self):
        self._check(
            {
                "enable_fluid_effects": True,
                "fluid_density": 800.0,
                "enable_gravity_effects": True,
                "gravity_vector": [1.0, -9.81, 0.0],
            },
            batch=True,
        )

    def test_gravity_quirk_preserved_on_linear_beam(self):
        """The reduced gravity closure inherits the reference's
        reduced-index quirk (shared index plan), on an all-linear beam."""
        self._check({"enable_gravity_effects": True},
                    csv_fn=helpers.linear_csv)

    def test_disabled_force_contributes_zero(self):
        fp = ForceParams(enable_gravity_effects=True)
        model = _model(helpers.nonlinear_csv(4), fp)
        ms = make_modal_rom(model, 1e-4)
        grav = model.force_registry.get_registered_forces()[0]
        grav.set_enabled(False)
        m = ms.n_modes
        out = ms.ext_modal(jnp.ones(m), jnp.ones(m), 0.0)
        np.testing.assert_array_equal(np.asarray(out), np.zeros(m))
        grav.set_enabled(True)
        assert float(jnp.abs(ms.ext_modal(jnp.ones(m) * 1e-3,
                                          jnp.zeros(m), 0.0)).max()) > 0


class TestPathEquivalence:
    """Registry (split + ext_modal) vs explicit forces_func (general path):
    the identical discrete trajectory up to split-path roundoff."""

    @pytest.mark.parametrize("csv_fn", [helpers.nonlinear_csv,
                                        helpers.mixed_csv])
    def test_trajectories_match(self, csv_fn):
        fp = ForceParams(
            enable_fluid_effects=True, fluid_density=1000.0,
            enable_gravity_effects=True,
        )
        model = _model(csv_fn(6), fp)
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n)
        u = jnp.zeros(n).at[-2].set(0.1)
        split = simulate(model, x0, 0.05, 1e-3, method="modal_rom",
                         u=u, substeps=5, n_newton=2, rho_inf=0.7)
        agg = model.force_registry.create_aggregated_function()
        general = simulate(model, x0, 0.05, 1e-3, method="modal_rom",
                           u=u, forces_func=agg, substeps=5, n_newton=2,
                           rho_inf=0.7)
        scale = float(jnp.abs(np.asarray(general.ys)).max())
        err = float(np.abs(np.asarray(split.ys)
                           - np.asarray(general.ys)).max())
        assert err < 1e-9 * scale

    def test_linear_beam_fluid_now_runs_on_rom(self):
        """Fluid on an all-linear beam — previously dense-tier only —
        runs on modal_rom and matches the dense gen-alpha path."""
        fp = ForceParams(enable_fluid_effects=True, fluid_density=1000.0)
        model = _model(helpers.linear_csv(6), fp)
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n)
        u = jnp.zeros(n).at[-2].set(0.1)
        rom = simulate(model, x0, 0.05, 1e-3, method="modal_rom",
                       u=u, substeps=5, n_newton=2, rho_inf=0.7)
        dense = simulate(model, x0, 0.05, 1e-3, method="generalized_alpha",
                         u=u, substeps=5, n_newton=2, rho_inf=0.7)
        np.testing.assert_allclose(np.asarray(rom.ys),
                                   np.asarray(dense.ys),
                                   rtol=1e-7, atol=1e-13)

    def test_adaptive_rom_carries_forces(self):
        """modal_rom_adaptive (error-controlled) evaluates the reduced
        forces too — drag must damp the adaptive trajectory."""
        fp = ForceParams(enable_fluid_effects=True, fluid_density=1000.0)
        wet = _model(helpers.nonlinear_csv(6), fp)
        dry = _model(helpers.nonlinear_csv(6, include_fluid=False))
        n = wet.n_pos_states
        x0 = jnp.zeros(2 * n)
        u = jnp.zeros(n).at[-2].set(0.1)
        kw = dict(t_final=0.2, dt=1e-2, method="modal_rom_adaptive",
                  u=u, rtol=1e-7, atol=1e-10, n_newton=2)
        res_w = simulate(wet, x0, **kw)
        res_d = simulate(dry, x0, **kw)
        vel_w = float(jnp.abs(np.asarray(res_w.ys)[-1, n:]).max())
        vel_d = float(jnp.abs(np.asarray(res_d.ys)[-1, n:]).max())
        assert np.isfinite(vel_w) and vel_w < vel_d  # drag dissipates


class TestWorkloadParity:
    """The reference comparison workloads on the flagship ROM engine,
    against the committed LSODA goldens (the VERDICT r3 item-2 done bar)."""

    CONFIGS = {
        "linear_fluid": (
            ["linear"] * 6,
            {"enable_fluid_effects": True, "fluid_density": 1000.0},
        ),
        "linear_gravity": (["linear"] * 6, {"enable_gravity_effects": True}),
        "nonlinear_fluid_gravity": (
            ["nonlinear"] * 6,
            {
                "enable_fluid_effects": True,
                "fluid_density": 1000.0,
                "enable_gravity_effects": True,
            },
        ),
    }

    @pytest.fixture(scope="class")
    def goldens(self):
        data = np.load(os.path.join(GOLDEN_DIR, "trajectories.npz"))
        with open(os.path.join(GOLDEN_DIR, "trajectories_meta.json")) as f:
            meta = json.load(f)
        return data, meta

    # Measured full-horizon (1 s) normalized error of the error-controlled
    # ROM engine at rtol=1e-10 vs the rtol-1e-12 LSODA oracles, pinned at
    # ~2x the measurement. The bound is NOT force error — it is the
    # second-order generalized-alpha family's secular phase drift over
    # ~50-350 oscillation periods (the DENSE adaptive gen-alpha measures
    # the same 0.02-0.06 at this tolerance, and the global error scales as
    # h^2 when rtol tightens: 0.38 -> 0.056 for linear_fluid from rtol
    # 1e-8 -> 1e-10). Force correctness is pinned separately by
    # TestPathEquivalence (ROM == dense to 1e-9) and the closure algebra
    # above; parity-grade trajectories (the 2e-6 BASELINE bar) come from
    # the dopri5 path (tests/test_parity_golden.py), which handles these
    # same force-coupled configs.
    BOUNDS = {
        "linear_fluid": 0.12,
        "linear_gravity": 0.05,
        "nonlinear_fluid_gravity": 3e-4,
    }

    @pytest.mark.parametrize("name", list(CONFIGS))
    def test_rom_vs_golden(self, name, goldens):
        data, meta = goldens
        types, fp_kw = self.CONFIGS[name]
        csv = helpers.write_beam_csv(types)
        beam = DynamicEulerBernoulliBeam(csv, ForceParams(**fp_kw))
        n = beam.n_pos_states
        x0 = np.zeros(2 * n)
        u = helpers.tip_impulse(
            n, amplitude=meta["impulse_amplitude"],
            t_end=meta["impulse_t_end"],
        )
        res = simulate(
            beam, x0, meta["t_final"], meta["dt"],
            method="modal_rom_adaptive", u=u, rtol=1e-10, atol=1e-14,
            n_newton=3,
        )
        y_ref = data[f"{name}_y"]  # (state, time)
        y_new = np.asarray(res.ys).T[:, : y_ref.shape[1]]
        scale = np.abs(y_ref).max()
        err = np.abs(y_new - y_ref).max() / scale
        assert err < self.BOUNDS[name], (
            f"{name}: normalized trajectory error {err:.3e}"
        )
        os.unlink(csv)


class TestErrorContracts:
    def test_modal_still_raises_with_pointer(self):
        fp = ForceParams(enable_fluid_effects=True, fluid_density=1000.0)
        model = _model(helpers.linear_csv(4), fp)
        n = model.n_pos_states
        with pytest.raises(ValueError, match="modal_rom"):
            simulate(model, jnp.zeros(2 * n), 0.01, 1e-3, method="modal")

    def test_pallas_rom_engine_refuses_forces(self):
        fp = ForceParams(enable_fluid_effects=True, fluid_density=1000.0)
        model = _model(helpers.nonlinear_csv(4), fp)
        n = model.n_pos_states
        with pytest.raises(ValueError, match="[Pp]allas"):
            simulate(model, jnp.zeros(2 * n), 0.01, 1e-3,
                     method="modal_rom", engine="pallas")
