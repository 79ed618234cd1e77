"""Registered fluid/gravity forces on the SHARDED modal-ROM tier.

Round-4 extension of ``tests/test_modal_forces.py`` (single-chip reduced
corrections, VERDICT r3 item 2) to the beam-axis-sharded engines: the
engine's ``ext_modal`` closure — replicated restricted basis rows — is
evaluated inside the ``shard_map`` body of every ``SpatialModalROM``
rollout, so force-coupled workloads run on the multi-chip ROM tier with
the exact single-chip force conventions (all reference quirks preserved;
see ``parallel/spatial_modal._make_force_modal``).

Test strategy (reference idioms, SURVEY §4): sharded == single-chip
equality on every rollout flavor (fixed-step, adaptive, ECSW delegation,
guarded), facade contract parity with ``simulate()``, and loud error
contracts for the unsupported combinations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam, ForceParams
from continuum_robot_tpu.models.simulate import simulate
from continuum_robot_tpu.parallel import (
    build_spatial_modal_rom,
    make_mesh,
    simulate_sharded,
)
from tests import helpers

FLUID_GRAVITY = dict(
    enable_fluid_effects=True,
    fluid_density=1000.0,
    enable_gravity_effects=True,
    gravity_vector=np.array([0.0, -9.81, 0.0]),
)


def _forced_setup(kind="hybrid", n_modes=None, fp_kw=FLUID_GRAVITY):
    csv = (
        helpers.nonlinear_csv(14) if kind == "nonlinear"
        else helpers.mixed_csv(14)
    )
    model = DynamicEulerBernoulliBeam(csv, ForceParams(**fp_kw))
    mesh = make_mesh({"sp": 8})
    sm = build_spatial_modal_rom(
        model, mesh, 1e-4, rho_inf=0.5, n_modes=n_modes
    )
    assert sm.ms.ext_modal is not None  # forces took the reduced path
    n = model.n_pos_states
    rng = np.random.default_rng(7)
    x = rng.normal(scale=1e-4, size=2 * n)
    eta, etad = sm.ms.to_modal(jnp.asarray(x[:n]), jnp.asarray(x[n:]))
    u = np.zeros(n)
    u[-2] = 0.1
    u_m = jnp.asarray(sm.ms.project_force_host(u))
    return model, sm, eta, etad, u_m


class TestShardedForcedROM:
    """Sharded forced rollouts == the single-chip forced engine."""

    @pytest.mark.parametrize("kind", ["hybrid", "nonlinear"])
    def test_rollout_frames_matches_single_chip(self, kind):
        _, sm, eta, etad, u_m = _forced_setup(kind)
        ts0, es0, eds0 = sm.ms.rollout_frames(
            eta, etad, u_m, 4, substeps=3, n_newton=2
        )
        ts1, es1, eds1 = sm.rollout_frames(
            eta, etad, u_m, 4, substeps=3, n_newton=2
        )
        np.testing.assert_allclose(np.asarray(ts1), np.asarray(ts0))
        scale = float(jnp.abs(es0).max())
        np.testing.assert_allclose(
            np.asarray(es1), np.asarray(es0), atol=1e-12 * scale
        )
        np.testing.assert_allclose(
            np.asarray(eds1), np.asarray(eds0),
            atol=1e-12 * float(jnp.abs(eds0).max()),
        )

    def test_forces_actually_enter_the_sharded_step(self):
        """Forced vs force-cleared trajectories diverge (guards against a
        silently dropped ext_modal — the pre-round-4 failure mode)."""
        model, sm, eta, etad, u_m = _forced_setup("hybrid")
        bare = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        sm_bare = build_spatial_modal_rom(
            bare, sm.mesh, 1e-4, rho_inf=0.5
        )
        _, es_f, _ = sm.rollout_frames(eta, etad, u_m, 3, substeps=3)
        _, es_b, _ = sm_bare.rollout_frames(eta, etad, u_m, 3, substeps=3)
        assert float(jnp.abs(es_f - es_b).max()) > 0.0

    def test_rollout_adaptive_matches_single_chip(self):
        _, sm, eta, etad, u_m = _forced_setup("hybrid")
        t_eval = np.linspace(0.0, 2e-3, 5)
        es0, eds0, st0 = sm.ms.rollout_adaptive(
            eta, etad, u_m, t_eval, rtol=1e-6, atol=1e-9, n_newton=2
        )
        es1, eds1, st1 = sm.rollout_adaptive(
            eta, etad, u_m, t_eval, rtol=1e-6, atol=1e-9, n_newton=2
        )
        assert int(st1.n_accepted) == int(st0.n_accepted)
        assert int(st1.n_rejected) == int(st0.n_rejected)
        scale = float(jnp.abs(es0).max())
        np.testing.assert_allclose(
            np.asarray(es1), np.asarray(es0), atol=1e-10 * scale
        )

    def test_ecsw_delegation_keeps_forces(self):
        """hyper_reduce -> rollout_frames delegates to the single-chip
        gathered-sample recurrence, ext_modal intact (stays exact; only
        the element correction is sampled)."""
        _, sm, eta, etad, u_m = _forced_setup("nonlinear", n_modes=12)
        rng = np.random.default_rng(1)
        snaps = rng.normal(scale=1e-4, size=(20, sm.n_modes))
        sm_h = sm.hyper_reduce(snaps, tau=1e-3)
        assert sm_h.is_hyper_reduced
        assert sm_h.ms.ext_modal is not None
        ts0, es0, eds0 = sm_h.ms.rollout_frames(
            eta, etad, u_m, 3, substeps=2, n_newton=2
        )
        ts1, es1, eds1 = sm_h.rollout_frames(
            eta, etad, u_m, 3, substeps=2, n_newton=2
        )
        np.testing.assert_array_equal(np.asarray(es1), np.asarray(es0))
        np.testing.assert_array_equal(np.asarray(eds1), np.asarray(eds0))


class TestForcedFacade:
    """simulate_sharded(method='modal_rom') force contract parity."""

    def test_matches_single_chip_simulate(self):
        model = DynamicEulerBernoulliBeam(
            helpers.mixed_csv(14), ForceParams(**FLUID_GRAVITY)
        )
        n = model.n_pos_states
        x0 = np.zeros(2 * n)
        u = np.zeros(n)
        u[-2] = 0.05
        kw = dict(method="modal_rom", u=u, substeps=5, n_newton=2,
                  rho_inf=0.5)
        res0 = simulate(model, x0, 2e-3, 1e-3, **kw)
        mesh = make_mesh({"sp": 8})
        res1 = simulate_sharded(model, x0, 2e-3, 1e-3, mesh, **kw)
        ys0 = np.asarray(res0.ys)
        ys1 = np.asarray(res1.ys)
        scale = float(np.abs(ys0).max())
        assert scale > 0.0
        np.testing.assert_allclose(ys1, ys0, atol=1e-11 * scale)

    def test_adaptive_facade_matches_single_chip(self):
        model = DynamicEulerBernoulliBeam(
            helpers.mixed_csv(14), ForceParams(**FLUID_GRAVITY)
        )
        n = model.n_pos_states
        x0 = 1e-5 * np.random.default_rng(2).normal(size=2 * n)
        kw = dict(method="modal_rom_adaptive", rtol=1e-6, atol=1e-9,
                  n_newton=2, rho_inf=0.5)
        res0 = simulate(model, x0, 2e-3, 1e-3, **kw)
        mesh = make_mesh({"sp": 8})
        res1 = simulate_sharded(model, x0, 2e-3, 1e-3, mesh, **kw)
        ys0, ys1 = np.asarray(res0.ys), np.asarray(res1.ys)
        scale = float(np.abs(ys0).max())
        np.testing.assert_allclose(ys1, ys0, atol=1e-9 * scale)

    def test_error_contracts(self):
        forced = DynamicEulerBernoulliBeam(
            helpers.mixed_csv(6), ForceParams(**FLUID_GRAVITY)
        )
        n = forced.n_pos_states
        x0 = np.zeros(2 * n)
        mesh = make_mesh({"sp": 8})
        # Linear modal method cannot Newton-iterate state-dependent forces.
        with pytest.raises(ValueError, match="modal_rom"):
            simulate_sharded(forced, x0, 1e-3, 1e-3, mesh, method="modal")
        # Explicit node-layout dials don't apply to the modal tier.
        with pytest.raises(ValueError, match="force registry"):
            simulate_sharded(
                forced, x0, 1e-3, 1e-3, mesh, method="modal_rom",
                fluid_density=1000.0,
            )
