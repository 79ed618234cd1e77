"""Pallas kernel tests (interpreter mode on the CPU test backend)."""

import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.ops import banded
from continuum_robot_tpu.ops.pallas import btd_solve_pallas
from tests.test_banded import random_btd


class TestBtdSolvePallas:
    @pytest.mark.parametrize("n_nodes,batch", [(7, 4), (13, 10)])
    def test_matches_xla_solver(self, n_nodes, batch):
        rng = np.random.default_rng(0)
        diag, lower, upper, dense = random_btd(rng, n_nodes)
        factors = banded.btd_factor(
            jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(upper)
        )
        rhs = rng.normal(size=(batch, n_nodes, 3))
        x_ref = np.asarray(banded.btd_solve(factors, jnp.asarray(rhs)))
        x_pal = np.asarray(
            btd_solve_pallas(factors, jnp.asarray(rhs), tile=4, interpret=True)
        )
        np.testing.assert_allclose(x_pal, x_ref, rtol=1e-10, atol=1e-12)
        # and against the dense ground truth
        for k in range(batch):
            np.testing.assert_allclose(
                x_pal[k].flatten(),
                np.linalg.solve(dense, rhs[k].flatten()),
                rtol=1e-8, atol=1e-10,
            )

    def test_batch_padding(self):
        """Batch not divisible by tile: padded and truncated correctly."""
        rng = np.random.default_rng(1)
        diag, lower, upper, dense = random_btd(rng, 5)
        factors = banded.btd_factor(
            jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(upper)
        )
        rhs = rng.normal(size=(3, 5, 3))
        x = np.asarray(
            btd_solve_pallas(factors, jnp.asarray(rhs), tile=4, interpret=True)
        )
        assert x.shape == (3, 5, 3)
        for k in range(3):
            np.testing.assert_allclose(
                x[k].flatten(),
                np.linalg.solve(dense, rhs[k].flatten()),
                rtol=1e-8, atol=1e-10,
            )


class TestFusedRollout:
    def test_matches_generalized_alpha_integrator(self):
        """Fused kernel (interpret mode) == the reference stepper."""
        import jax

        from continuum_robot_tpu.models import (
            DynamicEulerBernoulliBeam,
            ForceParams,
        )
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.ops.pallas.fused_rollout import fused_rollout
        from tests import helpers

        beam = DynamicEulerBernoulliBeam(
            helpers.linear_csv(),
            ForceParams(enable_fluid_effects=True, fluid_density=1000.0),
        )
        n = beam.n_pos_states
        x0 = np.zeros((3, 2 * n))
        x0[:, n - 2] = [1e-4, 5e-4, 1e-3]
        u = np.zeros(n)
        u[-2] = 0.05

        ts, ys = fused_rollout(
            beam, x0, t_final=0.02, dt=0.001, u=u, substeps=20,
            tile=4, interpret=True,
        )
        ys = np.asarray(ys)

        ref = simulate(
            beam, x0[2], 0.02, 0.001, method="generalized_alpha",
            u=jnp.asarray(u), substeps=20, rho_inf=0.8,
        )
        ref_ys = np.asarray(ref.ys)
        scale = np.abs(ref_ys).max()
        err = np.abs(ys[:, 2, :] - ref_ys).max() / scale
        assert err < 1e-6, f"fused vs integrator: {err:.3e}"
        assert np.all(np.isfinite(ys))
        assert not np.allclose(ys[:, 0], ys[:, 2])


class TestFusedModalRollout:
    """Fused modal gen-alpha kernel (``ops/pallas/modal_rollout.py``)."""

    def _setup(self, n_seg=10, B=5):
        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
        from continuum_robot_tpu.models.simulate import make_modal_genalpha
        from tests import helpers

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(n_seg))
        n = model.n_pos_states
        ms = make_modal_genalpha(model, 1e-4, rho_inf=0.8)
        rng = np.random.default_rng(0)
        q0 = jnp.asarray(rng.normal(scale=1e-6, size=(B, n)))
        v0 = jnp.zeros((B, n))
        u = jnp.zeros(n).at[-2].set(0.1)
        eta, etad = ms.to_modal(q0, v0)
        return ms, eta, etad, ms.project_force(u)

    def test_mode_coeffs_collapse(self):
        """The substituted-update coefficients equal the nested Newton form.

        ``mode_coeffs`` hard-codes ``p1 = -am * winv`` because the
        ``1 - winv*(1 + lam e f + c e g)`` bracket collapses exactly
        (``1/winv`` is that bracket plus ``1 - am``); verify the identity
        numerically in f64 across the stiffness range, damped and not.
        """
        from continuum_robot_tpu.ops.pallas.modal_rollout import mode_coeffs

        rho_inf, h = 0.8, 1e-4
        am = (2.0 * rho_inf - 1.0) / (rho_inf + 1.0)
        af = rho_inf / (rho_inf + 1.0)
        beta = 0.25 * (1.0 - am + af) ** 2
        gamma = 0.5 - am + af
        lam = np.logspace(-2, 12, 29)
        for cdamp in (None, 1e-3 * np.sqrt(lam)):
            J = (1.0 - am) + (1.0 - af) * beta * h * h * lam
            if cdamp is not None:
                J = J + (1.0 - af) * gamma * h * cdamp
            winv = 1.0 / J
            p1, p2, p3, p5, p6 = mode_coeffs(lam, winv, rho_inf, cdamp)
            bracket = 1.0 + lam * (1.0 - af) * beta * h * h
            if cdamp is not None:
                bracket = bracket + cdamp * (1.0 - af) * gamma * h
            np.testing.assert_allclose(p1, 1.0 - winv * bracket, rtol=1e-11)
            np.testing.assert_allclose(p2, winv * lam * (1.0 - af))
            np.testing.assert_allclose(p3, winv * lam * af)
            if cdamp is None:
                assert p5 is None and p6 is None
            else:
                np.testing.assert_allclose(p5, winv * cdamp * (1.0 - af))
                np.testing.assert_allclose(p6, winv * cdamp * af)

    def test_matches_xla_modal_rollout(self):
        ms, eta, etad, u_m = self._setup()
        e1, ed1, ea1 = ms.rollout(eta, etad, u_m, 50)
        e2, ed2, ea2 = ms.rollout_pallas(
            eta, etad, u_m, 50, tile=128, mode_tile=16, interpret=True
        )
        for a, b in [(e1, e2), (ed1, ed2), (ea1, ea2)]:
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-12 * scale
            )

    def test_zero_force_and_padding(self):
        """None force; B and m not multiples of the tile sizes."""
        ms, eta, etad, _ = self._setup(n_seg=7, B=3)
        e1, ed1, _ = ms.rollout(eta, etad, None, 30)
        e2, ed2, _ = ms.rollout_pallas(
            eta, etad, None, 30, tile=128, mode_tile=8, interpret=True
        )
        scale = float(jnp.abs(e1).max()) + 1e-30
        np.testing.assert_allclose(np.asarray(e2), np.asarray(e1), atol=1e-12 * scale)

    def test_frame_collection_matches_xla_frames(self):
        ms, eta, etad, u_m = self._setup(n_seg=8, B=4)
        ts1, e1, ed1 = ms.rollout_frames(eta, etad, u_m, 12, substeps=5)
        ts2, e2, ed2 = ms.rollout_frames_pallas(
            eta, etad, u_m, 12, substeps=5, tile=128, mode_tile=8,
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ts2), np.asarray(ts1))
        for a, b in [(e1, e2), (ed1, ed2)]:
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-12 * scale
            )
        assert e2.shape == (13, 4, eta.shape[-1])


class TestFusedROMRollout:
    """Fused modal-ROM gen-alpha kernel (``ops/pallas/rom_rollout.py``)."""

    def _setup(self, csv_fn, B=5, m=12, amp=3e-2, rho_inf=0.5,
               rayleigh=None):
        import jax

        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
        from continuum_robot_tpu.models.simulate import make_modal_rom
        from tests import helpers

        model = DynamicEulerBernoulliBeam(csv_fn(8, include_fluid=False))
        n = model.n_pos_states
        ms = make_modal_rom(model, 1e-4, rho_inf=rho_inf, n_modes=m,
                            rayleigh=rayleigh)
        rng = np.random.default_rng(0)
        # Large modal amplitudes so the correction force is a leading-order
        # contribution (it reaches ~100% of the trajectory here), not noise.
        eta = jnp.asarray(rng.normal(scale=amp, size=(B, m)), jnp.float32)
        etad = jnp.zeros((B, m), jnp.float32)
        u = np.zeros(n, np.float32)
        u[-2] = 5.0
        u_m = jnp.asarray(ms.project_force_host(u), jnp.float32)
        return ms, eta, etad, u_m

    def _roll_both(self, ms, eta, etad, u_m, steps=50, n_newton=2):
        import jax

        ref = ms.rollout(eta, etad, u_m, steps, n_newton=n_newton)
        fused = ms.make_pallas_rollout(tile=128)
        out = fused(
            eta, etad, u_m, steps, n_newton=n_newton,
            precision=jax.lax.Precision.HIGHEST,
            nl_precision=jax.lax.Precision.HIGHEST,
            interpret=True,
        )
        return ref, out

    def test_matches_xla_rom_rollout_nonlinear(self):
        from tests import helpers

        ms, eta, etad, u_m = self._setup(helpers.nonlinear_csv)
        (e1, ed1, ea1), (e2, ed2, ea2) = self._roll_both(ms, eta, etad, u_m)
        # f32 XLA-vs-interpreted-kernel agreement over 50 steps with a
        # leading-order correction force: 5e-6 of the state scale
        # (rtol=0: near-zero entries must not be held to a relative bar).
        for a, b in [(e1, e2), (ed1, ed2), (ea1, ea2)]:
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=0, atol=5e-6 * scale
            )

    def test_matches_xla_rom_rollout_hybrid_window(self):
        """Hybrid beam: the kernel's element mask + restricted window."""
        from tests import helpers

        ms, eta, etad, u_m = self._setup(helpers.mixed_csv)
        (e1, _, _), (e2, _, _) = self._roll_both(ms, eta, etad, u_m)
        scale = float(jnp.abs(e1).max()) + 1e-30
        np.testing.assert_allclose(
            np.asarray(e2), np.asarray(e1), rtol=0, atol=5e-6 * scale
        )

    def test_unroll_matches_to_roundoff(self):
        """In-kernel unroll is a pure loop transformation: same step body
        applied in the same order (K per fori_loop iteration, remainder
        peeled at trace time). 50 steps at unroll=4 exercises 12 fori_loop
        iterations + a 2-step trace-time tail. Interpret mode recompiles
        the unrolled body, so XLA:CPU may contract FMAs differently —
        agreement is roundoff-grade (measured ~2e-7 relative), not
        bitwise; the on-hardware Mosaic parity probe in
        tools/modal_kernel_sweep.py pins the bit-exact claim."""
        import jax

        from tests import helpers

        ms, eta, etad, u_m = self._setup(helpers.nonlinear_csv)
        fused = ms.make_pallas_rollout(tile=128)
        kw = dict(
            n_newton=2,
            precision=jax.lax.Precision.HIGHEST,
            nl_precision=jax.lax.Precision.HIGHEST,
            interpret=True,
        )
        base = fused(eta, etad, u_m, 50, **kw)
        for K in (4, 50):  # chunked + fully-unrolled (no fori_loop) forms
            out = fused(eta, etad, u_m, 50, unroll=K, **kw)
            for a, b in zip(out, base):
                scale = float(jnp.abs(b).max()) + 1e-30
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=0, atol=2e-6 * scale
                )

    def test_zero_force_semi_implicit(self):
        """None input force; the n_newton=1 throughput configuration."""
        from tests import helpers

        ms, eta, etad, _ = self._setup(helpers.nonlinear_csv, B=3)
        (e1, _, _), (e2, _, _) = self._roll_both(
            ms, eta, etad, None, steps=30, n_newton=1
        )
        scale = float(jnp.abs(e1).max()) + 1e-30
        np.testing.assert_allclose(
            np.asarray(e2), np.asarray(e1), atol=1e-6 * scale
        )

    def test_matches_xla_rollout_ecsw_gathered(self):
        """ECSW hyper-reduced engine: fused gathered kernel == XLA gathered.

        Pins the gathered-layout kernel path (six basis blocks, no roll
        adjacency, sample-only element columns) against the XLA
        pseudo-plane path on the SAME hyper-reduced engine — identical
        sample, identical folded weights, identical recurrence.
        """
        import jax

        from tests import helpers

        ms, eta, etad, u_m = self._setup(helpers.nonlinear_csv)
        # Train the sample on a short impulse rollout (the bench recipe);
        # tight tau keeps most elements so every code path stays live.
        z = jnp.zeros((1, ms.n_modes), jnp.float32)
        _, etas_tr, _ = ms.rollout_frames(z, z, u_m, 20, substeps=5,
                                          n_newton=2)
        red, info = ms.hyper_reduce(
            np.asarray(etas_tr[::2, 0, :]), tau=1e-8, return_info=True
        )
        assert red.sampled_params is not None
        assert info["n_sampled"] >= 1
        e1, ed1, ea1 = red.rollout(eta, etad, u_m, 50, n_newton=2)
        fused = red.make_pallas_rollout(tile=128)
        assert fused.gathered
        e2, ed2, ea2 = fused(
            eta, etad, u_m, 50, n_newton=2,
            precision=jax.lax.Precision.HIGHEST,
            nl_precision=jax.lax.Precision.HIGHEST, interpret=True,
        )
        for a, b in [(e1, e2), (ed1, ed2), (ea1, ea2)]:
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-6 * scale
            )

    def test_ecsw_gathered_hybrid_mask(self):
        """Hybrid beam through the gathered single-dot path: the in-kernel
        element mask (linear elements in the sample window produce zero
        correction) must match the XLA gathered engine exactly."""
        import jax

        from tests import helpers

        ms, eta, etad, u_m = self._setup(helpers.mixed_csv)
        z = jnp.zeros((1, ms.n_modes), jnp.float32)
        _, etas_tr, _ = ms.rollout_frames(z, z, u_m, 20, substeps=5,
                                          n_newton=2)
        red = ms.hyper_reduce(np.asarray(etas_tr[::2, 0, :]), tau=1e-8)
        assert red.sampled_params is not None
        e1, _, _ = red.rollout(eta, etad, u_m, 40, n_newton=2)
        fused = red.make_pallas_rollout(tile=128)
        assert fused.gathered
        e2, _, _ = fused(
            eta, etad, u_m, 40, n_newton=2,
            precision=jax.lax.Precision.HIGHEST,
            nl_precision=jax.lax.Precision.HIGHEST, interpret=True,
        )
        scale = float(jnp.abs(e1).max()) + 1e-30
        np.testing.assert_allclose(
            np.asarray(e2), np.asarray(e1), atol=1e-6 * scale
        )

    def test_ecsw_gathered_frames(self):
        """Frame-collecting fused rollout on the gathered layout."""
        import jax

        from tests import helpers

        ms, eta, etad, u_m = self._setup(helpers.nonlinear_csv, B=3)
        z = jnp.zeros((1, ms.n_modes), jnp.float32)
        _, etas_tr, _ = ms.rollout_frames(z, z, u_m, 20, substeps=5,
                                          n_newton=2)
        red = ms.hyper_reduce(np.asarray(etas_tr[::2, 0, :]), tau=1e-8)
        ts1, e1, ed1 = red.rollout_frames(
            eta, etad, u_m, 5, substeps=4, n_newton=1
        )
        fused = red.make_pallas_rollout(tile=128)
        ts2, e2, ed2 = fused.frames(
            eta, etad, u_m, 5, substeps=4, n_newton=1,
            precision=jax.lax.Precision.HIGHEST,
            nl_precision=jax.lax.Precision.HIGHEST, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ts2), np.asarray(ts1))
        for a, b in [(e1, e2), (ed1, ed2)]:
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-6 * scale
            )

    def test_damped_matches_xla_rom_rollout(self):
        """Rayleigh-damped engine through the fused kernel (window layout).

        The damping column rides the kernel residual (cd * etad_af); its
        Jacobian share is prefactored into Sinv — both must match the XLA
        damped stepper's arithmetic step for step.
        """
        from tests import helpers

        ms, eta, etad, u_m = self._setup(
            helpers.nonlinear_csv, rayleigh=(5.0, 1e-6)
        )
        assert ms.cdamp is not None
        (e1, ed1, ea1), (e2, ed2, ea2) = self._roll_both(ms, eta, etad, u_m)
        # f32 XLA-vs-interpreted-kernel agreement over 50 steps with a
        # leading-order correction force: 5e-6 of the state scale
        # (rtol=0: near-zero entries must not be held to a relative bar).
        for a, b in [(e1, e2), (ed1, ed2), (ea1, ea2)]:
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=0, atol=5e-6 * scale
            )

    def test_damped_actually_dissipates_fused(self):
        """The fused damped rollout loses modal amplitude vs undamped."""
        import jax

        from tests import helpers

        kw = dict(B=1, amp=1e-3)
        ms0, eta, etad, _ = self._setup(helpers.nonlinear_csv, **kw)
        msd, _, _, _ = self._setup(
            helpers.nonlinear_csv, rayleigh=(200.0, 0.0), **kw
        )
        steps = 400
        prec = dict(precision=jax.lax.Precision.HIGHEST,
                    nl_precision=jax.lax.Precision.HIGHEST, interpret=True)
        e0, ed0, _ = ms0.make_pallas_rollout(tile=128)(
            eta, etad, None, steps, n_newton=2, **prec
        )
        e1, ed1, _ = msd.make_pallas_rollout(tile=128)(
            eta, etad, None, steps, n_newton=2, **prec
        )
        energy0 = float(jnp.sum(e0**2 + ed0**2))
        energy1 = float(jnp.sum(e1**2 + ed1**2))
        assert energy1 < 0.9 * energy0

    def test_damped_ecsw_gathered(self):
        """Damping survives hyper-reduction into the gathered fused kernel."""
        import jax

        from tests import helpers

        ms, eta, etad, u_m = self._setup(
            helpers.nonlinear_csv, rayleigh=(5.0, 1e-6)
        )
        z = jnp.zeros((1, ms.n_modes), jnp.float32)
        _, etas_tr, _ = ms.rollout_frames(z, z, u_m, 20, substeps=5,
                                          n_newton=2)
        red = ms.hyper_reduce(np.asarray(etas_tr[::2, 0, :]), tau=1e-8)
        assert red.cdamp is not None
        e1, _, _ = red.rollout(eta, etad, u_m, 50, n_newton=2)
        fused = red.make_pallas_rollout(tile=128)
        assert fused.gathered and fused.cd_col is not None
        e2, _, _ = fused(
            eta, etad, u_m, 50, n_newton=2,
            precision=jax.lax.Precision.HIGHEST,
            nl_precision=jax.lax.Precision.HIGHEST, interpret=True,
        )
        scale = float(jnp.abs(e1).max()) + 1e-30
        np.testing.assert_allclose(
            np.asarray(e2), np.asarray(e1), rtol=0, atol=5e-6 * scale
        )

    def test_rejects_external_forces(self):
        import dataclasses

        from tests import helpers

        ms, _, _, _ = self._setup(helpers.nonlinear_csv)
        ms_ext = dataclasses.replace(ms, external_force=lambda x, t: 0.0 * x)
        with pytest.raises(ValueError, match="external force"):
            ms_ext.make_pallas_rollout()

    def test_rejects_callable_input(self):
        from tests import helpers

        ms, eta, etad, _ = self._setup(helpers.nonlinear_csv)
        fused = ms.make_pallas_rollout()
        with pytest.raises(ValueError, match="constant input"):
            fused(eta, etad, lambda t: 0.0, 10)

    def test_frames_matches_xla_rom_frames(self):
        import jax

        from tests import helpers

        ms, eta, etad, u_m = self._setup(helpers.nonlinear_csv, B=4)
        ts1, e1, ed1 = ms.rollout_frames(
            eta, etad, u_m, 6, substeps=5, n_newton=2
        )
        fused = ms.make_pallas_rollout(tile=128)
        ts2, e2, ed2 = fused.frames(
            eta, etad, u_m, 6, substeps=5, n_newton=2,
            precision=jax.lax.Precision.HIGHEST,
            nl_precision=jax.lax.Precision.HIGHEST, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(ts2), np.asarray(ts1))
        assert e2.shape == (7, 4, eta.shape[-1])
        for a, b in [(e1, e2), (ed1, ed2)]:
            scale = float(jnp.abs(a).max()) + 1e-30
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=1e-6 * scale
            )


class TestSimulatePallasEngine:
    """simulate(engine='pallas'): the fused kernels behind the public API."""

    def test_modal_rom_engine_matches_xla(self):
        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
        from continuum_robot_tpu.models.simulate import simulate
        from tests import helpers

        model = DynamicEulerBernoulliBeam(
            helpers.nonlinear_csv(8, include_fluid=False)
        )
        n = model.n_pos_states
        x0 = np.zeros((3, 2 * n))
        x0[:, n - 2] = [1e-3, 2e-3, 3e-3]
        u = np.zeros(n)
        u[-2] = 2.0
        kw = dict(t_final=0.01, dt=1e-3, method="modal_rom", u=u,
                  substeps=5, n_newton=2, rho_inf=0.7, n_modes=12)
        ref = simulate(model, x0, **kw)
        out = simulate(model, x0, engine="pallas", **kw)
        assert out.ys.shape == ref.ys.shape
        scale = float(jnp.abs(ref.ys).max())
        # f32 kernel vs (x64-session) XLA path.
        np.testing.assert_allclose(
            np.asarray(out.ys), np.asarray(ref.ys), atol=1e-5 * scale
        )

    def test_modal_engine_matches_xla_and_squeezes(self):
        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
        from continuum_robot_tpu.models.simulate import simulate
        from tests import helpers

        model = DynamicEulerBernoulliBeam(
            helpers.linear_csv(6, include_fluid=False)
        )
        n = model.n_pos_states
        x0 = np.zeros(2 * n)  # single env: output must squeeze back
        u = np.zeros(n)
        u[-2] = 0.1
        kw = dict(t_final=0.01, dt=1e-3, method="modal", u=u, substeps=5,
                  rho_inf=0.8)
        ref = simulate(model, x0, **kw)
        out = simulate(model, x0, engine="pallas", **kw)
        assert out.ys.shape == ref.ys.shape
        scale = float(jnp.abs(ref.ys).max())
        np.testing.assert_allclose(
            np.asarray(out.ys), np.asarray(ref.ys), atol=1e-9 * scale
        )

    def test_rayleigh_through_pallas_engine(self):
        """simulate(engine='pallas', rayleigh=...) == the XLA engines.

        Regression guard for the facade: rayleigh must thread into
        _simulate_pallas for BOTH modal methods (it once raised NameError
        on every engine='pallas' call).
        """
        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
        from continuum_robot_tpu.models.simulate import simulate
        from tests import helpers

        for csv_fn, method, atol_scale in [
            (helpers.linear_csv, "modal", 1e-8),
            (helpers.nonlinear_csv, "modal_rom", 1e-5),
        ]:
            model = DynamicEulerBernoulliBeam(csv_fn(6, include_fluid=False))
            n = model.n_pos_states
            x0 = np.zeros(2 * n)
            u = np.zeros(n)
            u[-2] = 0.5
            kw = dict(t_final=0.01, dt=1e-3, method=method, u=u,
                      substeps=5, rho_inf=0.8, rayleigh=(10.0, 1e-6))
            if method == "modal_rom":
                kw.update(n_modes=10, n_newton=2)
            ref = simulate(model, x0, **kw)
            out = simulate(model, x0, engine="pallas", **kw)
            assert out.ys.shape == ref.ys.shape
            scale = float(jnp.abs(ref.ys).max())
            np.testing.assert_allclose(
                np.asarray(out.ys), np.asarray(ref.ys),
                atol=atol_scale * scale,
            )

    def test_engine_contracts(self):
        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
        from continuum_robot_tpu.models.simulate import simulate
        from tests import helpers

        model = DynamicEulerBernoulliBeam(
            helpers.nonlinear_csv(4, include_fluid=False)
        )
        n = model.n_pos_states
        x0 = np.zeros(2 * n)
        with pytest.raises(ValueError, match="constant input"):
            simulate(model, x0, 0.01, 1e-3, method="modal_rom",
                     engine="pallas", u=lambda t: jnp.zeros(n))
        with pytest.raises(ValueError, match="applies to method"):
            simulate(model, x0, 0.01, 1e-3, method="rk4", engine="pallas")
        with pytest.raises(ValueError, match="Unknown engine"):
            simulate(model, x0, 0.01, 1e-3, method="modal", engine="tpu")
