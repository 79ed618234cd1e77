"""Composed-propagator modal engine (``ModalGenAlpha.rollout_power``).

The linear modal gen-α step is an exact affine map per mode, so K steps
compose on the host (float64, O(log K) batched 3x3 matmuls) into one map
whose application costs 12 ops per element — the discrete-map analogue of
the ZOH ``expm`` propagator (``ops/exponential.py``), reproducing the
production stepper's *discrete* trajectory instead of the continuous flow.

Contract under test: rollout_power == rollout up to roundoff of the
composed coefficients (NOT bit-equal — composition reassociates the
arithmetic), on both the fused-Pallas and XLA tiers, with remainder steps,
damping, no-force, and stiff-mesh configurations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import helpers
from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.models.simulate import make_modal_genalpha


def _setup(n_el=8, rayleigh=None, dtype=jnp.float64, segment_length=None,
           rho_inf=0.8, B=4):
    if segment_length is not None:
        csv = helpers.write_beam_csv(["linear"] * n_el,
                                     length=segment_length)
        model = DynamicEulerBernoulliBeam(csv)
    else:
        model = DynamicEulerBernoulliBeam(helpers.linear_csv(n_el))
    ms = make_modal_genalpha(model, 1e-4, rho_inf=rho_inf,
                             rayleigh=rayleigh)
    n = model.n_pos_states
    rng = np.random.default_rng(3)
    eta = jnp.asarray(rng.normal(scale=1e-4, size=(B, n)), dtype)
    etad = jnp.asarray(rng.normal(scale=1e-4, size=(B, n)), dtype)
    u = np.zeros(n)
    u[-2] = 0.1
    u_m = jnp.asarray(ms.project_force_host(u), dtype)
    return ms, eta, etad, u_m


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(b) + 1e-300))


class TestRolloutPower:
    @pytest.mark.parametrize("rayleigh", [None, (0.5, 1e-6)])
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_matches_stepper_f64(self, rayleigh, use_pallas):
        """f64: composition roundoff is ~1e-12 — the map IS the stepper.

        137 = 8*17 + 1 exercises the fused applications plus the
        remainder map; damped engines exercise the p5/p6 columns."""
        ms, eta, etad, u_m = _setup(rayleigh=rayleigh)
        base = ms.rollout(eta, etad, u_m, 137)
        out = ms.rollout_power(eta, etad, u_m, 137, K=8,
                               use_pallas=use_pallas, interpret=True)
        for a, b in zip(out, base):
            assert _rel(a, b) < 1e-10

    def test_k_equals_one_and_k_exceeds_steps(self):
        """K=1 is the stepper itself in map form; K > n_steps runs the
        whole span as one remainder map."""
        ms, eta, etad, u_m = _setup()
        base = ms.rollout(eta, etad, u_m, 37)
        for K in (1, 37, 100):
            out = ms.rollout_power(eta, etad, u_m, 37, K=K,
                                   use_pallas=False)
            for a, b in zip(out, base):
                assert _rel(a, b) < 1e-10, K

    def test_no_force(self):
        ms, eta, etad, _ = _setup()
        base = ms.rollout(eta, etad, None, 64)
        out = ms.rollout_power(eta, etad, None, 64, K=16, use_pallas=False)
        for a, b in zip(out, base):
            assert _rel(a, b) < 1e-10

    def test_stiff_mesh(self):
        """60 elements of the Nitinol material at 1/60 segment length —
        omega_max*dt >> 1, the regime the implicit stepper exists for.
        The composed map must track the stepper through the strongly
        dissipative high modes (large |T| entries, spectral radius < 1)."""
        ms, eta, etad, u_m = _setup(n_el=60, segment_length=0.25 / 60,
                                    rho_inf=0.95, B=2)
        base = ms.rollout(eta, etad, u_m, 500)
        out = ms.rollout_power(eta, etad, u_m, 500, K=32, use_pallas=False)
        for a, b in zip(out, base):
            assert _rel(a, b) < 1e-9

    def test_f32_long_horizon_drift(self):
        """f32 tier over 2000 steps: the composed coefficients round once
        per mode, the per-application roundoff replaces K steps' worth —
        drift vs the f32 stepper stays at the f32-trajectory noise level."""
        ms, eta, etad, u_m = _setup(dtype=jnp.float32)
        base = ms.rollout(eta, etad, u_m, 2000)
        out = ms.rollout_power(eta, etad, u_m, 2000, K=16, use_pallas=False)
        for a, b in zip(out, base):
            assert _rel(a, b) < 1e-3

    def test_frames_match_rollout_frames(self):
        ms, eta, etad, u_m = _setup()
        ts_ref, etas_ref, etads_ref = ms.rollout_frames(
            eta, etad, u_m, 6, substeps=20
        )
        ts, etas, etads = ms.rollout_frames_power(
            eta, etad, u_m, 6, substeps=20
        )
        np.testing.assert_allclose(np.asarray(ts), np.asarray(ts_ref),
                                   rtol=1e-12)
        assert etas.shape == etas_ref.shape
        assert _rel(etas[-1], etas_ref[-1]) < 1e-10
        assert _rel(etads[-1], etads_ref[-1]) < 1e-10

    def test_error_contracts(self):
        ms, eta, etad, u_m = _setup()
        with pytest.raises(ValueError, match="constant"):
            ms.rollout_power(eta, etad, lambda t: u_m, 10)
        with pytest.raises(ValueError, match="constant"):
            ms.rollout_frames_power(eta, etad, lambda t: u_m, 10)
        with pytest.raises(ValueError, match="K"):
            ms.rollout_power(eta, etad, u_m, 10, K=0)

    def test_simulate_facade_engine_power(self):
        """simulate(engine='power') == simulate(engine='xla') trajectory
        (method='modal'), including the squeeze/batch contract."""
        from continuum_robot_tpu.models.simulate import simulate

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(8))
        n = model.n_pos_states
        u = np.zeros(n)
        u[-2] = 0.1
        x0 = np.zeros(2 * n)
        ref = simulate(model, x0, 0.01, 1e-3, method="modal", u=u,
                       substeps=10, rho_inf=0.8)
        out = simulate(model, x0, 0.01, 1e-3, method="modal", u=u,
                       substeps=10, rho_inf=0.8, engine="power")
        assert out.ys.shape == ref.ys.shape
        np.testing.assert_allclose(np.asarray(out.ts), np.asarray(ref.ts),
                                   rtol=1e-12)
        err = np.abs(np.asarray(out.ys) - np.asarray(ref.ys)).max()
        scale = np.abs(np.asarray(ref.ys)).max()
        assert err < 1e-10 * max(scale, 1e-30)

    def test_simulate_facade_engine_power_contracts(self):
        from continuum_robot_tpu.models.simulate import simulate

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(6))
        n = model.n_pos_states
        x0 = np.zeros(2 * n)
        with pytest.raises(ValueError, match="method='modal'"):
            simulate(model, x0, 0.01, 1e-3, method="newmark",
                     engine="power")
        with pytest.raises(ValueError, match="constant"):
            simulate(model, x0, 0.01, 1e-3, method="modal",
                     u=lambda t: np.zeros(n), engine="power")

    def test_batched_rollout_modal_power(self):
        """parallel.batched_rollout(method='modal_power') == method='modal'
        trajectories over a vmapped batch."""
        from continuum_robot_tpu.parallel import batched_rollout

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(8))
        n = model.n_pos_states
        u = np.zeros(n)
        u[-2] = 0.1
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.normal(scale=1e-6, size=(3, 2 * n)))
        res_r = batched_rollout(model, x0, 0.01, 1e-3,
                                method="modal", u=u, substeps=10)
        res = batched_rollout(model, x0, 0.01, 1e-3,
                              method="modal_power", u=u, substeps=10)
        ys_r, ys = res_r.ys, res.ys
        assert ys.shape == ys_r.shape
        err = float(jnp.abs(ys - ys_r).max())
        scale = float(jnp.abs(ys_r).max())
        assert err < 1e-10 * max(scale, 1e-30)

    def test_piecewise_constant_callable_contract(self):
        """PiecewiseConstant IS a callable of t — it drops into every
        engine that accepts u=callable, with [b_{i-1}, b_i) spans."""
        from continuum_robot_tpu.models.simulate import PiecewiseConstant

        vals = np.arange(6.0).reshape(3, 2)
        pwc = PiecewiseConstant((0.01, 0.02), vals)
        np.testing.assert_allclose(np.asarray(pwc(0.0)), vals[0])
        np.testing.assert_allclose(np.asarray(pwc(0.0099)), vals[0])
        np.testing.assert_allclose(np.asarray(pwc(0.01)), vals[1])
        np.testing.assert_allclose(np.asarray(pwc(0.02)), vals[2])
        np.testing.assert_allclose(np.asarray(pwc(5.0)), vals[2])
        np.testing.assert_allclose(pwc.value_at(0.015), vals[1])
        # traced classification (jit over t)
        f = jax.jit(pwc)
        np.testing.assert_allclose(np.asarray(f(jnp.asarray(0.011))),
                                   vals[1])

    def test_piecewise_constant_validation(self):
        from continuum_robot_tpu.models.simulate import PiecewiseConstant

        with pytest.raises(ValueError, match="ascending"):
            PiecewiseConstant((0.02, 0.01), np.zeros((3, 2)))
        with pytest.raises(ValueError, match="rows"):
            PiecewiseConstant((0.01,), np.zeros((3, 2)))

    @pytest.mark.parametrize("rayleigh", [None, (0.5, 1e-6)])
    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_pwc_rollout_power_matches_stepper(self, rayleigh, use_pallas):
        """Piecewise-constant forcing (impulse-then-release + a second
        level) through the composed-propagator drive == the step-by-step
        stepper fed the same schedule as a callable, f64. Breaks fall
        mid-span (not K-aligned) and one span is shorter than K."""
        from continuum_robot_tpu.models.simulate import PiecewiseConstant

        ms, eta, etad, u_m = _setup(rayleigh=rayleigh)
        h = ms.dt
        u2 = np.stack([np.asarray(u_m), 0.3 * np.asarray(u_m),
                       np.zeros_like(u_m)])
        pwc = PiecewiseConstant((100 * h, 103 * h), u2)
        base = ms.rollout(eta, etad, pwc, 137)
        out = ms.rollout_power(eta, etad, pwc, 137, K=8,
                               use_pallas=use_pallas, interpret=True)
        for a, b in zip(out, base):
            assert _rel(a, b) < 1e-10

    def test_pwc_rollout_power_unaligned_breaks(self):
        """Breaks strictly inside a step interval: the f64 host
        classification must match the stepper's tau_n = (n+1-af)h force
        evaluation point, not the step start."""
        from continuum_robot_tpu.models.simulate import PiecewiseConstant

        ms, eta, etad, u_m = _setup()
        h = ms.dt
        # one break just below tau_50 and one just above tau_80:
        # af = 0.8/1.8 -> 1-af = 5/9; tau_n = (n + 5/9) h
        b1 = (50 + 0.4) * h   # < tau_50: step 50 already sees the new value
        b2 = (80 + 0.7) * h   # > tau_80: step 80 still sees the old value
        u2 = np.stack([np.asarray(u_m), np.zeros_like(u_m),
                       -0.5 * np.asarray(u_m)])
        pwc = PiecewiseConstant((b1, b2), u2)
        base = ms.rollout(eta, etad, pwc, 120)
        out = ms.rollout_power(eta, etad, pwc, 120, K=16, use_pallas=False)
        for a, b in zip(out, base):
            assert _rel(a, b) < 1e-10
        segs = ms._pwc_segments(pwc, 120, 0.0)
        assert [c for c, _v in segs] == [50, 31, 39]

    def test_pwc_frames_match_stepper_frames(self):
        """Frame-collecting PWC rollout == rollout_frames fed the same
        schedule as a callable — including a break that lands MID-frame
        (frame 2 of substeps=20 crosses step 45)."""
        from continuum_robot_tpu.models.simulate import PiecewiseConstant

        ms, eta, etad, u_m = _setup()
        h = ms.dt
        u2 = np.stack([np.asarray(u_m), np.zeros_like(u_m)])
        pwc = PiecewiseConstant((45 * h,), u2)
        ts_ref, etas_ref, etads_ref = ms.rollout_frames(
            eta, etad, pwc, 6, substeps=20
        )
        ts, etas, etads = ms.rollout_frames_power(
            eta, etad, pwc, 6, substeps=20
        )
        np.testing.assert_allclose(np.asarray(ts), np.asarray(ts_ref),
                                   rtol=1e-12)
        assert etas.shape == etas_ref.shape
        for f in range(7):
            assert _rel(etas[f], etas_ref[f]) < 1e-10, f
            assert _rel(etads[f], etads_ref[f]) < 1e-10, f

    @pytest.mark.parametrize("breaks_steps", [
        (25, 45),   # ADJACENT frames each cross a break: the run grouping
                    # must not merge the two distinct break-crossing maps
        (25, 35),   # both breaks inside ONE frame: 3 partial pieces
    ])
    def test_pwc_consecutive_midframe_breaks(self, breaks_steps):
        from continuum_robot_tpu.models.simulate import PiecewiseConstant

        ms, eta, etad, u_m = _setup()
        h = ms.dt
        u3 = np.stack([np.asarray(u_m), 0.2 * np.asarray(u_m),
                       np.zeros_like(u_m)])
        pwc = PiecewiseConstant(tuple(s * h for s in breaks_steps), u3)
        ts_ref, etas_ref, etads_ref = ms.rollout_frames(
            eta, etad, pwc, 5, substeps=20
        )
        ts, etas, etads = ms.rollout_frames_power(
            eta, etad, pwc, 5, substeps=20
        )
        for f in range(6):
            assert _rel(etas[f], etas_ref[f]) < 1e-10, f
            assert _rel(etads[f], etads_ref[f]) < 1e-10, f

    def test_simulate_engine_power_tip_impulse(self):
        """The flagship workload shape — tip impulse held then released
        (reference example_utilities.py:139-149) — runs on
        simulate(engine='power') via PiecewiseConstant and matches
        engine='xla' fed the identical schedule."""
        from continuum_robot_tpu.models.simulate import (
            PiecewiseConstant, simulate,
        )

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(8))
        n = model.n_pos_states
        u_imp = np.zeros(n)
        u_imp[-2] = 0.1
        pwc = PiecewiseConstant((0.01,), np.stack([u_imp, np.zeros(n)]))
        ref = simulate(model, np.zeros(2 * n), 0.05, 1e-3, method="modal",
                       u=pwc, substeps=10, rho_inf=0.8)
        out = simulate(model, np.zeros(2 * n), 0.05, 1e-3, method="modal",
                       u=pwc, substeps=10, rho_inf=0.8, engine="power")
        assert out.ys.shape == ref.ys.shape
        err = np.abs(np.asarray(out.ys) - np.asarray(ref.ys)).max()
        scale = np.abs(np.asarray(ref.ys)).max()
        assert scale > 0
        assert err < 1e-10 * scale

    def test_batched_rollout_modal_power_pwc(self):
        from continuum_robot_tpu.models.simulate import PiecewiseConstant
        from continuum_robot_tpu.parallel import batched_rollout

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(8))
        n = model.n_pos_states
        u_imp = np.zeros(n)
        u_imp[-2] = 0.1
        pwc = PiecewiseConstant((0.01,), np.stack([u_imp, np.zeros(n)]))
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.normal(scale=1e-6, size=(3, 2 * n)))
        res_r = batched_rollout(model, x0, 0.05, 1e-3,
                                method="modal", u=pwc, substeps=10)
        res = batched_rollout(model, x0, 0.05, 1e-3,
                              method="modal_power", u=pwc, substeps=10)
        assert res.ys.shape == res_r.ys.shape
        err = float(jnp.abs(res.ys - res_r.ys).max())
        scale = float(jnp.abs(res_r.ys).max())
        assert err < 1e-10 * max(scale, 1e-30)

    def test_affine_power_algebra(self):
        """_affine_power against literal repeated multiplication."""
        from continuum_robot_tpu.models.simulate import _affine_power

        rng = np.random.default_rng(0)
        T = rng.normal(scale=0.5, size=(5, 3, 3))
        for K in (1, 2, 3, 7, 16):
            P, S = _affine_power(T, K)
            P_ref = np.broadcast_to(np.eye(3), T.shape).copy()
            S_ref = np.zeros_like(T)
            for _ in range(K):
                S_ref = S_ref + P_ref
                P_ref = np.einsum("mij,mjk->mik", T, P_ref)
            np.testing.assert_allclose(P, P_ref, rtol=1e-12, atol=1e-14)
            np.testing.assert_allclose(S, S_ref, rtol=1e-12, atol=1e-14)


class TestPowerMapCache:
    """The composed-map memo (`_power_map_device`, round 5).

    POWER_DECOMP.jsonl measured the per-call fixed cost (eager f64
    composition + upload) at 93% of a 2000-step call; the memo makes
    repeat calls pay only the per-application marginal. Contract: same
    (k, u, dtype) returns the identical device buffers; with_dt returns
    a fresh instance whose memo is empty (coefficient changes can never
    hit a stale map); results are unchanged (the parity tests above run
    through the cache already).
    """

    def test_repeat_calls_reuse_device_maps(self):
        ms, eta, etad, u_m = _setup()
        u_host = np.asarray(jax.device_get(u_m), np.float64)
        P1, b1 = ms._power_map_device(8, u_host, jnp.float64)
        P2, b2 = ms._power_map_device(8, u_host, jnp.float64)
        assert P1 is P2 and b1 is b2
        # distinct k / dtype / force -> distinct entries
        P3, _ = ms._power_map_device(4, u_host, jnp.float64)
        assert P3 is not P1
        P4, _ = ms._power_map_device(8, u_host, jnp.float32)
        assert P4 is not P1
        P5, _ = ms._power_map_device(8, 2.0 * u_host, jnp.float64)
        assert P5 is not P1

    def test_with_dt_invalidates(self):
        ms, eta, etad, u_m = _setup()
        u_host = np.asarray(jax.device_get(u_m), np.float64)
        P1, _ = ms._power_map_device(8, u_host, jnp.float64)
        ms2 = ms.with_dt(5e-5)
        P2, _ = ms2._power_map_device(8, u_host, jnp.float64)
        assert P2 is not P1
        assert not np.allclose(np.asarray(P1), np.asarray(P2))

    def test_consts_memo_reuse_and_isolation(self):
        """The drive's small constant uploads (`_power_consts_device`,
        session 6) ride the same memo contract as the composed maps:
        repeat calls return identical device buffers, keys separate by
        force value and dtype, and the memo cannot collide with the
        composed-map entries sharing the cache dict."""
        ms, eta, etad, u_m = _setup()
        u_host = np.asarray(jax.device_get(u_m), np.float64)
        lam1, cd1, um1 = ms._power_consts_device(u_host, jnp.float64)
        lam2, cd2, um2 = ms._power_consts_device(u_host, jnp.float64)
        assert lam1 is lam2 and um1 is um2
        lam3, _, um3 = ms._power_consts_device(2.0 * u_host, jnp.float64)
        assert um3 is not um1
        lam4, _, _ = ms._power_consts_device(u_host, jnp.float32)
        assert lam4 is not lam1
        # u=None path: no force upload; its own memo entry (keys include
        # the force bytes), values identical
        lam5, _, um5 = ms._power_consts_device(None, jnp.float64)
        assert um5 is None
        np.testing.assert_array_equal(np.asarray(lam5), np.asarray(lam1))
        lam6, _, _ = ms._power_consts_device(None, jnp.float64)
        assert lam6 is lam5
        # rollout through the memo stays correct vs a fresh instance
        out_a = ms.rollout_power(eta, etad, u_m, 24, K=8, use_pallas=False)
        ms_fresh = ms.with_dt(float(ms.dt))
        out_b = ms_fresh.rollout_power(
            eta, etad, u_m, 24, K=8, use_pallas=False
        )
        for a, b in zip(out_a, out_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
