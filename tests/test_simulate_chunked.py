"""Chunked adaptive driving (`simulate(..., chunk=N)`) == monolithic drive.

The axon TPU worker kills device executions that run longer than ~60 s, so
long adaptive spans must be driven as one jitted call per few output
intervals, warm-restarted from the controller's own step proposal
(``AdaptiveStats.dt_next``). Round 3 kept that pattern private inside
``bench.py run_adaptive`` (VERDICT r3 item 7); ``simulate(chunk=...)`` is
the library API. These tests pin the contract: same trajectory and same
accepted/rejected step sequence as the monolithic driver, for every
adaptive engine tier (dense generalized-alpha, SDIRK3, modal-ROM).

SDIRK3's restart is bit-exact (its trial state is just ``(q, v)``); the
generalized-alpha and ROM engines recompute the consistent initial
acceleration per chunk, which equals the carried filtered acceleration to
roundoff on accepted states — tolerances below reflect that split.
"""

import numpy as np
import pytest

import helpers

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from continuum_robot_tpu.models.dynamic_beam_model import (  # noqa: E402
    DynamicEulerBernoulliBeam,
)
from continuum_robot_tpu.models.simulate import simulate  # noqa: E402


@pytest.fixture(scope="module")
def beam6():
    return DynamicEulerBernoulliBeam(helpers.write_beam_csv(["linear"] * 6))


@pytest.fixture(scope="module")
def beam6nl():
    return DynamicEulerBernoulliBeam(
        helpers.write_beam_csv(["nonlinear"] * 6))


def _impulse_x0(model, scale=1e-4):
    n = model.n_pos_states
    x0 = np.zeros(2 * n)
    x0[n - 2] = scale
    return x0


class TestChunkedEqualsMonolithic:
    def test_sdirk3_bit_exact(self, beam6):
        x0 = _impulse_x0(beam6)
        kw = dict(method="sdirk3", rtol=1e-6, atol=1e-9)
        res_m = simulate(beam6, x0, 20e-4, 1e-4, **kw)
        res_c = simulate(beam6, x0, 20e-4, 1e-4, chunk=4, **kw)
        # (q, v) trial state -> the per-chunk restart replays the exact
        # recurrence: trajectories AND step counts are identical.
        np.testing.assert_array_equal(
            np.asarray(res_c.ys), np.asarray(res_m.ys))
        assert int(res_c.stats.n_accepted) == int(res_m.stats.n_accepted)
        assert int(res_c.stats.n_rejected) == int(res_m.stats.n_rejected)
        assert float(res_c.stats.dt_next) == float(res_m.stats.dt_next)

    def test_genalpha_adaptive(self, beam6nl):
        x0 = _impulse_x0(beam6nl)
        kw = dict(method="generalized_alpha_adaptive", rtol=1e-6,
                  atol=1e-9, n_newton=2)
        res_m = simulate(beam6nl, x0, 20e-4, 1e-4, **kw)
        res_c = simulate(beam6nl, x0, 20e-4, 1e-4, chunk=5, **kw)
        # The (q, v, a) carry threads the algorithmic acceleration through
        # chunk boundaries: the recurrence — hence every trial decision —
        # replays bit-for-bit.
        np.testing.assert_array_equal(
            np.asarray(res_c.ys), np.asarray(res_m.ys))
        assert int(res_c.stats.n_accepted) == int(res_m.stats.n_accepted)
        assert int(res_c.stats.n_rejected) == int(res_m.stats.n_rejected)

    def test_modal_rom_adaptive(self, beam6nl):
        x0 = _impulse_x0(beam6nl)
        kw = dict(method="modal_rom_adaptive", rtol=1e-6, atol=1e-9,
                  n_modes=8)
        res_m = simulate(beam6nl, x0, 20e-4, 1e-4, **kw)
        res_c = simulate(beam6nl, x0, 20e-4, 1e-4, chunk=4, **kw)
        # Modal (eta, etad, etadd) carry + biorthonormal round-trip at the
        # boundary (to_modal(from_modal(eta)) == eta to roundoff): frames
        # agree to reconstruction roundoff and step counts exactly.
        scale = float(np.abs(np.asarray(res_m.ys)).max())
        np.testing.assert_allclose(
            np.asarray(res_c.ys), np.asarray(res_m.ys),
            atol=1e-13 * scale)
        assert int(res_c.stats.n_accepted) == int(res_m.stats.n_accepted)
        assert int(res_c.stats.n_rejected) == int(res_m.stats.n_rejected)

    def test_stats_aggregate_and_partial_tail(self, beam6):
        """chunk not dividing the interval count: the last partial chunk
        still runs; aggregated stats equal the monolithic totals."""
        x0 = _impulse_x0(beam6)
        kw = dict(method="sdirk3", rtol=1e-5, atol=1e-8)
        res_m = simulate(beam6, x0, 10e-4, 1e-4, **kw)
        res_c = simulate(beam6, x0, 10e-4, 1e-4, chunk=3, **kw)
        assert np.asarray(res_c.ys).shape == np.asarray(res_m.ys).shape
        np.testing.assert_array_equal(
            np.asarray(res_c.ys), np.asarray(res_m.ys))
        assert int(res_c.stats.n_steps) == int(res_m.stats.n_steps)
        assert int(res_c.stats.n_incomplete) == int(res_m.stats.n_incomplete)

    def test_chunk_requires_adaptive_method(self, beam6):
        x0 = _impulse_x0(beam6)
        with pytest.raises(ValueError, match="adaptive"):
            simulate(beam6, x0, 10e-4, 1e-4, method="generalized_alpha",
                     chunk=4)

    def test_chunk_validates_positive(self, beam6):
        x0 = _impulse_x0(beam6)
        with pytest.raises(ValueError, match="chunk"):
            simulate(beam6, x0, 10e-4, 1e-4, method="sdirk3", chunk=0)
