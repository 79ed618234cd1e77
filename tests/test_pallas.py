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
