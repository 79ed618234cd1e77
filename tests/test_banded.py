"""Block-tridiagonal solver tests: correctness vs dense, BC masking, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import assembly, beam_arrays_from_dataframe
from continuum_robot_tpu.ops import banded
from tests.test_unified_beam_system import make_df


def random_btd(rng, n_nodes, sym=False):
    diag = rng.normal(size=(n_nodes, 3, 3))
    diag = diag + np.swapaxes(diag, -1, -2) + 10 * np.eye(3)
    upper = 0.3 * rng.normal(size=(n_nodes - 1, 3, 3))
    lower = np.swapaxes(upper, -1, -2) if sym else 0.3 * rng.normal(
        size=(n_nodes - 1, 3, 3)
    )
    dense = np.zeros((3 * n_nodes, 3 * n_nodes))
    for i in range(n_nodes):
        dense[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = diag[i]
    for i in range(n_nodes - 1):
        dense[3 * i : 3 * i + 3, 3 * i + 3 : 3 * i + 6] = upper[i]
        dense[3 * i + 3 : 3 * i + 6, 3 * i : 3 * i + 3] = lower[i]
    return diag, lower, upper, dense


class TestInv33:
    def test_matches_numpy(self):
        m = np.random.default_rng(0).normal(size=(17, 3, 3)) + 4 * np.eye(3)
        got = np.asarray(banded.inv33(jnp.asarray(m)))
        np.testing.assert_allclose(got, np.linalg.inv(m), rtol=1e-10)


class TestBtdSolve:
    @pytest.mark.parametrize("sym", [True, False])
    def test_vs_dense(self, sym):
        rng = np.random.default_rng(1)
        diag, lower, upper, dense = random_btd(rng, 9, sym=sym)
        b = rng.normal(size=(9, 3))
        factors = banded.btd_factor(
            jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(upper)
        )
        x = np.asarray(banded.btd_solve(factors, jnp.asarray(b)))
        np.testing.assert_allclose(
            x.flatten(), np.linalg.solve(dense, b.flatten()), rtol=1e-9, atol=1e-12
        )

    def test_batched_rhs(self):
        rng = np.random.default_rng(2)
        diag, lower, upper, dense = random_btd(rng, 6)
        b = rng.normal(size=(8, 6, 3))
        factors = banded.btd_factor(
            jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(upper)
        )
        x = np.asarray(banded.btd_solve(factors, jnp.asarray(b)))
        for k in range(8):
            np.testing.assert_allclose(
                x[k].flatten(),
                np.linalg.solve(dense, b[k].flatten()),
                rtol=1e-9,
                atol=1e-12,
            )

    def test_matvec_roundtrip(self):
        rng = np.random.default_rng(3)
        diag, lower, upper, dense = random_btd(rng, 10)
        x = rng.normal(size=(10, 3))
        y = np.asarray(
            banded.btd_matvec(
                jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(upper),
                jnp.asarray(x),
            )
        )
        np.testing.assert_allclose(y.flatten(), dense @ x.flatten(), rtol=1e-10)

    def test_vmapped_over_matrices(self):
        """Factor+solve vmapped over a batch of different matrices."""
        rng = np.random.default_rng(4)
        mats = [random_btd(rng, 5) for _ in range(4)]
        diags = jnp.asarray(np.stack([m[0] for m in mats]))
        lowers = jnp.asarray(np.stack([m[1] for m in mats]))
        uppers = jnp.asarray(np.stack([m[2] for m in mats]))
        bs = jnp.asarray(rng.normal(size=(4, 5, 3)))

        def solve_one(d, l, u, b):
            return banded.btd_solve(banded.btd_factor(d, l, u), b)

        xs = np.asarray(jax.vmap(solve_one)(diags, lowers, uppers, bs))
        for k in range(4):
            np.testing.assert_allclose(
                xs[k].flatten(),
                np.linalg.solve(mats[k][3], np.asarray(bs[k]).flatten()),
                rtol=1e-9, atol=1e-12,
            )


class TestMassSolveViaBC:
    def test_masked_full_solve_equals_reduced_solve(self):
        """Unit-pivot BC masking reproduces the reference's reduced solve."""
        arrays = beam_arrays_from_dataframe(make_df(["linear"] * 5))
        diag, off = assembly.mass_block_tridiagonal(arrays)
        lower = jnp.swapaxes(off, -1, -2)
        n_nodes = 6
        mask = np.ones((n_nodes, 3), dtype=bool)
        mask[0] = False  # FIXED base

        md, ml, mu = banded.btd_apply_bc(diag, lower, off, jnp.asarray(mask))
        factors = banded.btd_factor(md, ml, mu)

        M_dense = assembly.dense_mass_matrix(arrays)
        free = np.where(mask.flatten())[0]
        M_red = M_dense[np.ix_(free, free)]

        rng = np.random.default_rng(5)
        f_red = rng.normal(size=len(free))
        f_full = np.zeros(3 * n_nodes)
        f_full[free] = f_red

        x_full = np.asarray(
            banded.btd_solve(factors, jnp.asarray(f_full.reshape(n_nodes, 3)))
        ).flatten()
        x_red = np.linalg.solve(M_red, f_red)
        np.testing.assert_allclose(x_full[free], x_red, rtol=1e-9)
        np.testing.assert_allclose(x_full[~mask.flatten()], 0.0, atol=1e-12)


class TestCyclicReduction:
    """Log-depth block cyclic reduction (``btd_cr_factor``/``btd_cr_solve``)."""

    @pytest.mark.parametrize("n_nodes", [1, 2, 3, 4, 7, 8, 9, 33])
    @pytest.mark.parametrize("sym", [True, False])
    def test_vs_dense(self, n_nodes, sym):
        rng = np.random.default_rng(10 + n_nodes)
        diag, lower, upper, dense = random_btd(rng, n_nodes, sym=sym)
        b = rng.normal(size=(n_nodes, 3))
        factors = banded.btd_cr_factor(
            jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(upper)
        )
        x = np.asarray(banded.btd_cr_solve(factors, jnp.asarray(b)))
        np.testing.assert_allclose(
            x.flatten(), np.linalg.solve(dense, b.flatten()), rtol=1e-8, atol=1e-11
        )

    def test_matches_thomas(self):
        rng = np.random.default_rng(11)
        diag, lower, upper, _ = random_btd(rng, 12)
        b = rng.normal(size=(5, 12, 3))
        d, l, u = jnp.asarray(diag), jnp.asarray(lower), jnp.asarray(upper)
        x_cr = np.asarray(banded.btd_cr_solve(banded.btd_cr_factor(d, l, u), b))
        x_th = np.asarray(banded.btd_solve(banded.btd_factor(d, l, u), b))
        np.testing.assert_allclose(x_cr, x_th, rtol=1e-8, atol=1e-11)

    def test_batched_operator(self):
        """Factor/solve broadcast over a leading batch of distinct matrices."""
        rng = np.random.default_rng(12)
        mats = [random_btd(rng, 9) for _ in range(3)]
        diags = jnp.asarray(np.stack([m[0] for m in mats]))
        lowers = jnp.asarray(np.stack([m[1] for m in mats]))
        uppers = jnp.asarray(np.stack([m[2] for m in mats]))
        bs = rng.normal(size=(3, 9, 3))
        x = np.asarray(
            banded.btd_cr_solve(
                banded.btd_cr_factor(diags, lowers, uppers), jnp.asarray(bs)
            )
        )
        for k in range(3):
            np.testing.assert_allclose(
                x[k].flatten(),
                np.linalg.solve(mats[k][3], bs[k].flatten()),
                rtol=1e-8, atol=1e-11,
            )

    def test_differentiable(self):
        rng = np.random.default_rng(13)
        diag, lower, upper, dense = random_btd(rng, 6)
        b = rng.normal(size=(6, 3))

        def loss(d):
            f = banded.btd_cr_factor(d, jnp.asarray(lower), jnp.asarray(upper))
            return jnp.sum(banded.btd_cr_solve(f, jnp.asarray(b)) ** 2)

        g = jax.grad(loss)(jnp.asarray(diag))
        assert bool(jnp.all(jnp.isfinite(g)))
        # Check one entry against finite differences.
        eps = 1e-6
        dp = diag.copy(); dp[2, 1, 1] += eps
        dm = diag.copy(); dm[2, 1, 1] -= eps
        fd = (loss(jnp.asarray(dp)) - loss(jnp.asarray(dm))) / (2 * eps)
        np.testing.assert_allclose(float(g[2, 1, 1]), float(fd), rtol=1e-4)

    def test_bc_masked_solve(self):
        """CR through a unit-pivot BC-masked beam operator == reduced solve."""
        arrays = beam_arrays_from_dataframe(make_df(["linear"] * 5))
        diag, off = assembly.mass_block_tridiagonal(arrays)
        lower = jnp.swapaxes(off, -1, -2)
        n_nodes = 6
        mask = np.ones((n_nodes, 3), dtype=bool)
        mask[0] = False

        md, ml, mu = banded.btd_apply_bc(diag, lower, off, jnp.asarray(mask))
        factors = banded.btd_cr_factor(md, ml, mu)

        M_dense = assembly.dense_mass_matrix(arrays)
        free = np.where(mask.flatten())[0]
        rng = np.random.default_rng(14)
        f_red = rng.normal(size=len(free))
        f_full = np.zeros(3 * n_nodes)
        f_full[free] = f_red

        x_full = np.asarray(
            banded.btd_cr_solve(factors, jnp.asarray(f_full.reshape(n_nodes, 3)))
        ).flatten()
        x_red = np.linalg.solve(M_dense[np.ix_(free, free)], f_red)
        np.testing.assert_allclose(x_full[free], x_red, rtol=1e-8)
        np.testing.assert_allclose(x_full[~mask.flatten()], 0.0, atol=1e-12)

    def test_newmark_rollout_matches_btd(self):
        """Full implicit rollout with linear_solver='cr' == 'btd' path."""
        from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
        from continuum_robot_tpu.models.simulate import simulate

        df = make_df(["linear"] * 6)
        df["boundary_condition"] = ["FIXED"] + ["NONE"] * 5
        model = DynamicEulerBernoulliBeam(df)
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(1e-3)
        r_btd = simulate(model, x0, 0.01, 1e-4, method="newmark",
                         linear_solver="btd")
        r_cr = simulate(model, x0, 0.01, 1e-4, method="newmark",
                        linear_solver="cr")
        scale = float(jnp.abs(r_btd.ys).max())
        np.testing.assert_allclose(
            np.asarray(r_cr.ys), np.asarray(r_btd.ys), atol=1e-10 * scale
        )
