"""Sharding tests on the 8-device fake CPU mesh.

Covers the two scaling axes (SURVEY §2.2): environment/data parallelism
(batch axis sharded with NamedSharding) and spatial/beam-axis parallelism
(shard_map + ppermute halo exchange + CG mass solve), each checked for
numerical equality against the unsharded program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
from continuum_robot_tpu.parallel import (
    batched_rollout,
    build_spatial_rhs,
    make_mesh,
    make_spatial_beam,
    sweep_statistics,
)
from tests import helpers


@pytest.fixture(scope="module")
def model():
    return DynamicEulerBernoulliBeam(helpers.linear_csv())


def test_eight_fake_devices():
    assert jax.device_count() == 8


class TestBatchedRollout:
    def test_unsharded_batch(self, model):
        n = model.n_pos_states
        x0 = np.zeros((16, 2 * n))
        x0[:, n - 2] = np.linspace(1e-4, 2e-3, 16)
        res = batched_rollout(model, x0, 0.01, 0.001, substeps=20)
        ys = np.asarray(res.ys)
        assert ys.shape == (11, 16, 2 * n)
        assert np.all(np.isfinite(ys))

    def test_mesh_sharded_equals_single_device(self, model):
        n = model.n_pos_states
        x0 = np.zeros((16, 2 * n))
        x0[:, n - 2] = np.linspace(1e-4, 2e-3, 16)

        res_plain = batched_rollout(model, x0, 0.01, 0.001, substeps=20)
        mesh = make_mesh({"dp": 8})
        res_shard = batched_rollout(
            model, x0, 0.01, 0.001, substeps=20, mesh=mesh
        )
        np.testing.assert_allclose(
            np.asarray(res_shard.ys), np.asarray(res_plain.ys), rtol=1e-10
        )

    def test_modal_engine_sharded(self, model):
        """Modal-engine batched rollout shards over dp and matches both the
        unsharded modal run and the generalized-alpha operator path."""
        n = model.n_pos_states
        x0 = np.zeros((16, 2 * n))
        x0[:, n - 2] = np.linspace(1e-4, 2e-3, 16)

        res_ga = batched_rollout(
            model, x0, 0.01, 0.001, substeps=10, method="generalized_alpha"
        )
        res_modal = batched_rollout(
            model, x0, 0.01, 0.001, substeps=10, method="modal"
        )
        mesh = make_mesh({"dp": 8})
        res_shard = batched_rollout(
            model, x0, 0.01, 0.001, substeps=10, method="modal", mesh=mesh
        )
        scale = float(np.abs(np.asarray(res_ga.ys)).max())
        np.testing.assert_allclose(
            np.asarray(res_modal.ys), np.asarray(res_ga.ys), atol=1e-9 * scale
        )
        np.testing.assert_allclose(
            np.asarray(res_shard.ys), np.asarray(res_modal.ys), rtol=1e-10
        )

    def test_modal_rom_engine_sharded(self):
        """Nonlinear ROM batched rollout shards over dp and matches the
        unsharded ROM run exactly; truncated ROM tracks the dense path."""
        model = DynamicEulerBernoulliBeam(
            helpers.nonlinear_csv(include_fluid=False)
        )
        n = model.n_pos_states
        # Forced response from near-rest (the sweep workload shape): a raw
        # point-displacement IC would be unrepresentable in a truncated
        # basis by construction, which tests the IC, not the dynamics.
        x0 = 1e-8 * np.random.default_rng(0).normal(size=(16, 2 * n))
        u = np.zeros(n)
        u[-2] = 0.05

        kw = dict(substeps=10, method="modal_rom", n_modes=12, n_newton=2, u=u)
        res_rom = batched_rollout(model, x0, 0.01, 0.001, **kw)
        mesh = make_mesh({"dp": 8})
        res_shard = batched_rollout(model, x0, 0.01, 0.001, mesh=mesh, **kw)
        np.testing.assert_allclose(
            np.asarray(res_shard.ys), np.asarray(res_rom.ys), rtol=1e-10
        )
        res_ga = batched_rollout(
            model, x0, 0.01, 0.001, substeps=10,
            method="generalized_alpha", n_newton=2, u=u,
        )
        tip_rom = np.asarray(res_rom.ys)[..., n - 2]
        tip_ga = np.asarray(res_ga.ys)[..., n - 2]
        scale = np.abs(tip_ga).max()
        assert scale > 0
        assert np.abs(tip_rom - tip_ga).max() < 2e-2 * scale

    def test_sweep_statistics(self, model):
        n = model.n_pos_states
        x0 = np.zeros((8, 2 * n))
        x0[:, n - 2] = 1e-3
        res = batched_rollout(model, x0, 0.005, 0.001, substeps=10)
        stats = sweep_statistics(res.ys)
        assert float(stats["tip_abs_max"]) > 0
        assert np.isfinite(float(stats["state_rms"]))


class TestSpatialSharding:
    @pytest.mark.parametrize("n_elements", [6, 16])
    def test_spatial_rhs_matches_dense(self, n_elements):
        """Halo-exchange RHS == unsharded RHS (8-way node sharding)."""
        csv = helpers.write_beam_csv(["linear"] * n_elements)
        model = DynamicEulerBernoulliBeam(csv)
        mesh = make_mesh({"sp": 8})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        rhs_spatial = build_spatial_rhs(beam, cg_iters=40)

        n = model.n_pos_states
        rng = np.random.default_rng(0)
        x_red = rng.normal(scale=1e-3, size=2 * n)

        # reduced -> full node layout
        free = model.beam_model.bc_info.free_dofs
        n_full = model.beam_model.n_dofs_full
        q_full = np.zeros(n_full)
        v_full = np.zeros(n_full)
        q_full[free] = x_red[:n]
        v_full[free] = x_red[n:]
        Np = beam.n_nodes
        x_sp = np.zeros((2, Np, 3))
        x_sp[0, : n_full // 3] = q_full.reshape(-1, 3)
        x_sp[1, : n_full // 3] = v_full.reshape(-1, 3)

        out = np.asarray(jax.jit(lambda x: rhs_spatial(0.0, x))(jnp.asarray(x_sp)))

        rhs_dense = model.build_rhs()
        dx_red = np.asarray(rhs_dense(0.0, x_red, None))

        # Compare on the free DOFs.
        dq = out[0, : n_full // 3].flatten()[free]
        dv = out[1, : n_full // 3].flatten()[free]
        scale = np.abs(dx_red).max()
        np.testing.assert_allclose(dq, dx_red[:n], atol=1e-8 * scale)
        np.testing.assert_allclose(dv, dx_red[n:], atol=1e-6 * scale)

    def test_spatial_step_runs_on_2d_mesh(self):
        """dp x sp mesh: batched envs of a node-sharded beam, one RK4 step."""
        csv = helpers.write_beam_csv(["linear"] * 10)
        model = DynamicEulerBernoulliBeam(csv)
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        rhs = build_spatial_rhs(beam, cg_iters=10)

        def step(x):
            k1 = rhs(0.0, x)
            return x + 1e-6 * k1

        vstep = jax.jit(jax.vmap(step))
        x = jnp.zeros((4, 2, beam.n_nodes, 3)).at[:, 0, 5, 1].set(
            jnp.linspace(1e-4, 4e-4, 4)
        )
        out = np.asarray(vstep(x))
        assert out.shape == (4, 2, beam.n_nodes, 3)
        assert np.all(np.isfinite(out))
        assert not np.allclose(out[0], out[-1])


class TestSpatialRollout:
    def test_sharded_rollout_matches_reduced(self):
        """Full spatially-sharded RK4 rollout == the reduced-coordinate one."""
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import (
            reduced_to_node_layout,
            spatial_rollout,
        )

        csv = helpers.write_beam_csv(["linear"] * 10)
        model = DynamicEulerBernoulliBeam(csv)
        n = model.n_pos_states
        x0 = np.zeros(2 * n)
        x0[n - 2] = 1e-4

        mesh = make_mesh({"sp": 8})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        x0_sp = reduced_to_node_layout(model, x0, beam.n_nodes)
        ts, xs = spatial_rollout(beam, x0_sp, 0.002, 0.001, substeps=40,
                                 cg_iters=40)
        xs = np.asarray(xs)

        res = simulate(model, x0, 0.002, 0.001, method="rk4", substeps=40)
        ys = np.asarray(res.ys)

        free = model.beam_model.bc_info.free_dofs
        n_full = model.beam_model.n_dofs_full
        q_sp = xs[:, 0, : n_full // 3, :].reshape(xs.shape[0], n_full)[:, free]
        scale = np.abs(ys[:, :n]).max()
        np.testing.assert_allclose(q_sp, ys[:, :n], atol=5e-7 * scale)


class TestMeshHelpers:
    def test_make_mesh_validates_device_count(self):
        with pytest.raises(ValueError, match="need"):
            make_mesh({"dp": 3, "sp": 5})  # 15 != 8 fake devices

    def test_named_axes(self):
        mesh = make_mesh({"dp": 2, "sp": 4})
        assert mesh.shape["dp"] == 2 and mesh.shape["sp"] == 4


class TestSpatialImplicit:
    """Distributed SPIKE solves + sharded generalized-alpha
    (parallel/spatial_implicit.py): the implicit engines past one chip."""

    @staticmethod
    def _node_layouts(model, Np, x_red, u_red):
        bc = model.beam_model.bc_info
        free = np.asarray(bc.free_dofs)
        nf = bc.n_dofs_full

        def to_node(vec):
            full = np.zeros(nf)
            full[free] = vec
            out = np.zeros((Np, 3))
            out[: nf // 3] = full.reshape(-1, 3)
            return out

        n = x_red.shape[-1] // 2
        if x_red.ndim == 1:
            x_node = np.stack([to_node(x_red[:n]), to_node(x_red[n:])])
        else:
            x_node = np.stack(
                [
                    np.stack([to_node(xb[:n]), to_node(xb[n:])])
                    for xb in x_red
                ]
            )
        return x_node, to_node(u_red), free, nf

    def test_spike_solve_matches_dense(self):
        """SPIKE == dense solve on the BC-masked effective Jacobian."""
        from scipy.linalg import solve as dense_solve

        from continuum_robot_tpu.models import assembly
        from continuum_robot_tpu.parallel.spatial_implicit import (
            mask_aligned_blocks,
            spike_prepare,
            spike_solve,
        )
        from jax.sharding import PartitionSpec
        from functools import partial

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        Np, S = beam.n_nodes, 4
        m = Np // S
        mdiag, moff = assembly.mass_block_tridiagonal(beam.arrays)
        mdiag = np.asarray(mdiag)[:Np]
        moff = np.asarray(moff)[: Np - 1]
        z33 = np.zeros((1, 3, 3))
        mlow = np.concatenate([z33, np.swapaxes(moff, -1, -2)])
        mup = np.concatenate([moff, z33])
        mask = np.asarray(beam.free_mask, float)
        llm = np.vstack([np.zeros(3), mask[m - 1 :: m][: S - 1]])
        rfm = np.vstack([mask[m::m][: S - 1], np.zeros(3)])

        rng = np.random.default_rng(3)
        r = rng.normal(size=(Np, 3)) * mask

        p_n = PartitionSpec("sp", None)
        p_b = PartitionSpec("sp", None, None)

        @partial(
            jax.shard_map, mesh=mesh,
            in_specs=(p_b, p_b, p_b, p_n, p_n, p_n, p_n),
            out_specs=p_n,
        )
        def solve_sharded(md, ml, mu, m3, llm_, rfm_, r_):
            md, ml, mu = mask_aligned_blocks(
                md, ml, mu, m3, llm_[0], rfm_[0]
            )
            prep = spike_prepare(md, ml, mu, "sp", S)
            return spike_solve(prep, r_, "sp", S)

        x_spike = np.asarray(
            solve_sharded(mdiag, mlow, mup, mask, llm, rfm, r)
        )

        # Dense oracle: assemble the masked operator globally.
        T = np.zeros((3 * Np, 3 * Np))
        for i in range(Np):
            mi = np.diag(mask[i])
            blk = mi @ mdiag[i] @ mi + np.diag(1.0 - mask[i])
            T[3 * i : 3 * i + 3, 3 * i : 3 * i + 3] = blk
        for i in range(Np - 1):
            mi, mj = np.diag(mask[i]), np.diag(mask[i + 1])
            T[3 * i : 3 * i + 3, 3 * i + 3 : 3 * i + 6] = mi @ moff[i] @ mj
            T[3 * i + 3 : 3 * i + 6, 3 * i : 3 * i + 3] = (
                mj @ moff[i].T @ mi
            )
        x_dense = dense_solve(T, r.reshape(-1)).reshape(Np, 3)
        err = np.abs(x_spike - x_dense).max() / np.abs(x_dense).max()
        assert err < 1e-10, f"SPIKE vs dense solve: {err:.3e}"

    @pytest.mark.parametrize("kind", ["linear", "hybrid"])
    def test_sharded_genalpha_matches_dense_engine(self, kind):
        """Sharded implicit rollout == single-chip dense generalized-alpha
        (same recurrence) to 1e-8 — batched over a dp x sp mesh."""
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import build_spatial_genalpha

        csv = (
            helpers.linear_csv(14) if kind == "linear"
            else helpers.mixed_csv(14)
        )
        model = DynamicEulerBernoulliBeam(csv)
        n = model.n_pos_states
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        rng = np.random.default_rng(0)
        B = 3
        x_red = rng.normal(scale=1e-4, size=(B, 2 * n))
        u_red = np.zeros(n)
        u_red[-2] = 0.1
        x_node, u_node, free, nf = self._node_layouts(
            model, beam.n_nodes, x_red, u_red
        )

        dt, n_frames, substeps = 1e-4, 4, 3
        rollout = build_spatial_genalpha(
            beam, dt, rho_inf=0.8, n_newton=2
        )
        _, xs = rollout(
            jnp.asarray(x_node), n_frames, u=u_node, substeps=substeps
        )
        xs = np.asarray(xs)  # (frames+1, B, 2, Np, 3)

        res = simulate(
            model, x_red, n_frames * substeps * dt, substeps * dt,
            method="generalized_alpha", u=jnp.asarray(u_red),
            rho_inf=0.8, n_newton=2, substeps=substeps,
            linear_solver="btd",
        )
        ys = np.asarray(res.ys)

        err = 0.0
        for f in range(n_frames + 1):
            for b in range(B):
                got = np.concatenate(
                    [
                        xs[f, b, 0, : nf // 3].reshape(-1)[free],
                        xs[f, b, 1, : nf // 3].reshape(-1)[free],
                    ]
                )
                err = max(err, np.abs(got - ys[f, b]).max())
        rel = err / np.abs(ys).max()
        assert rel < 1e-8, f"{kind}: sharded vs dense gen-alpha {rel:.3e}"


class TestSpatialAdaptive:
    """Error control on the sp axis: build_spatial_genalpha_adaptive.

    The distributed controller must reproduce the single-chip adaptive
    engine (same ZX estimate, same PI dials, psum-contracted error norm
    over exactly the free DOFs) — both land within the tolerance of the
    same trajectory, and the accept/reject counters match because every
    decision is global across shards.
    """

    def _setup(self, n_elements=14):
        model = DynamicEulerBernoulliBeam(helpers.linear_csv(n_elements))
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        return model, beam

    def test_matches_dense_adaptive_engine(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel.spatial_implicit import (
            build_spatial_genalpha_adaptive,
        )

        model, beam = self._setup()
        n = model.n_pos_states
        u_red = np.zeros(n)
        u_red[-2] = 0.1
        free = np.flatnonzero(
            np.asarray(model.beam_model.bc_info.free_mask)
        )
        Np = beam.n_nodes
        u_node = np.zeros((Np, 3))
        u_node.reshape(-1)[free] = u_red
        x_node = np.zeros((2, Np, 3))

        t_final, dt_out = 5e-3, 1e-3
        t_eval = np.linspace(0.0, t_final, int(t_final / dt_out) + 1)
        rollout = build_spatial_genalpha_adaptive(beam, rho_inf=0.9,
                                                  n_newton=2)
        xs, stats = rollout(
            jnp.asarray(x_node), t_eval, u=jnp.asarray(u_node),
            rtol=1e-6, atol=1e-9,
        )
        xs = np.asarray(xs)  # (frames+1, 2, Np, 3)

        res = simulate(
            model, np.zeros(2 * n), t_final, dt_out,
            method="generalized_alpha_adaptive", u=jnp.asarray(u_red),
            rtol=1e-6, atol=1e-9, rho_inf=0.9, n_newton=2,
            linear_solver="dense_inv",
        )
        ys = np.asarray(res.ys)

        err = 0.0
        for f in range(len(t_eval)):
            got = np.concatenate([
                xs[f, 0].reshape(-1)[free],
                xs[f, 1].reshape(-1)[free],
            ])
            err = max(err, np.abs(got - ys[f]).max())
        rel = err / np.abs(ys).max()
        assert rel < 1e-5, f"sharded vs dense adaptive: {rel:.3e}"
        # identical global controller decisions
        assert int(stats.n_accepted) == int(res.stats.n_accepted)
        assert int(stats.n_rejected) == int(res.stats.n_rejected)

    def test_batched_per_env_dt(self):
        from continuum_robot_tpu.parallel.spatial_implicit import (
            build_spatial_genalpha_adaptive,
        )

        model, beam = self._setup()
        n = model.n_pos_states
        free = np.flatnonzero(
            np.asarray(model.beam_model.bc_info.free_mask)
        )
        Np = beam.n_nodes
        # two envs with very different initial energy -> different dt
        rng = np.random.default_rng(0)
        x_node = np.zeros((2, 2, Np, 3))
        x_red = rng.normal(scale=1e-6, size=2 * n)
        x_node[0, 0].reshape(-1)[free] = x_red[:n]
        x_node[1, 0].reshape(-1)[free] = 1e4 * x_red[:n]

        t_eval = np.linspace(0.0, 2e-3, 3)
        rollout = build_spatial_genalpha_adaptive(beam, rho_inf=0.9)
        xs, stats = rollout(jnp.asarray(x_node), t_eval, rtol=1e-6,
                            atol=1e-12)
        assert xs.shape == (3, 2, 2, Np, 3)
        assert bool(jnp.all(jnp.isfinite(xs)))
        acc = np.asarray(stats.n_accepted)
        assert acc.shape == (2,)
        assert acc[0] != acc[1]


class TestToleranceCG:
    def test_cg_tol_matches_fixed_iters(self):
        """Tolerance-stopped CG reaches the same RHS as a generous fixed
        count, and the iteration cap is no longer load-bearing."""
        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        rng = np.random.default_rng(1)
        x = rng.normal(scale=1e-4, size=(2, beam.n_nodes, 3))
        x = x * np.asarray(beam.free_mask, float)
        rhs_tol = build_spatial_rhs(beam, cg_iters=64, cg_tol=1e-10)
        rhs_fix = build_spatial_rhs(beam, cg_iters=64, cg_tol=None)
        a = np.asarray(rhs_tol(0.0, jnp.asarray(x)))
        b = np.asarray(rhs_fix(0.0, jnp.asarray(x)))
        assert np.abs(a - b).max() / np.abs(b).max() < 1e-9


class TestSpatialSDIRK3:
    """The accuracy-grade stiff engine on the sp axis (build_spatial_sdirk3).

    Same contract as the adaptive gen-alpha test: the distributed SDIRK3
    must land within tolerance of the single-chip engine AND take the
    identical accept/reject decisions (psum-contracted error norm; every
    stage solve is an exact distributed SPIKE solve)."""

    def _setup(self, n_elements=14, kind="linear"):
        csv = (
            helpers.linear_csv(n_elements) if kind == "linear"
            else helpers.mixed_csv(n_elements)
        )
        model = DynamicEulerBernoulliBeam(csv)
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        return model, beam

    @pytest.mark.parametrize("kind", ["linear", "hybrid"])
    def test_matches_dense_sdirk3_engine(self, kind):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel.spatial_implicit import (
            build_spatial_sdirk3,
        )

        model, beam = self._setup(kind=kind)
        n = model.n_pos_states
        u_red = np.zeros(n)
        u_red[-2] = 0.1
        free = np.flatnonzero(
            np.asarray(model.beam_model.bc_info.free_mask)
        )
        Np = beam.n_nodes
        u_node = np.zeros((Np, 3))
        u_node.reshape(-1)[free] = u_red
        x_node = np.zeros((2, Np, 3))

        t_final, dt_out = 5e-3, 1e-3
        t_eval = np.linspace(0.0, t_final, int(t_final / dt_out) + 1)
        rollout = build_spatial_sdirk3(beam, n_newton=2)
        xs, stats = rollout(
            jnp.asarray(x_node), t_eval, u=jnp.asarray(u_node),
            rtol=1e-6, atol=1e-9,
        )
        xs = np.asarray(xs)  # (frames+1, 2, Np, 3)

        res = simulate(
            model, np.zeros(2 * n), t_final, dt_out,
            method="sdirk3", u=jnp.asarray(u_red),
            rtol=1e-6, atol=1e-9, n_newton=2,
            linear_solver="dense_inv",
        )
        ys = np.asarray(res.ys)

        err = 0.0
        for f in range(len(t_eval)):
            got = np.concatenate([
                xs[f, 0].reshape(-1)[free],
                xs[f, 1].reshape(-1)[free],
            ])
            err = max(err, np.abs(got - ys[f]).max())
        rel = err / np.abs(ys).max()
        assert rel < 1e-5, f"sharded vs dense SDIRK3: {rel:.3e}"
        assert int(stats.n_accepted) == int(res.stats.n_accepted)
        assert int(stats.n_rejected) == int(res.stats.n_rejected)
        assert int(stats.n_incomplete) == 0


class TestSpatialFluid:
    """The reference's fluid drag on the sharded axis (fluid_density=...).

    Drag is node-local (zero added communication); it enters each engine's
    residual at the stage/alpha-point velocity, lagged in the Jacobian —
    exactly the single-chip external-force treatment, so trajectories and
    (for adaptive engines) accept/reject counters must match the
    single-chip engines with the fluid registry force enabled."""

    RHO_F = 1000.0

    def _setup(self, n_elements=14):
        from continuum_robot_tpu.models.config import ForceParams

        fp = ForceParams(
            enable_fluid_effects=True, fluid_density=self.RHO_F
        )
        model = DynamicEulerBernoulliBeam(
            helpers.linear_csv(n_elements), fp
        )
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        n = model.n_pos_states
        free = np.flatnonzero(
            np.asarray(model.beam_model.bc_info.free_mask)
        )
        # Nonzero initial velocity so the quadratic drag is leading-order.
        rng = np.random.default_rng(3)
        x_red = np.zeros(2 * n)
        x_red[n:] = rng.normal(scale=0.05, size=n)
        u_red = np.zeros(n)
        u_red[-2] = 0.1
        Np = beam.n_nodes
        x_node = np.zeros((2, Np, 3))
        x_node[0].reshape(-1)[free] = x_red[:n]
        x_node[1].reshape(-1)[free] = x_red[n:]
        u_node = np.zeros((Np, 3))
        u_node.reshape(-1)[free] = u_red
        return model, beam, x_red, u_red, x_node, u_node, free

    def _compare(self, xs, ys, t_count, free):
        err = 0.0
        for f in range(t_count):
            got = np.concatenate([
                xs[f, 0].reshape(-1)[free],
                xs[f, 1].reshape(-1)[free],
            ])
            err = max(err, np.abs(got - ys[f]).max())
        return err / np.abs(ys).max()

    def test_fixed_genalpha_with_fluid(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import build_spatial_genalpha

        model, beam, x_red, u_red, x_node, u_node, free = self._setup()
        dt, n_frames, substeps = 1e-4, 4, 3
        rollout = build_spatial_genalpha(
            beam, dt, rho_inf=0.8, n_newton=2, fluid_density=self.RHO_F
        )
        _, xs = rollout(jnp.asarray(x_node), n_frames, u=jnp.asarray(u_node),
                        substeps=substeps)
        res = simulate(
            model, x_red, n_frames * substeps * dt, substeps * dt,
            method="generalized_alpha", u=jnp.asarray(u_red),
            rho_inf=0.8, n_newton=2, substeps=substeps,
            linear_solver="btd",
        )
        rel = self._compare(np.asarray(xs), np.asarray(res.ys),
                            n_frames + 1, free)
        assert rel < 1e-8, f"sharded+fluid vs dense: {rel:.3e}"
        # And the drag is load-bearing: without it the trajectory differs.
        dry = build_spatial_genalpha(beam, dt, rho_inf=0.8, n_newton=2)
        _, xs_dry = dry(jnp.asarray(x_node), n_frames,
                        u=jnp.asarray(u_node), substeps=substeps)
        assert float(jnp.abs(xs - xs_dry).max()) > 1e-10

    @pytest.mark.parametrize("engine", ["genalpha_adaptive", "sdirk3"])
    def test_adaptive_engines_with_fluid(self, engine):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import (
            build_spatial_genalpha_adaptive,
            build_spatial_sdirk3,
        )

        model, beam, x_red, u_red, x_node, u_node, free = self._setup()
        t_eval = np.linspace(0.0, 4e-3, 5)
        if engine == "genalpha_adaptive":
            rollout = build_spatial_genalpha_adaptive(
                beam, rho_inf=0.9, n_newton=2, fluid_density=self.RHO_F
            )
            method = "generalized_alpha_adaptive"
            kw = dict(rho_inf=0.9)
        else:
            rollout = build_spatial_sdirk3(
                beam, n_newton=2, fluid_density=self.RHO_F
            )
            method = "sdirk3"
            kw = {}
        xs, stats = rollout(
            jnp.asarray(x_node), t_eval, u=jnp.asarray(u_node),
            rtol=1e-6, atol=1e-9,
        )
        res = simulate(
            model, x_red, float(t_eval[-1]), float(t_eval[1]),
            method=method, u=jnp.asarray(u_red), rtol=1e-6, atol=1e-9,
            n_newton=2, linear_solver="dense_inv", **kw,
        )
        rel = self._compare(np.asarray(xs), np.asarray(res.ys),
                            len(t_eval), free)
        assert rel < 1e-5, f"{engine}+fluid: {rel:.3e}"
        assert int(stats.n_accepted) == int(res.stats.n_accepted)
        assert int(stats.n_rejected) == int(res.stats.n_rejected)


class TestSpatialGravity:
    """Deformation-aware gravity on the sharded axis (gravity=[gx,gy,gz]).

    The sharded formulation is PHYSICAL: element i rotates (gx, gy) by the
    average of its own end-node rotations. (The single-chip registry force
    reproduces the reference's reduced-index quirk — a BC-dependent index
    misalignment with no node-layout analogue; divergence documented in
    PARITY.md.) The oracle here is therefore a consistent-gravity
    forces_func on the single-chip engines."""

    G = (2.0, -9.81)

    def _consistent_gravity_fn(self, model):
        arrays = model.beam_model.arrays
        masses = np.asarray(
            np.asarray(arrays.density)
            * np.asarray(arrays.cross_area)
            * np.asarray(arrays.length),
            np.float64,
        )
        n_seg = len(masses)
        gx, gy = self.G

        def f(x, t):
            n_pos = x.shape[-1] // 2
            q = x[..., :n_pos]
            # Base-fixed cantilever: reduced = full[3:]. theta_0 = 0;
            # theta_j (j>=1) = q[3(j-1)+2].
            th = jnp.concatenate(
                [jnp.zeros((*q.shape[:-1], 1), q.dtype),
                 q[..., 2::3]], axis=-1,
            )  # (nodes,)
            phi = 0.5 * (th[..., :-1] + th[..., 1:])  # per element
            c, s = jnp.cos(phi), jnp.sin(phi)
            m = jnp.asarray(masses, q.dtype)
            f_ax = (c * gx + s * gy) * m * 0.5
            f_tr = (-s * gx + c * gy) * m * 0.5
            out = jnp.zeros_like(q)
            for i in range(n_seg):
                for node in (i, i + 1):
                    if node == 0:
                        continue  # fixed base: DOFs dropped
                    out = out.at[..., 3 * (node - 1)].add(f_ax[..., i])
                    out = out.at[..., 3 * (node - 1) + 1].add(f_tr[..., i])
            return out

        return f

    def _setup(self, n_elements=14):
        model = DynamicEulerBernoulliBeam(helpers.linear_csv(n_elements))
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        n = model.n_pos_states
        free = np.flatnonzero(
            np.asarray(model.beam_model.bc_info.free_mask)
        )
        x_red = np.zeros(2 * n)
        Np = beam.n_nodes
        x_node = np.zeros((2, Np, 3))
        return model, beam, x_red, x_node, free

    def test_adaptive_genalpha_with_gravity(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import (
            build_spatial_genalpha_adaptive,
        )

        model, beam, x_red, x_node, free = self._setup()
        t_eval = np.linspace(0.0, 4e-3, 5)
        rollout = build_spatial_genalpha_adaptive(
            beam, rho_inf=0.9, n_newton=2,
            gravity=(self.G[0], self.G[1], 0.0),
        )
        xs, stats = rollout(jnp.asarray(x_node), t_eval, rtol=1e-6,
                            atol=1e-9)
        res = simulate(
            model, x_red, float(t_eval[-1]), float(t_eval[1]),
            method="generalized_alpha_adaptive",
            forces_func=self._consistent_gravity_fn(model),
            rtol=1e-6, atol=1e-9, rho_inf=0.9, n_newton=2,
            linear_solver="dense_inv",
        )
        ys = np.asarray(res.ys)
        xs = np.asarray(xs)
        err = 0.0
        for f in range(len(t_eval)):
            got = np.concatenate([
                xs[f, 0].reshape(-1)[free],
                xs[f, 1].reshape(-1)[free],
            ])
            err = max(err, np.abs(got - ys[f]).max())
        rel = err / np.abs(ys).max()
        assert rel < 1e-5, f"sharded gravity vs consistent oracle: {rel:.3e}"
        assert int(stats.n_accepted) == int(res.stats.n_accepted)
        # Gravity is load-bearing (beam sags).
        assert float(np.abs(xs).max()) > 0

    def test_sdirk3_with_gravity(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import build_spatial_sdirk3

        model, beam, x_red, x_node, free = self._setup()
        t_eval = np.linspace(0.0, 4e-3, 5)
        rollout = build_spatial_sdirk3(
            beam, n_newton=2, gravity=(self.G[0], self.G[1], 0.0)
        )
        xs, stats = rollout(jnp.asarray(x_node), t_eval, rtol=1e-6,
                            atol=1e-9)
        res = simulate(
            model, x_red, float(t_eval[-1]), float(t_eval[1]),
            method="sdirk3",
            forces_func=self._consistent_gravity_fn(model),
            rtol=1e-6, atol=1e-9, n_newton=2,
            linear_solver="dense_inv",
        )
        ys = np.asarray(res.ys)
        xs = np.asarray(xs)
        err = 0.0
        for f in range(len(t_eval)):
            got = np.concatenate([
                xs[f, 0].reshape(-1)[free],
                xs[f, 1].reshape(-1)[free],
            ])
            err = max(err, np.abs(got - ys[f]).max())
        rel = err / np.abs(ys).max()
        assert rel < 1e-5, f"sharded SDIRK3 gravity: {rel:.3e}"
        assert int(stats.n_accepted) == int(res.stats.n_accepted)
        assert float(np.abs(xs).max()) > 1e-9  # the beam actually sagged

    def test_fixed_genalpha_with_gravity(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import build_spatial_genalpha

        model, beam, x_red, x_node, free = self._setup()
        dt, n_frames, substeps = 1e-4, 4, 3
        rollout = build_spatial_genalpha(
            beam, dt, rho_inf=0.8, n_newton=2,
            gravity=(self.G[0], self.G[1], 0.0),
        )
        _, xs = rollout(jnp.asarray(x_node), n_frames, substeps=substeps)
        res = simulate(
            model, x_red, n_frames * substeps * dt, substeps * dt,
            method="generalized_alpha",
            forces_func=self._consistent_gravity_fn(model),
            rho_inf=0.8, n_newton=2, substeps=substeps,
            linear_solver="btd",
        )
        ys = np.asarray(res.ys)
        xs = np.asarray(xs)
        err = 0.0
        for f in range(n_frames + 1):
            got = np.concatenate([
                xs[f, 0].reshape(-1)[free],
                xs[f, 1].reshape(-1)[free],
            ])
            err = max(err, np.abs(got - ys[f]).max())
        rel = err / np.abs(ys).max()
        assert rel < 1e-8, f"fixed sharded gravity: {rel:.3e}"


class TestSpatialExplicitForces:
    """Fluid/gravity on the EXPLICIT spatial RHS (build_spatial_rhs)."""

    def test_rhs_with_fluid_matches_dense(self):
        from continuum_robot_tpu.models.config import ForceParams

        fp = ForceParams(enable_fluid_effects=True, fluid_density=1000.0)
        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14), fp)
        mesh = make_mesh({"sp": 8})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        rhs_sp = build_spatial_rhs(beam, cg_iters=64, cg_tol=1e-12,
                                   fluid_density=1000.0)
        n = model.n_pos_states
        rng = np.random.default_rng(5)
        x_red = rng.normal(scale=1e-3, size=2 * n)
        free = model.beam_model.bc_info.free_dofs
        n_full = model.beam_model.n_dofs_full
        x_sp = np.zeros((2, beam.n_nodes, 3))
        x_sp[0].reshape(-1)[: n_full][free] = x_red[:n]
        x_sp[1].reshape(-1)[: n_full][free] = x_red[n:]

        out = np.asarray(
            jax.jit(lambda x: rhs_sp(0.0, x))(jnp.asarray(x_sp))
        )
        dx_ref = np.asarray(model.build_rhs()(0.0, x_red, None))
        got = np.concatenate([
            out[0].reshape(-1)[: n_full][free],
            out[1].reshape(-1)[: n_full][free],
        ])
        scale = np.abs(dx_ref).max()
        np.testing.assert_allclose(got, dx_ref, atol=1e-6 * scale)

    def test_rhs_with_gravity_matches_consistent_oracle(self):
        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        mesh = make_mesh({"sp": 8})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        G = (2.0, -9.81)
        rhs_sp = build_spatial_rhs(beam, cg_iters=64, cg_tol=1e-12,
                                   gravity=(G[0], G[1], 0.0))
        grav_fn = TestSpatialGravity._consistent_gravity_fn(
            type("T", (), {"G": G})(), model
        )
        n = model.n_pos_states
        rng = np.random.default_rng(6)
        x_red = rng.normal(scale=1e-3, size=2 * n)
        free = model.beam_model.bc_info.free_dofs
        n_full = model.beam_model.n_dofs_full
        x_sp = np.zeros((2, beam.n_nodes, 3))
        x_sp[0].reshape(-1)[: n_full][free] = x_red[:n]
        x_sp[1].reshape(-1)[: n_full][free] = x_red[n:]

        out = np.asarray(
            jax.jit(lambda x: rhs_sp(0.0, x))(jnp.asarray(x_sp))
        )
        dx_ref = np.asarray(
            model.build_rhs(forces_func=grav_fn)(0.0, x_red, None)
        )
        got = np.concatenate([
            out[0].reshape(-1)[: n_full][free],
            out[1].reshape(-1)[: n_full][free],
        ])
        scale = np.abs(dx_ref).max()
        np.testing.assert_allclose(got, dx_ref, atol=1e-6 * scale)


class TestSpatialParametric:
    """Traced-parameter (differentiable) sharded implicit rollouts.

    ``build_spatial_genalpha``'s ``rollout(..., arrays=...)`` recomputes
    mass bands / drag factors / gravity masses inside the trace, making
    the sharded engine differentiable w.r.t. physical parameters —
    system identification on beams too long for one chip.
    """

    @staticmethod
    def _setup(fluid=None, gravity=None):
        from continuum_robot_tpu.parallel import build_spatial_genalpha

        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        mesh = make_mesh({"sp": 8})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        roll = build_spatial_genalpha(
            beam, 1e-4, rho_inf=0.8, n_newton=1,
            fluid_density=fluid, gravity=gravity,
        )
        tip = beam.n_nodes_real - 1
        u = np.zeros((beam.n_nodes, 3))
        u[tip, 1] = 0.05
        return beam, roll, jnp.asarray(u), tip

    def test_traced_arrays_reproduce_baked(self):
        """arrays=beam.arrays (as jnp leaves) == the baked-constant path."""
        beam, roll, u, tip = self._setup(fluid=1000.0,
                                         gravity=(0.0, -9.81, 0.0))
        x0 = jnp.zeros((2, beam.n_nodes, 3))
        _, xs0 = roll(x0, 3, u=u, substeps=4)
        arrs = jax.tree_util.tree_map(jnp.asarray, beam.arrays)
        _, xs1 = roll(x0, 3, u=u, substeps=4, arrays=arrs)
        scale = float(jnp.abs(xs0).max())
        np.testing.assert_allclose(
            np.asarray(xs1), np.asarray(xs0), atol=1e-14 * max(scale, 1.0)
        )

    def test_grad_wrt_modulus_matches_fd(self):
        """jax.grad through the sharded SPIKE rollout == central FD."""
        import dataclasses as _dc

        beam, roll, u, tip = self._setup()
        x0 = jnp.zeros((2, beam.n_nodes, 3))
        E0 = jnp.asarray(beam.arrays.length * 0.0) + jnp.asarray(
            beam.arrays.elastic_modulus
        )

        def loss(s):
            arrs = _dc.replace(
                jax.tree_util.tree_map(jnp.asarray, beam.arrays),
                elastic_modulus=s * E0,
            )
            _, xs = roll(x0, 2, u=u, substeps=4, arrays=arrs)
            return jnp.sum(xs[-1, 0, tip]) * 1e3

        # Differentiate UNDER JIT (the documented contract): the eager
        # shard_map transpose mis-propagates the cotangent sharding of the
        # 'sp'-sharded element fields ("Unexpected XLA sharding override");
        # under jit XLA's sharding propagation resolves it.
        g = float(jax.jit(jax.grad(loss))(jnp.asarray(1.0)))
        h = 1e-5
        fd = (float(loss(jnp.asarray(1.0 + h)))
              - float(loss(jnp.asarray(1.0 - h)))) / (2 * h)
        assert np.isfinite(g) and abs(g) > 0
        np.testing.assert_allclose(g, fd, rtol=2e-5)

    def test_grad_wrt_density_through_mass(self):
        """Mass bands are traced too: grad w.r.t. density is live."""
        import dataclasses as _dc

        beam, roll, u, tip = self._setup()
        x0 = jnp.zeros((2, beam.n_nodes, 3))
        rho0 = jnp.asarray(beam.arrays.density)

        def loss(s):
            arrs = _dc.replace(
                jax.tree_util.tree_map(jnp.asarray, beam.arrays),
                density=s * rho0,
            )
            _, xs = roll(x0, 2, u=u, substeps=4, arrays=arrs)
            return jnp.sum(xs[-1, 0, tip]) * 1e3

        g = float(jax.jit(jax.grad(loss))(jnp.asarray(1.0)))
        h = 1e-5
        fd = (float(loss(jnp.asarray(1.0 + h)))
              - float(loss(jnp.asarray(1.0 - h)))) / (2 * h)
        assert np.isfinite(g) and abs(g) > 0
        np.testing.assert_allclose(g, fd, rtol=2e-5)

    @staticmethod
    def _adaptive_setup(builder, **kw):
        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        mesh = make_mesh({"sp": 8})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        roll = builder(beam, **kw)
        tip = beam.n_nodes_real - 1
        u = np.zeros((beam.n_nodes, 3))
        u[tip, 1] = 0.05
        return beam, roll, jnp.asarray(u), tip

    def _check_adaptive_jvp(self, builder, **kw):
        """jax.jvp through an error-controlled sharded engine == central FD.

        The accept/reject sequence is piecewise constant in the
        parameters (smooth a.e.), so at a tight tolerance the realized
        step sequence is identical across the FD stencil and the tangent
        is the sensitivity of that sequence — same contract as the dense
        engine's forward-sensitivity test (test_sweep.py).
        """
        import dataclasses as _dc

        beam, roll, u, tip = self._adaptive_setup(builder, **kw)
        x0 = jnp.zeros((2, beam.n_nodes, 3))
        t_eval = jnp.asarray(np.linspace(0.0, 4e-4, 3))
        E0 = jnp.asarray(beam.arrays.elastic_modulus)
        arrs0 = jax.tree_util.tree_map(jnp.asarray, beam.arrays)

        def tip_at_end(s):
            arrs = _dc.replace(arrs0, elastic_modulus=s * E0)
            xs, _ = roll(x0, t_eval, u=u, rtol=1e-7, atol=1e-10,
                         arrays=arrs)
            return xs[-1, 0, tip, 1] * 1e3

        _, g = jax.jvp(tip_at_end, (jnp.asarray(1.0),),
                       (jnp.asarray(1.0),))
        h = 1e-5
        fd = (float(tip_at_end(jnp.asarray(1.0 + h)))
              - float(tip_at_end(jnp.asarray(1.0 - h)))) / (2 * h)
        assert np.isfinite(float(g)) and abs(float(g)) > 0
        np.testing.assert_allclose(float(g), fd, rtol=1e-4)

    def test_jvp_through_adaptive_genalpha(self):
        from continuum_robot_tpu.parallel import (
            build_spatial_genalpha_adaptive,
        )

        self._check_adaptive_jvp(build_spatial_genalpha_adaptive,
                                 rho_inf=0.9)

    def test_jvp_through_sdirk3(self):
        from continuum_robot_tpu.parallel import build_spatial_sdirk3

        self._check_adaptive_jvp(build_spatial_sdirk3)


class TestSpatialModalROM:
    """Node-sharded modal / modal-ROM engines (parallel/spatial_modal.py).

    The modal state is replicated; the bases' rows and the ROM's per-step
    correction pipeline (expand -> element correction -> project) are
    sharded over ``sp`` with one (m,) psum per Newton correction. Every
    check pins the sharded engine against the single-chip engine it
    re-distributes.
    """

    @staticmethod
    def _modal_setup(kind="hybrid", n_modes=None, rayleigh=None):
        from continuum_robot_tpu.parallel import build_spatial_modal_rom

        csv = (
            helpers.nonlinear_csv(14) if kind == "nonlinear"
            else helpers.mixed_csv(14)
        )
        model = DynamicEulerBernoulliBeam(csv)
        mesh = make_mesh({"sp": 8})
        sm = build_spatial_modal_rom(
            model, mesh, 1e-4, rho_inf=0.5, n_modes=n_modes,
            rayleigh=rayleigh,
        )
        n = model.n_pos_states
        rng = np.random.default_rng(0)
        x_red = rng.normal(scale=1e-4, size=2 * n)
        eta, etad = sm.ms.to_modal(
            jnp.asarray(x_red[:n]), jnp.asarray(x_red[n:])
        )
        u = np.zeros(n)
        u[-2] = 0.1
        u_m = jnp.asarray(sm.ms.project_force_host(u))
        return model, sm, eta, etad, u_m, x_red

    @pytest.mark.parametrize("kind", ["hybrid", "nonlinear"])
    def test_sharded_rom_matches_single_chip(self, kind):
        model, sm, eta, etad, u_m, _ = self._modal_setup(kind)
        ts0, es0, eds0 = sm.ms.rollout_frames(
            eta, etad, u_m, 4, substeps=3, n_newton=2
        )
        ts1, es1, eds1 = sm.rollout_frames(
            eta, etad, u_m, 4, substeps=3, n_newton=2
        )
        scale = float(jnp.abs(es0).max())
        np.testing.assert_allclose(np.asarray(ts1), np.asarray(ts0))
        np.testing.assert_allclose(
            np.asarray(es1), np.asarray(es0), atol=1e-12 * scale
        )
        np.testing.assert_allclose(
            np.asarray(eds1), np.asarray(eds0),
            atol=1e-12 * float(jnp.abs(eds0).max()),
        )

    def test_truncated_and_damped(self):
        """Truncation (n_modes) and Rayleigh damping ride the sharded path."""
        _, sm, eta, etad, u_m, _ = self._modal_setup(
            "hybrid", n_modes=12, rayleigh=(0.5, 1e-6)
        )
        assert sm.n_modes == 12
        _, es0, _ = sm.ms.rollout_frames(
            eta, etad, u_m, 3, substeps=4, n_newton=1
        )
        _, es1, _ = sm.rollout_frames(
            eta, etad, u_m, 3, substeps=4, n_newton=1
        )
        scale = float(jnp.abs(es0).max())
        np.testing.assert_allclose(
            np.asarray(es1), np.asarray(es0), atol=1e-12 * scale
        )

    def test_transforms_roundtrip(self):
        """Sharded to_modal / project_force / physical_frames == host."""
        from continuum_robot_tpu.parallel import reduced_to_node_layout

        model, sm, eta, etad, u_m, x_red = self._modal_setup("hybrid")
        n = model.n_pos_states
        x_node = reduced_to_node_layout(
            model, jnp.asarray(x_red), sm.n_nodes
        )
        eta2, etad2 = sm.to_modal(x_node)
        np.testing.assert_allclose(
            np.asarray(eta2), np.asarray(eta), atol=1e-14
        )
        np.testing.assert_allclose(
            np.asarray(etad2), np.asarray(etad), atol=1e-14
        )

        # project_force: node-layout tip force == host projection.
        free = np.asarray(model.beam_model.bc_info.free_dofs)
        n_full = model.beam_model.n_dofs_full
        u_red = np.zeros(n)
        u_red[-2] = 0.1
        u_node = np.zeros((sm.n_nodes, 3))
        u_node.reshape(-1)[:n_full][free] = u_red
        u_m2 = sm.project_force(jnp.asarray(u_node))
        np.testing.assert_allclose(
            np.asarray(u_m2), np.asarray(u_m), atol=1e-14
        )

        # physical_frames: local expansion matches from_modal on free DOFs.
        _, es, eds = sm.rollout_frames(eta, etad, u_m, 2, substeps=2)
        qs, vs = sm.physical_frames(es, eds)
        q_ref, v_ref = sm.ms.from_modal(es[-1], eds[-1])
        got_q = np.asarray(qs[-1]).reshape(-1)[:n_full][free]
        got_v = np.asarray(vs[-1]).reshape(-1)[:n_full][free]
        np.testing.assert_allclose(got_q, np.asarray(q_ref), atol=1e-14)
        np.testing.assert_allclose(got_v, np.asarray(v_ref), atol=1e-14)

    def test_env_batch_on_dp_sp_mesh(self):
        """Env-batched rollout on a dp x sp mesh matches per-env runs."""
        from continuum_robot_tpu.parallel import build_spatial_modal_rom

        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        mesh = make_mesh({"dp": 2, "sp": 4})
        sm = build_spatial_modal_rom(model, mesh, 1e-4, rho_inf=0.5)
        n = model.n_pos_states
        rng = np.random.default_rng(1)
        B = 3
        x_red = rng.normal(scale=1e-4, size=(B, 2 * n))
        eta, etad = sm.ms.to_modal(
            jnp.asarray(x_red[:, :n]), jnp.asarray(x_red[:, n:])
        )
        u = np.zeros(n)
        u[-2] = 0.1
        u_m = jnp.asarray(sm.ms.project_force_host(u))
        _, esB, _ = sm.rollout_frames(eta, etad, u_m, 3, substeps=2)
        _, es0, _ = sm.ms.rollout_frames(eta, etad, u_m, 3, substeps=2)
        scale = float(jnp.abs(es0).max())
        np.testing.assert_allclose(
            np.asarray(esB), np.asarray(es0), atol=1e-12 * scale
        )

    def test_linear_spatial_modal(self):
        """Sharded linear modal engine: transforms match the host engine."""
        from continuum_robot_tpu.parallel import (
            build_spatial_modal,
            reduced_to_node_layout,
        )

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        mesh = make_mesh({"sp": 8})
        lm = build_spatial_modal(model, mesh, 1e-4, rayleigh=(0.1, 1e-7))
        n = model.n_pos_states
        rng = np.random.default_rng(2)
        x_red = rng.normal(scale=1e-4, size=2 * n)
        x_node = reduced_to_node_layout(model, jnp.asarray(x_red), lm.n_nodes)
        eta, etad = lm.to_modal(x_node)
        eta0, etad0 = lm.ms.to_modal(
            jnp.asarray(x_red[:n]), jnp.asarray(x_red[n:])
        )
        np.testing.assert_allclose(
            np.asarray(eta), np.asarray(eta0), atol=1e-14
        )
        u_m = jnp.asarray(lm.ms.project_force_host(
            np.zeros(n) + np.eye(n)[n - 2] * 0.1
        ))
        ts, es, eds = lm.rollout_frames(eta, etad, u_m, 3, substeps=2)
        qs, vs = lm.physical_frames(es, eds)
        free = np.asarray(model.beam_model.bc_info.free_dofs)
        n_full = model.beam_model.n_dofs_full
        q_ref, _ = lm.ms.from_modal(es[-1], eds[-1])
        got = np.asarray(qs[-1]).reshape(-1)[:n_full][free]
        np.testing.assert_allclose(got, np.asarray(q_ref), atol=1e-14)

    def test_error_contracts(self):
        """General-path registry forces are rejected; reduced-closure forces
        (fluid/gravity) build and are actually integrated (regression: the
        builder used to guard only ``external_force``, silently DROPPING
        forces that arrive as ``ext_modal`` after the round-4 split-path
        force support)."""
        from continuum_robot_tpu.models.abstractions import AbstractForce
        from continuum_robot_tpu.models.config import ForceParams
        from continuum_robot_tpu.parallel import build_spatial_modal_rom

        class OpaqueForce(AbstractForce):
            # No make_reduced_modal -> needs the general external_force
            # path, which the sharded split engine cannot evaluate.
            def compute_forces(self, x, t):
                n = x.shape[-1] // 2
                return jnp.zeros((*x.shape[:-1], n), x.dtype) + 1e-3

            def is_enabled(self):
                return True

        mesh = make_mesh({"sp": 8})
        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(6))
        model.force_registry.register(OpaqueForce())
        with pytest.raises(ValueError, match="external"):
            build_spatial_modal_rom(model, mesh, 1e-4)

        fp = ForceParams(enable_gravity_effects=True,
                         gravity_vector=np.array([0.0, -9.81, 0.0]))
        forced = DynamicEulerBernoulliBeam(helpers.mixed_csv(6), fp)
        sm = build_spatial_modal_rom(forced, mesh, 1e-4, rho_inf=0.5)
        assert sm.ms.ext_modal is not None
        m = sm.n_modes
        z = jnp.zeros(m)
        _, es, _ = sm.rollout_frames(z, z, None, 2, substeps=2)
        assert float(jnp.abs(es[-1]).max()) > 0.0  # gravity moved the beam

    @pytest.mark.parametrize("rayleigh", [None, (0.5, 1e-6)])
    def test_adaptive_matches_single_chip(self, rayleigh):
        """Sharded rollout_adaptive == single-chip, counter-for-counter."""
        _, sm, eta, etad, u_m, _ = self._modal_setup(
            "hybrid", rayleigh=rayleigh
        )
        t_eval = np.linspace(0.0, 2e-3, 5)
        es0, eds0, st0 = sm.ms.rollout_adaptive(
            eta, etad, u_m, t_eval, rtol=1e-7, atol=1e-12
        )
        es1, eds1, st1 = sm.rollout_adaptive(
            eta, etad, u_m, t_eval, rtol=1e-7, atol=1e-12
        )
        assert int(st1.n_incomplete) == 0
        assert int(st1.n_steps) == int(st0.n_steps)
        assert int(st1.n_accepted) == int(st0.n_accepted)
        assert int(st1.n_rejected) == int(st0.n_rejected)
        scale = float(jnp.abs(es0).max())
        np.testing.assert_allclose(
            np.asarray(es1), np.asarray(es0), atol=1e-11 * scale
        )
        np.testing.assert_allclose(
            np.asarray(eds1), np.asarray(eds0),
            atol=1e-11 * float(jnp.abs(eds0).max()),
        )

    def test_ecsw_sharded_guard(self):
        """Sharded ECSW: replicated sampled stepping + sp-sharded audit.

        The full-correction envelope guard — the O(beam length) piece of
        guarded ECSW stepping — runs node-sharded; everything is pinned
        against the single-chip hyper-reduced engine.
        """
        from continuum_robot_tpu.parallel import build_spatial_modal_rom

        model = DynamicEulerBernoulliBeam(helpers.nonlinear_csv(22))
        mesh = make_mesh({"sp": 8})
        sm = build_spatial_modal_rom(model, mesh, 1e-4, rho_inf=0.5,
                                     n_modes=16)
        ms = sm.ms
        n = model.n_pos_states
        u = np.zeros(n)
        u[-2] = 3.0
        u_m = jnp.asarray(ms.project_force_host(u))
        z = jnp.zeros((1, 16))
        _, etas_tr, _ = ms.rollout_frames(z, z, u_m, 20, substeps=10,
                                          n_newton=2)
        snaps = np.asarray(etas_tr[::2, 0, :])
        red, info = sm.hyper_reduce(snaps, tau=1e-3, return_info=True)
        assert red.is_hyper_reduced and 0 < info["n_sampled"] < 22

        # Sharded residual == single-chip residual (in and out of envelope).
        probe = jnp.stack([
            jnp.asarray(snaps[-1]), 50.0 * jnp.asarray(snaps[-1]),
        ])
        rho_sharded = np.asarray(red.ecsw_residual(probe))
        rho_single = np.asarray(red.ms.ecsw_residual(probe))
        np.testing.assert_allclose(rho_sharded, rho_single, rtol=1e-8,
                                   atol=1e-14)

        # Guarded rollout: frames + guard match the single-chip engine;
        # an in-envelope run is not flagged.
        eta0 = jnp.asarray(snaps[-1])
        z1 = jnp.zeros(16)
        ts0, es0, eds0, g0 = red.ms.rollout_frames_guarded(
            eta0, z1, u_m, 4, substeps=5
        )
        ts1, es1, eds1, g1 = red.rollout_frames_guarded(
            eta0, z1, u_m, 4, substeps=5
        )
        scale = float(jnp.abs(es0).max())
        np.testing.assert_allclose(np.asarray(es1), np.asarray(es0),
                                   atol=1e-11 * scale)
        np.testing.assert_allclose(
            float(g1["max_residual"]), float(g0["max_residual"]),
            rtol=1e-8, atol=1e-14,
        )
        assert not bool(g1["flagged"])

        # Out-of-envelope rollout is DETECTED, not silently wrong: a
        # near-clamp force pattern drives curvature content the
        # tip-impulse training never produced (amplitude scaling alone
        # stays covered — same probe as the single-chip detection test).
        u2 = np.zeros(n)
        u2[1] = 3.0
        u2_m = jnp.asarray(ms.project_force_host(u2))
        _, _, _, g_bad = red.rollout_frames_guarded(
            z1, z1, u2_m, 10, substeps=10
        )
        assert bool(g_bad["flagged"])

        # Plain stepping on the hyper-reduced engine delegates to the
        # replicated gathered recurrence (bit-identical).
        _, esA, _ = red.rollout_frames(eta0, z1, u_m, 3, substeps=2)
        _, esB, _ = red.ms.rollout_frames(eta0, z1, u_m, 3, substeps=2)
        np.testing.assert_array_equal(np.asarray(esA), np.asarray(esB))

        # Adaptive stepping delegates too.
        t_eval = np.linspace(0.0, 5e-4, 3)
        esC, _, stC = red.rollout_adaptive(eta0, z1, u_m, t_eval,
                                           rtol=1e-6, atol=1e-12)
        esD, _, stD = red.ms.rollout_adaptive(eta0, z1, u_m, t_eval,
                                              rtol=1e-6, atol=1e-12)
        assert int(stC.n_accepted) == int(stD.n_accepted)
        np.testing.assert_array_equal(np.asarray(esC), np.asarray(esD))

    def test_adaptive_batched_per_env_dt(self):
        """Batched sharded adaptive: each vmapped lane == its solo run."""
        _, sm, eta, etad, u_m, _ = self._modal_setup("hybrid")
        t_eval = np.linspace(0.0, 1e-3, 3)
        etaB = jnp.stack([eta, 2.0 * eta])
        etadB = jnp.stack([etad, -etad])
        esB, _edsB, stB = sm.rollout_adaptive(
            etaB, etadB, u_m, t_eval, rtol=1e-6, atol=1e-12
        )
        for b in (0, 1):
            es, _eds, st = sm.rollout_adaptive(
                etaB[b], etadB[b], u_m, t_eval, rtol=1e-6, atol=1e-12
            )
            assert int(stB.n_accepted[b]) == int(st.n_accepted)
            np.testing.assert_allclose(
                np.asarray(esB[:, b]), np.asarray(es),
                atol=1e-12 * float(jnp.abs(es).max()),
            )


class TestSimulateSharded:
    """The sharded facade (`parallel.simulate_sharded`): the single-chip
    `simulate()` contract (reduced [q; v] in, SimulationResult out,
    ForceParams auto-wired) over the sp mesh axis."""

    @staticmethod
    def _model(force_params=None):
        return DynamicEulerBernoulliBeam(
            helpers.mixed_csv(14), force_params
        )

    def test_genalpha_matches_single_chip(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = self._model()
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        u = jnp.zeros(n).at[n - 2].set(0.05)
        mesh = make_mesh({"sp": 8})
        res_s = simulate_sharded(
            model, x0, 4e-4, 1e-4, mesh, method="generalized_alpha",
            u=u, substeps=4, rho_inf=0.8, n_newton=2,
        )
        res_1 = simulate(
            model, x0, 4e-4, 1e-4, method="generalized_alpha", u=u,
            substeps=4, rho_inf=0.8, n_newton=2,
        )
        assert res_s.ys.shape == res_1.ys.shape == (5, 2 * n)
        np.testing.assert_allclose(np.asarray(res_s.ts),
                                   np.asarray(res_1.ts), atol=1e-15)
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys),
            atol=1e-9 * scale,
        )

    def test_force_params_auto_wiring(self):
        from continuum_robot_tpu.models.config import ForceParams
        from continuum_robot_tpu.parallel import simulate_sharded

        mesh = make_mesh({"sp": 8})
        n = None
        runs = {}
        for key, model, kw in (
            ("auto", self._model(ForceParams(
                fluid_density=1000.0, enable_fluid_effects=True,
                gravity_vector=[0.0, -9.81, 0.0],
                enable_gravity_effects=True,
            )), {}),
            ("explicit", self._model(),
             dict(fluid_density=1000.0, gravity=(0.0, -9.81, 0.0))),
            ("none", self._model(), {}),
        ):
            n = model.n_pos_states
            x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
            res = simulate_sharded(
                model, x0, 2e-4, 1e-4, mesh,
                method="generalized_alpha", substeps=2, **kw,
            )
            runs[key] = np.asarray(res.ys)
        scale = np.abs(runs["explicit"]).max()
        np.testing.assert_allclose(runs["auto"], runs["explicit"],
                                   atol=1e-14 * scale)
        # and the forces actually act: gravity bends the beam
        assert np.abs(runs["auto"] - runs["none"]).max() > 1e-12 * scale

    def test_adaptive_batched_stats(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model = self._model()
        n = model.n_pos_states
        x0 = np.zeros((2, 2 * n))
        x0[0, n - 2] = 2e-4
        x0[1, n - 2] = 4e-4
        mesh = make_mesh({"dp": 2, "sp": 4})
        res = simulate_sharded(
            model, jnp.asarray(x0), 4e-4, 2e-4, mesh, method="sdirk3",
            rtol=1e-5, atol=1e-8,
        )
        assert res.ys.shape == (2, 3, 2 * n)
        assert np.all(np.isfinite(np.asarray(res.ys)))
        assert res.stats is not None
        acc = np.asarray(res.stats.n_accepted)
        assert acc.shape == (2,) and np.all(acc > 0)
        # per-env trajectories differ (distinct initial conditions)
        assert not np.allclose(np.asarray(res.ys[0]),
                               np.asarray(res.ys[1]))

    def test_rk4_runs(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model = self._model()
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(1e-4)
        mesh = make_mesh({"sp": 8})
        res = simulate_sharded(model, x0, 2e-6, 1e-6, mesh, method="rk4",
                               substeps=2)
        assert res.ys.shape == (3, 2 * n)
        assert np.all(np.isfinite(np.asarray(res.ys)))

    def test_error_contracts(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model = self._model()
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n)
        mesh = make_mesh({"sp": 8})
        with pytest.raises(ValueError, match="Unknown sharded method"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh, method="lsoda")
        with pytest.raises(ValueError, match="constant reduced force"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh,
                             u=lambda t: 0.0)
        with pytest.raises(ValueError, match="at most one leading"):
            simulate_sharded(model, jnp.zeros((2, 2, 2 * n)), 1e-4,
                             1e-4, mesh)
        with pytest.raises(ValueError, match="shape"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh,
                             u=jnp.zeros(3))


class TestSpatialNodeForce:
    """Custom nodewise external forces on the sharded implicit tier.

    `node_force(x, t)` (node layout, evaluated inside shard_map) must
    reproduce the single-chip engines' `external_force(x_red, t)`
    treatment exactly: residual-only at the alpha point / stage states,
    lagged in the Jacobian. The force used mixes state feedback (spring +
    damper on w) with explicit time dependence (harmonic drive), so the
    time-threading of every engine is exercised too.
    """

    K_W, C_W, AMP, OMEGA = 40.0, 0.8, 0.03, 2500.0

    @classmethod
    def _node_force(cls):
        k, c, A, w = cls.K_W, cls.C_W, cls.AMP, cls.OMEGA

        def nf(x, t):
            q, v = x[0], x[1]
            f = jnp.zeros_like(q)
            return f.at[:, 1].set(
                -k * q[:, 1] - c * v[:, 1] + A * jnp.sin(w * t)
            )

        return nf

    @classmethod
    def _forces_func(cls, model):
        free = np.asarray(model.beam_model.bc_info.free_dofs)
        iw = jnp.asarray((free % 3 == 1).astype(float))
        k, c, A, w = cls.K_W, cls.C_W, cls.AMP, cls.OMEGA
        n = len(free)

        def ff(x, t):
            q, v = x[..., :n], x[..., n:]
            return iw * (-k * q - c * v + A * jnp.sin(w * t))

        return ff

    def _run_pair(self, method, **kw):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        u = jnp.zeros(n).at[n - 2].set(0.05)
        mesh = make_mesh({"sp": 8})
        res_s = simulate_sharded(
            model, x0, 4e-4, 1e-4, mesh, method=method, u=u,
            node_force=self._node_force(), **kw,
        )
        res_1 = simulate(
            model, x0, 4e-4, 1e-4, method=method, u=u,
            forces_func=self._forces_func(model), **kw,
        )
        return res_s, res_1

    def test_genalpha_matches_single_chip(self):
        res_s, res_1 = self._run_pair(
            "generalized_alpha", substeps=4, rho_inf=0.8, n_newton=2,
        )
        scale = float(jnp.abs(res_1.ys).max())
        assert scale > 0
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys),
            atol=1e-9 * scale,
        )
        # the force actually acts: drop it and the trajectory moves
        from continuum_robot_tpu.models.simulate import simulate

        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        u = jnp.zeros(n).at[n - 2].set(0.05)
        res_0 = simulate(model, x0, 4e-4, 1e-4,
                         method="generalized_alpha", u=u, substeps=4,
                         rho_inf=0.8, n_newton=2)
        assert float(jnp.abs(res_1.ys - res_0.ys).max()) > 1e-8 * scale

    def test_sdirk3_matches_single_chip(self):
        res_s, res_1 = self._run_pair("sdirk3", rtol=1e-6, atol=1e-9)
        assert int(np.asarray(res_s.stats.n_accepted)) == int(
            np.asarray(res_1.stats.n_accepted)
        )
        assert int(np.asarray(res_s.stats.n_rejected)) == int(
            np.asarray(res_1.stats.n_rejected)
        )
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys),
            atol=1e-8 * scale,
        )

    def test_adaptive_genalpha_matches_single_chip(self):
        res_s, res_1 = self._run_pair(
            "generalized_alpha_adaptive", rtol=1e-6, atol=1e-9,
            rho_inf=0.9,
        )
        assert int(np.asarray(res_s.stats.n_accepted)) == int(
            np.asarray(res_1.stats.n_accepted)
        )
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys),
            atol=1e-8 * scale,
        )

    def test_rk4_matches_single_chip(self):
        """node_force on the explicit sharded RHS == single-chip rk4
        with the equivalent reduced forces_func (CG-tolerance bound)."""
        res_s, res_1 = self._run_pair("rk4", substeps=2)
        scale = float(jnp.abs(res_1.ys).max())
        assert scale > 0
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys),
            atol=1e-6 * scale,
        )


class TestSimulateShardedModal:
    """The facade's modal tier: `simulate()` contract over sp for
    method='modal'/'modal_rom'/'modal_rom_adaptive' (VERDICT r2 item 7)."""

    def test_modal_matches_single_chip(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        u = jnp.zeros(n).at[n - 2].set(0.05)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="modal", u=u, substeps=4, rho_inf=0.9)
        res_s = simulate_sharded(model, x0, 4e-4, 1e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 1e-4, **kw)
        assert res_s.ys.shape == res_1.ys.shape == (5, 2 * n)
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys), atol=1e-10 * scale)

    def test_modal_rayleigh_matches_single_chip(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="modal", substeps=4, rayleigh=(4.0, 1e-7))
        res_s = simulate_sharded(model, x0, 4e-4, 1e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 1e-4, **kw)
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys), atol=1e-10 * scale)

    def test_modal_rom_matches_single_chip(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        u = jnp.zeros(n).at[n - 2].set(0.05)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="modal_rom", u=u, substeps=4, rho_inf=0.8,
                  n_newton=2)
        res_s = simulate_sharded(model, x0, 4e-4, 1e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 1e-4, **kw)
        assert res_s.ys.shape == res_1.ys.shape
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys), atol=1e-9 * scale)

    def test_modal_rom_truncated_batched(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        n = model.n_pos_states
        x0 = np.zeros((2, 2 * n))
        x0[0, n - 2] = 2e-4
        x0[1, n - 2] = -1e-4
        mesh = make_mesh({"dp": 2, "sp": 4})
        res_s = simulate_sharded(
            model, jnp.asarray(x0), 4e-4, 2e-4, mesh, method="modal_rom",
            substeps=2, n_modes=12,
        )
        assert res_s.ys.shape == (2, 3, 2 * n)
        for b in (0, 1):
            res_1 = simulate(
                model, jnp.asarray(x0[b]), 4e-4, 2e-4, method="modal_rom",
                substeps=2, n_modes=12,
            )
            scale = float(jnp.abs(res_1.ys).max())
            np.testing.assert_allclose(
                np.asarray(res_s.ys[b]), np.asarray(res_1.ys),
                atol=1e-9 * scale)

    def test_modal_rom_adaptive_matches_single_chip(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="modal_rom_adaptive", rtol=1e-6, atol=1e-12)
        res_s = simulate_sharded(model, x0, 4e-4, 2e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 2e-4, **kw)
        assert res_s.stats is not None
        assert int(np.asarray(res_s.stats.n_accepted)) == int(
            np.asarray(res_1.stats.n_accepted))
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys), atol=1e-9 * scale)

    def test_modal_power_engine_matches_single_chip(self):
        """engine='power' (composed propagator) through the sharded facade
        == simulate(engine='power') == the sharded XLA stepper (roundoff
        of the host-composed coefficients)."""
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        u = jnp.zeros(n).at[n - 2].set(0.05)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="modal", u=u, substeps=8, rho_inf=0.9)
        res_p = simulate_sharded(model, x0, 4e-4, 1e-4, mesh,
                                 engine="power", **kw)
        res_1 = simulate(model, x0, 4e-4, 1e-4, engine="power", **kw)
        res_x = simulate_sharded(model, x0, 4e-4, 1e-4, mesh, **kw)
        assert res_p.ys.shape == res_1.ys.shape == (5, 2 * n)
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_p.ys), np.asarray(res_1.ys), atol=1e-12 * scale)
        np.testing.assert_allclose(
            np.asarray(res_p.ys), np.asarray(res_x.ys), atol=1e-9 * scale)

    def test_modal_power_piecewise_constant(self):
        """The tip-impulse workload shape (PiecewiseConstant) rides
        engine='power' through the sharded facade, matching simulate()."""
        from continuum_robot_tpu.models.simulate import (
            PiecewiseConstant,
            simulate,
        )
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n)
        vals = np.zeros((2, n))
        vals[0, n - 2] = 0.05  # held 0.25 ms, then released
        u = PiecewiseConstant((2.5e-4,), vals)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="modal", u=u, substeps=8, rho_inf=0.9)
        res_p = simulate_sharded(model, x0, 6e-4, 1e-4, mesh,
                                 engine="power", **kw)
        res_1 = simulate(model, x0, 6e-4, 1e-4, engine="power", **kw)
        scale = float(jnp.abs(res_1.ys).max())
        assert scale > 0
        np.testing.assert_allclose(
            np.asarray(res_p.ys), np.asarray(res_1.ys), atol=1e-12 * scale)

    def test_modal_pallas_engine_matches_single_chip(self):
        """engine='pallas' (fused whole-span kernel, interpreted on CPU)
        through the sharded facade matches the XLA stepper."""
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.linear_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="modal", substeps=4, rho_inf=0.9)
        res_p = simulate_sharded(model, x0, 4e-4, 1e-4, mesh,
                                 engine="pallas", **kw)
        res_x = simulate_sharded(model, x0, 4e-4, 1e-4, mesh, **kw)
        scale = float(jnp.abs(res_x.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_p.ys), np.asarray(res_x.ys), atol=1e-9 * scale)

    def test_engine_error_contracts(self):
        from continuum_robot_tpu.models.simulate import PiecewiseConstant
        from continuum_robot_tpu.parallel import simulate_sharded

        mesh = make_mesh({"sp": 8})
        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n)
        with pytest.raises(ValueError, match="Unknown engine"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh, method="modal",
                             engine="cuda")
        with pytest.raises(ValueError, match="method='modal'"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh, method="modal_rom",
                             engine="power")
        with pytest.raises(ValueError, match="modal stepping engine"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh,
                             method="generalized_alpha", engine="power")
        # PiecewiseConstant is power-only (the XLA stepper path keeps the
        # constant-vector contract).
        vals = np.zeros((2, n))
        u = PiecewiseConstant((5e-5,), vals)
        with pytest.raises(ValueError, match="PiecewiseConstant"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh, method="modal",
                             u=u)

    def test_error_contracts(self):
        from continuum_robot_tpu.models.config import ForceParams
        from continuum_robot_tpu.parallel import simulate_sharded

        mesh = make_mesh({"sp": 8})
        model = DynamicEulerBernoulliBeam(helpers.mixed_csv(14))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n)
        with pytest.raises(ValueError, match="force registry"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh, method="modal_rom",
                             fluid_density=1000.0)
        # Registry-registered fluid forces RIDE the sharded ROM tier
        # (round 4; parity coverage in test_sharding_modal_forces.py) —
        # only the linear modal method still refuses them.
        fp_model = DynamicEulerBernoulliBeam(
            helpers.mixed_csv(14, include_fluid=True),
            ForceParams(fluid_density=1000.0, enable_fluid_effects=True),
        )
        with pytest.raises(ValueError, match="no fluid/gravity"):
            simulate_sharded(fp_model, x0, 1e-4, 1e-4, mesh,
                             method="modal")
        with pytest.raises(ValueError, match="node_force"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh, method="modal_rom",
                             node_force=lambda x, t: x[0])
        with pytest.raises(ValueError, match="rayleigh"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh,
                             method="generalized_alpha", rayleigh=(1.0, 0.0))
        with pytest.raises(ValueError, match="parity element"):
            simulate_sharded(model, x0, 1e-4, 1e-4, mesh, method="modal_rom",
                             use_consistent=True)


class TestCgIncompleteStat:
    """CG iteration-cap hits are COUNTED, not silent (VERDICT r2 item 6c):
    the explicit tier's analogue of AdaptiveStats.n_incomplete."""

    @staticmethod
    def _setup(n_el=10):
        from continuum_robot_tpu.parallel import reduced_to_node_layout

        csv = helpers.write_beam_csv(["linear"] * n_el)
        model = DynamicEulerBernoulliBeam(csv)
        n = model.n_pos_states
        x0 = np.zeros(2 * n)
        x0[n - 2] = 1e-4
        mesh = make_mesh({"sp": 8})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        return model, beam, reduced_to_node_layout(model, x0, beam.n_nodes)

    def test_converged_counts_zero_and_matches_plain(self):
        from continuum_robot_tpu.parallel import spatial_rollout

        _, beam, x0_sp = self._setup()
        ts, xs, stats = spatial_rollout(
            beam, x0_sp, 0.002, 0.001, substeps=10, cg_iters=40,
            cg_tol=1e-8, cg_stats=True,
        )
        assert int(np.asarray(stats["cg_incomplete"])) == 0
        assert stats["cg_evals"] == 4 * 2 * 10
        ts2, xs2 = spatial_rollout(
            beam, x0_sp, 0.002, 0.001, substeps=10, cg_iters=40,
            cg_tol=1e-8,
        )
        np.testing.assert_array_equal(np.asarray(xs), np.asarray(xs2))

    def test_cap_hit_is_counted(self):
        from continuum_robot_tpu.parallel import spatial_rollout

        _, beam, x0_sp = self._setup()
        # cg_iters=1 cannot reach 1e-12 on a 31-node mass solve.
        _, _, stats = spatial_rollout(
            beam, x0_sp, 0.002, 0.001, substeps=5, cg_iters=1,
            cg_tol=1e-12, cg_stats=True,
        )
        n_inc = int(np.asarray(stats["cg_incomplete"]))
        assert n_inc > 0
        assert n_inc <= stats["cg_evals"]

    def test_with_info_requires_tolerance_stop(self):
        from continuum_robot_tpu.parallel import build_spatial_rhs

        _, beam, _ = self._setup()
        with pytest.raises(ValueError, match="with_info"):
            build_spatial_rhs(beam, cg_tol=None, with_info=True)

    def test_facade_rk4_carries_stats(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(helpers.write_beam_csv(
            ["linear"] * 10))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(1e-4)
        mesh = make_mesh({"sp": 8})
        res = simulate_sharded(model, x0, 2e-6, 1e-6, mesh, method="rk4",
                               substeps=2)
        assert res.stats is not None
        assert int(np.asarray(res.stats["cg_incomplete"])) == 0

    def test_batched_per_env_counts(self):
        from continuum_robot_tpu.parallel import (
            reduced_to_node_layout,
            spatial_rollout,
        )

        csv = helpers.write_beam_csv(["linear"] * 10)
        model = DynamicEulerBernoulliBeam(csv)
        n = model.n_pos_states
        x0 = np.zeros((2, 2 * n))
        x0[:, n - 2] = 1e-4
        mesh = make_mesh({"dp": 2, "sp": 4})
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh,
        )
        x0_sp = reduced_to_node_layout(model, jnp.asarray(x0), beam.n_nodes)
        _, xs, stats = spatial_rollout(
            beam, x0_sp, 0.002, 0.001, substeps=5, cg_iters=40,
            cg_tol=1e-8, cg_stats=True,
        )
        assert np.asarray(stats["cg_incomplete"]).shape == (2,)
        assert xs.shape[1] == 2


class TestShardedScaleParity:
    """Sharded == unsharded at REALISTIC scale (VERDICT r2 item 6a).

    Earlier parity tests shard 6-16 element beams (1-2 nodes per shard on
    the 8-device fake mesh); these run 240 elements — 30 nodes per shard,
    the regime the halo/SPIKE/interface machinery actually exists for —
    so partition-boundary bookkeeping errors that vanish on toy meshes
    have room to show up.
    """

    N_EL = 240

    def test_spike_genalpha_240_elements(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["linear"] * self.N_EL))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        u = jnp.zeros(n).at[n - 2].set(0.05)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="generalized_alpha", u=u, substeps=2,
                  rho_inf=0.8, n_newton=2)
        res_s = simulate_sharded(model, x0, 4e-4, 2e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 2e-4,
                         linear_solver="dense_inv", **kw)
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys), atol=1e-8 * scale)

    def test_spike_sdirk3_240_elements_counters(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["linear"] * self.N_EL))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="sdirk3", rtol=1e-5, atol=1e-8)
        res_s = simulate_sharded(model, x0, 4e-4, 2e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 2e-4,
                         linear_solver="dense_inv", **kw)
        assert int(np.asarray(res_s.stats.n_accepted)) == int(
            np.asarray(res_1.stats.n_accepted))
        assert int(np.asarray(res_s.stats.n_rejected)) == int(
            np.asarray(res_1.stats.n_rejected))
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys), atol=1e-7 * scale)

    def test_sharded_rom_240_elements(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        types = ["linear"] * (self.N_EL // 2) + \
            ["nonlinear"] * (self.N_EL // 2)
        model = DynamicEulerBernoulliBeam(helpers.write_beam_csv(types))
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n).at[n - 2].set(2e-4)
        u = jnp.zeros(n).at[n - 2].set(0.05)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="modal_rom", u=u, substeps=2, n_modes=24,
                  n_newton=2)
        res_s = simulate_sharded(model, x0, 4e-4, 2e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 2e-4, **kw)
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys), atol=1e-8 * scale)


class TestShardedF32Parity:
    """f32 variants of the scale-parity tests (VERDICT r3 item 8).

    The hardware benches run f32 while this suite validates in f64 — a
    precision-sensitivity bug in the SPIKE/halo/interface machinery would
    only ever surface on the TPU. These pin sharded == dense at f32 with
    conditioning-aware tolerances (both sides carry f32 roundoff amplified
    by the effective-Jacobian conditioning; bounds pinned at ~3x measured),
    and bound a bench-shaped nonlinear f32 span so an f32-specific
    instability in the distributed implicit path fails HERE, not only on
    hardware.
    """

    N_EL = 240

    @staticmethod
    def _f32(a):
        return jnp.asarray(np.asarray(a), jnp.float32)

    def test_spike_genalpha_240_elements_f32(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["linear"] * self.N_EL))
        n = model.n_pos_states
        x0 = self._f32(np.zeros(2 * n))
        x0 = x0.at[n - 2].set(2e-4)
        u = self._f32(np.zeros(n))
        u = u.at[n - 2].set(0.05)
        kw = dict(method="generalized_alpha", u=u, substeps=2,
                  rho_inf=0.8, n_newton=2)
        mesh = make_mesh({"sp": 8})
        res_s = simulate_sharded(model, x0, 4e-4, 2e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 2e-4,
                         linear_solver="dense_inv", **kw)
        assert np.asarray(res_s.ys).dtype == np.float32
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys),
            atol=3e-4 * scale)

    def test_spike_sdirk3_240_elements_f32(self):
        from continuum_robot_tpu.models.simulate import simulate
        from continuum_robot_tpu.parallel import simulate_sharded

        model = DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["linear"] * self.N_EL))
        n = model.n_pos_states
        x0 = self._f32(np.zeros(2 * n))
        x0 = x0.at[n - 2].set(2e-4)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="sdirk3", rtol=1e-4, atol=1e-7)
        res_s = simulate_sharded(model, x0, 4e-4, 2e-4, mesh, **kw)
        res_1 = simulate(model, x0, 4e-4, 2e-4,
                         linear_solver="dense_inv", **kw)
        assert np.asarray(res_s.ys).dtype == np.float32
        scale = float(jnp.abs(res_1.ys).max())
        np.testing.assert_allclose(
            np.asarray(res_s.ys), np.asarray(res_1.ys),
            atol=3e-3 * scale)

    def test_nonlinear_spike_f32_bench_shape_stays_bounded(self):
        """The bench row's workload shape (nonlinear beam, SPIKE gen-alpha,
        f32, tiny-noise ICs, constant tip force, modified Newton n=2,
        rho_inf=0.5) at suite scale: a long f32 span must stay finite and
        bounded — the CPU-side regression for the round-3 FAILED hardware
        row.

        Disposition of that row (root-caused round 4 via this test's
        first, parity-element version, which blew up HERE off-hardware):
        the reference-parity von Karman polynomials are non-conservative
        (f != dU/dq, a preserved reference quirk) and under a sustained
        tip load that ODE is GENUINELY unstable — the reference itself,
        dopri5 at rtol=1e-8, the dense gen-alpha, and the sharded SPIKE
        engine diverge on the same trajectory (engine-independent to 1e-7;
        tools/repros/diag_nl_matrix.py / diag_nl_reference.py). The
        benchmark therefore integrates the variationally CONSISTENT
        element (stable, same cubic cost class; bench.py BENCH_CONSISTENT)
        and so does this regression."""
        from jax.sharding import Mesh

        from continuum_robot_tpu.parallel.facade import _node_force
        from continuum_robot_tpu.parallel.spatial_implicit import (
            build_spatial_genalpha,
        )

        model = DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["nonlinear"] * self.N_EL),
            use_consistent_nonlinear=True)
        n = model.n_pos_states
        mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh, axis="sp",
        )
        Np = beam.n_nodes
        roll = build_spatial_genalpha(beam, 1e-4, rho_inf=0.5, n_newton=2,
                                      use_consistent=True)
        bc = model.beam_model.bc_info
        free = np.asarray(bc.free_dofs)
        n_full = bc.n_dofs_full
        nn = n_full // 3
        rng = np.random.default_rng(0)
        B = 2
        qf = np.zeros((B, n_full), np.float32)
        qf[:, free] = rng.normal(scale=1e-6, size=(B, n))
        x0 = np.zeros((B, 2, Np, 3), np.float32)
        x0[:, 0, :nn, :] = qf.reshape(B, nn, 3)
        u_red = np.zeros(n, np.float32)
        u_red[-2] = 0.1
        u_node = _node_force(model, u_red, Np, jnp.float32)
        # 600 steps in 3 exact-carry chunks (the chunked driver is the
        # hardware workaround; equivalence with the monolithic span is
        # pinned in TestShardedChunkedCarry).
        x = jnp.asarray(x0)
        run = jax.jit(lambda s: roll(
            s, 1, u=u_node, substeps=200, return_carry=True)[2])
        for _ in range(3):
            x = run(x)
            xh = np.asarray(x)
            assert np.isfinite(xh).all()
        # Bounded: the tip load is static after the transient; state must
        # stay at the physical response scale, not grow exponentially.
        assert float(np.abs(xh[:, 0]).max()) < 1.0
        assert float(np.abs(xh[:, 1]).max()) < 100.0


class TestSpikeLocalSolvers:
    """The three within-shard solve algorithms are exact and agree.

    ``spike_prepare(local_solver=)`` offers Thomas scans (default), block
    cyclic reduction, and a trace-time dense local inverse. All three are
    algebraically the same solve; 'cr' and 'dense' exist because the
    all-scan program shape is the axon TPU backend's batched-fusion
    miscompile trigger (docs/design.md pitfall 4 — batched output !=
    per-env output of the same jitted program while every component is
    individually correct; substituting any one scan-lowered operator
    restores correctness). These pin the substitutes to the Thomas
    reference off-hardware so the hardware dial only changes lowering,
    never semantics.
    """

    N_EL = 240

    def _nl_setup(self):
        model = DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["nonlinear"] * self.N_EL),
            use_consistent_nonlinear=True)
        n = model.n_pos_states
        x0 = jnp.zeros(2 * n, jnp.float32).at[n - 2].set(2e-4)
        u = jnp.zeros(n, jnp.float32).at[n - 2].set(0.05)
        return model, x0, u

    def test_local_solvers_agree_nonlinear_f32(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model, x0, u = self._nl_setup()
        mesh = make_mesh({"sp": 8})
        kw = dict(method="generalized_alpha", u=u, substeps=4,
                  rho_inf=0.5, n_newton=2, use_consistent=True)
        ys = {}
        for solver in ("thomas", "cr", "dense"):
            res = simulate_sharded(model, x0, 8e-4, 4e-4, mesh,
                                   local_solver=solver, **kw)
            ys[solver] = np.asarray(res.ys)
            assert np.isfinite(ys[solver]).all()
        scale = float(np.abs(ys["thomas"]).max())
        np.testing.assert_allclose(ys["cr"], ys["thomas"],
                                   atol=1e-4 * scale)
        np.testing.assert_allclose(ys["dense"], ys["thomas"],
                                   atol=1e-4 * scale)

    def test_local_solvers_exact_f64(self):
        """At f64 the three lowerings agree to solver roundoff (~1e-11)."""
        from continuum_robot_tpu.parallel import simulate_sharded

        model, x0, u = self._nl_setup()
        x0 = jnp.asarray(np.asarray(x0), jnp.float64)
        u = jnp.asarray(np.asarray(u), jnp.float64)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="generalized_alpha", u=u, substeps=2,
                  rho_inf=0.5, n_newton=2, use_consistent=True)
        res_t = simulate_sharded(model, x0, 4e-4, 4e-4, mesh,
                                 local_solver="thomas", **kw)
        scale = float(jnp.abs(res_t.ys).max())
        for solver in ("cr", "dense"):
            res = simulate_sharded(model, x0, 4e-4, 4e-4, mesh,
                                   local_solver=solver, **kw)
            np.testing.assert_allclose(
                np.asarray(res.ys), np.asarray(res_t.ys),
                atol=1e-9 * scale)

    def test_adaptive_dense_local_solver(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model, x0, u = self._nl_setup()
        mesh = make_mesh({"sp": 8})
        res = simulate_sharded(
            model, x0, 4e-4, 2e-4, mesh,
            method="generalized_alpha_adaptive", u=u, rtol=1e-4,
            atol=1e-7, use_consistent=True, local_solver="dense",
        )
        assert np.isfinite(np.asarray(res.ys)).all()
        assert int(res.stats.n_incomplete) == 0

    def test_local_solver_validation(self):
        from continuum_robot_tpu.parallel import simulate_sharded
        from continuum_robot_tpu.parallel.spatial_implicit import (
            spike_prepare,
        )

        model, x0, u = self._nl_setup()
        mesh = make_mesh({"sp": 8})
        with pytest.raises(ValueError, match="local_solver"):
            simulate_sharded(model, x0, 4e-4, 2e-4, mesh, method="rk4",
                             local_solver="dense")
        eye = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        with pytest.raises(ValueError, match="local_solver"):
            spike_prepare(eye, eye, eye, "sp", 1, local_solver="qr")


class TestShardedChunkedCarry:
    """return_carry chunked driving == the monolithic span, bit-for-bit
    (the exact-continuation API behind tools/repros/repro_sharded_nl.py
    and long-span driving on execution-watchdog-limited stacks)."""

    def test_chunked_equals_monolithic(self):
        from jax.sharding import Mesh

        from continuum_robot_tpu.parallel.facade import _node_force
        from continuum_robot_tpu.parallel.spatial_implicit import (
            build_spatial_genalpha,
        )

        model = DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["nonlinear"] * 24))
        n = model.n_pos_states
        mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh, axis="sp",
        )
        Np = beam.n_nodes
        roll = build_spatial_genalpha(beam, 1e-4, rho_inf=0.5, n_newton=2)
        bc = model.beam_model.bc_info
        free = np.asarray(bc.free_dofs)
        n_full = bc.n_dofs_full
        nn = n_full // 3
        rng = np.random.default_rng(1)
        qf = np.zeros(n_full)
        qf[free] = rng.normal(scale=1e-5, size=n)
        x0 = np.zeros((2, Np, 3))
        x0[0, :nn, :] = qf.reshape(nn, 3)
        u_red = np.zeros(n)
        u_red[-2] = 0.05
        u_node = _node_force(model, u_red, Np, x0.dtype)

        # Monolithic: 30 steps in one call.
        _, xs = roll(jnp.asarray(x0), 1, u=u_node, substeps=30)
        x_mono = np.asarray(xs[-1])

        # Chunked: 3 x 10 steps with the (q, v, a) carry threaded.
        x = jnp.asarray(x0)
        for k in range(3):
            _, xs_c, x = roll(x, 1, u=u_node, substeps=10,
                              return_carry=True, t0=k * 10 * 1e-4)
        np.testing.assert_array_equal(np.asarray(x)[:2], x_mono)

    def test_reset_differs_from_carry(self):
        """Restarting chunks WITHOUT the accel carry (the old repro
        pattern) is a genuinely different recurrence — this pins that the
        distinction the carry API exists for is real."""
        from jax.sharding import Mesh

        from continuum_robot_tpu.parallel.facade import _node_force
        from continuum_robot_tpu.parallel.spatial_implicit import (
            build_spatial_genalpha,
        )

        model = DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["nonlinear"] * 24))
        n = model.n_pos_states
        mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
        beam = make_spatial_beam(
            model.beam_model.arrays,
            model.beam_model.bc_info.free_mask.reshape(-1, 3),
            mesh, axis="sp",
        )
        Np = beam.n_nodes
        roll = build_spatial_genalpha(beam, 1e-4, rho_inf=0.5, n_newton=2)
        bc = model.beam_model.bc_info
        free = np.asarray(bc.free_dofs)
        n_full = bc.n_dofs_full
        nn = n_full // 3
        rng = np.random.default_rng(1)
        qf = np.zeros(n_full)
        qf[free] = rng.normal(scale=1e-5, size=n)
        x0 = np.zeros((2, Np, 3))
        x0[0, :nn, :] = qf.reshape(nn, 3)
        u_red = np.zeros(n)
        u_red[-2] = 0.05
        u_node = _node_force(model, u_red, Np, x0.dtype)

        x_carry = jnp.asarray(x0)
        for _ in range(3):
            _, _, x_carry = roll(x_carry, 1, u=u_node, substeps=10,
                                 return_carry=True)
        x_reset = jnp.asarray(x0)
        for _ in range(3):
            _, xs_r = roll(x_reset, 1, u=u_node, substeps=10)
            x_reset = xs_r[-1]
        d = np.abs(np.asarray(x_carry)[:2] - np.asarray(x_reset)).max()
        assert d > 0.0


class TestShardedFacadeChunked:
    """simulate_sharded(chunk=N) == the monolithic adaptive drive.

    The sharded half of the chunked-driving API (VERDICT r3 item 7; the
    single-chip half is tests/test_simulate_chunked.py): the controller
    proposal (stats.dt_next) and — for generalized-alpha — the 3-plane
    algorithmic carry thread through chunk boundaries, so the error-
    controlled recurrence replays bit-for-bit.
    """

    def _model(self, n_el=24):
        return DynamicEulerBernoulliBeam(
            helpers.write_beam_csv(["nonlinear"] * n_el))

    def _x0_u(self, model):
        n = model.n_pos_states
        x0 = np.zeros(2 * n)
        x0[n - 2] = 1e-4
        u = np.zeros(n)
        u[-2] = 0.05
        return x0, u

    def test_genalpha_adaptive_chunked(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model = self._model()
        x0, u = self._x0_u(model)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="generalized_alpha_adaptive", u=u, rtol=1e-5,
                  atol=1e-8, rho_inf=0.8, n_newton=2)
        res_m = simulate_sharded(model, x0, 10e-4, 2e-4, mesh, **kw)
        res_c = simulate_sharded(model, x0, 10e-4, 2e-4, mesh, chunk=2,
                                 **kw)
        np.testing.assert_array_equal(
            np.asarray(res_c.ys), np.asarray(res_m.ys))
        assert int(res_c.stats.n_accepted) == int(res_m.stats.n_accepted)
        assert int(res_c.stats.n_rejected) == int(res_m.stats.n_rejected)
        assert float(res_c.stats.dt_next) == float(res_m.stats.dt_next)

    def test_sdirk3_chunked(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model = self._model()
        x0, u = self._x0_u(model)
        mesh = make_mesh({"sp": 8})
        kw = dict(method="sdirk3", u=u, rtol=1e-5, atol=1e-8)
        res_m = simulate_sharded(model, x0, 10e-4, 2e-4, mesh, **kw)
        res_c = simulate_sharded(model, x0, 10e-4, 2e-4, mesh, chunk=3,
                                 **kw)
        np.testing.assert_array_equal(
            np.asarray(res_c.ys), np.asarray(res_m.ys))
        assert int(res_c.stats.n_accepted) == int(res_m.stats.n_accepted)

    def test_chunk_rejects_fixed_step(self):
        from continuum_robot_tpu.parallel import simulate_sharded

        model = self._model()
        x0, u = self._x0_u(model)
        mesh = make_mesh({"sp": 8})
        with pytest.raises(ValueError, match="adaptive"):
            simulate_sharded(model, x0, 10e-4, 2e-4, mesh,
                             method="generalized_alpha", u=u, chunk=2)
