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
