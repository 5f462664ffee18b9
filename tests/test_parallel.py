import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.encodings.fourier import Barf
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.parallel import mesh as mesh_lib
from nerf_experiments_tpu.parallel import shard as shard_lib
from nerf_experiments_tpu.systems import barf as barf_sys

pytestmark = [pytest.mark.slow, pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)]


def _cfg():
    return barf_sys.BarfConfig(
        radiance=nerf_mlp.NerfMLPConfig(
            position_encoder=Barf(levels=4, scale=1.0),
            direction_encoder=Barf(levels=2, scale=1.0),
            n_hidden=1, hidden_dim=32, n_segments=2,
            learning_rate_decay_end=1000,
        ),
        n_training_images=4,
        samples_per_ray_radiance=16,
        uniform_sampling_strategy="equidistant",
    )


def _batch(key, b=64):
    ks = jax.random.split(key, 4)
    dirs = jax.random.normal(ks[0], (b, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return {
        "origs_raw": jax.random.normal(ks[1], (b, 3)),
        "origs_noisy": jax.random.normal(ks[1], (b, 3)),
        "dirs_raw": dirs,
        "dirs_noisy": dirs,
        "colors": jax.random.uniform(ks[2], (b, 2, 3)),
        "img_idx": jax.random.randint(ks[3], (b,), 0, 4),
        "pixel_width": jnp.full((b, 1), 0.005),
    }


class TestMesh:
    def test_make_mesh_shapes(self):
        m = mesh_lib.make_mesh()
        assert m.shape["data"] == 8 and m.shape["model"] == 1
        m2 = mesh_lib.make_mesh(n_data=4, n_model=2)
        assert m2.shape["data"] == 4 and m2.shape["model"] == 2

    def test_shard_params_model_axis(self):
        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        params = {"w": jnp.zeros((64, 256)), "b": jnp.zeros((3,))}
        sharded = mesh_lib.shard_params(params, m)
        # 256-wide output dim sharded over model axis
        assert "model" in str(sharded["w"].sharding.spec)
        assert sharded["b"].sharding.spec == jax.sharding.PartitionSpec()


class TestShardedTraining:
    def test_pjit_step_matches_single_device(self):
        cfg = _cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        tx = barf_sys.make_optimizer(cfg, state.params)
        batch = _batch(jax.random.PRNGKey(1))
        args = (jnp.asarray(4.0), jnp.asarray(2.0), jnp.asarray(0.0))

        # single-device reference trajectory
        step1 = barf_sys.make_train_step(cfg, tx, donate=False)
        s_ref = state
        for i in range(3):
            s_ref, m_ref = step1(s_ref, batch, jax.random.PRNGKey(42 + i), *args)

        # 8-way data-parallel trajectory on the same global batch
        m = mesh_lib.make_mesh()
        unjitted = lambda s, b, k, a, d, sg: barf_sys.train_step(s, cfg, tx, b, k, a, d, sg)
        stepN = shard_lib.pjit_train_step(unjitted, m, donate=False)
        s_par = barf_sys.init(jax.random.PRNGKey(0), cfg)
        s_par = s_par.replace(params=mesh_lib.shard_params(s_par.params, m))
        batch_sharded = mesh_lib.shard_batch(batch, m)
        for i in range(3):
            s_par, m_par = stepN(s_par, batch_sharded, jax.random.PRNGKey(42 + i), *args)

        for a, b_ in zip(
            jax.tree_util.tree_leaves(s_ref.params), jax.tree_util.tree_leaves(s_par.params)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)

    def test_shard_map_fused_megakernel_matches_single_device(self):
        # every device runs the Pallas training mega-kernel (interpret mode
        # on CPU) on its ray shard; pmean'd grads must reproduce the
        # single-device fused trajectory on the same global batch
        cfg = _cfg()
        assert barf_sys.can_fuse_train_step(cfg)
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        tx = barf_sys.make_optimizer(cfg, state.params)
        batch = _batch(jax.random.PRNGKey(1))
        args = (jnp.asarray(4.0), jnp.asarray(2.0), jnp.asarray(0.0))

        step1 = barf_sys.make_train_step(cfg, tx, donate=False, fused=True)
        s_ref = state
        for i in range(2):
            s_ref, _ = step1(s_ref, batch, jax.random.PRNGKey(42 + i), *args)

        m = mesh_lib.make_mesh()
        stepN = shard_lib.shard_map_train_step_fused(cfg, tx, m, donate=False)
        s_par = barf_sys.init(jax.random.PRNGKey(0), cfg)
        s_par = s_par.replace(params=mesh_lib.shard_params(s_par.params, m))
        batch_sharded = mesh_lib.shard_batch(batch, m)
        for i in range(2):
            s_par, m_par = stepN(s_par, batch_sharded, jax.random.PRNGKey(42 + i), *args)
        assert np.isfinite(float(m_par["loss"]))

        for a, b_ in zip(
            jax.tree_util.tree_leaves(s_ref.params),
            jax.tree_util.tree_leaves(s_par.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)

    def test_shard_map_step_runs(self):
        cfg = _cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        tx = barf_sys.make_optimizer(cfg, state.params)
        m = mesh_lib.make_mesh()

        def loss_fn(params, batch, key, a_pos, a_dir, sigma):
            return barf_sys.loss_fn(params, cfg, batch, key, a_pos, a_dir, sigma)

        step = shard_lib.shard_map_train_step(loss_fn, tx, m, n_scalar_args=4)
        batch = mesh_lib.shard_batch(_batch(jax.random.PRNGKey(1)), m)
        params, opt_state, loss, metrics = step(
            state.params, state.opt_state, batch,
            jax.random.PRNGKey(7), jnp.asarray(4.0), jnp.asarray(2.0), jnp.asarray(0.0),
        )
        assert np.isfinite(float(loss))
        assert bool(metrics["grads_finite"])

    def test_tensor_parallel_compiles(self):
        # 4-way data x 2-way model: hidden-dim-sharded weights, forward still exact
        cfg = _cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        m = mesh_lib.make_mesh(n_data=4, n_model=2)
        params_sh = mesh_lib.shard_params(state.params, m)
        batch = mesh_lib.shard_batch(_batch(jax.random.PRNGKey(1)), m)

        @jax.jit
        def fwd(params, batch):
            rgb, _ = barf_sys.forward(
                params, cfg, None, batch["origs_raw"], batch["dirs_raw"],
                batch["pixel_width"], jnp.asarray(4.0), jnp.asarray(2.0),
                stratified=False,
            )
            return rgb

        rgb_sharded = fwd(params_sh, batch)
        rgb_single = fwd(state.params, _batch(jax.random.PRNGKey(1)))
        np.testing.assert_allclose(
            np.asarray(rgb_sharded), np.asarray(rgb_single), atol=1e-5
        )


class TestShardedRender:
    def test_matches_single_device_render(self):
        cfg = _cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        m = mesh_lib.make_mesh()

        def fwd(params, o, d, pw):
            rgb, _ = barf_sys.forward(
                params, cfg, None, o, d, pw,
                jnp.asarray(4.0), jnp.asarray(2.0), stratified=False,
            )
            return rgb

        render = shard_lib.sharded_render(fwd, m)
        # deliberately NOT divisible by 8 to exercise the padding path
        b = _batch(jax.random.PRNGKey(1), b=100)
        out = render(state.params, b["origs_raw"], b["dirs_raw"], b["pixel_width"])
        ref = jax.jit(fwd)(state.params, b["origs_raw"], b["dirs_raw"], b["pixel_width"])
        assert out.shape == (100, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_16_virtual_devices_unsupported_gracefully(self):
        # make_mesh must reject mismatched device counts loudly
        with pytest.raises(AssertionError):
            mesh_lib.make_mesh(n_data=16, n_model=1, devices=jax.devices()[:8])


class TestHostAxis:
    """Multi-slice layout: an outer "host" axis rides DCN; rays shard over
    (host x data) jointly (SURVEY.md §2.6 "multi-slice later")."""

    def test_host_mesh_shapes_and_batch_sharding(self):
        m = mesh_lib.make_mesh(n_data=2, n_model=2, n_hosts=2)
        assert m.shape == {"host": 2, "data": 2, "model": 2}
        assert mesh_lib.data_axes(m) == ("host", "data")
        sh = mesh_lib.batch_sharding(m)
        x = jax.device_put(jnp.zeros((64, 3)), sh)
        # leading dim split over host*data = 4 ways
        assert len({s.index[0] for s in x.addressable_shards}) == 4

    def test_pjit_step_matches_single_device_on_host_mesh(self):
        cfg = _cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        tx = barf_sys.make_optimizer(cfg, state.params)
        batch = _batch(jax.random.PRNGKey(1))
        args = (jnp.asarray(4.0), jnp.asarray(2.0), jnp.asarray(0.0))

        step1 = barf_sys.make_train_step(cfg, tx, donate=False)
        s_ref, _ = step1(state, batch, jax.random.PRNGKey(42), *args)

        m = mesh_lib.make_mesh(n_data=2, n_model=2, n_hosts=2)
        unjitted = lambda s, b, k, a, d, sg: barf_sys.train_step(
            s, cfg, tx, b, k, a, d, sg)
        stepN = shard_lib.pjit_train_step(unjitted, m, donate=False)
        s_par = barf_sys.init(jax.random.PRNGKey(0), cfg)
        s_par = s_par.replace(params=mesh_lib.shard_params(s_par.params, m))
        s_par, _ = stepN(s_par, mesh_lib.shard_batch(batch, m),
                         jax.random.PRNGKey(42), *args)
        for a, b_ in zip(jax.tree_util.tree_leaves(s_ref.params),
                         jax.tree_util.tree_leaves(s_par.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)

    def test_sharded_render_on_host_mesh(self):
        cfg = _cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        m = mesh_lib.make_mesh(n_data=4, n_model=1, n_hosts=2)

        def fwd(params, o, d, pw):
            rgb, _ = barf_sys.forward(
                params, cfg, None, o, d, pw,
                jnp.asarray(4.0), jnp.asarray(2.0), stratified=False,
            )
            return rgb

        render = shard_lib.sharded_render(fwd, m)
        b = _batch(jax.random.PRNGKey(1), b=100)
        out = render(state.params, b["origs_raw"], b["dirs_raw"], b["pixel_width"])
        ref = jax.jit(fwd)(state.params, b["origs_raw"], b["dirs_raw"], b["pixel_width"])
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


class TestIngpDataParallel:
    """DP correctness for the hash-grid (INGP) system: replicated tables with
    scatter-add gradients must psum to the single-device trajectory
    (VERDICT r4 missing #5 — replicated-table correctness under psum).

    Semantics source: `/root/reference/3d-ingp/model.py:58-121` (table
    gather + multilinear interp; grads scatter-add into the table)."""

    def _ingp_cfg(self, encoder="gather"):
        from nerf_experiments_tpu.experiments.run_3d_ingp import IngpModelDef
        from nerf_experiments_tpu.models import ingp
        from nerf_experiments_tpu.encodings.fourier import Fourier
        from nerf_experiments_tpu.ops import hashgrid

        grid = hashgrid.HashGridConfig(
            dim=3, resolution_min=4, resolution_max=16,
            table_size=512, n_features=2, n_levels=2)
        model_cfg = ingp.NerfINGPConfig(
            grid=grid,
            direction_encoder=Fourier(levels=2, scale=1.0, space_dimensions=3),
            n_hidden=1, hidden_dim=32, encoder=encoder)
        model_def = IngpModelDef(cfg=model_cfg, learning_rate_decay_end=1000)
        return barf_sys.BarfConfig(
            radiance=model_def,
            proposal=model_def,
            n_training_images=4,
            samples_per_ray_radiance=16,
            samples_per_ray_proposal=8,
            uniform_sampling_strategy="equidistant",
            optimize_camera=False,
            adam_eps=1e-15, adam_b2=0.99,
        )

    @pytest.mark.parametrize("encoder", ["gather", "matmul", "rolled"])
    def test_ingp_pjit_step_matches_single_device(self, encoder):
        cfg = self._ingp_cfg(encoder)
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        tx = barf_sys.make_optimizer(cfg, state.params)
        batch = _batch(jax.random.PRNGKey(1))
        args = (jnp.asarray(4.0), jnp.asarray(2.0), jnp.asarray(0.0))

        step1 = barf_sys.make_train_step(cfg, tx, donate=False)
        s_ref = state
        for i in range(2):
            s_ref, _ = step1(s_ref, batch, jax.random.PRNGKey(42 + i), *args)

        m = mesh_lib.make_mesh()  # pure 8-way DP
        unjitted = lambda s, b, k, a, d, sg: barf_sys.train_step(
            s, cfg, tx, b, k, a, d, sg)
        stepN = shard_lib.pjit_train_step(unjitted, m, donate=False)
        s_par = barf_sys.init(jax.random.PRNGKey(0), cfg)
        s_par = s_par.replace(params=mesh_lib.shard_params(s_par.params, m))
        batch_sharded = mesh_lib.shard_batch(batch, m)
        for i in range(2):
            s_par, m_par = stepN(s_par, batch_sharded,
                                 jax.random.PRNGKey(42 + i), *args)
        assert np.isfinite(float(m_par["loss"]))

        # hash tables see scatter-add grads; the DP psum must reproduce the
        # single-device tables bit-for-bit up to reduction-order tolerance
        for a, b_ in zip(
            jax.tree_util.tree_leaves(s_ref.params),
            jax.tree_util.tree_leaves(s_par.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
