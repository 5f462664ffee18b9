import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.encodings.fourier import Barf
from nerf_experiments_tpu.models import garf, nerf_mlp
from nerf_experiments_tpu.systems import barf as barf_sys
from nerf_experiments_tpu.systems import garf_system


def _tiny_mlp_cfg():
    return nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=4, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=2, scale=1.0, include_identity=True),
        n_hidden=1, hidden_dim=32, n_segments=2,
        learning_rate_start=5e-4, learning_rate_stop=1e-5,
        learning_rate_decay_end=1000,
    )


def _fake_batch(key, b=16, n_imgs=4, n_sigmas=2):
    ks = jax.random.split(key, 6)
    dirs = jax.random.normal(ks[1], (b, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return {
        "origs_raw": jax.random.normal(ks[0], (b, 3)),
        "origs_noisy": jax.random.normal(ks[2], (b, 3)),
        "dirs_raw": dirs,
        "dirs_noisy": dirs,
        "colors": jax.random.uniform(ks[3], (b, n_sigmas, 3)),
        "img_idx": jax.random.randint(ks[4], (b,), 0, n_imgs),
        "pixel_width": jnp.full((b, 1), 0.005),
    }


class TestBarfSystem:
    def _cfg(self, **kw):
        defaults = dict(
            radiance=_tiny_mlp_cfg(), n_training_images=4,
            samples_per_ray_radiance=16, samples_per_ray_proposal=0,
        )
        defaults.update(kw)
        return barf_sys.BarfConfig(**defaults)

    @pytest.mark.slow
    def test_forward_shapes(self):
        cfg = self._cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        batch = _fake_batch(jax.random.PRNGKey(1))
        rgb, coarse = barf_sys.forward(
            state.params, cfg, jax.random.PRNGKey(2),
            batch["origs_raw"], batch["dirs_raw"], batch["pixel_width"],
            alpha_pos=jnp.asarray(4.0), alpha_dir=jnp.asarray(2.0),
        )
        assert rgb.shape == (16, 3) and coarse is None

    @pytest.mark.slow
    def test_proposal_path(self):
        cfg = self._cfg(samples_per_ray_proposal=8, samples_per_ray_radiance=16)
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        batch = _fake_batch(jax.random.PRNGKey(1))
        rgb, coarse = barf_sys.forward(
            state.params, cfg, jax.random.PRNGKey(2),
            batch["origs_raw"], batch["dirs_raw"], batch["pixel_width"],
            alpha_pos=jnp.asarray(4.0), alpha_dir=jnp.asarray(2.0),
        )
        assert rgb.shape == (16, 3) and coarse.shape == (16, 3)

    def test_block_coarse_serving(self):
        # block=1 must equal the deterministic serving forward exactly;
        # block=4 shares coarse bins across blocks of 4 raster-neighbor
        # rays and must stay close on a smooth field (random-init net)
        cfg = self._cfg(samples_per_ray_proposal=8, samples_per_ray_radiance=16)
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        batch = _fake_batch(jax.random.PRNGKey(1))
        ref, _ = barf_sys.forward(
            state.params, cfg, None,
            batch["origs_raw"], batch["dirs_raw"], batch["pixel_width"],
            alpha_pos=jnp.asarray(4.0), alpha_dir=jnp.asarray(2.0),
            stratified=False,
        )
        b1 = barf_sys.render_block_coarse(
            state.params, cfg, batch["origs_raw"], batch["dirs_raw"],
            jnp.asarray(4.0), jnp.asarray(2.0), block=1)
        np.testing.assert_allclose(np.asarray(b1), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        # block=4: perturb dirs slightly within each block so neighbors are
        # coherent, as raster-order rays are
        dirs = jnp.repeat(batch["dirs_raw"][::4], 4, axis=0)
        dirs = dirs + 1e-3 * batch["dirs_raw"]
        origs = jnp.repeat(batch["origs_raw"][::4], 4, axis=0)
        ref4, _ = barf_sys.forward(
            state.params, cfg, None, origs, dirs, batch["pixel_width"],
            alpha_pos=jnp.asarray(4.0), alpha_dir=jnp.asarray(2.0),
            stratified=False,
        )
        b4 = barf_sys.render_block_coarse(
            state.params, cfg, origs, dirs,
            jnp.asarray(4.0), jnp.asarray(2.0), block=4)
        assert b4.shape == (16, 3)
        np.testing.assert_allclose(np.asarray(b4), np.asarray(ref4),
                                   atol=0.05, rtol=0.1)

    def test_train_step_reduces_loss_and_moves_camera(self):
        cfg = self._cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        tx = barf_sys.make_optimizer(cfg, state.params)
        step = barf_sys.make_train_step(cfg, tx, donate=False)
        batch = _fake_batch(jax.random.PRNGKey(1))
        a = jnp.asarray(4.0)
        d = jnp.asarray(2.0)
        sigma = jnp.asarray(0.0)
        cam_before = np.asarray(state.params["camera"]["translation"]).copy()
        losses = []
        for i in range(10):
            state, metrics = step(state, batch, jax.random.PRNGKey(10 + i), a, d, sigma)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 10
        cam_after = np.asarray(state.params["camera"]["translation"])
        assert np.abs(cam_after - cam_before).max() > 0  # camera is learning

    def test_val_gauge_and_pose_error(self):
        cfg = self._cfg()
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        raw = jax.random.normal(jax.random.PRNGKey(5), (4, 3))
        noisy = raw + 0.05
        gauge = barf_sys.val_gauge(state.params, raw, noisy)
        assert len(gauge) == 3
        err = barf_sys.pose_error_metric(state.params, raw, noisy)
        assert np.isfinite(float(err))


class TestGarfSystem:
    def _cfg(self):
        return garf_system.GarfSystemConfig(
            n_train_images=4, proposal_samples_per_ray=8, radiance_samples_per_ray=16,
            net=garf.GarfConfig(init_min=0.5, init_max=2.0,
                                learning_rate_decay_end=1000),
        )

    @pytest.mark.slow
    def test_forward_and_train_step(self):
        cfg = self._cfg()
        state = garf_system.init(jax.random.PRNGKey(0), cfg)
        tx = garf_system.make_optimizer(cfg, state.params)
        step = garf_system.make_train_step(cfg, tx, donate=False)
        batch = _fake_batch(jax.random.PRNGKey(1))
        losses = []
        for i in range(8):
            state, metrics = step(state, batch, jax.random.PRNGKey(20 + i))
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0]

    @pytest.mark.slow
    def test_interlevel_camera_detach(self):
        # Detaching the interlevel-loss ray dependence must leave the loss
        # VALUE unchanged while changing only the camera gradient; proposal
        # and radiance gradients are identical either way.
        import dataclasses

        cfg_on = self._cfg()
        cfg_off = dataclasses.replace(cfg_on, interlevel_camera_grads=False)
        state = garf_system.init(jax.random.PRNGKey(0), cfg_on)
        batch = _fake_batch(jax.random.PRNGKey(1))
        key = jax.random.PRNGKey(2)

        def lg(cfg):
            (loss, _), grads = jax.value_and_grad(
                garf_system.loss_fn, has_aux=True)(
                    state.params, cfg, batch, key, True)
            return float(loss), grads

        loss_on, g_on = lg(cfg_on)
        loss_off, g_off = lg(cfg_off)
        assert loss_on == loss_off
        for sub in ("proposal", "radiance"):
            a = jax.tree_util.tree_leaves(g_on[sub])
            b = jax.tree_util.tree_leaves(g_off[sub])
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        diff = sum(
            float(jnp.abs(x - y).sum())
            for x, y in zip(jax.tree_util.tree_leaves(g_on["camera"]),
                            jax.tree_util.tree_leaves(g_off["camera"])))
        assert diff > 0.0

    @pytest.mark.slow
    def test_camera_adam_eps_group(self):
        # camera_adam_eps must reach the camera group and ONLY the camera
        # group: with a huge eps the camera update shrinks ~proportionally
        # while net updates are unchanged.
        import dataclasses

        cfg = self._cfg()
        cfg_eps = dataclasses.replace(cfg, camera_adam_eps=1e3,
                                      camera_learning_rate_start=1e-4)
        cfg_ref = dataclasses.replace(cfg, camera_learning_rate_start=1e-4)
        batch = _fake_batch(jax.random.PRNGKey(1))

        def one_step(c):
            state = garf_system.init(jax.random.PRNGKey(0), c)
            tx = garf_system.make_optimizer(c, state.params)
            step = garf_system.make_train_step(c, tx, donate=False)
            new, _ = step(state, batch, jax.random.PRNGKey(3))
            return state, new

        s0a, s1a = one_step(cfg_ref)
        s0b, s1b = one_step(cfg_eps)
        cam_move_ref = float(jnp.abs(
            s1a.params["camera"]["rotation"] - s0a.params["camera"]["rotation"]).max())
        cam_move_eps = float(jnp.abs(
            s1b.params["camera"]["rotation"] - s0b.params["camera"]["rotation"]).max())
        assert cam_move_eps < cam_move_ref * 1e-2
        rad_a = jax.tree_util.tree_leaves(s1a.params["radiance"])
        rad_b = jax.tree_util.tree_leaves(s1b.params["radiance"])
        for x, y in zip(rad_a, rad_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    @pytest.mark.slow
    def test_forward_deterministic_in_eval(self):
        cfg = self._cfg()
        state = garf_system.init(jax.random.PRNGKey(0), cfg)
        batch = _fake_batch(jax.random.PRNGKey(1))
        out1 = garf_system.forward(state.params, cfg, None,
                                   batch["origs_raw"], batch["dirs_raw"], stratified=False)
        out2 = garf_system.forward(state.params, cfg, None,
                                   batch["origs_raw"], batch["dirs_raw"], stratified=False)
        np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]))


def test_mip_nerf_density_scale_parity():
    """run_mip_nerf must carry the reference's own magic: MAGIC_NUMBER=7 ->
    density scale 21 (`mip_NeRF/model_interpolation.py:8,216`), unlike the
    barf family's net-1.0. Without it the 4x256 net never escapes the
    empty-density basin at near/far 1/10-1/3 (stays ~10 dB indefinitely —
    round-4 C3 incident). Also: a non-default scale must route around the
    mega-kernels, which bake the default."""
    import numpy as np

    from nerf_experiments_tpu.ops import render

    cfg21 = barf_sys.BarfConfig(
        radiance=_tiny_mlp_cfg(), n_training_images=2, density_scale=21.0)
    assert not barf_sys.can_fuse_train_step(cfg21)

    dens = jnp.asarray([[1.0, 2.0, 0.5]])
    dists = jnp.asarray([[0.01, 0.01, 0.01]])
    w21, _, _ = render.render_weights(dens, dists, 21.0)
    # reference semantics: blocking_neg = -sigma*delta*3*MAGIC(=7)
    b = -np.asarray(dens) * np.asarray(dists) * 21.0
    T = np.exp(np.concatenate([np.zeros((1, 1)), np.cumsum(b, -1)[:, :-1]], -1))
    np.testing.assert_allclose(np.asarray(w21), T * (1 - np.exp(b)),
                               rtol=1e-5, atol=1e-7)

    from nerf_experiments_tpu.experiments import run_mip_nerf

    # entry-level pin (no dataset load needed: build() reads the module
    # constant, so pinning the constant pins the entry config)
    assert run_mip_nerf.MIP_DENSITY_SCALE == 21.0
