"""End-to-end: synthetic scene generation -> loader -> training -> PSNR rises.

The integration-test analogue of the reference's `run_*_as_barf.py` A/B
experiment pattern (SURVEY.md §4.2).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.data import blender, sampler, single_image, synthetic

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene")
    synthetic.generate_dataset(str(d), n_train=6, n_val=2, n_test=2,
                               image_size=32, n_samples=48)
    return str(d)


class TestSyntheticAndLoader:
    def test_generate_and_load(self, scene_dir):
        assert os.path.exists(os.path.join(scene_dir, "transforms_train.json"))
        data = blender.load(scene_dir, "train", 32, 32,
                            gaussian_blur_sigmas=[2.0, 0.0])
        assert data.images.shape == (6, 32, 32, 2, 3)
        assert data.ray_origins.shape == (6, 1024, 3)
        # directions unit norm
        norms = np.linalg.norm(data.ray_directions, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        # blur level 0 (sigma=2) differs from sharp level
        assert np.abs(data.images[..., 0, :] - data.images[..., 1, :]).max() > 0.01

    def test_space_transform_auto(self, scene_dir):
        data = blender.load(scene_dir, "train", 16, 16)
        # cameras centered near origin and inside unit-ish ball
        assert np.abs(data.camera_origins.mean(axis=0)).max() < 0.05
        assert np.linalg.norm(data.camera_origins, axis=1).max() < 1.0

    def test_noise_seeded_and_reproducible(self, scene_dir):
        d1 = blender.load(scene_dir, "train", 16, 16, rotation_noise_sigma=0.15,
                          translation_noise_sigma=0.15, noise_seed=7)
        d2 = blender.load(scene_dir, "train", 16, 16, rotation_noise_sigma=0.15,
                          translation_noise_sigma=0.15, noise_seed=7)
        np.testing.assert_allclose(d1.ray_origins_noisy, d2.ray_origins_noisy)
        assert np.abs(d1.ray_origins_noisy - d1.ray_origins).max() > 0.01

    def test_subset_bookkeeping(self, scene_dir):
        data = blender.load(scene_dir, "train", 16, 16)
        sub = data.subset([2, 4])
        assert sub.n_images == 2
        assert sub.index_to_index == {0: 2, 1: 4}
        np.testing.assert_allclose(sub.camera_origins[0], data.camera_origins[2])

    def test_gauge_corruption_hook_recoverable(self, scene_dir):
        from nerf_experiments_tpu.ops.kabsch import kabsch, apply_similarity

        data = blender.load(scene_dir, "train", 16, 16)
        origs_before = data.camera_origins.copy()
        R, t, c = data.corrupt_poses_for_gauge_test()
        # Kabsch from corrupted -> original must recover (R, t, c)
        R_hat, t_hat, c_hat = kabsch(jnp.asarray(data.camera_origins),
                                     jnp.asarray(origs_before), remove_outliers=False)
        np.testing.assert_allclose(np.asarray(R_hat), R, atol=1e-3)
        np.testing.assert_allclose(float(c_hat), c, atol=2e-2)

    def test_ray_store_and_blur_interp(self, scene_dir):
        data = blender.load(scene_dir, "train", 16, 16,
                            gaussian_blur_sigmas=[4.0, 1.0, 0.0])
        store = sampler.make_ray_store(data)
        batch = sampler.sample_batch(store, jax.random.PRNGKey(0), 64)
        assert batch["colors"].shape == (64, 3, 3)
        # sigma=0 -> sharp twice
        out = sampler.blurred_pixel_colors(batch["colors"], store.gaussian_blur_sigmas,
                                           jnp.asarray(0.0))
        np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(batch["colors"][:, -1]))
        # sigma=4 -> most blurred
        out4 = sampler.blurred_pixel_colors(batch["colors"], store.gaussian_blur_sigmas,
                                            jnp.asarray(4.0))
        np.testing.assert_allclose(np.asarray(out4[:, 0]), np.asarray(batch["colors"][:, 0]))
        # endpoints of interpolation: sigma exactly at a pyramid level
        out1 = sampler.blurred_pixel_colors(batch["colors"], store.gaussian_blur_sigmas,
                                            jnp.asarray(1.0))
        np.testing.assert_allclose(np.asarray(out1[:, 0]), np.asarray(batch["colors"][:, 1]),
                                   atol=1e-5)


class Test2DReconstruction:
    def test_psnr_rises(self, tmp_path):
        from nerf_experiments_tpu.experiments import run_2d_reconstruction as r2d

        args = r2d.parse_args([
            "--image_size", "32", "--steps", "600", "--batch_size", "1024",
            "--hidden_dim", "64", "--fourier_levels", "6",
            "--out_dir", str(tmp_path),
        ])
        params, cfg, result = r2d.train(args)
        assert result["val_psnr"] > 15.0, result


class TestBarfEndToEnd:
    def test_vanilla_nerf_trains_on_synthetic_scene(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_barf

        args = run_barf.parse_args([
            "--scene_path", scene_dir, "--image_size", "32",
            "--batch_size", "256", "--max_steps", "300",
            "--samples_per_ray", "32",
            "--hidden_dim", "64", "--n_hidden", "1",
            "--checkpoint_every_n_epochs", "0",
            "--camera_origin_noise_sigma", "0.0",
            "--camera_rotation_noise_sigma", "0.0",
            "--no-optimize_camera",
            "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
            "--out_dir", str(tmp_path / "run"),
        ])
        exp = run_barf.build(args)
        # shrink the net for CPU test speed
        state = exp.fit()
        assert int(state.step) == 300
        # read back logged metrics: psnr must rise
        metrics = [json.loads(l) for l in open(tmp_path / "run" / "metrics.jsonl")]
        psnrs = [m["psnr"] for m in metrics if "psnr" in m and np.isfinite(m["psnr"])]
        assert len(psnrs) >= 2
        assert psnrs[-1] > psnrs[0] + 1.0, psnrs
        assert psnrs[-1] > 10.0, psnrs

    def test_barf_reduces_pose_error(self, scene_dir):
        """Controlled BARF-mechanism test: (1) fit the scene with clean
        poses; (2) freeze the radiance net (lr=0), inject translation noise,
        optimize ONLY the camera extrinsics photometrically -> the
        Kabsch-aligned pose error must drop. This isolates the calibration
        gradient path the way `run_vanilla_as_barf.py` A/B runs do."""
        import dataclasses

        import jax.numpy as jnp

        from nerf_experiments_tpu.data import sampler as sampler_lib
        from nerf_experiments_tpu.encodings.fourier import Barf
        from nerf_experiments_tpu.models import nerf_mlp
        from nerf_experiments_tpu.systems import barf as barf_sys

        radiance = nerf_mlp.NerfMLPConfig(
            position_encoder=Barf(levels=6, scale=1.0, include_identity=True),
            direction_encoder=Barf(levels=2, scale=1.0, include_identity=True),
            n_hidden=1, hidden_dim=64, n_segments=2,
            learning_rate_start=5e-3, learning_rate_stop=5e-4,
            learning_rate_decay_end=1000,
        )

        def make_cfg(rad, cam_lr):
            return barf_sys.BarfConfig(
                radiance=rad, n_training_images=6, near=2.0, far=6.5,
                samples_per_ray_radiance=24,
                uniform_sampling_strategy="equidistant",
                uniform_sampling_offset_size=-1.0,
                camera_learning_rate_start=cam_lr,
                camera_learning_rate_stop=cam_lr / 10,
                camera_learning_rate_decay_end=1000,
            )

        a_pos, a_dir = jnp.asarray(6.0), jnp.asarray(2.0)
        sigma = jnp.asarray(0.0)

        # ---- phase 1: clean poses, scene fitting only (identity space
        # transform so the generator's near/far bracket still applies)
        data_clean = blender.load(scene_dir, "train", 32, 32,
                                  space_transform_scale=1.0,
                                  space_transform_translate=np.zeros(3))
        store_clean = sampler_lib.make_ray_store(data_clean)
        cfg1 = make_cfg(radiance, cam_lr=0.0)
        state = barf_sys.init(jax.random.PRNGKey(0), cfg1)
        tx1 = barf_sys.make_optimizer(cfg1, state.params)
        step1 = barf_sys.make_train_step(cfg1, tx1, donate=False)
        key = jax.random.PRNGKey(1)
        for i in range(400):
            key, kb, ks = jax.random.split(key, 3)
            batch = sampler_lib.sample_batch(store_clean, kb, 256)
            state, m1 = step1(state, batch, ks, a_pos, a_dir, sigma)
        assert float(m1["psnr"]) > 12.0

        # ---- phase 2: noisy poses, frozen radiance (lr=0), camera-only
        data_noisy = blender.load(
            scene_dir, "train", 32, 32,
            space_transform_scale=1.0, space_transform_translate=np.zeros(3),
            translation_noise_sigma=0.1, rotation_noise_sigma=0.0, noise_seed=3,
        )
        store_noisy = sampler_lib.make_ray_store(data_noisy)
        frozen = dataclasses.replace(radiance, learning_rate_start=0.0,
                                     learning_rate_stop=0.0, learning_rate_decay_end=0)
        cfg2 = make_cfg(frozen, cam_lr=3e-3)
        state2 = barf_sys.init(jax.random.PRNGKey(0), cfg2)
        state2 = state2.replace(
            params=dict(state2.params, radiance=state.params["radiance"])
        )
        tx2 = barf_sys.make_optimizer(cfg2, state2.params)
        step2 = barf_sys.make_train_step(cfg2, tx2, donate=False)

        raw = store_noisy.camera_origins_raw
        noisy = store_noisy.camera_origins_noisy
        pe_start = float(barf_sys.pose_error_metric(state2.params, raw, noisy))
        for i in range(600):
            key, kb, ks = jax.random.split(key, 3)
            batch = sampler_lib.sample_batch(store_noisy, kb, 256)
            state2, m2 = step2(state2, batch, ks, a_pos, a_dir, sigma)
        pe_end = float(barf_sys.pose_error_metric(state2.params, raw, noisy))
        assert pe_end < pe_start * 0.8, (pe_start, pe_end)
