import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestCameraSimilarity:
    def test_closed_form_beats_iterative(self):
        from nerf_experiments_tpu.experiments.studies import camera_similarity as cs
        from nerf_experiments_tpu.ops.lie import so3_exp
        from nerf_experiments_tpu.ops.kabsch import apply_similarity

        pts = jax.random.normal(jax.random.PRNGKey(0), (40, 3))
        R = so3_exp(jnp.array([0.4, -0.2, 0.9]))
        target = apply_similarity(R, jnp.array([[1.0, 2.0, -0.5]]), 1.3, pts)
        cf = cs.closed_form_align(pts, target)
        assert cf["residual"] < 1e-4

    def test_iterative_align_converges_rotation_only(self):
        from nerf_experiments_tpu.experiments.studies import camera_similarity as cs
        from nerf_experiments_tpu.ops.lie import so3_exp

        pts = jax.random.normal(jax.random.PRNGKey(1), (60, 3))
        R = np.asarray(so3_exp(jnp.array([0.3, 0.1, -0.4])))
        target = pts @ R.T
        out = cs.iterative_align(pts, jnp.asarray(target), lr=0.05, max_iter=500)
        assert out["loss"][-1] < 1e-3

    def test_scale_response(self):
        from nerf_experiments_tpu.experiments.studies import camera_similarity as cs

        res = cs.scale_response_study(scales=(1.0, 4.0), steps=200, n_points=128)
        assert all(np.isfinite(v["final_loss"]) for v in res.values())


class TestBulge:
    def test_projection_geometry(self):
        from nerf_experiments_tpu.experiments.studies.bulge import bulge_study

        out = bulge_study()
        # constant-z lines stay straight...
        assert out["const_z_line_linear_residual"] < 1e-9
        # ...while depth along z bulges (non-linear)
        assert out["const_x_depth_nonlinearity"] > 1e-2


class TestRotationCheck:
    def test_all_conventions_hold(self):
        from nerf_experiments_tpu.experiments.studies.rotation_check import convention_checks

        checks = convention_checks()
        assert all(checks.values()), checks


class TestSweep:
    def test_generates_scripts(self, tmp_path):
        from nerf_experiments_tpu.experiments import sweep

        scripts = sweep.main([
            "--module", "run_barf",
            "--grid", "start_blur_sigma=0,20", "seed=1,2",
            "--out_dir", str(tmp_path),
        ])
        assert len(scripts) == 4
        body = open(scripts[0]).read()
        assert "run_barf" in body and "--start_blur_sigma 0" in body
        assert os.access(scripts[0], os.X_OK)

    def test_combinations_cartesian(self):
        from nerf_experiments_tpu.experiments.sweep import combinations, parse_grid

        combos = list(combinations(parse_grid(["a=1,2,3", "b=x,y"])))
        assert len(combos) == 6
        assert {"a": "1", "b": "x"} in combos


class TestSchedules:
    def test_le_nice_endpoints(self):
        from nerf_experiments_tpu.training.schedules import le_nice

        s = le_nice(5e-4, 1e-5, 1000)
        assert abs(float(s(0)) - 5e-4) < 1e-9
        assert abs(float(s(1000)) - 1e-5) < 1e-7
        assert abs(float(s(5000)) - 1e-5) < 1e-7  # clamped after decay end

    def test_garf_exponential_unclamped(self):
        from nerf_experiments_tpu.training.schedules import garf_exponential

        s = garf_exponential(1e-3, 1e-4, 100)
        assert abs(float(s(100)) - 1e-4) < 1e-7
        assert float(s(200)) < 1e-4  # keeps decaying (torch ExponentialLR)

    def test_mip_sigma_schedule(self):
        from nerf_experiments_tpu.training.schedules import mip_sigma_schedule

        assert float(mip_sigma_schedule(0, 10, 100, 20.0, 20.0)) == 1.0
        end = float(mip_sigma_schedule(100, 10, 100, 20.0, 20.0))
        assert abs(end - 0.25 / 20.0) < 1e-5
        assert float(mip_sigma_schedule(101, 10, 100, 20.0, 20.0)) == 0.0

    def test_barf_sigma_alpha(self):
        from nerf_experiments_tpu.training.schedules import barf_sigma_alpha

        assert float(barf_sigma_alpha(jnp.asarray(0.0), 16.0)) == 16.0
        assert float(barf_sigma_alpha(jnp.asarray(2.0), 16.0)) == 4.0
        assert float(barf_sigma_alpha(jnp.asarray(10.0), 16.0)) == 0.0  # < 1/4 -> 0


class TestCheckpoints:
    def test_save_restore_roundtrip(self, tmp_path):
        from nerf_experiments_tpu.training.checkpoints import CheckpointManager
        from nerf_experiments_tpu.systems import barf as barf_sys
        from nerf_experiments_tpu.models import nerf_mlp
        from nerf_experiments_tpu.encodings.fourier import Barf

        cfg = barf_sys.BarfConfig(
            radiance=nerf_mlp.NerfMLPConfig(
                position_encoder=Barf(levels=2, scale=1.0),
                direction_encoder=Barf(levels=2, scale=1.0),
                n_hidden=1, hidden_dim=16, n_segments=1,
            ),
            n_training_images=2, samples_per_ray_radiance=4,
        )
        state = barf_sys.init(jax.random.PRNGKey(0), cfg)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(5, state, metadata={"seed": 0})
        restored = mgr.restore(state)
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert mgr.latest_step() == 5
        mgr.close()


class TestConfigPresets:
    def test_presets_parse(self):
        from nerf_experiments_tpu.utils.config import PRESETS

        assert "barf_lego_400" in PRESETS and len(PRESETS) >= 8
        # every preset's argv must parse with its module's CLI
        import importlib

        for p in PRESETS.values():
            mod = importlib.import_module(
                f"nerf_experiments_tpu.experiments.{p.module}"
            )
            args = mod.parse_args(list(p.argv))
            assert args is not None


class TestPEMaskVisualiser:
    def test_weights_monotone_in_alpha(self):
        from nerf_experiments_tpu.experiments.studies.visualise_pe_mask import (
            pe_mask_weights,
        )

        ts, weights = pe_mask_weights(levels=6, alphas=(0.0, 3.0, 6.0), n_t=8)
        # alpha=0: all frequency weights masked to ~0
        assert np.asarray(weights[0.0]).max() < 1e-6
        # higher alpha unlocks more frequencies (more total weight)
        assert weights[6.0].sum() > weights[3.0].sum() > 0


class TestProfiling:
    def test_step_timer(self):
        from nerf_experiments_tpu.utils.profiling import StepTimer

        t = StepTimer(sync=lambda m: None, warmup=2)
        for i in range(10):
            t.tick({}, rays=100)
        assert t.rays_per_sec() > 0


class TestQuantizedSchedule:
    def test_staircase(self):
        from nerf_experiments_tpu.training.schedules import quantized_exponential

        s = quantized_exponential(1e-3, 1e-4, 1000, steps_per_period=100)
        # constant within a period
        assert float(s(0)) == float(s(99))
        assert float(s(100)) < float(s(99))
        # endpoint matches after all periods
        assert abs(float(s(1000)) - 1e-4) < 1e-7


class TestLoggers:
    def test_taper_schedule_fires_and_spaces_out(self):
        from nerf_experiments_tpu.training.loggers import TaperSchedule

        s = TaperSchedule(logging_start=0.002, delay_start=1 / 24, delay_end=1.0,
                          delay_taper=5.0)
        # below logging_start: never fires
        assert not s.should_fire(0.001)
        # first fire at the initial delay point
        fires = [ef for ef in np.linspace(0.01, 30, 3000) if s.should_fire(float(ef))]
        assert len(fires) > 3
        gaps = np.diff(fires)
        # delays grow toward delay_end (tanh taper)
        assert gaps[-1] > gaps[0]
        assert gaps[-1] <= 1.1

    def test_metric_logger_jsonl(self, tmp_path):
        from nerf_experiments_tpu.training.loggers import MetricLogger

        lg = MetricLogger(str(tmp_path))
        lg.log({"loss": jnp.asarray(0.5), "skipme": "notanumber"}, step=3)
        lg.log({"loss": 0.25}, step=4)
        rows = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert rows[0] == {"step": 3, "loss": 0.5}
        assert rows[1]["loss"] == 0.25
        lg.close()

    def test_metric_logger_points(self, tmp_path):
        from nerf_experiments_tpu.training.loggers import MetricLogger

        lg = MetricLogger(str(tmp_path))
        pts = np.zeros((5, 3)); cols = np.zeros((5, 3), np.uint8)
        lg.log_points("cams", pts, cols, step=7)
        files = os.listdir(tmp_path / "points")
        assert files and files[0].startswith("cams")


def test_reconstruct_image_roundtrip():
    """reconstruct_image + full_image_psnr: an exact predictor reproduces the
    image (infinite PSNR clamp) with the x-major coord layout."""
    import numpy as np
    from nerf_experiments_tpu.data import single_image

    img = single_image.procedural_test_image(16, 0)
    data = single_image.load(img, pixel_shuffle_seed=0)
    lookup = {tuple(c): col for c, col in zip(map(tuple, data.coords), data.colors)}

    def apply_fn(chunk):
        return np.stack([lookup[tuple(c)] for c in chunk])

    recon = single_image.reconstruct_image(apply_fn, data, chunk=37)
    np.testing.assert_allclose(recon, img, atol=1e-6)
    assert single_image.full_image_psnr(recon, data) > 100
