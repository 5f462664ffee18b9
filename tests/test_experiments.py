"""Smoke tests for the experiment entry points (tiny shapes, few steps)."""
import json
import os

import jax
import numpy as np
import pytest

from nerf_experiments_tpu.data import synthetic

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene_exp")
    synthetic.generate_dataset(str(d), n_train=4, n_val=2, n_test=2,
                               image_size=24, n_samples=32)
    return str(d)


def _metrics(out_dir):
    return [json.loads(l) for l in open(os.path.join(out_dir, "metrics.jsonl"))]


class TestGarfMain:
    @pytest.mark.parametrize("activation", ["gauss", "gabor", "sarf"])
    def test_runs_and_loss_finite(self, scene_dir, tmp_path, activation):
        from nerf_experiments_tpu.experiments import garf_main

        args = garf_main.parse_args([
            "--activation", activation,
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "60",
            "--proposal_samples_per_ray", "8", "--radiance_samples_per_ray", "16",
            "--out_dir", str(tmp_path / activation),
        ])
        cfg, state, trainer = garf_main.build(args)
        state = trainer.fit(state)
        assert int(state.step) == 60
        rows = _metrics(str(tmp_path / activation))
        losses = [r["loss"] for r in rows if "loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)
        assert any("pose_error" in r for r in rows)


class TestBipBarf:
    def test_runs_with_sigma_schedule(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_bip_barf

        args = run_bip_barf.parse_args([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "60",
            "--samples_per_ray", "16",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--start_blur_sigma", "4.0", "--start_pixel_width_sigma", "4.0",
            "--max_blur_sigma", "4.0", "--n_blur_sigmas", "3",
            "--sigma_decay_start_step", "10", "--sigma_decay_end_step", "40",
            "--checkpoint_every_n_epochs", "0",
            "--out_dir", str(tmp_path / "bip"),
        ])
        exp = run_bip_barf.build(args)
        state = exp.fit()
        assert int(state.step) == 60
        rows = _metrics(str(tmp_path / "bip"))
        losses = [r["loss"] for r in rows if "loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)

    def test_mip_proposal_shared_net(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_bip_barf

        args = run_bip_barf.parse_args([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "30",
            "--samples_per_ray", "16", "--samples_per_ray_proposal", "8",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--checkpoint_every_n_epochs", "0",
            "--out_dir", str(tmp_path / "mip"),
        ])
        exp = run_bip_barf.build(args)
        assert exp.cfg.share_proposal_net and exp.cfg.coarse_loss_weight == 0.1
        state = exp.fit()
        rows = _metrics(str(tmp_path / "mip"))
        assert any("loss_coarse" in r for r in rows)


class TestModelDefExperiments:
    """CPU smoke tests for the ModelDef-plugged entry points."""

    def test_3d_ingp(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_3d_ingp

        args = run_3d_ingp.parse_args([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "40",
            "--samples_per_ray_fine", "16", "--samples_per_ray_coarse", "8",
            "--n_levels", "2", "--table_size", "512", "--resolution_max", "16",
            "--out_dir", str(tmp_path / "ingp3d"),
        ])
        exp = run_3d_ingp.build(args)
        state = exp.fit()
        rows = _metrics(str(tmp_path / "ingp3d"))
        assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)

    def test_siren(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_nerf_siren

        args = run_nerf_siren.parse_args([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "40",
            "--samples_per_ray_fine", "16", "--samples_per_ray_coarse", "8",
            "--out_dir", str(tmp_path / "siren"),
        ])
        exp = run_nerf_siren.build(args)
        exp.fit()
        rows = _metrics(str(tmp_path / "siren"))
        assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)

    def test_naive_to_vanilla(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_naive_to_vanilla

        args = run_naive_to_vanilla.parse_args([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "40",
            "--samples_per_ray_fine", "16", "--samples_per_ray_coarse", "8",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--out_dir", str(tmp_path / "naive"),
        ])
        exp = run_naive_to_vanilla.build(args)
        exp.fit()
        rows = _metrics(str(tmp_path / "naive"))
        assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)

    def test_mip_nerf(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_mip_nerf

        args = run_mip_nerf.parse_args([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "40",
            "--samples_per_ray", "16", "--samples_per_ray_proposal", "8",
            "--n_hidden", "1", "--hidden_dim", "32",
            "--checkpoint_every_n_epochs", "0",
            "--out_dir", str(tmp_path / "mip"),
        ])
        exp = run_mip_nerf.build(args)
        assert exp.cfg.share_proposal_net
        exp.fit()
        rows = _metrics(str(tmp_path / "mip"))
        assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)

    def test_2d_reconstruction_and_ingp_quick(self, tmp_path):
        from nerf_experiments_tpu.experiments import run_2d_ingp

        args = run_2d_ingp.parse_args([
            "--image_size", "32", "--steps", "300", "--batch_size", "1024",
            "--n_levels", "4", "--table_size", "2048", "--resolution_max", "32",
            "--out_dir", str(tmp_path / "g2d"),
        ])
        params, cfg, result = run_2d_ingp.train(args)
        assert result["val_psnr"] > 12.0, result


class TestResumeAndRender:
    def test_checkpoint_resume_continues(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_barf

        base = [
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--samples_per_ray", "16",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--camera_origin_noise_sigma", "0.0",
            "--camera_rotation_noise_sigma", "0.0",
            "--no-optimize_camera",
            "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
            "--checkpoint_every_n_epochs", "1",
            "--out_dir", str(tmp_path / "run"),
        ]
        state1 = run_barf.main(base + ["--max_steps", "30"])
        assert int(state1.step) == 30
        # resume: continues from the saved step, not from zero
        state2 = run_barf.main(base + ["--max_steps", "50", "--resume"])
        assert int(state2.step) == 50

    def test_cli_trains_on_device_mesh(self, scene_dir, tmp_path):
        """--mesh DxM trains end-to-end SPMD on the 8 virtual CPU devices
        (VERDICT round-1 item 5: the mesh wired into a real entry point)."""
        import jax

        from nerf_experiments_tpu.experiments import run_barf

        assert len(jax.devices()) >= 8
        out = str(tmp_path / "mesh_run")
        state = run_barf.main([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "40",
            "--samples_per_ray", "16",
            "--hidden_dim", "256", "--n_hidden", "1",
            "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
            "--checkpoint_every_n_epochs", "0",
            "--mesh", "4x2",
            "--out_dir", out,
        ])
        assert int(state.step) == 40
        rows = _metrics(out)
        losses = [r["loss"] for r in rows if "loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)
        # the 256-wide hidden weights actually live model-sharded on the mesh
        import jax as _jax

        shardings = {
            str(l.sharding.spec)
            for l in _jax.tree_util.tree_leaves(state.params["radiance"])
            if hasattr(l, "sharding") and l.ndim == 2 and l.shape[-1] == 256
        }
        assert any("model" in s for s in shardings), shardings

    def test_cli_mesh_with_fused_megakernel(self, scene_dir, tmp_path):
        """--mesh 8x1 --fused_kernel: the data-parallel Pallas mega-kernel
        path end-to-end through the CLI (interpret mode on CPU)."""
        import jax

        from nerf_experiments_tpu.experiments import run_barf

        assert len(jax.devices()) >= 8
        out = str(tmp_path / "mesh_fused_run")
        state = run_barf.main([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "20",
            "--samples_per_ray", "16",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
            "--checkpoint_every_n_epochs", "0",
            "--mesh", "8x1", "--fused_kernel",
            "--out_dir", out,
        ])
        assert int(state.step) == 20
        rows = _metrics(out)
        losses = [r["loss"] for r in rows if "loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)

    def test_garf_cli_trains_on_mesh(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import garf_main

        out = str(tmp_path / "garf_mesh")
        args = garf_main.parse_args([
            "--activation", "gauss",
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "30",
            "--proposal_samples_per_ray", "8", "--radiance_samples_per_ray", "16",
            "--mesh", "auto",
            "--out_dir", out,
        ])
        cfg, state, trainer = garf_main.build(args)
        state = trainer.fit(state)
        assert int(state.step) == 30
        rows = _metrics(out)
        losses = [r["loss"] for r in rows if "loss" in r]
        assert losses and all(np.isfinite(l) for l in losses)

    def test_render_views_reports_psnr(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import render_views, run_barf

        out = str(tmp_path / "run")
        run_barf.main([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "120",
            "--samples_per_ray", "16",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--camera_origin_noise_sigma", "0.0",
            "--camera_rotation_noise_sigma", "0.0",
            "--no-optimize_camera",
            "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
            "--checkpoint_every_n_epochs", "1",
            "--out_dir", out,
        ])
        summary = render_views.main([
            "--ckpt_dir", os.path.join(out, "ckpt"),
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--samples_per_ray", "16",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--split", "test", "--n_images", "2", "--chunk", "288",
            "--out_dir", out,
        ])
        assert summary["mean_psnr"] > 8.0, summary
        renders = os.listdir(os.path.join(out, "renders"))
        assert len(renders) == 2

    def test_small_proposal_net_config(self, scene_dir, tmp_path):
        """The north-star hierarchical config: a dedicated small proposal
        net (--proposal_hidden_dim) guiding a low-sample radiance pass,
        reconstructed identically by render_views from the checkpoint."""
        from nerf_experiments_tpu.experiments import render_views, run_barf

        out = str(tmp_path / "run")
        flags = [
            "--scene_path", scene_dir, "--image_size", "24",
            "--samples_per_ray", "8", "--samples_per_ray_proposal", "12",
            "--proposal_hidden_dim", "16", "--proposal_n_hidden", "1",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--camera_origin_noise_sigma", "0.0",
            "--camera_rotation_noise_sigma", "0.0",
        ]
        state = run_barf.main(flags + [
            "--batch_size", "128", "--max_steps", "100",
            "--no-optimize_camera",
            "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
            "--checkpoint_every_n_epochs", "1",
            "--out_dir", out,
        ])
        # the dedicated proposal net exists and is smaller than radiance
        assert "proposal" in state.params
        w = jax.tree_util.tree_leaves(state.params["proposal"])
        assert max(x.shape[-1] for x in w) <= 16 + 1
        rows = _metrics(out)
        assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)
        summary = render_views.main(flags + [
            "--ckpt_dir", os.path.join(out, "ckpt"),
            "--batch_size", "128",
            "--split", "test", "--n_images", "1", "--chunk", "288",
            "--out_dir", out,
        ])
        assert summary["mean_psnr"] > 8.0, summary
        # serving-only block-coarse path (--serve_block): same checkpoint,
        # coarse PDF shared across raster-neighbor blocks; a chunk that is
        # NOT a multiple of the block exercises the pad-and-truncate path
        # (24*24=576 rays per view; chunk 290 -> chunks 290/286)
        blk = render_views.main(flags + [
            "--ckpt_dir", os.path.join(out, "ckpt"),
            "--batch_size", "128",
            "--split", "test", "--n_images", "1", "--chunk", "290",
            "--serve_block", "4",
            "--out_dir", str(tmp_path / "blk"),
        ])
        assert blk["mean_psnr"] > 8.0, blk
        # neighbor-shared coarse bins must stay close to the full render
        assert abs(blk["mean_psnr"] - summary["mean_psnr"]) < 3.0, (
            blk["mean_psnr"], summary["mean_psnr"])


class TestSamplingAblation:
    def test_grid_runs_and_summarizes(self, scene_dir, tmp_path):
        from nerf_experiments_tpu.experiments import run_sampling_test

        results = run_sampling_test.main([
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--steps_per_cell", "60",
            "--hidden_dim", "32", "--n_hidden", "1",
            "--strategies", "equidistant",
            "--integrations", "left", "middle",
            "--offsets", "0.0",
            "--out_dir", str(tmp_path / "grid"),
        ])
        assert len(results) == 2
        assert all(r["final_psnr"] is not None and np.isfinite(r["final_psnr"])
                   for r in results)
        assert os.path.exists(tmp_path / "grid" / "summary.json")


class TestExactResume:
    def test_resume_reproduces_uninterrupted_trajectory(self, scene_dir, tmp_path):
        """fold_in(step) keys: save at step 15, restore, continue to 30 ==
        uninterrupted 30-step run, bit-for-bit."""
        import jax
        from nerf_experiments_tpu.experiments import run_barf
        from nerf_experiments_tpu.training.checkpoints import CheckpointManager

        def args_for(out, steps):
            return [
                "--scene_path", scene_dir, "--image_size", "24",
                "--batch_size", "64", "--max_steps", str(steps),
                "--samples_per_ray", "8",
                "--hidden_dim", "16", "--n_hidden", "1",
                "--camera_origin_noise_sigma", "0.0",
                "--camera_rotation_noise_sigma", "0.0",
                "--no-optimize_camera",
                "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
                "--checkpoint_every_n_epochs", "0",
                "--out_dir", out,
            ]

        # uninterrupted
        straight = run_barf.main(args_for(str(tmp_path / "a"), 30))

        # interrupted at 15
        exp = run_barf.build(run_barf.parse_args(args_for(str(tmp_path / "b"), 15)))
        mid = exp.trainer.fit(exp.state)
        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(15, mid)
        exp2 = run_barf.build(run_barf.parse_args(args_for(str(tmp_path / "b2"), 30)))
        restored = mgr.restore(exp2.state)
        resumed = exp2.trainer.fit(restored)

        for a, b in zip(jax.tree_util.tree_leaves(straight.params),
                        jax.tree_util.tree_leaves(resumed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_conv_blur_resume_matches_straight(self, scene_dir, tmp_path):
        """The conv-blur sigma ladder is a closed-form function of the epoch
        fraction, so save/restore mid-ladder reproduces the uninterrupted
        trajectory bit-for-bit (garf_main --resume)."""
        import jax
        from nerf_experiments_tpu.experiments import garf_main

        def args_for(out, steps, extra=()):
            return [
                "--activation", "gauss",
                "--scene_path", scene_dir, "--image_size", "24",
                "--batch_size", "64", "--max_steps", str(steps),
                "--proposal_samples_per_ray", "8",
                "--radiance_samples_per_ray", "16",
                "--conv_blur", "--blur_relative_sigma_start", "0.05",
                "--blur_relative_sigma_decay", "0.9",
                "--blur_kernel_size", "9",
                "--out_dir", out,
            ] + list(extra)

        # uninterrupted 24 steps (several blur milestones at this scale)
        cfg, state, trainer = garf_main.build(
            garf_main.parse_args(args_for(str(tmp_path / "s"), 24)))
        straight = trainer.fit(state)

        # interrupted at 12 (checkpoint saved at end of fit), then resumed
        cfg, state, trainer = garf_main.build(garf_main.parse_args(
            args_for(str(tmp_path / "r"), 12,
                     ["--checkpoint_every_n_epochs", "1000"])))
        trainer.fit(state)
        cfg, state, trainer = garf_main.build(garf_main.parse_args(
            args_for(str(tmp_path / "r"), 24, ["--resume"])))
        assert int(state.step) == 12
        resumed = trainer.fit(state)

        for a, b in zip(jax.tree_util.tree_leaves(straight.params),
                        jax.tree_util.tree_leaves(resumed.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestCameraFreezeWindow:
    def test_freeze_window_holds_cameras_and_lr_rows(self, scene_dir, tmp_path):
        """--camera_freeze_during_anneal: the freeze window is copied from
        the gamma-ramp window and the lr_camera metric rows report 0 inside
        it (the SARF ramp-destabilization mitigation; the bitwise param
        hold is unit-tested in test_trainer_monitoring.py)."""
        from nerf_experiments_tpu.experiments import garf_main

        # scene: 4 views x 24^2 = 2304 rays; batch 128 -> 18 steps/epoch.
        # anneal window epochs [1.0, 2.5) -> steps [18, 45); run 60 steps.
        out = str(tmp_path / "freeze")
        args = garf_main.parse_args([
            "--activation", "sarf",
            "--scene_path", scene_dir, "--image_size", "24",
            "--batch_size", "128", "--max_steps", "60",
            "--proposal_samples_per_ray", "8", "--radiance_samples_per_ray", "16",
            "--act_anneal_start_epoch", "1.0", "--act_anneal_end_epoch", "2.5",
            "--camera_freeze_during_anneal",
            "--camera_learning_rate_start", "1e-2",
            "--camera_learning_rate_stop", "1e-3",
            "--log_every_n_steps", "10",
            "--out_dir", out,
        ])
        cfg, state, trainer = garf_main.build(args)
        assert cfg.camera_freeze_start_step == 18
        assert cfg.camera_freeze_end_step == 45

        state = trainer.fit(state)
        rows = _metrics(out)
        lr_rows = {r["step"]: r["lr_camera"] for r in rows if "lr_camera" in r}
        assert lr_rows, "no lr_camera rows logged"
        # trainer logs lr at the pre-step index (step-1): rows at steps
        # 20/30/40 sit inside the [18, 45) window, 10/50/60 outside
        inside = [s for s in lr_rows if 18 < s - 1 < 45 - 1]
        outside = [s for s in lr_rows if s - 1 < 18 or s - 1 >= 45]
        assert inside and outside
        assert all(lr_rows[s] == 0.0 for s in inside), lr_rows
        assert all(lr_rows[s] > 0.0 for s in outside), lr_rows
