"""Mip-BARF ("bip barf"): integrated encodings + coupled blur/IPE sigma schedule.

Parity with `barf/run_bip_barf.py:22-188`: IntegratedFourierFeatures
(10 levels, identity, scale 1, per-axis variance), identity-only direction
encoding (BarfPositionalEncoding(0, 1, 0, 1, True)), NerfModel 4x256 x 2
segments, 126 samples/ray, equidistant offset -1 sampling, LR 5e-4 -> 1e-5
over 200k steps, camera 1e-3 -> 1e-5; sigma schedule: exponential decay of
both the image-blur sigma and the IPE pixel_width_sigma from their start
values at step 2000 down to 0.25 at step 100k, zero after
(`barf/model_mip.py:170-225`).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.data import blender
from nerf_experiments_tpu.encodings.fourier import Barf, Integrated
from nerf_experiments_tpu.experiments import common
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.systems import barf as barf_sys
from nerf_experiments_tpu.training import schedules
from nerf_experiments_tpu.training.trainer import TrainerConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--camera_origin_noise_sigma", type=float, default=0.15)
    p.add_argument("--camera_rotation_noise_sigma", type=float, default=0.15)
    p.add_argument("--start_blur_sigma", type=float, default=200.0)
    p.add_argument("--start_pixel_width_sigma", type=float, default=200.0)
    p.add_argument("--max_blur_sigma", type=float, default=200.0)
    p.add_argument("--n_blur_sigmas", type=int, default=10)
    p.add_argument("--optimize_camera", action=argparse.BooleanOptionalAction, default=True)
    # camera-eps recipe knobs (same semantics as run_barf: reference defaults
    # stay the defaults, the improved joint-calibration recipe is opt-in)
    p.add_argument("--camera_lr", type=float, default=1e-3)
    p.add_argument("--camera_lr_stop", type=float, default=1e-5)
    p.add_argument("--camera_adam_eps", type=float, default=None)
    p.add_argument("--resume", action="store_true", default=False,
                   help="resume from the latest checkpoint in out_dir/ckpt")
    p.add_argument("--image_log_period_epochs", type=float, default=None)
    p.add_argument("--samples_per_ray", type=int, default=126)
    p.add_argument("--samples_per_ray_proposal", type=int, default=0)
    p.add_argument("--sigma_decay_start_step", type=int, default=2000)
    p.add_argument("--sigma_decay_end_step", type=int, default=100_000)
    p.add_argument("--lr_decay_end_step", type=int, default=200_000)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--n_hidden", type=int, default=4)
    p.add_argument("--checkpoint_every_n_epochs", type=float, default=1.0)
    common.add_common_args(p)
    return p.parse_args(argv)


def build(args) -> common.BarfExperiment:
    scene = common.resolve_scene(args.scene_path, args.image_size)
    sigmas = common.blur_sigmas_from_start(args.max_blur_sigma, args.n_blur_sigmas)

    dm = blender.DataModule(
        scene_path=scene,
        image_width=args.image_size,
        image_height=args.image_size,
        space_transform_scale=1.0,
        space_transform_translate=jnp.zeros(3),
        rotation_noise_sigma=args.camera_rotation_noise_sigma,
        translation_noise_sigma=args.camera_origin_noise_sigma,
        camera_noise_seed=args.seed,
        gaussian_blur_sigmas=sigmas,
        validation_fraction=0.06,
        validation_fraction_shuffle=1234,
    )

    position_encoder = Integrated(
        levels=10, include_identity=True, scale=1.0, distribute_variance=False
    )
    # identity-only direction encoding: BarfPositionalEncoding(0, 1, 0, 1, True)
    direction_encoder = Barf(levels=0, alpha_start=1.0, include_identity=True, scale=1.0)

    radiance = nerf_mlp.NerfMLPConfig(
        position_encoder=position_encoder,
        direction_encoder=direction_encoder,
        n_hidden=args.n_hidden, hidden_dim=args.hidden_dim,
        delayed_direction=True, delayed_density=False, n_segments=2,
        learning_rate_start=5e-4, learning_rate_stop=1e-5,
        learning_rate_decay_end=args.lr_decay_end_step,
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )

    cfg = barf_sys.BarfConfig(
        radiance=radiance,
        n_training_images=dm.n_training_images,
        near=2.0, far=8.0,
        samples_per_ray_radiance=args.samples_per_ray,
        samples_per_ray_proposal=args.samples_per_ray_proposal,
        share_proposal_net=args.samples_per_ray_proposal > 0,  # MipNeRF style
        coarse_loss_weight=0.1,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=-1.0,
        optimize_camera=args.optimize_camera,
        camera_learning_rate_start=args.camera_lr if args.optimize_camera else 0.0,
        camera_learning_rate_stop=args.camera_lr_stop if args.optimize_camera else 0.0,
        camera_learning_rate_decay_end=args.lr_decay_end_step,
        camera_adam_eps=args.camera_adam_eps,
        max_gaussian_sigma=args.max_blur_sigma,
        gaussian_blur_sigmas=sigmas,
    )

    trainer_cfg = TrainerConfig(
        max_epochs=args.max_epochs, max_steps=args.max_steps,
        batch_size=args.batch_size, seed=args.seed,
        checkpoint_every_n_epochs=args.checkpoint_every_n_epochs or None,
    )

    def mip_scalars(step: int, epoch_frac: float):
        """(alpha_pos, alpha_dir, blur_sigma, pixel_width_sigma) per step."""
        sched = schedules.mip_sigma_schedule(
            step, args.sigma_decay_start_step, args.sigma_decay_end_step,
            args.start_blur_sigma, args.start_pixel_width_sigma,
        )
        blur = schedules.sigma_floor(sched * args.start_blur_sigma)
        pw = schedules.sigma_floor(sched * args.start_pixel_width_sigma)
        # IPE has no alpha mask here (non-BARF Integrated encoding)
        return (jnp.asarray(10.0), jnp.asarray(0.0), blur, pw)

    name = (
        f"bipBARF noise={args.camera_origin_noise_sigma} "
        f"blur={args.start_blur_sigma} pixel_width={args.start_pixel_width_sigma}"
    )
    exp = common.build_barf_experiment(
        cfg, dm, trainer_cfg, args.out_dir,
        use_wandb=args.wandb, wandb_name=name,
        image_log_names=(["r_1"], ["r_2"]),
        image_log_taper=(
            (args.image_log_period_epochs,) * 3 + (1.0,)
            if args.image_log_period_epochs else None
        ),
    )
    # override the scalar schedule with the Mip sigma schedule
    exp.trainer.scalar_fn = mip_scalars
    return exp


def _maybe_resume(args, exp):
    """--resume: restore the latest checkpoint in out_dir/ckpt (the
    reference's `trainer.fit(..., ckpt_path=...)` resume path)."""
    if not getattr(args, "resume", False):
        return exp
    import os

    from nerf_experiments_tpu.training.checkpoints import CheckpointManager

    mgr = CheckpointManager(os.path.join(args.out_dir, "ckpt"))
    if mgr.latest_step() is not None:
        exp.state = mgr.restore(exp.state)
        print(f"resumed from step {mgr.latest_step()}")
    return exp


def main(argv=None):
    args = parse_args(argv)
    return _maybe_resume(args, build(args)).fit()


if __name__ == "__main__":
    main()
