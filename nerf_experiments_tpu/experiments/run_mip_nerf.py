"""Mip-NeRF: cone casting with integrated positional encoding.

Parity with `mip_NeRF/main.py:17-114` + `mip_NeRF/mip_model.py:11-167`:
800^2 lego, batch 2048, near/far 1/10 - 1/3 (auto unit-sphere space
transform), 64-sample proposal shared-or-separate with the radiance net
(--use_seperate_coarse_fine), IPE 10 pos / 4 dir levels, LR 5e-4 with
per-epoch exponential decay to 5e-5 over max_epochs, coarse loss x0.1.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.data import blender
from nerf_experiments_tpu.encodings.fourier import Barf, Fourier, Integrated
from nerf_experiments_tpu.experiments import common
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.systems import barf as barf_sys
from nerf_experiments_tpu.training.trainer import TrainerConfig


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--experiment_name", type=str, default="mip-nerf")
    p.add_argument("--n_hidden", type=int, default=4)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--n_segments", type=int, default=2)
    p.add_argument("--use_fourier", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--use_proposal", action=argparse.BooleanOptionalAction, default=True)
    p.add_argument("--resume", action="store_true", default=False,
                   help="resume from the latest checkpoint in out_dir/ckpt")
    p.add_argument("--use_seperate_coarse_fine", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--mip_distribute_variance", action=argparse.BooleanOptionalAction,
                   default=False)
    p.add_argument("--samples_per_ray", type=int, default=192)
    p.add_argument("--samples_per_ray_proposal", type=int, default=64)
    p.add_argument("--near", type=float, default=1 / 10)
    p.add_argument("--far", type=float, default=1 / 3)
    p.add_argument("--checkpoint_every_n_epochs", type=float, default=2.0)
    common.add_common_args(p)
    p.set_defaults(batch_size=2048, image_size=800)
    return p.parse_args(argv)


# mip_NeRF's own magic: MAGIC_NUMBER=7 -> density scale 3*7=21
# (`mip_NeRF/model_interpolation.py:8,216`) — required at the near/far
# 1/10–1/3 scale (see BarfConfig.density_scale). Pinned by
# tests/test_systems.py::test_mip_nerf_density_scale_parity.
MIP_DENSITY_SCALE = 21.0


def build(args) -> common.BarfExperiment:
    scene = common.resolve_scene(args.scene_path, args.image_size)
    # auto space transform (mean-centered, 3x max pairwise distance) — this is
    # what puts near/far at 1/10 - 1/3 for lego
    dm = blender.DataModule(
        scene_path=scene,
        image_width=args.image_size,
        image_height=args.image_size,
        gaussian_blur_sigmas=(0.0,),
        validation_fraction=0.05,
        validation_fraction_shuffle=1234,
    )

    if args.use_fourier:
        position_encoder = Integrated(
            levels=10, include_identity=True, scale=1.0,
            distribute_variance=args.mip_distribute_variance,
        )
        direction_encoder = Fourier(levels=4, scale=1.0)
    else:
        position_encoder = Barf(levels=0, alpha_start=1.0, include_identity=True)
        direction_encoder = Barf(levels=0, alpha_start=1.0, include_identity=True)

    radiance = nerf_mlp.NerfMLPConfig(
        position_encoder=position_encoder,
        direction_encoder=direction_encoder,
        n_hidden=args.n_hidden, hidden_dim=args.hidden_dim,
        delayed_direction=True, delayed_density=False, n_segments=args.n_segments,
        learning_rate_start=5e-4, learning_rate_stop=5e-5,
        learning_rate_decay_end=args.max_epochs,  # filled to steps below
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )

    cfg = barf_sys.BarfConfig(
        radiance=radiance,
        n_training_images=dm.n_training_images,
        near=args.near, far=args.far,
        samples_per_ray_radiance=args.samples_per_ray,
        samples_per_ray_proposal=(
            args.samples_per_ray_proposal if args.use_proposal else 0
        ),
        share_proposal_net=not args.use_seperate_coarse_fine,
        coarse_loss_weight=0.1,
        density_scale=MIP_DENSITY_SCALE,
        uniform_sampling_strategy="stratified_uniform",
        optimize_camera=False,
        gaussian_blur_sigmas=(0.0,),
    )

    # LR decay over the full run (per-epoch exp decay in the reference)
    n_rays = dm.n_training_images * args.image_size**2
    steps_per_epoch = max(1, n_rays // args.batch_size)
    import dataclasses as _dc

    radiance = _dc.replace(radiance, learning_rate_decay_end=args.max_epochs * steps_per_epoch)
    cfg = _dc.replace(cfg, radiance=radiance)

    trainer_cfg = TrainerConfig(
        max_epochs=args.max_epochs, max_steps=args.max_steps,
        batch_size=args.batch_size, seed=args.seed,
        checkpoint_every_n_epochs=args.checkpoint_every_n_epochs or None,
    )
    return common.build_barf_experiment(
        cfg, dm, trainer_cfg, args.out_dir, use_wandb=args.wandb,
        wandb_name=args.experiment_name, image_log_names=((), ["r_2"]),
    )


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
