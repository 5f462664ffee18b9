"""GARF / GaborF / SARF: calibrated NeRF with learnable-bandwidth activations.

One parameterized entry point replacing the three copy-dirs' mains
(`garf/main.py:18-192`, `gaborf/main.py`, `sarf/main.py`); select the
activation family with --activation. Defaults follow `garf/main.py`:
pose noise 0.15/0.15, camera LR 4e-3 -> 8e-4 over 2 epochs, activation LR
factor 16, init U(0.5, 2.0), proposal LR 5e-4 -> 5e-5 over 4 epochs
(weight decay 1e-8), radiance LR 2e-4 -> 2e-5 over 6 epochs (wd 1e-9),
64 proposal + 192 radiance samples, lindisp stratified sampling, 40 epochs,
mixed precision (bf16 here), seed 1337 / noise seed 13571113.
SARF overrides (`sarf/main.py`): activation LR factor 128, near-zero camera
LR. GaborF (`gaborf/main.py`): init U(0, 2), factor 128, 20 epochs.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.data import blender, sampler
from nerf_experiments_tpu.experiments import common
from nerf_experiments_tpu.models import garf
from nerf_experiments_tpu.systems import garf_system
from nerf_experiments_tpu.training import loggers
from nerf_experiments_tpu.training.trainer import Trainer, TrainerConfig

ACTIVATION_DEFAULTS = {
    "gauss": dict(act_lr_factor=16.0, init_min=0.5, init_max=2.0,
                  camera_lr=(4e-3, 8e-4), max_epochs=40),
    "gabor": dict(act_lr_factor=128.0, init_min=0.0, init_max=2.0,
                  camera_lr=(4e-3, 8e-4), max_epochs=20),
    "sarf": dict(act_lr_factor=128.0, init_min=0.5, init_max=2.0,
                 camera_lr=(4e-9, 8e-9), max_epochs=40),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--activation", choices=["gauss", "gabor", "sarf"], default="gauss")
    p.add_argument("--name", type=str, default=None)
    p.add_argument("--camera_origin_noise_sigma", type=float, default=0.15)
    p.add_argument("--camera_rotation_noise_sigma", type=float, default=0.15)
    p.add_argument("--camera_learning_rate_start", type=float, default=None)
    p.add_argument("--camera_learning_rate_stop", type=float, default=None)
    p.add_argument("--camera_learning_rate_decay_end", type=float, default=2.0,
                   help="in epochs (converted to steps like the reference)")
    p.add_argument("--activation_learning_rate_factor", type=float, default=None)
    p.add_argument("--init_min", type=float, default=None)
    p.add_argument("--init_max", type=float, default=None)
    p.add_argument("--proposal_learning_rate_start", type=float, default=5e-4)
    p.add_argument("--proposal_learning_rate_stop", type=float, default=5e-5)
    p.add_argument("--proposal_learning_rate_decay_end", type=float, default=4.0)
    p.add_argument("--proposal_weight_decay", type=float, default=1e-8)
    p.add_argument("--radiance_learning_rate_start", type=float, default=2e-4)
    p.add_argument("--radiance_learning_rate_stop", type=float, default=2e-5)
    p.add_argument("--radiance_learning_rate_decay_end", type=float, default=6.0)
    p.add_argument("--radiance_weight_decay", type=float, default=1e-9)
    p.add_argument("--proposal_samples_per_ray", type=int, default=64)
    p.add_argument("--radiance_samples_per_ray", type=int, default=192)
    p.add_argument("--scheduler_period_epoch_fraction", type=float, default=None,
                   help="gaborf-style rate-limited LR stepping (default 0.02 for gabor)")
    p.add_argument("--near", type=float, default=2.0)
    p.add_argument("--far", type=float, default=7.0)
    # gaborf conv-blur-with-decay target variant (`gaborf/dataset.py:324-440`)
    p.add_argument("--conv_blur", action="store_true", default=False,
                   help="decaying separable-Gaussian blur of the training "
                        "targets, re-blurred on device at each epoch-fraction "
                        "milestone (gaborf/mip_barf dataset variant)")
    p.add_argument("--blur_kernel_size", type=int, default=81)
    p.add_argument("--blur_relative_sigma_start", type=float, default=0.015)
    p.add_argument("--blur_relative_sigma_decay", type=float, default=0.99)
    p.add_argument("--checkpoint_every_n_epochs", type=float, default=None)
    p.add_argument("--resume", action="store_true", default=False,
                   help="resume from the latest checkpoint in out_dir/ckpt")
    p.add_argument("--camera_adam_eps", type=float, default=None,
                   help="Adam eps for the camera group; large values make "
                        "small camera updates gradient-proportional instead "
                        "of sign-normalized (anti-random-walk)")
    p.add_argument("--no_interlevel_camera_grads", action="store_true",
                   default=False,
                   help="detach the rays in the interlevel-loss branch so "
                        "the proposal histogram loss cannot push the camera "
                        "extrinsics (see GarfSystemConfig)")
    p.add_argument("--act_anneal_start_epoch", type=float, default=0.0,
                   help="activation coarse-to-fine annealing (gabor/sarf): "
                        "the oscillation term is scaled by gamma ramping "
                        "0 -> 1 between these epochs; 0/0 disables "
                        "(gamma = 1, reference semantics)")
    p.add_argument("--act_anneal_end_epoch", type=float, default=0.0)
    p.add_argument("--camera_freeze_start_epoch", type=float, default=0.0,
                   help="hold the camera extrinsics (LR = 0) between these "
                        "epochs, e.g. across the gamma ramp — the SARF 100k "
                        "run showed the ramp undoing converged calibration "
                        "(RESULTS.md); 0/0 disables")
    p.add_argument("--camera_freeze_end_epoch", type=float, default=0.0)
    p.add_argument("--camera_freeze_during_anneal", action="store_true",
                   default=False,
                   help="shortcut: freeze the cameras over exactly the "
                        "activation-anneal window")
    p.add_argument("--log_every_n_steps", type=int, default=50)
    p.add_argument("--fused_kernel", action="store_true", default=False,
                   help="run the radiance half of the step through the GARF "
                        "Pallas mega-kernel (ops/garf_megakernel.py; "
                        "gradient-exact, ~1.2x faster on TPU)")
    p.add_argument("--train_coarse_block", type=int, default=1,
                   help="share each proposal/estimator stage across this "
                        "many raster-consecutive rays (fused kernel only; "
                        "GarfSystemConfig.train_coarse_block + "
                        "TrainerConfig.batch_block)")
    common.add_common_args(p)
    p.set_defaults(seed=1337, max_epochs=None)
    return p.parse_args(argv)


def build(args):
    if args.camera_freeze_during_anneal:
        if args.camera_freeze_start_epoch or args.camera_freeze_end_epoch:
            raise SystemExit(
                "--camera_freeze_during_anneal conflicts with explicit "
                "--camera_freeze_start_epoch/--camera_freeze_end_epoch: the "
                "shortcut would silently override them; pass one or the other"
            )
        if not (args.act_anneal_end_epoch > args.act_anneal_start_epoch):
            raise SystemExit(
                "--camera_freeze_during_anneal is a no-op because the "
                "activation-anneal window is disabled "
                f"(act_anneal {args.act_anneal_start_epoch}.."
                f"{args.act_anneal_end_epoch}); set --act_anneal_start_epoch/"
                "--act_anneal_end_epoch or use explicit freeze epochs"
            )
    d = ACTIVATION_DEFAULTS[args.activation]
    act_factor = (d["act_lr_factor"]
                  if args.activation_learning_rate_factor is None
                  else args.activation_learning_rate_factor)
    init_min = d["init_min"] if args.init_min is None else args.init_min
    init_max = d["init_max"] if args.init_max is None else args.init_max
    # explicit 0.0 must freeze the camera, so no `or`-defaulting here
    cam_lr_start = (d["camera_lr"][0] if args.camera_learning_rate_start is None
                    else args.camera_learning_rate_start)
    cam_lr_stop = (d["camera_lr"][1] if args.camera_learning_rate_stop is None
                   else args.camera_learning_rate_stop)
    max_epochs = args.max_epochs or d["max_epochs"]

    scene = common.resolve_scene(args.scene_path, args.image_size)
    dm = blender.DataModule(
        scene_path=scene,
        image_width=args.image_size,
        image_height=args.image_size,
        space_transform_scale=1.0,
        space_transform_translate=None,
        rotation_noise_sigma=args.camera_rotation_noise_sigma,
        translation_noise_sigma=args.camera_origin_noise_sigma,
        camera_noise_seed=13571113,
        gaussian_blur_sigmas=(0.0,),
        validation_fraction=0.06,
        validation_fraction_shuffle=1234,
    )
    dm.setup("fit")
    train_store = sampler.make_ray_store(dm.dataset_train)
    val_store = sampler.make_ray_store(dm.dataset_val) if dm.dataset_val else None
    steps_per_epoch = max(1, train_store.n_rays // args.batch_size)

    def epochs_to_steps(e):
        return int(e * steps_per_epoch)

    compute_dtype = jnp.bfloat16 if args.bf16 else None
    net = garf.GarfConfig(
        activation=args.activation,
        init_min=init_min, init_max=init_max,
        learning_rate_start=args.radiance_learning_rate_start,
        learning_rate_stop=args.radiance_learning_rate_stop,
        learning_rate_decay_end=epochs_to_steps(args.radiance_learning_rate_decay_end),
        activation_learning_rate_factor=act_factor,
        weight_decay=args.radiance_weight_decay,
        compute_dtype=compute_dtype,
    )
    proposal_net = garf.GarfConfig(
        activation=args.activation,
        init_min=init_min, init_max=init_max,
        learning_rate_start=args.proposal_learning_rate_start,
        learning_rate_stop=args.proposal_learning_rate_stop,
        learning_rate_decay_end=epochs_to_steps(args.proposal_learning_rate_decay_end),
        activation_learning_rate_factor=act_factor,
        weight_decay=args.proposal_weight_decay,
        compute_dtype=compute_dtype,
    )
    period = args.scheduler_period_epoch_fraction
    if period is None and args.activation == "gabor":
        period = 0.02  # gaborf/main.py scheduler period
    cfg = garf_system.GarfSystemConfig(
        n_train_images=dm.n_training_images,
        near=args.near, far=args.far,
        proposal_samples_per_ray=args.proposal_samples_per_ray,
        radiance_samples_per_ray=args.radiance_samples_per_ray,
        net=net, proposal_net=proposal_net,
        camera_learning_rate_start=cam_lr_start,
        camera_learning_rate_stop=cam_lr_stop,
        camera_learning_rate_decay_end=epochs_to_steps(args.camera_learning_rate_decay_end),
        scheduler_steps_per_period=max(1, epochs_to_steps(period)) if period else 1,
        interlevel_camera_grads=not args.no_interlevel_camera_grads,
        camera_adam_eps=args.camera_adam_eps,
        act_anneal_start_step=epochs_to_steps(args.act_anneal_start_epoch),
        act_anneal_end_step=epochs_to_steps(args.act_anneal_end_epoch),
        camera_freeze_start_step=epochs_to_steps(
            args.act_anneal_start_epoch if args.camera_freeze_during_anneal
            else args.camera_freeze_start_epoch),
        camera_freeze_end_step=epochs_to_steps(
            args.act_anneal_end_epoch if args.camera_freeze_during_anneal
            else args.camera_freeze_end_epoch),
        train_coarse_block=args.train_coarse_block,
    )
    if args.train_coarse_block > 1:
        assert args.fused_kernel, "--train_coarse_block requires --fused_kernel"

    state = garf_system.init(jax.random.PRNGKey(args.seed), cfg)
    tx = garf_system.make_optimizer(cfg, state.params)
    mesh = common.mesh_from_flag(args.mesh)
    if mesh is not None:
        from nerf_experiments_tpu.parallel import mesh as mesh_lib
        from nerf_experiments_tpu.parallel import shard as shard_lib

        state = state.replace(
            params=mesh_lib.shard_params(state.params, mesh),
            opt_state=mesh_lib.shard_params(state.opt_state, mesh),
        )
        unjitted = lambda s, b, k, an=1.0: garf_system.train_step(
            s, cfg, tx, b, k, an)
        step_fn = shard_lib.pjit_train_step(unjitted, mesh, donate=True)
    else:
        step_fn = (
            garf_system.make_train_step_fused(cfg, tx, donate=True)
            if args.fused_kernel
            else garf_system.make_train_step(cfg, tx, donate=True))

    raw = train_store.camera_origins_raw
    noisy = train_store.camera_origins_noisy
    pose_fn = jax.jit(
        lambda params: garf_system.pose_error_metric(params, raw, noisy)
    )

    @jax.jit
    def val_step(params, batch, act_anneal=1.0):
        from nerf_experiments_tpu.cameras import calibration

        # evaluate at the LIVE anneal gamma (the trainer threads the
        # schedule scalars through): during the Gaussian-held phase the
        # oscillation term is off in training, so val must match — a
        # gamma=1 eval of gamma=0-trained weights reads ~6 dB flat
        # (observed on the r3 SARF run) regardless of the actual fit
        gauge = calibration.post_transform_params(params["camera"], raw, noisy)
        _, metrics = garf_system.loss_fn(params, cfg, batch, None, train=False,
                                         val_gauge=gauge,
                                         act_anneal=act_anneal)
        return metrics

    name = args.name or (
        f"{args.activation}:r{args.camera_rotation_noise_sigma:.2f}"
        f"+t{args.camera_origin_noise_sigma:.2f}"
    )
    metric_logger = loggers.MetricLogger(
        args.out_dir, use_wandb=args.wandb,
        wandb_kwargs={"project": "nerf-experiments", "name": name},
    )

    from nerf_experiments_tpu.utils import regalloc

    safe_batch, _ = regalloc.safe_batch_size(
        args.batch_size,
        samples_per_ray=args.proposal_samples_per_ray + args.radiance_samples_per_ray,
        fused=args.fused_kernel,
        image_size=args.image_size, n_images=dm.n_training_images,
    )
    trainer_cfg = TrainerConfig(
        max_epochs=max_epochs, max_steps=args.max_steps,
        batch_size=safe_batch, seed=args.seed,
        checkpoint_every_n_epochs=args.checkpoint_every_n_epochs,
        log_every_n_steps=args.log_every_n_steps,
        batch_block=args.train_coarse_block,
    )
    # ray-density profile logger (`garf/ray_logger.py` parity): density along
    # the center ray of a named train image, from both networks
    @jax.jit
    def density_profiles(params, pos, dirs):
        from nerf_experiments_tpu.models import garf as garf_models

        rad_rgb, rad_density = garf_models.radiance_apply(
            params["radiance"], cfg.net, pos, dirs
        )
        prop_density = garf_models.proposal_apply(params["proposal"], cfg.prop_cfg, pos)
        return {
            "radiance_density": rad_density,
            "proposal_density": prop_density,
            "rgb": rad_rgb,
        }

    # full-image reconstruction logging (`garf/image_logger.py` parity):
    # train images through the learned extrinsics, val through the gauge
    fused_render = garf_system.use_fused_render(cfg)

    @jax.jit
    def render_garf_train(params, origs, dirs, img_idx):
        from nerf_experiments_tpu.cameras import calibration

        o, d = calibration.training_transform_rays(
            params["camera"], jnp.full((origs.shape[0],), img_idx, jnp.int32),
            origs, dirs,
        )
        rgb, _, _, _ = garf_system.forward(
            params, cfg, None, o, d, stratified=False, fused=fused_render)
        return jnp.clip(rgb, 0.0, 1.0)

    @jax.jit
    def render_garf_val(params, origs, dirs):
        from nerf_experiments_tpu.cameras import calibration

        gauge = calibration.post_transform_params(params["camera"], raw, noisy)
        o, d = calibration.validation_transform_rays(origs, dirs, gauge)
        rgb, _, _, _ = garf_system.forward(
            params, cfg, None, o, d, stratified=False, fused=fused_render)
        return jnp.clip(rgb, 0.0, 1.0)

    def garf_render_fn(params, origs, dirs, pw, train_space, img_idx):
        if train_space:
            return render_garf_train(params, jnp.asarray(origs), jnp.asarray(dirs), img_idx)
        return render_garf_val(params, jnp.asarray(origs), jnp.asarray(dirs))

    img_logger = loggers.ImageReconstructionLogger(
        render_fn=garf_render_fn,
        metric_logger=metric_logger,
        train_image_names=["r_1"],
        validation_image_names=["r_2"],
        schedule=loggers.TaperSchedule(0.002, 1 / 24, 1.0, 5.0),
    )

    ray_logger = loggers.RayDensityLogger(
        density_fn=lambda params, pos, dirs: density_profiles(
            params, jnp.asarray(pos), jnp.asarray(dirs)
        ),
        metric_logger=metric_logger,
        image_names=["r_1"],
        near=args.near, far=args.far,
        schedule=loggers.TaperSchedule(0.002, 1 / 24, 1.0, 5.0),
    )
    callbacks = [
        lambda trainer, state, step, ef: ray_logger.maybe_log(
            ef, step, state.params, dm.dataset_train
        ),
        lambda trainer, state, step, ef: img_logger.maybe_log(
            ef, step, state.params, dm
        ),
    ]
    conv_blur = None
    if args.conv_blur:
        from nerf_experiments_tpu.ops.image_blur import ConvBlurTargets

        raw_images = dm.dataset_train.images[:, :, :, -1]  # sigma-0 slot
        conv_blur = ConvBlurTargets(
            raw_images,
            kernel_size=args.blur_kernel_size,
            relative_sigma_start=args.blur_relative_sigma_start,
            relative_sigma_decay=args.blur_relative_sigma_decay,
            epoch_fraction_period=period or 0.02,
            n_sigma_slots=dm.dataset_train.images.shape[3],
        )
        callbacks.append(conv_blur)

    ckpt_mgr = None
    if args.checkpoint_every_n_epochs or args.resume:
        import os as _os

        from nerf_experiments_tpu.training.checkpoints import CheckpointManager

        ckpt_mgr = CheckpointManager(
            _os.path.abspath(_os.path.join(args.out_dir, "ckpt")))

    trainer = Trainer(
        cfg=trainer_cfg,
        train_store=train_store,
        step_fn=lambda state, batch, key, *sc: step_fn(
            state, batch, key, *sc),
        scalar_fn=lambda step, ef: (cfg.act_anneal_at(step),),
        metric_logger=metric_logger,
        val_store=val_store,
        val_fn=val_step,
        pose_error_fn=pose_fn,
        callbacks=callbacks,
        lr_fn=garf_system.lr_fn(cfg, state.params),
        checkpoint_manager=ckpt_mgr,
    )
    if args.resume and ckpt_mgr is not None and ckpt_mgr.latest_step() is not None:
        state = ckpt_mgr.restore(state)
        print(f"resumed from step {ckpt_mgr.latest_step()}")
    if conv_blur is not None:
        # targets start blurred at the sigma an uninterrupted run would
        # have here: the trainer fires callbacks with the epoch fraction of
        # the step JUST EXECUTED, so after `state.step` steps the ladder
        # state is sync_to(ef(step - 1))
        conv_blur.sync_to(
            trainer.epoch_fraction(max(0, int(state.step) - 1)))
        trainer._train_arrays = trainer.train_store.arrays()
        trainer.swap_train_colors(conv_blur.flat_colors())
    return cfg, state, trainer


def main(argv=None):
    args = parse_args(argv)
    cfg, state, trainer = build(args)
    return trainer.fit(state)


if __name__ == "__main__":
    main()
