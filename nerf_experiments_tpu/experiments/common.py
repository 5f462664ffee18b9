"""Shared experiment wiring: scene resolution, stores, loggers, BARF system
assembly. Replaces the reference's 14 copy-evolved run scripts with one
builder + thin CLIs (SURVEY.md §7.1 design delta)."""
from __future__ import annotations

import argparse
import dataclasses
import math
import os
import tempfile
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.cameras import calibration
from nerf_experiments_tpu.data import blender, sampler, synthetic
from nerf_experiments_tpu.systems import barf as barf_sys
from nerf_experiments_tpu.training import loggers, schedules
from nerf_experiments_tpu.training.trainer import Trainer, TrainerConfig
from nerf_experiments_tpu.utils import regalloc


def resolve_scene(scene_path: str, image_size: int) -> str:
    """Resolve a scene path; "synthetic" generates a procedural Blender-format
    scene into a cache dir (the lego data is not shipped with this repo)."""
    if scene_path != "synthetic":
        return scene_path
    cache = os.path.join(tempfile.gettempdir(), f"netpu_synth_{image_size}")
    if not os.path.exists(os.path.join(cache, "transforms_train.json")):
        synthetic.generate_dataset(cache, image_size=image_size)
    return cache


def blur_sigmas_from_start(start_blur_sigma: float, n_blur_sigmas: int) -> Tuple[float, ...]:
    """The reference's geometric blur-sigma ladder (`barf/run_barf.py:48-53`):
    2^linspace(-1, log2(start), n-1) reversed, then 0.0 appended."""
    if start_blur_sigma <= 0.25:
        return (0.0, 0.0)
    if n_blur_sigmas <= 2:
        return (start_blur_sigma, 0.0)
    exps = np.linspace(-1, math.log2(start_blur_sigma), n_blur_sigmas - 1)
    ladder = [round(float(2.0**e), 2) for e in exps[::-1]]
    return tuple(ladder + [0.0])


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--scene_path", type=str, default="synthetic",
                   help="Blender dataset dir, or 'synthetic' for the generated scene")
    p.add_argument("--mesh", type=str, default="",
                   help="device mesh for SPMD training: '' (single device), "
                        "'auto' (all devices data-parallel), or 'DxM' "
                        "(D-way data x M-way model parallel), e.g. '4x2'")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=1024)
    p.add_argument("--max_epochs", type=int, default=100)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--out_dir", type=str, default="runs/latest")
    p.add_argument("--seed", type=int, default=134534)
    p.add_argument("--wandb", action="store_true", default=False)
    p.add_argument("--bf16", action="store_true", default=False)


def mesh_from_flag(mesh_flag: str):
    """'' -> None; 'auto' -> all devices on the data axis; 'DxM' -> explicit
    (data x model) mesh. The returned jax.sharding.Mesh drives pjit sharding
    of the train step and ray-parallel rendering (SURVEY.md §5.8)."""
    if not mesh_flag:
        return None
    from nerf_experiments_tpu.parallel import mesh as mesh_lib

    if mesh_flag == "auto":
        return mesh_lib.make_mesh()
    n_data, n_model = (int(v) for v in mesh_flag.lower().split("x"))
    return mesh_lib.make_mesh(n_data, n_model)


@dataclasses.dataclass
class BarfExperiment:
    cfg: barf_sys.BarfConfig
    state: barf_sys.TrainState
    trainer: Trainer
    dm: blender.DataModule
    train_store: sampler.RayStore

    def fit(self):
        return self.trainer.fit(self.state)


def build_barf_experiment(
    cfg: barf_sys.BarfConfig,
    dm: blender.DataModule,
    trainer_cfg: TrainerConfig,
    out_dir: str,
    use_wandb: bool = False,
    wandb_name: Optional[str] = None,
    alpha_schedules=None,  # (pos_alpha_fn(epoch), dir_alpha_fn(epoch)) or None
    image_log_names: Tuple[Sequence[str], Sequence[str]] = ((), ()),
    checkpoint_keep: Optional[int] = None,
    mesh=None,  # jax.sharding.Mesh => SPMD train step + sharded rendering
    image_log_taper: Optional[Tuple[float, float, float, float]] = None,
    fused: bool = False,  # training mega-kernel step (flagship dense config)
) -> BarfExperiment:
    dm.setup("fit")
    # one chokepoint for the known libtpu regalloc crash modes: cap the batch
    # (with a warning) instead of letting default flags reach a hard crash
    samples = cfg.samples_per_ray_radiance + cfg.samples_per_ray_proposal
    capped, _ = regalloc.safe_batch_size(
        trainer_cfg.batch_size, samples_per_ray=samples, fused=fused,
        image_size=max(dm.image_width, dm.image_height),
        n_images=cfg.n_training_images,
    )
    if capped != trainer_cfg.batch_size:
        trainer_cfg = dataclasses.replace(trainer_cfg, batch_size=capped)
    train_store = sampler.make_ray_store(dm.dataset_train)
    val_store = sampler.make_ray_store(dm.dataset_val) if dm.dataset_val else None

    key = jax.random.PRNGKey(trainer_cfg.seed)
    state = barf_sys.init(key, cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)
    if mesh is not None:
        from nerf_experiments_tpu.parallel import mesh as mesh_lib
        from nerf_experiments_tpu.parallel import shard as shard_lib

        # params (and matching Adam moments) on the mesh: replicated, or
        # output-dim-sharded over the "model" axis when it is >1
        state = state.replace(
            params=mesh_lib.shard_params(state.params, mesh),
            opt_state=mesh_lib.shard_params(state.opt_state, mesh),
        )
        if (fused and barf_sys.can_fuse_train_step(cfg)
                and mesh.shape.get(mesh_lib.MODEL_AXIS, 1) == 1):
            # data-parallel mega-kernel: each device runs the Pallas kernel
            # on its ray shard, grads pmean over ICI (params replicated)
            step_fn = shard_lib.shard_map_train_step_fused(
                cfg, tx, mesh, donate=True)
        else:
            unjitted = lambda s, b, k, *sc: barf_sys.train_step(
                s, cfg, tx, b, k, *sc)
            step_fn = shard_lib.pjit_train_step(unjitted, mesh, donate=True)
    else:
        step_fn = barf_sys.make_train_step(cfg, tx, donate=True, fused=fused)

    # NerfMLPConfig has encoders; generic ModelDefs (hash grids, SIREN) don't
    pos_enc = getattr(cfg.radiance, "position_encoder", None)
    dir_enc = getattr(cfg.radiance, "direction_encoder", None)

    def scalar_fn(step: int, epoch_frac: float):
        if alpha_schedules is not None:
            a_pos = alpha_schedules[0](epoch_frac)
            a_dir = alpha_schedules[1](epoch_frac)
        else:
            a_pos = (
                pos_enc.alpha_at(epoch_frac)
                if hasattr(pos_enc, "alpha_at")
                else jnp.asarray(0.0)
            )
            a_dir = (
                dir_enc.alpha_at(epoch_frac)
                if hasattr(dir_enc, "alpha_at")
                else jnp.asarray(0.0)
            )
        sigma = schedules.barf_sigma_alpha(jnp.asarray(a_pos), cfg.max_gaussian_sigma)
        return (jnp.asarray(a_pos), jnp.asarray(a_dir), sigma)

    raw = train_store.camera_origins_raw
    noisy = train_store.camera_origins_noisy

    pose_fn = jax.jit(lambda params: barf_sys.pose_error_metric(params, raw, noisy))

    @jax.jit
    def val_step(params, batch):
        gauge = barf_sys.val_gauge(params, raw, noisy)
        # validation uses fully-unlocked encodings (alpha = levels)
        a_pos = jnp.asarray(float(getattr(pos_enc, "levels", 0)))
        a_dir = jnp.asarray(float(getattr(dir_enc, "levels", 0)))
        _, metrics = barf_sys.loss_fn(
            params, cfg, batch, jax.random.PRNGKey(0), a_pos, a_dir,
            jnp.asarray(0.0), train=False, val_gauge=gauge,
        )
        return metrics

    metric_logger = loggers.MetricLogger(
        out_dir, use_wandb=use_wandb,
        wandb_kwargs={"project": "nerf-experiments", "name": wandb_name},
    )

    # image reconstruction callback (tapered like the reference's)
    callbacks = []
    train_names, val_names = image_log_names
    if train_names or val_names:
        fused_render = barf_sys.use_fused_render(cfg)

        @jax.jit
        def render_train(params, origs, dirs, pw, img_idx):
            o, d = calibration.training_transform_rays(
                params["camera"], jnp.full((origs.shape[0],), img_idx, jnp.int32), origs, dirs
            )
            rgb, _ = barf_sys.forward(
                params, cfg, None, o, d, pw,
                jnp.asarray(float(getattr(pos_enc, "levels", 0))),
                jnp.asarray(float(getattr(dir_enc, "levels", 0))),
                stratified=False, fused=fused_render,
            )
            return jnp.clip(rgb, 0.0, 1.0)

        @jax.jit
        def render_val(params, origs, dirs, pw):
            gauge = barf_sys.val_gauge(params, raw, noisy)
            o, d = calibration.validation_transform_rays(origs, dirs, gauge)
            rgb, _ = barf_sys.forward(
                params, cfg, None, o, d, pw,
                jnp.asarray(float(getattr(pos_enc, "levels", 0))),
                jnp.asarray(float(getattr(dir_enc, "levels", 0))),
                stratified=False, fused=fused_render,
            )
            return jnp.clip(rgb, 0.0, 1.0)

        def render_fn(params, origs, dirs, pw, train_space, img_idx):
            if train_space:
                return render_train(params, jnp.asarray(origs), jnp.asarray(dirs),
                                    jnp.asarray(pw), img_idx)
            return render_val(params, jnp.asarray(origs), jnp.asarray(dirs), jnp.asarray(pw))

        taper = image_log_taper or (0.002, 1 / 24, 1.0, 5.0)
        img_logger = loggers.ImageReconstructionLogger(
            render_fn=render_fn,
            metric_logger=metric_logger,
            train_image_names=train_names,
            validation_image_names=val_names,
            schedule=loggers.TaperSchedule(*taper),
        )
        callbacks.append(
            lambda trainer, state, step, ef: img_logger.maybe_log(ef, step, state.params, dm)
        )

        point_logger = loggers.CameraPointLogger(
            predict_origins_fn=jax.jit(
                lambda params: calibration.predicted_train_origins(params["camera"], noisy)
            ),
            metric_logger=metric_logger,
            schedule=loggers.TaperSchedule(0.0, 1 / 200, 1 / 16, 4.0),
        )
        callbacks.append(
            lambda trainer, state, step, ef: point_logger.maybe_log(ef, step, state.params, raw)
        )

    ckpt_mgr = None
    if trainer_cfg.checkpoint_every_n_epochs:
        from nerf_experiments_tpu.training.checkpoints import CheckpointManager

        ckpt_mgr = CheckpointManager(os.path.join(out_dir, "ckpt"), keep=checkpoint_keep)

    trainer = Trainer(
        cfg=trainer_cfg,
        train_store=train_store,
        step_fn=step_fn,
        scalar_fn=scalar_fn,
        metric_logger=metric_logger,
        val_store=val_store,
        val_fn=val_step,
        pose_error_fn=pose_fn,
        checkpoint_manager=ckpt_mgr,
        callbacks=callbacks,
        lr_fn=barf_sys.lr_fn(cfg, state.params),
    )
    return BarfExperiment(cfg=cfg, state=state, trainer=trainer, dm=dm, train_store=train_store)
