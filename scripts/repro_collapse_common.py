"""Shared setup for the 256^2 collapse investigation scripts: rebuild the
exact quality_barf_256/fused-8192 experiment, restore a checkpoint, and
expose the trainer's deterministic batch stream (fold_in(base, step))."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def setup(out_dir: str, from_step: int, steps: int = 7400):
    from nerf_experiments_tpu.data import synthetic
    from nerf_experiments_tpu.experiments import run_barf
    from nerf_experiments_tpu.training.checkpoints import CheckpointManager
    from nerf_experiments_tpu.data import sampler as sampler_lib
    from nerf_experiments_tpu.systems import barf as barf_sys

    SIZE = 256
    scene = f"/tmp/netpu_quality_scene_{SIZE}"
    if not os.path.exists(os.path.join(scene, "transforms_train.json")):
        synthetic.generate_dataset(scene, n_train=24, n_val=4, n_test=6,
                                   image_size=SIZE, n_samples=128)
    args = run_barf.parse_args([
        "--scene_path", scene, "--image_size", str(SIZE),
        "--batch_size", "8192", "--max_steps", str(steps),
        "--samples_per_ray", "128",
        "--camera_origin_noise_sigma", "0.15",
        "--camera_rotation_noise_sigma", "0.15",
        "--lr_decay_end_step", "60000",
        "--alpha_decay_start_step", "2000",
        "--alpha_decay_end_step", "30000",
        "--checkpoint_every_n_epochs", "1",
        "--image_log_period_epochs", "1000",
        "--bf16", "--fused_kernel",
        "--out_dir", out_dir,
    ])
    exp = run_barf.build(args)
    trainer, state = exp.trainer, exp.state
    mgr = CheckpointManager(os.path.join(out_dir, "ckpt"))
    state = mgr.restore(state, step=from_step)
    print(f"resumed at step {int(state.step)}", flush=True)

    cfg = exp.cfg
    tx = barf_sys.make_optimizer(cfg, state.params)

    base_key, _ = jax.random.split(jax.random.PRNGKey(trainer.cfg.seed))
    arrays = trainer.train_store.arrays()
    pixel_width = trainer.train_store.pixel_width
    n_rays = trainer.train_store.n_rays
    batch_size = trainer.cfg.batch_size

    @jax.jit
    def _mk(step_idx):
        key = jax.random.fold_in(base_key, step_idx)
        k_batch, k_step = jax.random.split(key)
        idx = jax.random.randint(k_batch, (batch_size,), 0, n_rays)
        return sampler_lib.gather_batch_arrays(arrays, pixel_width, idx), k_step

    def make_batch(step):
        return _mk(step)

    def scalars_at(step):
        return trainer._host_scalars(step, trainer.epoch_fraction(step))

    return exp, trainer, state, cfg, tx, make_batch, scalars_at
