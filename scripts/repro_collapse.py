"""Deterministic repro of the 256^2 fused-kernel density collapse (NEXT #4).

Phase 1 (this script, REPRO_PHASE=train): rerun the quality_barf_256 config
through the training mega-kernel at batch 8192 up to just before the
observed collapse (~step 7.6k), checkpointing every epoch (192 steps).

Phase 2 (REPRO_PHASE=probe): resume the trainer state from the latest
checkpoint and step MANUALLY through the jump, logging per-step loss,
max raw density, per-group grad/update norms; dump params+batch around the
first step whose loss jumps.

The per-step PRNG is fold_in(base, step), so resuming reproduces the
uninterrupted trajectory bit-for-bit (trainer.py:130-136).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 256
SCENE = f"/tmp/netpu_quality_scene_{SIZE}"
OUT = os.environ.get("REPRO_OUT", "runs/repro_collapse")
PHASE = os.environ.get("REPRO_PHASE", "train")
STEPS = int(os.environ.get("REPRO_STEPS", 7400))

from nerf_experiments_tpu.data import synthetic

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

ARGS = [
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "8192", "--max_steps", str(STEPS),
    "--samples_per_ray", "128",
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--lr_decay_end_step", "60000",
    "--alpha_decay_start_step", "2000",
    "--alpha_decay_end_step", "30000",
    "--checkpoint_every_n_epochs", "1",
    "--image_log_period_epochs", "1000",
    "--bf16", "--fused_kernel",
    "--out_dir", OUT,
]

from nerf_experiments_tpu.experiments import run_barf  # noqa: E402

if PHASE == "train":
    run_barf.main(ARGS)
    print(json.dumps({"phase": "train", "done_steps": STEPS}))
    sys.exit(0)

# ---- phase 2: manual stepping from the latest checkpoint ----
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nerf_experiments_tpu.data import sampler as sampler_lib  # noqa: E402
from nerf_experiments_tpu.systems import barf as barf_sys  # noqa: E402

from nerf_experiments_tpu.training.checkpoints import CheckpointManager  # noqa: E402

args = run_barf.parse_args(ARGS)
exp = run_barf.build(args)
trainer, state = exp.trainer, exp.state
mgr = CheckpointManager(os.path.join(OUT, "ckpt"))
state = mgr.restore(state, step=int(os.environ.get("REPRO_FROM", 0)) or None)
start_step = int(state.step)
print(f"resumed at step {start_step}", flush=True)

base_key, _ = jax.random.split(jax.random.PRNGKey(trainer.cfg.seed))
arrays = trainer.train_store.arrays()
pixel_width = trainer.train_store.pixel_width
n_rays = trainer.train_store.n_rays
batch_size = trainer.cfg.batch_size

cfg = exp.cfg
tx = barf_sys.make_optimizer(cfg, state.params)


def make_batch(step):
    key = jax.random.fold_in(base_key, step)
    k_batch, k_step = jax.random.split(key)
    idx = jax.random.randint(k_batch, (batch_size,), 0, n_rays)
    return sampler_lib.gather_batch_arrays(arrays, pixel_width, idx), k_step


@jax.jit
def probe_stats(params, batch, a_pos, a_dir):
    """Forward-only density probe on the current batch's rays."""
    from nerf_experiments_tpu.cameras import calibration
    from nerf_experiments_tpu.ops import sampling
    origs, dirs = calibration.training_transform_rays(
        params["camera"], batch["img_idx"], batch["origs_noisy"],
        batch["dirs_noisy"])
    t_start, t_end = sampling.sample_stratified(
        None, origs.shape[0], cfg.samples_per_ray_radiance, cfg.near,
        cfg.far, "equidistant", 0.0)
    dens, rgb = barf_sys._eval_model(
        barf_sys._model_def(cfg.radiance), params["radiance"], origs, dirs,
        t_start, t_end, batch["pixel_width"], a_pos, a_dir, "middle")
    return {
        "dens_max": jnp.max(dens),
        "dens_mean": jnp.mean(dens),
        "dens_p999": jnp.percentile(dens, 99.9),
    }


step_fn = barf_sys.make_train_step(cfg, tx, donate=False, fused=True)

grad_fn = jax.jit(lambda params, batch, key, a_pos, a_dir, sigma: jax.tree_util.tree_map(
    lambda g: jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2)),
    jax.grad(lambda p: barf_sys.loss_fn(
        p, cfg, batch, key, a_pos, a_dir, sigma)[0])(params)))

log_path = os.path.join(OUT, "probe_log.jsonl")
prev_loss = None
collapse_at = None
with open(log_path, "a") as f:
    for step in range(start_step, start_step + int(os.environ.get("REPRO_PROBE_STEPS", 700))):
        scalars = trainer._host_scalars(step, trainer.epoch_fraction(step))
        batch, k_step = make_batch(step)
        new_state, metrics = step_fn(state, batch, k_step, *scalars)
        loss = float(np.asarray(metrics["loss"]))
        stats = {k: float(np.asarray(v))
                 for k, v in probe_stats(state.params, batch,
                                         scalars[0], scalars[1]).items()}
        row = {"step": step, "loss": loss, **stats,
               "grads_finite": float(np.asarray(metrics["grads_finite"]))}
        f.write(json.dumps(row) + "\n")
        f.flush()
        if step % 20 == 0 or (prev_loss and loss > 5 * prev_loss + 1e-4):
            print(row, flush=True)
        if prev_loss is not None and loss > 10 * prev_loss + 1e-3 and collapse_at is None:
            collapse_at = step
            print(f"COLLAPSE at step {step}: loss {prev_loss} -> {loss}", flush=True)
            np.savez(os.path.join(OUT, f"collapse_params_{step}.npz"),
                     **{f"flat_{i}": np.asarray(x) for i, x in enumerate(
                         jax.tree_util.tree_leaves(state.params))})
            gnorms = grad_fn(state.params, batch, k_step, scalars[0],
                             scalars[1], scalars[2])
            flatg, treedef = jax.tree_util.tree_flatten_with_path(gnorms)
            for path, v in flatg:
                print("gradnorm", jax.tree_util.keystr(path),
                      float(np.asarray(v)), flush=True)
            np.savez(os.path.join(OUT, f"collapse_batch_{step}.npz"),
                     **{k: np.asarray(v) for k, v in batch.items()})
        prev_loss = loss
        state = new_state
print(json.dumps({"phase": "probe", "collapse_at": collapse_at}))
