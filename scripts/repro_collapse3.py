"""Phase 3 of the 256^2 collapse investigation: at the collapse step (7580),
compare the mega-kernel's gradients against the XLA autodiff gradients
computed in 2x4096 chunks (the XLA dense path regalloc-crashes at 8192),
then roll both updates forward to see which trajectory collapses.

Run: REPRO_PHASE unused; needs runs/repro_collapse/ckpt from phase 1.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts import repro_collapse_common as C  # noqa: E402

OUT = "runs/repro_collapse"
FROM_STEP = 7400
WATCH_FROM = int(os.environ.get("REPRO_WATCH_FROM", 7574))
WATCH_TO = int(os.environ.get("REPRO_WATCH_TO", 7590))

(exp, trainer, state, cfg, tx, make_batch, scalars_at) = C.setup(OUT, FROM_STEP)

from nerf_experiments_tpu.systems import barf as barf_sys  # noqa: E402
from nerf_experiments_tpu.ops.train_megakernel import flagship_train_grads  # noqa: E402
from nerf_experiments_tpu.cameras import calibration  # noqa: E402
from nerf_experiments_tpu.data.sampler import blurred_pixel_colors  # noqa: E402
from nerf_experiments_tpu.ops import sampling  # noqa: E402

step_fn = barf_sys.make_train_step(cfg, tx, donate=True, fused=True)
step_fn_nodonate = barf_sys.make_train_step(cfg, tx, donate=False, fused=True)

mlp_cfg = cfg.radiance

# For the kernel-vs-XLA gradient comparison both paths must see IDENTICAL
# t samples: the kernel draws offsets for 8192 rays while the chunked XLA
# path would draw per-4096-chunk — so compare under deterministic
# equidistant bins (offset 0). The rolled-forward trajectory (step_fn)
# keeps the real stratified sampling.
import dataclasses

cfg_det = dataclasses.replace(cfg, uniform_sampling_strategy="equidistant",
                              uniform_sampling_offset_size=0.0)


def kernel_grads(params, batch, key, a_pos, a_dir, sigma):
    """Replicate train_step_fused's gradient computation (no update)."""
    (origs, dirs), vjp_cam = jax.vjp(
        lambda cam: calibration.training_transform_rays(
            cam, batch["img_idx"], batch["origs_noisy"], batch["dirs_noisy"]),
        params["camera"])
    colors = blurred_pixel_colors(batch["colors"], cfg_det.gaussian_blur_sigmas, sigma)
    target = colors[:, 0]
    n_rays = origs.shape[0]
    t_start, t_end = sampling.sample_stratified(
        None, n_rays, cfg_det.samples_per_ray_radiance, cfg_det.near,
        cfg_det.far, cfg_det.uniform_sampling_strategy,
        cfg_det.uniform_sampling_offset_size)
    rgb, grads_rad, d_origs, d_dirs = flagship_train_grads(
        params["radiance"], mlp_cfg, origs, dirs, t_start, t_end, target,
        a_pos, a_dir)
    (d_cam,) = vjp_cam((d_origs, d_dirs))
    loss = jnp.mean((rgb - target) ** 2)
    return {"radiance": grads_rad, "camera": d_cam}, loss


@jax.jit
def xla_chunk_grad(params, sub, key, a_pos, a_dir, sigma):
    """One 4096-ray chunk through XLA autodiff in its OWN program — the
    dense path regalloc-crashes at >= 1M samples per program, so the two
    chunks must be separate jit calls, averaged on the host."""
    (loss, _), g = jax.value_and_grad(barf_sys.loss_fn, has_aux=True)(
        params, cfg_det, sub, key, a_pos, a_dir, sigma)
    return g, loss


def xla_grads_chunked(params, batch, key, a_pos, a_dir, sigma, n_chunks=2):
    n = batch["origs_noisy"].shape[0]
    c = n // n_chunks
    acc, losses = None, []
    for i in range(n_chunks):
        sub = {k: (v[i * c:(i + 1) * c]
                   if hasattr(v, "shape") and v.shape[:1] == (n,) else v)
               for k, v in batch.items()}
        g, loss = xla_chunk_grad(params, sub, key, a_pos, a_dir, sigma)
        losses.append(float(np.asarray(loss)))
        g = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), g)
        acc = g if acc is None else jax.tree_util.tree_map(np.add, acc, g)
    g = jax.tree_util.tree_map(lambda x: x / n_chunks, acc)
    return g, sum(losses) / n_chunks


kernel_grads_j = jax.jit(kernel_grads)
xla_grads_j = xla_grads_chunked


def gnorms(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[jax.tree_util.keystr(path)] = float(np.asarray(
            jnp.sqrt(jnp.sum(leaf.astype(jnp.float32) ** 2))))
    return out


def top_diffs(ga, gb, k=12):
    rows = []
    fa = dict(jax.tree_util.tree_flatten_with_path(ga)[0])
    fb = dict(jax.tree_util.tree_flatten_with_path(gb)[0])
    for path in fa:
        a = np.asarray(fa[path], np.float32)
        b = np.asarray(fb[path], np.float32)
        na, nb = float(np.linalg.norm(a)), float(np.linalg.norm(b))
        nd = float(np.linalg.norm(a - b))
        rel = nd / (nb + 1e-12)
        rows.append((rel, nd, na, nb, jax.tree_util.keystr(path)))
    rows.sort(reverse=True)
    return rows[:k]


raw = trainer.train_store.camera_origins_raw
noisy = trainer.train_store.camera_origins_noisy
pose_fn = jax.jit(lambda p: barf_sys.pose_error_metric(p, raw, noisy))


@jax.jit
def dens_stats(params, batch, a_pos, a_dir):
    origs, dirs = calibration.training_transform_rays(
        params["camera"], batch["img_idx"], batch["origs_noisy"],
        batch["dirs_noisy"])
    t_start, t_end = sampling.sample_stratified(
        None, origs.shape[0], cfg.samples_per_ray_radiance, cfg.near,
        cfg.far, "equidistant", 0.0)
    dens, _ = barf_sys._eval_model(
        barf_sys._model_def(cfg.radiance), params["radiance"], origs, dirs,
        t_start, t_end, batch["pixel_width"], a_pos, a_dir, "middle")
    return (jnp.max(dens), jnp.mean(dens),
            jnp.mean((dens < 1e-3).astype(jnp.float32)))


# ---- fast-forward to WATCH_FROM ----
step = FROM_STEP
while step < WATCH_FROM:
    scalars = scalars_at(step)
    batch, k_step = make_batch(step)
    state, metrics = step_fn(state, batch, k_step, *scalars)
    step += 1
    if step % 50 == 0:
        print("ff", step, float(np.asarray(metrics["loss"])), flush=True)

# ---- watch window: per-step kernel-vs-XLA gradient comparison ----
import copy

for step in range(WATCH_FROM, WATCH_TO):
    scalars = scalars_at(step)
    batch, k_step = make_batch(step)
    gk, lk = kernel_grads_j(state.params, batch, k_step, *scalars)
    gx, lx = xla_grads_j(state.params, batch, k_step, *scalars)
    diffs = top_diffs(gk, gx, k=5)
    print(json.dumps({
        "step": step,
        "loss_kernel": float(np.asarray(lk)),
        "loss_xla": float(np.asarray(lx)),
        "top_grad_diffs": [
            {"rel": round(r, 4), "norm_diff": nd, "norm_kernel": na,
             "norm_xla": nb, "path": p} for r, nd, na, nb, p in diffs],
    }), flush=True)
    new_state, metrics = step_fn_nodonate(state, batch, k_step, *scalars)
    loss_next = float(np.asarray(metrics["loss"]))
    # biggest parameter movers this step
    upd = jax.tree_util.tree_map(
        lambda a, b: jnp.sqrt(jnp.sum((a.astype(jnp.float32)
                                       - b.astype(jnp.float32)) ** 2)),
        new_state.params, state.params)
    movers = sorted(((float(np.asarray(v)),
                      jax.tree_util.keystr(p))
                     for p, v in jax.tree_util.tree_flatten_with_path(upd)[0]),
                    reverse=True)[:5]
    dmax, dmean, dzero = dens_stats(new_state.params, batch,
                                    scalars[0], scalars[1])
    print(json.dumps({
        "step": step, "loss": loss_next, "top_param_moves": movers,
        "pose_error": float(np.asarray(pose_fn(new_state.params))),
        "dens_max": float(np.asarray(dmax)),
        "dens_mean": float(np.asarray(dmean)),
        "dens_frac_dead": float(np.asarray(dzero)),
    }), flush=True)
    state = new_state

print("done", flush=True)
