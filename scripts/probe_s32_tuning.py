"""Tune the S=32 north-star train step: kernel tile rows, batch scaling,
and a decomposition of the ~3.5 ms fixed XLA overhead around the kernel.

Findings feed RESULTS.md ("North-star config").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import bench
from nerf_experiments_tpu.cameras import calibration
from nerf_experiments_tpu.data.sampler import blurred_pixel_colors
from nerf_experiments_tpu.ops import sampling
from nerf_experiments_tpu.ops.train_megakernel import flagship_train_grads
from nerf_experiments_tpu.systems import barf as barf_sys
from nerf_experiments_tpu.training import optim
from __graft_entry__ import _example_batch

N = int(os.environ.get("P_BATCH", 8192))
S = int(os.environ.get("P_SRAD", 32))
STEPS = 30


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:42s} {1000*dt:8.3f} ms", flush=True)
    return dt


cfg = barf_sys.BarfConfig(
    radiance=bench._mlp_cfg(jnp.bfloat16), n_training_images=100,
    near=2.0, far=8.0, samples_per_ray_radiance=S,
    uniform_sampling_strategy="equidistant", uniform_sampling_offset_size=-1.0)
state = barf_sys.init(jax.random.PRNGKey(0), cfg)
b = _example_batch(jax.random.PRNGKey(1), N)
t_start, t_end = sampling.sample_stratified(
    None, N, S, 2.0, 8.0, "equidistant", 0.0)
mlp_cfg = barf_sys._model_def(cfg.radiance).cfg
tgt = b["colors"][:, 0]

# --- kernel tile sweep ---------------------------------------------------
for tile in (0, 16, 32, 48, 64):
    rows = tile * S if tile else "default"

    @jax.jit
    def kern(p, o, d, ts, te, t, tile=tile):
        return flagship_train_grads(
            p, mlp_cfg, o, d, ts, te, t, jnp.asarray(5.0), jnp.asarray(2.0),
            tile_rays=tile)

    try:
        timed(f"train kernel S={S} tile_rays={tile} ({rows} rows)", kern,
              state.params["radiance"], b["origs_raw"], b["dirs_raw"],
              t_start, t_end, tgt)
    except Exception as e:  # noqa: BLE001
        print(f"  tile {tile}: {type(e).__name__} {str(e)[:120]}", flush=True)

# --- fixed-overhead pieces ------------------------------------------------
@jax.jit
def cam_vjp(cam, idx, o, d):
    (oo, dd), vjp = jax.vjp(
        lambda c: calibration.training_transform_rays(c, idx, o, d), cam)
    return vjp((oo, dd))


timed("camera transform fwd+vjp", cam_vjp, state.params["camera"],
      b["img_idx"], b["origs_noisy"], b["dirs_noisy"])

tx = barf_sys.make_optimizer(cfg, state.params)
opt_state = tx.init(state.params)
grads = jax.tree_util.tree_map(jnp.ones_like, state.params)


@jax.jit
def adam_update(g, os_, p):
    g, ok = optim.guard_nonfinite(g)
    up, os2 = tx.update(g, os_, p)
    return optax.apply_updates(p, up), os2, ok


timed("guard_nonfinite + multi-group Adam", adam_update, grads, opt_state,
      state.params)

timed("blurred_pixel_colors lerp", jax.jit(
    lambda c: blurred_pixel_colors(c, cfg.gaussian_blur_sigmas,
                                   jnp.asarray(0.0))), b["colors"])

timed("stratified t sampling", jax.jit(
    lambda: sampling.sample_stratified(None, N, S, 2.0, 8.0,
                                       "equidistant", 0.0)))

# --- batch scaling --------------------------------------------------------
for nb in (8192, 16384, 32768):
    try:
        r = bench.bench_barf(nb, S, 20, jnp.bfloat16, fused=True,
                             proposal=True)
        print(f"fused hierarchical step batch={nb}: {r['step_ms']} ms -> "
              f"{r['rays_per_sec']} rays/s", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"  batch {nb}: {type(e).__name__} {str(e)[:120]}", flush=True)
