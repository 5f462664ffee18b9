"""INGP level-width study (NEXT #3): TPU dynamic-gather throughput scales
with bytes moved PER ROW, so fewer/wider levels should amortize the gather
transactions. This study holds table bytes and encoding output dim fixed
(L * F = 32, T = 2^16) and trades level count against row width, measuring
BOTH step time and short-horizon training quality (the multiscale pyramid
shrinks as L drops — the quality cost is the open question).

Workload: the bench INGP config (barf system, camera frozen, 64 samples)
on a 64^2 synthetic scene, 1500 steps, batch 4096.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from nerf_experiments_tpu.data import synthetic, blender
from nerf_experiments_tpu.data import sampler as sampler_lib
from nerf_experiments_tpu.experiments.run_3d_ingp import IngpModelDef
from nerf_experiments_tpu.models import ingp
from nerf_experiments_tpu.ops import hashgrid
from nerf_experiments_tpu.systems import barf as barf_sys

SIZE = int(os.environ.get("STUDY_SIZE", 64))
STEPS = int(os.environ.get("STUDY_STEPS", 1500))
BATCH = int(os.environ.get("STUDY_BATCH", 4096))
SCENE = f"/tmp/netpu_study_scene_{SIZE}"

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=12, n_val=2, n_test=2,
                               image_size=SIZE, n_samples=96)

dm = blender.DataModule(
    scene_path=SCENE, image_width=SIZE, image_height=SIZE,
    space_transform_scale=1.0, space_transform_translate=jnp.zeros(3),
    rotation_noise_sigma=0.0, translation_noise_sigma=0.0,
    camera_noise_seed=0, gaussian_blur_sigmas=(0.0,),
    validation_fraction=0.0, validation_fraction_shuffle=0,
)
dm.setup("fit")
store = sampler_lib.make_ray_store(dm.dataset_train)
arrays = store.arrays()
pixel_width = store.pixel_width
n_rays = store.n_rays

CONFIGS = [(16, 2), (8, 4), (4, 8), (2, 16)]
results = {}
for L, F in CONFIGS:
    grid = hashgrid.HashGridConfig(
        dim=3, n_levels=L, n_features=F, table_size=2 ** 16,
        resolution_min=16, resolution_max=512,
    )
    model = IngpModelDef(cfg=ingp.NerfINGPConfig(
        grid=grid, compute_dtype=jnp.bfloat16))
    cfg = barf_sys.BarfConfig(
        radiance=model, n_training_images=dm.n_training_images,
        near=2.0, far=8.0, samples_per_ray_radiance=64,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=-1.0,
        optimize_camera=False, adam_eps=1e-15, adam_b2=0.99,
    )
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)
    step = barf_sys.make_train_step(cfg, tx, donate=True)
    scalars = (jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.0))
    base_key = jax.random.PRNGKey(7)

    @jax.jit
    def fused(state, key_idx):
        key = jax.random.fold_in(base_key, key_idx)
        kb, ks = jax.random.split(key)
        idx = jax.random.randint(kb, (BATCH,), 0, n_rays)
        batch = sampler_lib.gather_batch_arrays(arrays, pixel_width, idx)
        return step(state, batch, ks, *scalars)

    # warmup + timing
    for i in range(3):
        state, metrics = fused(state, i)
    float(np.asarray(metrics["loss"]))
    t0 = time.perf_counter()
    n_timed = 20
    for i in range(3, 3 + n_timed):
        state, metrics = fused(state, i)
    float(np.asarray(metrics["loss"]))
    dt = (time.perf_counter() - t0) / n_timed

    for i in range(3 + n_timed, STEPS):
        state, metrics = fused(state, i)
    psnr = float(np.asarray(metrics["psnr"]))
    results[f"L{L}_F{F}"] = {
        "step_ms": round(dt * 1000, 2),
        "rays_per_sec": round(BATCH / dt, 1),
        "psnr_at_end": round(psnr, 2),
        "level_resolutions": list(grid.level_resolutions),
    }
    print("INGP_WIDE", f"L{L}_F{F}", json.dumps(results[f"L{L}_F{F}"]),
          flush=True)

print("INGP_WIDE_SUMMARY", json.dumps(results))
