"""Diagnostic: does the GARF system's camera gradient recover poses on a
FROZEN scene? Isolates the calibration path from joint dynamics (the quality
runs show pose error rising during joint GARF training)."""
import dataclasses
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import blender, sampler as sampler_lib, synthetic
from nerf_experiments_tpu.models import garf
from nerf_experiments_tpu.systems import garf_system

scene_dir = os.path.join(tempfile.gettempdir(), "netpu_diag_scene32")
if not os.path.exists(os.path.join(scene_dir, "transforms_train.json")):
    synthetic.generate_dataset(scene_dir, n_train=6, n_val=1, n_test=1,
                               image_size=32, n_samples=48)

net = garf.GarfConfig(init_min=0.5, init_max=2.0,
                      learning_rate_start=2e-4, learning_rate_stop=2e-5,
                      learning_rate_decay_end=1000,
                      activation_learning_rate_factor=8.0)


def make_cfg(net_cfg, cam_lr):
    return garf_system.GarfSystemConfig(
        n_train_images=6, near=2.0, far=6.5,
        proposal_samples_per_ray=8, radiance_samples_per_ray=16,
        net=net_cfg,
        camera_learning_rate_start=cam_lr,
        camera_learning_rate_stop=cam_lr / 10 if cam_lr else 0.0,
        camera_learning_rate_decay_end=2000,
    )


# phase 1: clean poses, fit scene
data_clean = blender.load(scene_dir, "train", 32, 32,
                          space_transform_scale=1.0,
                          space_transform_translate=np.zeros(3))
store_clean = sampler_lib.make_ray_store(data_clean)
cfg1 = make_cfg(net, cam_lr=0.0)
state = garf_system.init(jax.random.PRNGKey(0), cfg1)
tx1 = garf_system.make_optimizer(cfg1, state.params)
step1 = garf_system.make_train_step(cfg1, tx1, donate=False)
key = jax.random.PRNGKey(1)
for i in range(500):
    key, kb, ks = jax.random.split(key, 3)
    batch = sampler_lib.sample_batch(store_clean, kb, 256)
    state, m1 = step1(state, batch, ks)
    if i % 100 == 0:
        print("phase1", i, "psnr", float(m1["psnr"]))
print("phase1 final psnr", float(m1["psnr"]))

# phase 2: noisy poses, frozen nets, camera-only
data_noisy = blender.load(
    scene_dir, "train", 32, 32,
    space_transform_scale=1.0, space_transform_translate=np.zeros(3),
    translation_noise_sigma=0.1, rotation_noise_sigma=0.0, noise_seed=3,
)
store_noisy = sampler_lib.make_ray_store(data_noisy)
frozen = dataclasses.replace(net, learning_rate_start=0.0,
                             learning_rate_stop=0.0)
cfg2 = make_cfg(frozen, cam_lr=3e-3)
state2 = garf_system.init(jax.random.PRNGKey(0), cfg2)
state2 = state2.replace(params=dict(
    state2.params,
    radiance=state.params["radiance"],
    proposal=state.params["proposal"],
))
tx2 = garf_system.make_optimizer(cfg2, state2.params)
step2 = garf_system.make_train_step(cfg2, tx2, donate=False)

raw = store_noisy.camera_origins_raw
noisy = store_noisy.camera_origins_noisy
pe0 = float(garf_system.pose_error_metric(state2.params, raw, noisy))
print("phase2 pose_error start", pe0)
for i in range(800):
    key, kb, ks = jax.random.split(key, 3)
    batch = sampler_lib.sample_batch(store_noisy, kb, 256)
    state2, m2 = step2(state2, batch, ks)
    if i % 100 == 99:
        pe = float(garf_system.pose_error_metric(state2.params, raw, noisy))
        print("phase2", i + 1, "pose_error", round(pe, 5),
              "psnr", round(float(m2["psnr"]), 2))
pe1 = float(garf_system.pose_error_metric(state2.params, raw, noisy))
print("RESULT", "start", round(pe0, 5), "end", round(pe1, 5),
      "reduced" if pe1 < pe0 * 0.8 else "NOT-REDUCED")
