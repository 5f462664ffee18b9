"""Render the test split from a saved garf-family checkpoint (the post-fit
section of scripts/quality_garf.py as a standalone step — for runs whose
render phase was cut by a queue timeout).

Env: Q_OUT (run dir with ckpt/), Q_SIZE (160), Q_SCENE, Q_NOISE (0.15),
Q_ACTIVATION (gauss|gabor|sarf), Q_EXTRA (extra garf_main CLI flags to
rebuild the same config — the anneal/blur flags do not matter for the
render since gamma=1 post-anneal).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

SIZE = int(os.environ.get("Q_SIZE", 160))
SCENE = os.environ.get("Q_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")
OUT = os.environ.get("Q_OUT", "runs/quality_gabor_joint")
NOISE = os.environ.get("Q_NOISE", "0.15")
ACT = os.environ.get("Q_ACTIVATION", "gabor")
EXTRA = os.environ.get("Q_EXTRA", "").split()

from nerf_experiments_tpu.cameras import calibration
from nerf_experiments_tpu.data import blender, sampler as sampler_lib
from nerf_experiments_tpu.experiments import garf_main
from nerf_experiments_tpu.systems import garf_system
from nerf_experiments_tpu.training import checkpoints

args = garf_main.parse_args([
    "--activation", ACT,
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024",
    "--camera_origin_noise_sigma", NOISE,
    "--camera_rotation_noise_sigma", NOISE,
    "--bf16",
    "--out_dir", OUT,
] + EXTRA)
cfg, state, trainer = garf_main.build(args)
mgr = checkpoints.CheckpointManager(os.path.join(os.path.abspath(OUT), "ckpt"))
state = mgr.restore(state)
print("restored step", int(state.step))

dm = blender.DataModule(
    scene_path=SCENE, image_width=SIZE, image_height=SIZE,
    space_transform_scale=1.0, space_transform_translate=None,
    rotation_noise_sigma=float(NOISE), translation_noise_sigma=float(NOISE),
    camera_noise_seed=13571113, gaussian_blur_sigmas=(0.0,),
)
dm.setup("fit")
dm.setup("test")
train_store = sampler_lib.make_ray_store(dm.dataset_train)
gauge = calibration.post_transform_params(
    state.params["camera"],
    train_store.camera_origins_raw, train_store.camera_origins_noisy)


@jax.jit
def _render_chunk(params, origs, dirs):
    o, d = calibration.validation_transform_rays(origs, dirs, gauge)
    rgb, _, _, _ = garf_system.forward(params, cfg, None, o, d,
                                       stratified=False)
    return jnp.clip(rgb, 0.0, 1.0)


test = dm.dataset_test
H = W = SIZE
out_png = os.path.join(OUT, "test_renders")
os.makedirs(out_png, exist_ok=True)
psnrs = []
for i in range(test.ray_origins.shape[0]):
    origs = jnp.asarray(test.ray_origins[i])
    dirs = jnp.asarray(test.ray_directions[i])
    chunks = [
        _render_chunk(state.params, origs[s:s + 2048], dirs[s:s + 2048])
        for s in range(0, origs.shape[0], 2048)
    ]
    pred = np.asarray(jnp.concatenate(chunks, axis=0)).reshape(H, W, 3)
    target = np.asarray(test.images[i, :, :, -1]).reshape(H, W, 3)
    mse = float(np.mean((pred - target) ** 2))
    psnrs.append(-10.0 * np.log10(mse))
    try:
        from PIL import Image

        Image.fromarray((pred * 255).astype(np.uint8)).save(
            os.path.join(out_png, f"test_{i}.png"))
    except Exception:
        pass

summary = {"test_psnr_mean": float(np.mean(psnrs)),
           "test_psnr_per_image": [round(p, 2) for p in psnrs],
           "ckpt_step": int(state.step)}
print(json.dumps({"novel_view_summary": summary}))
with open(os.path.join(OUT, "novel_views.json"), "w") as f:
    json.dump(summary, f)
