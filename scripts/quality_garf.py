"""Quality run (VERDICT r1 item 4b): long GARF joint calibration at 128^2
(Gaussian activations, 64+192 lindisp proposal estimator, interlevel loss).

Targets: PSNR comparable to BARF's and pose error clearly descending —
round 1 only showed 15.8 dB @ 5k steps with pose 0.076->0.070.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic_fast as synthetic

SIZE = int(os.environ.get("Q_SIZE", 128))
STEPS = int(os.environ.get("Q_STEPS", 50000))
VIEWS = int(os.environ.get("Q_VIEWS", 24))
SCENE = os.environ.get("Q_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")
OUT = os.environ.get("Q_OUT", "runs/quality_garf")
NOISE = os.environ.get("Q_NOISE", "0.15")          # translation = rotation
FUSED = os.environ.get("Q_FUSED", "0") == "1"
EXTRA = os.environ.get("Q_EXTRA", "").split()      # extra CLI flags

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=VIEWS, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import garf_main  # noqa: E402

steps_per_epoch = VIEWS * SIZE * SIZE // 1024
epochs = STEPS / steps_per_epoch

args = garf_main.parse_args([
    "--activation", "gauss",
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024", "--max_steps", str(STEPS),
    "--camera_origin_noise_sigma", NOISE,
    "--camera_rotation_noise_sigma", NOISE,
    # sustained camera LR (round-1 lesson: the default 2-epoch decay
    # starves the camera); decay over the whole run
    "--camera_learning_rate_decay_end", str(epochs),
    "--radiance_learning_rate_decay_end", str(epochs),
    "--proposal_learning_rate_decay_end", str(epochs * 0.7),
    "--bf16",
    "--out_dir", OUT,
] + (["--fused_kernel"] if FUSED else []) + EXTRA)
cfg, state, trainer = garf_main.build(args)
state = trainer.fit(state)
print("done", int(state.step))

# ---- post-fit: checkpoint + held-out TEST split novel-view rendering ----
import json  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nerf_experiments_tpu.cameras import calibration  # noqa: E402
from nerf_experiments_tpu.data import blender, sampler as sampler_lib  # noqa: E402
from nerf_experiments_tpu.systems import garf_system  # noqa: E402
from nerf_experiments_tpu.training import checkpoints  # noqa: E402

ckpt = checkpoints.CheckpointManager(os.path.join(os.path.abspath(OUT), "ckpt"))
ckpt.save(int(state.step), state)
ckpt.close()

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
    rgb, _, _, _ = garf_system.forward(params, cfg, None, o, d, stratified=False)
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
           "test_psnr_per_image": [round(p, 2) for p in psnrs]}
print(json.dumps({"novel_view_summary": summary}))
with open(os.path.join(OUT, "novel_views.json"), "w") as f:
    json.dump(summary, f)
