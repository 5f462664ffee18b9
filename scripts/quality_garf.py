"""Quality run (VERDICT r1 item 4b): long GARF joint calibration at 128^2
(Gaussian activations, 64+192 lindisp proposal estimator, interlevel loss).

Targets: PSNR comparable to BARF's and pose error clearly descending —
round 1 only showed 15.8 dB @ 5k steps with pose 0.076->0.070.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("Q_SIZE", 128))
STEPS = int(os.environ.get("Q_STEPS", 50000))
SCENE = os.environ.get("Q_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")
OUT = os.environ.get("Q_OUT", "runs/quality_garf")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import garf_main  # noqa: E402

steps_per_epoch = 24 * SIZE * SIZE // 1024
epochs = STEPS / steps_per_epoch

args = garf_main.parse_args([
    "--activation", "gauss",
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024", "--max_steps", str(STEPS),
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    # sustained camera LR (round-1 lesson: the default 2-epoch decay
    # starves the camera); decay over the whole run
    "--camera_learning_rate_decay_end", str(epochs),
    "--radiance_learning_rate_decay_end", str(epochs),
    "--proposal_learning_rate_decay_end", str(epochs * 0.7),
    "--bf16",
    "--out_dir", OUT,
])
cfg, state, trainer = garf_main.build(args)
state = trainer.fit(state)
print("done", int(state.step))
