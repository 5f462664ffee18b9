"""Quality run (VERDICT r1 item 4a): long joint-BARF calibration at 160^2
with the hierarchical proposal path, then held-out novel-view rendering.

Targets: train PSNR >= ~28-30 dB, pose error reduced >= 80%, novel-view
test PSNR meaningfully above 20 dB.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic_fast as synthetic

SIZE = int(os.environ.get("Q_SIZE", 160))
STEPS = int(os.environ.get("Q_STEPS", 60000))
BATCH = int(os.environ.get("Q_BATCH", 1024))
FUSED = os.environ.get("Q_FUSED", "0") != "0"
VIEWS = int(os.environ.get("Q_VIEWS", 24))
CKPT_EPOCHS = os.environ.get("Q_CKPT_EPOCHS", "10")
SCENE = os.environ.get("Q_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")
OUT = os.environ.get("Q_OUT", "runs/quality_barf_joint")
# camera-eps recipe knobs (RESULTS.md probe: eps 1e-2 @ LR 1e-2 doubles
# pose recovery vs the reference schedule)
CAM_LR = os.environ.get("Q_CAM_LR")
CAM_EPS = os.environ.get("Q_CAM_EPS")
CAM_ARGS = (
    (["--camera_lr", CAM_LR, "--camera_lr_stop", str(float(CAM_LR) / 100)]
     if CAM_LR else [])
    + (["--camera_adam_eps", CAM_EPS] if CAM_EPS else [])
)

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=VIEWS, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import run_barf  # noqa: E402

PROPOSAL = int(os.environ.get("Q_PROPOSAL", 64))  # 0 => dense 128

state = run_barf.main((["--resume"] if os.environ.get("Q_RESUME") else [])
                      + (["--fused_kernel"] if FUSED else []) + CAM_ARGS + [
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", str(BATCH), "--max_steps", str(STEPS),
    "--samples_per_ray", "128", "--samples_per_ray_proposal", str(PROPOSAL),
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--lr_decay_end_step", str(STEPS),
    "--alpha_decay_start_step", str(STEPS // 30),
    "--alpha_decay_end_step", str(STEPS // 2),
    "--checkpoint_every_n_epochs", CKPT_EPOCHS,
    "--image_log_period_epochs", "4.0",
    "--bf16",
    "--out_dir", OUT,
])

from nerf_experiments_tpu.experiments import render_views  # noqa: E402

summary = render_views.main([
    "--ckpt_dir", os.path.join(OUT, "ckpt"),
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024", "--samples_per_ray", "128",
    "--samples_per_ray_proposal", str(PROPOSAL),
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--split", "test", "--out_dir", os.path.join(OUT, "novel_views"),
])
print(json.dumps({"novel_view_summary": summary}, default=str))
