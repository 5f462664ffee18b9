"""GARF joint-calibration sweep, round 2: strong image-space coarse-to-fine.

Round-2 finding (sweep_garf_sched.py + diagnostics): every plain schedule
fails — pose error random-walks UP from step 0 (Adam turns noise-level
photometric camera gradients into LR-sized steps while the 1024-wide
Gaussian net absorbs the pose noise). BARF on the SAME scene descends from
step 50, and the one mechanism it has that GARF lacks is heavy image-space
blur early (sigma(alpha) ~ 10 px at 160^2). The reference itself runs GARF
nets under the barf blur schedule (`barf/run_garf_test.py`), so a GARF +
conv-blur-ladder recipe is reference-faithful.

This sweep: 160^2 (the scale where BARF demonstrably converges), heavy
sigma_0, slow decay, crossed with camera LR and activation-sharpening speed.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("S_SIZE", 160))
STEPS = int(os.environ.get("S_STEPS", 6000))
SCENE = os.environ.get("S_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import garf_main  # noqa: E402

steps_per_epoch = 24 * SIZE * SIZE // 1024
epochs = STEPS / steps_per_epoch

BASE = [
    "--activation", "gauss",
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024", "--max_steps", str(STEPS),
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--radiance_learning_rate_decay_end", str(epochs),
    "--proposal_learning_rate_decay_end", str(0.7 * epochs),
    "--fused_kernel", "--bf16",
]

BLUR = ["--conv_blur", "--blur_relative_sigma_start", "0.08",
        "--blur_relative_sigma_decay", "0.9995"]

CONFIGS = {
    "blur_refcam": BLUR + [
        "--camera_learning_rate_start", "4e-3",
        "--camera_learning_rate_stop", "8e-4",
        "--camera_learning_rate_decay_end", str(0.3 * epochs),
        "--activation_learning_rate_factor", "4"],
    "blur_slowcam": BLUR + [
        "--camera_learning_rate_start", "1e-3",
        "--camera_learning_rate_stop", "1e-4",
        "--camera_learning_rate_decay_end", str(epochs),
        "--activation_learning_rate_factor", "4"],
    "blur_slowact": BLUR + [
        "--camera_learning_rate_start", "4e-3",
        "--camera_learning_rate_stop", "8e-4",
        "--camera_learning_rate_decay_end", str(0.3 * epochs),
        "--activation_learning_rate_factor", "1"],
    "noblur_slowact": [
        "--camera_learning_rate_start", "4e-3",
        "--camera_learning_rate_stop", "8e-4",
        "--camera_learning_rate_decay_end", str(0.3 * epochs),
        "--activation_learning_rate_factor", "1"],
}

only = os.environ.get("S_ONLY")
results = {}
for name, extra in CONFIGS.items():
    if only and name not in only.split(","):
        continue
    out = f"runs/sweep_garf_blur/{name}"
    args = garf_main.parse_args(BASE + extra + ["--out_dir", out])
    cfg, state, trainer = garf_main.build(args)
    state = trainer.fit(state)
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    pe = [(r["step"], r["pose_error"]) for r in rows if "pose_error" in r]
    results[name] = {"pose_start": pe[0][1], "pose_end": pe[-1][1],
                     "pose_min": min(v for _, v in pe),
                     "psnr_end": rows[-1]["psnr"]}
    print("SWEEP", name, json.dumps(results[name]), flush=True)

print(json.dumps(results, indent=2))
