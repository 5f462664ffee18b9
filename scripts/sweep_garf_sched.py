"""Small-scale GARF joint-calibration schedule sweep (TPU, ~64^2).

Round-2 finding: full-scale GARF joint runs show pose error RISING while
PSNR rises (scene absorbs pose noise), yet the isolated camera path recovers
poses on a frozen scene (scripts/diag_garf_camera.py). This sweep isolates
the joint-dynamics levers cheaply before relaunching the long quality run:
  * compute dtype (camera grads are tiny; bf16 noise + Adam = random walk)
  * camera LR schedule (reference: 4e-3 -> 8e-4 over 2 epochs,
    `garf/main.py:28-33`)
  * Gaussian-activation init width (wide = smooth early net)
  * conv-blur target ladder (gaborf/dataset.py:324-390 mechanism)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("S_SIZE", 64))
STEPS = int(os.environ.get("S_STEPS", 6000))
SCENE = f"/tmp/netpu_sweep_scene_{SIZE}"

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=2, n_test=2,
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
]

CONFIGS = {
    # reference-faithful camera schedule, fp32
    "fp32_ref": ["--camera_learning_rate_start", "4e-3",
                 "--camera_learning_rate_stop", "8e-4",
                 "--camera_learning_rate_decay_end", str(0.3 * epochs)],
    # identical but bf16: isolates the dtype effect on camera grads
    "bf16_ref": ["--camera_learning_rate_start", "4e-3",
                 "--camera_learning_rate_stop", "8e-4",
                 "--camera_learning_rate_decay_end", str(0.3 * epochs),
                 "--bf16"],
    # harder decay: fast early recovery then anneal out the oscillation
    "fp32_fastdecay": ["--camera_learning_rate_start", "4e-3",
                       "--camera_learning_rate_stop", "1e-4",
                       "--camera_learning_rate_decay_end", str(0.5 * epochs)],
    # wide (smooth) activation init
    "fp32_wideinit": ["--camera_learning_rate_start", "4e-3",
                      "--camera_learning_rate_stop", "8e-4",
                      "--camera_learning_rate_decay_end", str(0.3 * epochs),
                      "--init_min", "0.05", "--init_max", "0.5"],
    # conv-blur target ladder on top of the reference schedule
    "fp32_blur": ["--camera_learning_rate_start", "4e-3",
                  "--camera_learning_rate_stop", "8e-4",
                  "--camera_learning_rate_decay_end", str(0.3 * epochs),
                  "--conv_blur", "--blur_relative_sigma_start", "0.03",
                  "--blur_relative_sigma_decay", "0.995"],
}

only = os.environ.get("S_ONLY")
results = {}
for name, extra in CONFIGS.items():
    if only and name not in only.split(","):
        continue
    out = f"runs/sweep_garf/{name}"
    args = garf_main.parse_args(BASE + extra + ["--out_dir", out])
    cfg, state, trainer = garf_main.build(args)
    state = trainer.fit(state)
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    pe = [(r["step"], r["pose_error"]) for r in rows if "pose_error" in r]
    psnr = rows[-1]["psnr"]
    results[name] = {"pose_start": pe[0][1], "pose_end": pe[-1][1],
                     "pose_min": min(v for _, v in pe), "psnr_end": psnr}
    print("SWEEP", name, json.dumps(results[name]), flush=True)

print(json.dumps(results, indent=2))
