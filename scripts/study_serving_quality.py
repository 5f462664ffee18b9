"""Quality validation for the FAST SERVING knobs (VERDICT r2 #3).

The serving study (scripts/study_serving.py) shows the >=1.8M rays/s
configs reached by shrinking the serving-time coarse budget: fewer coarse
bins (prop16: 1.83M at batch 16384) or the block-coarse render (blk8:
1.75M at 8192). Both change ONLY how the fine t-bins are placed — the
trained model is untouched — so their cost must be measured in held-out
novel-view PSNR on a TRAINED checkpoint, not argued.

Protocol: train the north-star hierarchical config (160², 24 views, clean
poses, prop 64 + S=32, fused bf16 batch 8192, 12k steps — the
time-to-30dB protocol, test PSNR ~29.9 reference point), then render the
test split from the SAME checkpoint through each serving knob:
  base    coarse 64 (training-time budget)
  prop32  coarse 32
  prop16  coarse 16   (the 1.83M rays/s config)
  blk4    block-coarse, block=4 (1.73M)
  blk8    block-coarse, block=8 (1.75M)

Env: Q_SIZE (160), Q_STEPS (12000), Q_OUT (runs/serving_quality).
Prints one JSON line per config and a final summary line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("Q_SIZE", 160))
STEPS = int(os.environ.get("Q_STEPS", 12000))
SCENE = os.environ.get("Q_SCENE", f"/tmp/netpu_serving_scene_{SIZE}")
OUT = os.environ.get("Q_OUT", "runs/serving_quality")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import render_views, run_barf  # noqa: E402

run_barf.main([
    "--fused_kernel",
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "8192", "--max_steps", str(STEPS),
    "--samples_per_ray", "32", "--samples_per_ray_proposal", "64",
    "--camera_origin_noise_sigma", "0.0", "--camera_rotation_noise_sigma", "0.0",
    "--no-optimize_camera",
    "--lr_decay_end_step", str(STEPS),
    # clean poses + full encodings from step 0 (reconstruction protocol)
    "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
    "--checkpoint_every_n_epochs", "4",
    "--image_log_period_epochs", "8.0",
    "--bf16",
    "--out_dir", OUT,
])

common = [
    "--ckpt_dir", os.path.join(os.path.abspath(OUT), "ckpt"),
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "2048",
    "--samples_per_ray", "32",
    "--camera_origin_noise_sigma", "0.0", "--camera_rotation_noise_sigma", "0.0",
    "--split", "test",
]

configs = {
    "base_prop64": ["--samples_per_ray_proposal", "64"],
    "prop32": ["--samples_per_ray_proposal", "32"],
    "prop16": ["--samples_per_ray_proposal", "16"],
    "blk4": ["--samples_per_ray_proposal", "64", "--serve_block", "4"],
    "blk8": ["--samples_per_ray_proposal", "64", "--serve_block", "8"],
}

summary = {}
for name, extra in configs.items():
    out_dir = os.path.join(OUT, f"serve_{name}")
    s = render_views.main(common + extra + ["--out_dir", out_dir])
    summary[name] = round(s["mean_psnr"], 2)
    print(json.dumps({name: summary[name]}), flush=True)

payload = {"serving_quality_psnr": summary, "steps": STEPS, "size": SIZE}
print(json.dumps(payload))
# persist for bench.py's serving row (PSNR column next to rays/s)
os.makedirs("docs/evidence/studies", exist_ok=True)
with open("docs/evidence/studies/serving_quality.json", "w") as f:
    json.dump(payload, f, indent=1)
