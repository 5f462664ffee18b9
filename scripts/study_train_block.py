"""Quality validation for BLOCK-COARSE TRAINING (train_coarse_block).

The blocked step shares each coarse stage (proposal fwd+VJP + PDF
resample) across `block` raster-consecutive rays, trading coarse-stage
compute for correlated-batch gradient noise (8192 rays = 2048 independent
blocks at blk4). Exact-parity on duplicate-ray batches is pinned by
tests/test_train_megakernel.py; THIS study measures what matters: held-out
test PSNR at the fixed north-star protocol (160², 24 views, clean poses,
prop 64 + S=32, fused bf16 batch 8192, 12k steps — the time-to-30dB
protocol whose blk1 reference point is 29.95 dB test PSNR, RESULTS.md),
plus the measured train rays/s for each block size.

Env: S_BLOCKS ("1,4,8"), Q_SIZE (160), Q_STEPS (12000), Q_BATCH (8192 —
round-5 batch-promotion arm runs Q_BATCH=32768 Q_STEPS=3000, equal rays
and ~equal wall vs the canonical blk4 12k x 8192 = 29.17 dB row).
Prints one JSON line per block size.
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("Q_SIZE", 160))
STEPS = int(os.environ.get("Q_STEPS", 12000))
BLOCKS = [int(b) for b in os.environ.get("S_BLOCKS", "1,4,8").split(",")]
BATCH = int(os.environ.get("Q_BATCH", 8192))
LR = os.environ.get("Q_LR")  # optional LR override (large-batch scaling arms)
SCENE = os.environ.get("Q_SCENE", f"/tmp/netpu_blk_scene_{SIZE}")
OUT_BASE = os.environ.get("Q_OUT", "runs/train_block")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import render_views, run_barf  # noqa: E402

results = {}
for blk in BLOCKS:
    out = f"{OUT_BASE}_blk{blk}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    run_barf.main((["--learning_rate", LR] if LR else []) + [
        "--fused_kernel",
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--batch_size", str(BATCH), "--max_steps", str(STEPS),
        "--samples_per_ray", "32", "--samples_per_ray_proposal", "64",
        "--train_coarse_block", str(blk),
        "--camera_origin_noise_sigma", "0.0",
        "--camera_rotation_noise_sigma", "0.0",
        "--no-optimize_camera",
        "--lr_decay_end_step", str(STEPS),
        "--alpha_decay_start_step", "0", "--alpha_decay_end_step", "1",
        "--checkpoint_every_n_epochs", "4",
        "--image_log_period_epochs", "16.0",
        "--log_every_n_steps", "50",
        "--bf16",
        "--out_dir", out,
    ])
    wall = time.time() - t0
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    walls = [r["wall_s"] for r in rows if "wall_s" in r]
    # post-compile stepping pace: wall between the first and last log rows;
    # steps derived from the rows themselves (robust to log cadence)
    post = (walls[-1] - walls[0]) if len(walls) > 1 else None
    step_rows = [r["step"] for r in rows if "wall_s" in r]
    steps_logged = (step_rows[-1] - step_rows[0]) if len(step_rows) > 1 else 0
    s = render_views.main([
        "--ckpt_dir", os.path.join(os.path.abspath(out), "ckpt"),
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--batch_size", "2048",
        "--samples_per_ray", "32", "--samples_per_ray_proposal", "64",
        "--camera_origin_noise_sigma", "0.0",
        "--camera_rotation_noise_sigma", "0.0",
        "--split", "test", "--out_dir", os.path.join(out, "novel_views"),
    ])
    results[f"blk{blk}"] = {
        "test_psnr": round(s["mean_psnr"], 2),
        "train_rays_per_sec": (round(BATCH * steps_logged / post, 1)
                               if post else None),
        "wall_s_total": round(wall, 1),
    }
    print(json.dumps({f"blk{blk}": results[f"blk{blk}"]}), flush=True)

summary = {"train_block_study": results, "steps": STEPS, "size": SIZE,
           "batch": BATCH}
print(json.dumps(summary))
# persist for bench.py's headline gate (blk4 may only take the headline
# with its quality delta recorded — VERDICT r3 #2); auxiliary runs (e.g.
# the equal-wall-clock blk1 rerun, Q_OUT override) get their own file so
# the canonical study is never clobbered
os.makedirs("docs/evidence/studies", exist_ok=True)
fname = ("train_block_study.json" if OUT_BASE == "runs/train_block"
         else f"train_block_study_{os.path.basename(OUT_BASE)}.json")
with open(os.path.join("docs/evidence/studies", fname), "w") as f:
    json.dump(summary, f, indent=1)
