"""Occupancy-grid estimator study: throughput + quality vs the proposal-net
hierarchy at the north-star S=32 config (and smaller S).

Question: does replacing the per-step proposal-net coarse stage (64-sample
small-net forward+VJP + coarse photometric loss) with the occ-grid gather
(ops/occgrid.py) hold novel-view PSNR while cutting step time — and does
the sharper grid PDF let S drop below 32?

Protocol mirrors scripts/study_nsamples.py: procedural scene 160^2
(24 train / 6 test), clean poses with the camera frozen, batch 8192 fused
bf16, equal step budget, then held-out test-split renders.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("S_SIZE", 160))
STEPS = int(os.environ.get("S_STEPS", 6000))
BATCH = int(os.environ.get("S_BATCH", 8192))
FUSED = os.environ.get("S_FUSED", "1") != "0"  # 0 = XLA step (CPU smoke)
SCENE = os.environ.get("S_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import render_views, run_barf  # noqa: E402

CONFIGS = {
    # name: (samples_per_ray, extra flags)
    "prop64_S32": (32, ["--samples_per_ray_proposal", "64",
                        "--proposal_hidden_dim", "64"]),
    "occ64_S32": (32, ["--occ_grid_resolution", "64"]),
    "occ64_S16": (16, ["--occ_grid_resolution", "64"]),
    "occ128_S32": (32, ["--occ_grid_resolution", "128"]),
}
only = os.environ.get("S_ONLY")
if only:
    CONFIGS = {k: v for k, v in CONFIGS.items() if k in only.split(",")}

results = {}
for name, (s_rad, extra) in CONFIGS.items():
    out = f"runs/study_occgrid/{name}"
    common_flags = [
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--samples_per_ray", str(s_rad),
        "--camera_origin_noise_sigma", "0.0",
        "--camera_rotation_noise_sigma", "0.0",
    ] + extra
    run_barf.main(common_flags + [
        "--batch_size", str(BATCH), "--max_steps", str(STEPS),
        "--no-optimize_camera",
        "--lr_decay_end_step", str(STEPS),
        "--alpha_decay_start_step", str(STEPS // 8),
        "--alpha_decay_end_step", str(STEPS // 2),
        "--checkpoint_every_n_epochs", "50",
        "--bf16",
        "--out_dir", out,
    ] + (["--fused_kernel"] if FUSED else []))
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    train_psnr = [r["psnr"] for r in rows if "psnr" in r][-5:]
    rps = [r["train_rays_per_sec"] for r in rows if "train_rays_per_sec" in r]
    summary = render_views.main(common_flags + [
        "--ckpt_dir", os.path.join(out, "ckpt"),
        "--batch_size", "2048",
        "--split", "test", "--out_dir", os.path.join(out, "test_renders"),
        "--bf16",
    ])
    results[name] = {
        "train_psnr_tail": round(sum(train_psnr) / len(train_psnr), 2),
        "test_psnr": summary.get("mean_psnr"),
        "rays_per_sec_tail": round(rows and rps[-1] or 0, 1),
    }
    print("OCCGRID", name, json.dumps(results[name]), flush=True)

print("OCCGRID_FINAL", json.dumps(results))
