"""North-star config study #2: radiance MLP WIDTH vs quality at S=32.

The S=32 hierarchical step is at its arithmetic ceiling for the 256-wide
reference net (RESULTS.md: kernel ~95% of the bare-GEMM-chain pace,
~787k rays/s absolute max at 8192x32). The remaining lever toward the 5M
north star is FLOPs/sample: a 128-wide net is 4x cheaper and still
MXU-lane-aligned; 2 hidden layers halve it again. This study measures what
those cheaper nets give up in quality at the S=32 protocol (the same
protocol that validated S=32 itself vs dense-128 in study_nsamples.py).

Protocol: procedural scene 160^2 (24 train / 6 test), CLEAN poses, batch
8192 fused bf16, equal step budget, 64x1 proposal net, held-out test
renders. Reference architecture semantics unchanged
(`model_interpolation_architecture.py:33-168` - width is a constructor
argument there too).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("S_SIZE", 160))
STEPS = int(os.environ.get("S_STEPS", 6000))
BATCH = int(os.environ.get("S_BATCH", 8192))
SCENE = os.environ.get("S_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import render_views, run_barf  # noqa: E402

CONFIGS = {
    # name: (hidden_dim, n_hidden)
    "w256_h4": (256, 4),   # reference net (study_nsamples baseline row)
    "w128_h4": (128, 4),
    "w128_h2": (128, 2),
    "w64_h4": (64, 4),
}
only = os.environ.get("S_ONLY")
if only:
    CONFIGS = {k: v for k, v in CONFIGS.items() if k in only.split(",")}

results = {}
for name, (width, n_hidden) in CONFIGS.items():
    out = f"runs/study_width/{name}"
    common_flags = [
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--samples_per_ray", "32",
        "--samples_per_ray_proposal", "64",
        "--proposal_hidden_dim", "64",
        "--hidden_dim", str(width), "--n_hidden", str(n_hidden),
        "--camera_origin_noise_sigma", "0.0",
        "--camera_rotation_noise_sigma", "0.0",
    ]
    run_barf.main(common_flags + [
        "--batch_size", str(BATCH), "--max_steps", str(STEPS),
        "--no-optimize_camera",
        "--lr_decay_end_step", str(STEPS),
        "--alpha_decay_start_step", str(STEPS // 8),
        "--alpha_decay_end_step", str(STEPS // 2),
        "--checkpoint_every_n_epochs", "50",
        "--bf16", "--fused_kernel",
        "--out_dir", out,
    ])
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    train_psnr = [r["psnr"] for r in rows if "psnr" in r][-5:]
    wall = [r["wall_s"] for r in rows if "wall_s" in r]
    summary = render_views.main(common_flags + [
        "--ckpt_dir", os.path.join(out, "ckpt"),
        "--batch_size", "2048",
        "--split", "test", "--out_dir", os.path.join(out, "test_renders"),
        "--bf16",
    ])
    results[name] = {
        "train_psnr_tail": round(sum(train_psnr) / len(train_psnr), 2),
        "test_psnr": summary.get("mean_psnr"),
        "train_wall_s": round(wall[-1] - wall[0], 1) if len(wall) > 1 else None,
    }
    print("WIDTH", name, json.dumps(results[name]), flush=True)

print("WIDTH_FINAL", json.dumps(results))
