"""North-star config study: radiance sample count vs reconstruction quality.

The 5M rays/s/chip north star (BASELINE.md) is defined over the fast
hierarchical configs, not the dense-128 worst case. The fused proposal
step (XLA coarse stage + Pallas radiance mega-kernel) measures
  S=128: 158k   S=64: 264k   S=32: 426k   rays/s train (8192, bf16, v5e)
so the open question is purely QUALITY: how much PSNR does a 64-sample
proposal + S-sample radiance config give up vs dense 128? (Mip-NeRF 360
ships 32 final samples behind two proposal rounds; the reference's own
hierarchy is 64 coarse + 128 fine, `barf/run_barf.py:190-191`.)

Protocol: procedural scene 160^2 (24 train / 6 test), CLEAN poses with the
camera branch frozen (isolates reconstruction), batch 8192 fused bf16,
equal STEP budget per config, small 64x1 proposal net for the hierarchical
rows, then held-out test-split novel-view PSNR via render_views.
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
    # name: (samples_per_ray, samples_per_ray_proposal, proposal_hidden_dim)
    "dense_128": (128, 0, 0),
    "prop64_S128": (128, 64, 64),
    "prop64_S64": (64, 64, 64),
    "prop64_S32": (32, 64, 64),
}
only = os.environ.get("S_ONLY")
if only:
    CONFIGS = {k: v for k, v in CONFIGS.items() if k in only.split(",")}

results = {}
for name, (s_rad, s_prop, p_hidden) in CONFIGS.items():
    out = f"runs/study_nsamples/{name}"
    common_flags = [
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--samples_per_ray", str(s_rad),
        "--samples_per_ray_proposal", str(s_prop),
        "--proposal_hidden_dim", str(p_hidden),
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
    summary = render_views.main(common_flags + [
        "--ckpt_dir", os.path.join(out, "ckpt"),
        "--batch_size", "2048",
        "--split", "test", "--out_dir", os.path.join(out, "test_renders"),
        "--bf16",
    ])
    results[name] = {
        "train_psnr_tail": round(sum(train_psnr) / len(train_psnr), 2),
        "test_psnr": summary.get("mean_psnr"),
    }
    print("NSAMPLES", name, json.dumps(results[name]), flush=True)

print("NSAMPLES_FINAL", json.dumps(results))
