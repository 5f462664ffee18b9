"""Time-to-30dB study (the BASELINE.md north star names "time-to-30 dB
PSNR" as a target alongside rays/s — this measures it directly).

Protocol: procedural scene 160^2 (24 train / 6 test), clean poses with the
camera frozen, full encodings from step 0 (no BARF anneal — this is a
reconstruction-speed measurement, not a calibration run), fused bf16
mega-kernel step at batch 8192. Reports, per config:

  * wall seconds (incl. first-step compile) until the 5-row moving average
    of per-batch train PSNR crosses 30 dB, via the trainer's wall_s rows;
  * the same with compile subtracted (first log row's wall_s is ~all
    compile at batch 8192);
  * held-out test-split PSNR at the end of the budget, as the quality
    anchor (30 dB train PSNR means little if novel views are bad).

Configs: the quality-validated north-star hierarchy (64-sample small
proposal net + S=32 radiance) and the occ-grid coarse-stage variant
(scripts/study_occgrid.py).
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("T_SIZE", 160))
STEPS = int(os.environ.get("T_STEPS", 4000))
BATCH = int(os.environ.get("T_BATCH", 8192))
FUSED = os.environ.get("T_FUSED", "1") != "0"  # 0 = XLA step (CPU smoke)
SCENE = os.environ.get("T_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")
TARGET_DB = float(os.environ.get("T_TARGET_DB", 30.0))

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import render_views, run_barf  # noqa: E402

CONFIGS = {
    "prop64_S32": ["--samples_per_ray", "32",
                   "--samples_per_ray_proposal", "64",
                   "--proposal_hidden_dim", "64"],
    "occ64_S32": ["--samples_per_ray", "32", "--occ_grid_resolution", "64"],
}
only = os.environ.get("T_ONLY")
if only:
    CONFIGS = {k: v for k, v in CONFIGS.items() if k in only.split(",")}

results = {}
for name, extra in CONFIGS.items():
    out = f"runs/study_t30/{name}"
    # metrics.jsonl appends across runs; a stale dir corrupts the
    # compile-baseline (first row) and the moving-average windows
    shutil.rmtree(out, ignore_errors=True)
    common_flags = [
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--camera_origin_noise_sigma", "0.0",
        "--camera_rotation_noise_sigma", "0.0",
    ] + extra
    run_barf.main(common_flags + [
        "--batch_size", str(BATCH), "--max_steps", str(STEPS),
        "--no-optimize_camera",
        "--lr_decay_end_step", str(STEPS),
        # full encodings from step 0: reconstruction-speed protocol
        "--alpha_decay_start_step", "0",
        "--alpha_decay_end_step", "1",
        "--checkpoint_every_n_epochs", "1000",
        "--log_every_n_steps", os.environ.get("T_LOG_EVERY", "10"),
        "--bf16",
        "--out_dir", out,
    ] + (["--fused_kernel"] if FUSED else []))
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    train = [r for r in rows if "psnr" in r and "wall_s" in r]
    hit = None
    for i in range(len(train)):
        window = train[max(0, i - 4): i + 1]
        if sum(r["psnr"] for r in window) / len(window) >= TARGET_DB:
            hit = train[i]
            break
    compile_wall = train[0]["wall_s"] if train else 0.0
    summary = render_views.main(common_flags + [
        "--ckpt_dir", os.path.join(out, "ckpt"),
        "--batch_size", "2048",
        "--split", "test", "--out_dir", os.path.join(out, "test_renders"),
        "--bf16",
    ])
    results[name] = {
        "hit_step": hit and hit["step"],
        "wall_s_incl_compile": hit and hit["wall_s"],
        "wall_s_post_compile": hit and round(hit["wall_s"] - compile_wall, 3),
        "first_log_wall_s": round(compile_wall, 3),
        "final_train_psnr_tail": round(
            sum(r["psnr"] for r in train[-5:]) / max(len(train[-5:]), 1), 2),
        "test_psnr": summary.get("mean_psnr"),
    }
    print("T30", name, json.dumps(results[name]), flush=True)

print("T30_FINAL", json.dumps(results))
