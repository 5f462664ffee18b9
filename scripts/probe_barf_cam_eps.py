"""Does the camera-eps recipe (RESULTS.md, GARF fix) also improve BARF's
joint-calibration tail? (NEXT.md item 7, open question.)

Short probes: same scene/noise as the quality runs (160^2, sigma 0.15/0.15),
schedules compressed to the probe budget, camera recipe varied. Compares the
Kabsch pose error at the end of each probe.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("P_SIZE", 160))
STEPS = int(os.environ.get("P_STEPS", 8000))
SCENE = os.environ.get("P_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import run_barf  # noqa: E402

CONFIGS = {
    # label: (camera_lr, camera_lr_stop, camera_adam_eps)
    "reference (1e-3, eps default)": (1e-3, 1e-5, None),
    "eps 1e-2, lr 1e-3": (1e-3, 1e-4, 1e-2),
    "eps 1e-2, lr 1e-2": (1e-2, 1e-3, 1e-2),
    "eps 1e-2, lr 4e-2 (garf recipe)": (4e-2, 4e-3, 1e-2),
}

results = {}
for label, (lr, lr_stop, eps) in CONFIGS.items():
    out = f"/tmp/probe_barf_eps_{lr}_{eps}"
    argv = [
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--batch_size", "1024", "--max_steps", str(STEPS),
        "--samples_per_ray", "128",
        "--camera_origin_noise_sigma", "0.15",
        "--camera_rotation_noise_sigma", "0.15",
        "--lr_decay_end_step", str(STEPS),
        "--alpha_decay_start_step", str(STEPS // 10),
        "--alpha_decay_end_step", str(STEPS // 2),
        "--camera_lr", str(lr), "--camera_lr_stop", str(lr_stop),
        "--checkpoint_every_n_epochs", "0",
        "--image_log_period_epochs", "1e9",
        "--bf16", "--out_dir", out,
    ]
    if eps is not None:
        argv += ["--camera_adam_eps", str(eps)]
    run_barf.main(argv)
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    pe = [(r["step"], r["pose_error"]) for r in rows if "pose_error" in r]
    psnr = [r["psnr"] for r in rows if "psnr" in r][-5:]
    results[label] = {
        "pose_first": pe[0], "pose_mid": pe[len(pe) // 2], "pose_last": pe[-1],
        "psnr_tail": round(sum(psnr) / len(psnr), 2),
    }
    print(label, "->", results[label], flush=True)

print(json.dumps(results, indent=1))
