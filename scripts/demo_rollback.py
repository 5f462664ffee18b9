"""Demonstrate the trainer's divergence-rollback guard on the REAL
256^2/batch-8192 fused-kernel collapse (RESULTS.md "collapse"): resume the
exact collapsing trajectory from its step-7400 checkpoint with the guard
enabled and run through the step-7581 cliff. Without the guard the run
freezes at loss ~0.09 with dead gradients; with it, the trainer detects the
sustained spike, restores the snapshot, perturbs the batch key stream, and
continues training.

Run on TPU: python scripts/demo_rollback.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SRC = "runs/repro_collapse"  # holds the step-7400 checkpoint of the collapse run
OUT = "runs/collapse_rollback"
FROM_STEP = 7400
TO_STEP = int(os.environ.get("RB_TO_STEP", 12000))

from nerf_experiments_tpu.data import synthetic  # noqa: E402
from nerf_experiments_tpu.experiments import run_barf  # noqa: E402
from nerf_experiments_tpu.training.checkpoints import CheckpointManager  # noqa: E402

SIZE = 256
scene = f"/tmp/netpu_quality_scene_{SIZE}"
if not os.path.exists(os.path.join(scene, "transforms_train.json")):
    synthetic.generate_dataset(scene, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

args = run_barf.parse_args([
    "--scene_path", scene, "--image_size", str(SIZE),
    "--batch_size", "8192", "--max_steps", str(TO_STEP),
    "--samples_per_ray", "128",
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--lr_decay_end_step", "60000",
    "--alpha_decay_start_step", "2000",
    "--alpha_decay_end_step", "30000",
    "--image_log_period_epochs", "1000",
    "--bf16", "--fused_kernel",
    "--out_dir", OUT,
])
exp = run_barf.build(args)
state = CheckpointManager(os.path.join(SRC, "ckpt")).restore(
    exp.state, step=FROM_STEP)
print(f"resumed at step {int(state.step)}; rollback guard: "
      f"{exp.trainer.cfg.rollback_enabled}", flush=True)

final = exp.trainer.fit(state)

rows = [json.loads(l) for l in open(os.path.join(OUT, "metrics.jsonl"))]
rollbacks = [r for r in rows if "rollback" in r]
losses = [(r["step"], r["loss"]) for r in rows if "loss" in r]
tail = [l for s, l in losses if s >= TO_STEP - 500]
print(json.dumps({
    "rollbacks": rollbacks,
    "final_step": int(final.step),
    "tail_loss_mean": float(np.mean(tail)) if tail else None,
    "survived": bool(tail) and float(np.mean(tail)) < 0.01,
}), flush=True)
