"""mip_NeRF STANDALONE quality run (component #29 — partial since r1).

The reference's own mip_NeRF workload (`mip_NeRF/main.py:47-114`): 800²
lego, batch 2048, 192 radiance + 64 proposal samples, IPE 10/4 levels,
near/far 1/10–1/3 under the auto unit-sphere space transform, clean poses
(no camera optimization), LR 5e-4 → 5e-5. Here at the 400² fallback the
VERDICT allows (`run_mip_nerf` keeps the reference's architecture), on the
procedural scene, then held-out test novel views through the same entry.

Env: Q_SIZE (400), Q_STEPS (40000), Q_BATCH (2048), Q_SAMPLES (192),
Q_COARSE (64), Q_SEPARATE (0 — the reference default shares the net).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic_fast as synthetic

SIZE = int(os.environ.get("Q_SIZE", 400))
STEPS = int(os.environ.get("Q_STEPS", 40000))
BATCH = int(os.environ.get("Q_BATCH", 2048))
SAMPLES = int(os.environ.get("Q_SAMPLES", 192))
COARSE = int(os.environ.get("Q_COARSE", 64))
SEPARATE = os.environ.get("Q_SEPARATE", "0") == "1"
VIEWS = int(os.environ.get("Q_VIEWS", 24))
SCENE = os.environ.get("Q_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")
OUT = os.environ.get("Q_OUT", "runs/quality_mip_standalone")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=VIEWS, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import render_views, run_mip_nerf  # noqa: E402

args = run_mip_nerf.parse_args((["--resume"] if os.environ.get("Q_RESUME") else []) + [
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", str(BATCH), "--max_steps", str(STEPS),
    "--samples_per_ray", str(SAMPLES),
    "--samples_per_ray_proposal", str(COARSE),
    "--checkpoint_every_n_epochs", "4",
    "--bf16",
    "--out_dir", OUT,
] + (["--use_seperate_coarse_fine"] if SEPARATE else []))
exp = run_mip_nerf.build(args)
state = exp.fit()
print("done", int(state.step))

summary = render_views.main([
    "--entry", "mip",
    "--ckpt_dir", os.path.join(os.path.abspath(OUT), "ckpt"),
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", str(BATCH),
    "--samples_per_ray", str(SAMPLES),
    "--samples_per_ray_proposal", str(COARSE),
    "--bf16",
    "--split", "test", "--out_dir", os.path.join(OUT, "novel_views"),
])
print(json.dumps({"novel_view_summary": summary}, default=str))
