"""Real-photograph 2-D fits (VERDICT r2 missing #3): fit grace_hopper.jpg
(a real 600x512 photo shipped with matplotlib) with both 2-D paths —
the Fourier-feature MLP (`run_2d_reconstruction`, reference
`2d-reconstruction/main.py`) and the hash-grid Gigapixel model
(`run_2d_ingp`, reference `2d-ingp/main.py`) — and save full-image
reconstructions + PSNR as committable evidence.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib.cbook as cbook

IMG = cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)
STEPS = int(os.environ.get("Q_STEPS", 20000))
OUT = os.environ.get("Q_OUT", "runs/quality_2d_real")

from nerf_experiments_tpu.experiments import run_2d_ingp, run_2d_reconstruction

results = {}

_, _, results["fourier_mlp"] = run_2d_reconstruction.train(
    run_2d_reconstruction.parse_args([
        "--image_path", IMG, "--steps", str(STEPS),
        "--batch_size", "8192", "--save_image",
        "--out_dir", os.path.join(OUT, "fourier"),
    ]))

_, _, results["ingp"] = run_2d_ingp.train(
    run_2d_ingp.parse_args([
        "--image_path", IMG, "--steps", str(STEPS),
        "--batch_size", "8192", "--save_image",
        "--out_dir", os.path.join(OUT, "ingp"),
    ]))

os.makedirs(OUT, exist_ok=True)
with open(os.path.join(OUT, "summary.json"), "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results))
