"""Render-only recovery for the round-5 BARF 400^2 @100-view capstone
(runs/quality_barf_400_v100): if the watchdog/timeout cuts the training
before quality_barf.py reaches its render phase, this renders the held-out
test split from the latest orbax checkpoint with the run's exact config.

Reference protocol context: /root/reference/barf/run_barf.py:44-59 trains
the full ~100-image lego split at 400^2 — this run is the 100-view analog
on the procedural scene (VERDICT r4 Missing #2 / Next #4).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.experiments import render_views

OUT = os.environ.get("Q_OUT", "runs/quality_barf_400_v100")
SCENE = os.environ.get("Q_SCENE", "/tmp/netpu_scene_400_v100")
SIZE = int(os.environ.get("Q_SIZE", 400))

summary = render_views.main([
    "--ckpt_dir", os.path.join(os.path.abspath(OUT), "ckpt"),
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024", "--samples_per_ray", "128",
    "--samples_per_ray_proposal", os.environ.get("Q_PROPOSAL", "64"),
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--split", "test",
    "--out_dir", os.path.join(OUT, "novel_views"),
])
print(json.dumps({"novel_view_summary": summary}, default=str))
