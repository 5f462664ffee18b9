"""Best-val-checkpoint render for the A4 Mip-BARF sharp run (the in-train
val peaks mid-schedule and then declines — classic 24-view sharp-end
overfit; the novel-view claim should come from the best checkpoint)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.experiments import render_views

OUT = os.environ.get("Q_OUT", "runs/quality_mip_sharp")
SCENE = os.environ.get("Q_SCENE", "/tmp/netpu_quality_scene_256")
SIZE = int(os.environ.get("Q_SIZE", 256))
SIGMA0 = float(os.environ.get("Q_SIGMA0", SIZE / 2))

rows = [json.loads(l) for l in open(os.path.join(OUT, "metrics.jsonl"))]
val = [(r["step"], r["val_psnr"]) for r in rows if "val_psnr" in r]
best_step = max(val, key=lambda t: t[1])[0]
ckpts = sorted(int(d) for d in os.listdir(os.path.join(OUT, "ckpt"))
               if d.isdigit())
near = min(ckpts, key=lambda c: abs(c - best_step))
print(json.dumps({"bestval_step": best_step, "bestval_ckpt": near}))

summary = render_views.main([
    "--entry", "bip",
    "--ckpt_dir", os.path.join(os.path.abspath(OUT), "ckpt"),
    "--ckpt_step", str(near),
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024", "--samples_per_ray", "126",
    "--samples_per_ray_proposal", os.environ.get("Q_PROPOSAL", "64"),
    "--start_blur_sigma", str(SIGMA0),
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--split", "test",
    "--out_dir", os.path.join(OUT, "novel_views_bestval"),
])
print(json.dumps({"novel_view_summary_bestval": summary}, default=str))
