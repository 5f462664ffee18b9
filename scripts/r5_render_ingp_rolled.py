"""Render-only recovery for the A3 INGP-rolled quality run (the in-run
render failed on a stale --ingp_encoder choices list, now fixed): renders
held-out test views from the final AND best-val checkpoints."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.experiments import render_views

OUT = os.environ.get("Q_OUT", "runs/quality_ingp3d_rolled")
SCENE = os.environ.get("Q_SCENE", "/tmp/netpu_quality_scene_160_v100")
SIZE, SAMPLES, COARSE = 160, 64, 32
LEVELS, FEATURES, TABLE, WD = 4, 8, 16384, 1e-6


def _render(ckpt_step, tag):
    return render_views.main([
        "--entry", "ingp",
        "--ckpt_dir", os.path.join(os.path.abspath(OUT), "ckpt"),
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--batch_size", "1024",
        "--samples_per_ray", str(SAMPLES),
        "--samples_per_ray_proposal", str(COARSE),
        "--hidden_dim", "64", "--n_hidden", "2",
        "--ingp_n_levels", str(LEVELS), "--ingp_n_features", str(FEATURES),
        "--ingp_table_size", str(TABLE), "--ingp_encoder", "rolled",
        "--ingp_weight_decay", str(WD),
        "--bf16",
        "--split", "test", "--out_dir", os.path.join(OUT, f"novel_views{tag}"),
    ] + (["--ckpt_step", str(ckpt_step)] if ckpt_step else []))


print(json.dumps({"novel_view_summary": _render(None, "")}, default=str))

rows = [json.loads(l) for l in open(os.path.join(OUT, "metrics.jsonl"))]
val = [(r["step"], r["val_psnr"]) for r in rows if "val_psnr" in r]
best_step = max(val, key=lambda t: t[1])[0]
ckpts = sorted(int(d) for d in os.listdir(os.path.join(OUT, "ckpt"))
               if d.isdigit())
near = min(ckpts, key=lambda c: abs(c - best_step))
print(json.dumps({"bestval_ckpt": near, "bestval_step": best_step}))
print(json.dumps(
    {"novel_view_summary_bestval": _render(near, "_bestval")}, default=str))
