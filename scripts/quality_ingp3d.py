"""Trained 3-D INGP quality run (VERDICT r2 weak #2): run_3d_ingp at >=160²
on the procedural scene (clean poses — INGP is a reconstruction-speed
model; the reference's 3d-ingp has no camera optimization,
`3d-ingp/model.py:237-475`), then held-out test novel views.

Target: run_barf quality class (>=29 dB novel view at the 12k horizon
equivalent — see RESULTS.md time-to-30dB).

Env: Q_SIZE (160), Q_STEPS (12000), Q_BATCH (4096), Q_LEVELS (4),
Q_FEATURES (8), Q_TABLE (65536), Q_ENCODER (fused), Q_SAMPLES (64),
Q_VIEWS (24 — the r3 run overfit 24 views to 40 dB train / 15.9 dB val;
the reference trains on the full 100-image lego split, so the round-4
diagnosis runs 100 views), Q_RES_MAX (512 — finest hash resolution).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic_fast as synthetic

SIZE = int(os.environ.get("Q_SIZE", 160))
STEPS = int(os.environ.get("Q_STEPS", 12000))
BATCH = int(os.environ.get("Q_BATCH", 4096))
LEVELS = int(os.environ.get("Q_LEVELS", 4))
FEATURES = int(os.environ.get("Q_FEATURES", 8))
TABLE = int(os.environ.get("Q_TABLE", 65536))
ENCODER = os.environ.get("Q_ENCODER", "fused")
SAMPLES = int(os.environ.get("Q_SAMPLES", 64))
COARSE = int(os.environ.get("Q_COARSE", 32))
WD = float(os.environ.get("Q_WD", 0.0))
VIEWS = int(os.environ.get("Q_VIEWS", 24))
RES_MAX = int(os.environ.get("Q_RES_MAX", 512))
SCENE = os.environ.get(
    "Q_SCENE",
    f"/tmp/netpu_quality_scene_{SIZE}" if VIEWS == 24
    else f"/tmp/netpu_quality_scene_{SIZE}_v{VIEWS}")
OUT = os.environ.get("Q_OUT", "runs/quality_ingp3d")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=VIEWS, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import render_views, run_3d_ingp

common_flags = [
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", str(BATCH),
    "--samples_per_ray_fine", str(SAMPLES),
    "--samples_per_ray_coarse", str(COARSE),
    "--n_levels", str(LEVELS), "--n_features", str(FEATURES),
    "--table_size", str(TABLE), "--encoder", ENCODER,
    "--resolution_max", str(RES_MAX),
    "--bf16", "--out_dir", OUT,
]
args = run_3d_ingp.parse_args(common_flags + [
    "--max_steps", str(STEPS),
    "--weight_decay", str(WD),
    "--checkpoint_every_n_epochs", "4",
])
exp = run_3d_ingp.build(args)
state = exp.fit()
print("done", int(state.step))


def _render(ckpt_step, tag):
    return render_views.main([
        "--entry", "ingp",
        "--ckpt_dir", os.path.join(os.path.abspath(OUT), "ckpt"),
        "--scene_path", SCENE, "--image_size", str(SIZE),
        "--batch_size", "1024",
        "--samples_per_ray", str(SAMPLES),
        "--samples_per_ray_proposal", str(COARSE),
        # run_3d_ingp MLP geometry (render_views' own defaults are run_barf's)
        "--hidden_dim", "64", "--n_hidden", "2",
        "--ingp_n_levels", str(LEVELS), "--ingp_n_features", str(FEATURES),
        "--ingp_table_size", str(TABLE), "--ingp_encoder", ENCODER,
        "--ingp_resolution_max", str(RES_MAX),
        "--ingp_weight_decay", str(WD),
        "--bf16",
        "--split", "test", "--out_dir", os.path.join(OUT, f"novel_views{tag}"),
    ] + (["--ckpt_step", str(ckpt_step)] if ckpt_step else []))


summary = _render(None, "")
print(json.dumps({"novel_view_summary": summary}, default=str))

# early-stopping render: pick the checkpoint nearest the val-PSNR peak
# (hash-grid NeRFs can overfit past their val optimum — the r3 24-view run
# peaked at step 1501 of 12k)
try:
    rows = [json.loads(l) for l in open(os.path.join(OUT, "metrics.jsonl"))]
    val = [(r["step"], r["val_psnr"]) for r in rows if "val_psnr" in r]
    ckpts = sorted(int(d) for d in os.listdir(os.path.join(OUT, "ckpt"))
                   if d.isdigit())
    if val and ckpts:
        peak_step = max(val, key=lambda t: t[1])[0]
        best_ckpt = min(ckpts, key=lambda c: abs(c - peak_step))
        if best_ckpt != ckpts[-1]:
            s2 = _render(best_ckpt, "_bestval")
            print(json.dumps({"novel_view_summary_bestval": s2,
                              "val_peak_step": peak_step,
                              "ckpt_step": best_ckpt}, default=str))
except Exception as e:  # noqa: BLE001 — best-val render is best-effort
    print(json.dumps({"bestval_render_error": str(e)[:200]}))
