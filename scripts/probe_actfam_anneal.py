"""GaborF/SARF joint calibration with ACTIVATION ANNEALING (gamma ramps the
oscillation term 0 -> 1), on top of the GARF camera-eps recipe.

Baseline (scripts/probe_gabor_sarf.py, RESULTS.md): with gamma = 1 both
families FAIL to calibrate (pose 0.23 -> 0.30) while overfitting blurred
targets at 43-46 dB — their high-frequency capacity absorbs the pose noise
before the cameras settle. At gamma = 0 both reduce to the Gaussian bump
that DOES calibrate (-93.6% with this recipe). This probe ramps gamma over
the middle of the schedule — the family-specific coarse-to-fine analog of
BARF's encoding-alpha anneal.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.experiments import garf_main

SIZE = 160
STEPS = int(os.environ.get("PROBE_STEPS", 6000))  # late-anneal variants want 10k+
SCENE = f"/tmp/netpu_quality_scene_{SIZE}"
spe = 24 * SIZE * SIZE // 1024
epochs = STEPS / spe

RECIPE = [
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024", "--max_steps", str(STEPS),
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--radiance_learning_rate_decay_end", str(epochs),
    "--proposal_learning_rate_decay_end", str(0.7 * epochs),
    "--camera_learning_rate_start", "4e-2",
    "--camera_learning_rate_stop", "4e-3",
    "--camera_learning_rate_decay_end", str(epochs),
    "--camera_adam_eps", "1e-2", "--no_interlevel_camera_grads",
    "--conv_blur", "--blur_relative_sigma_start", "0.08",
    "--blur_relative_sigma_decay", "0.9995",
    "--activation_learning_rate_factor", "4",
    "--bf16", "--fused_kernel",
    # gamma: hold Gaussian through the heavy-blur phase, unlock as the
    # cameras converge (the garf run reaches most of its pose recovery in
    # the first ~40% of steps)
    "--act_anneal_start_epoch",
    str(float(os.environ.get("ANNEAL_START", 0.15)) * epochs),
    "--act_anneal_end_epoch",
    str(float(os.environ.get("ANNEAL_END", 0.85)) * epochs),
]

TAG = os.environ.get("PROBE_TAG", "anneal")

CONFIGS = {
    f"gabor_{TAG}": ["--activation", "gabor"],
    f"sarf_{TAG}": ["--activation", "sarf"],
}

for name, extra in CONFIGS.items():
    out = f"runs/probe_actfam/{name}"
    args = garf_main.parse_args(RECIPE + extra + ["--out_dir", out])
    cfg, state, trainer = garf_main.build(args)
    state = trainer.fit(state)
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    pe = [(r["step"], r["pose_error"]) for r in rows if "pose_error" in r]
    print("ACTFAM", name, json.dumps(
        {"pose_start": pe[0][1], "pose_end": pe[-1][1],
         "pose_min": min(p for _, p in pe),
         "psnr_end": rows[-1]["psnr"]}), flush=True)
