"""Apply the GARF camera-eps calibration recipe to the GaborF and SARF
activation families (NEXT #7): 6k-step probes at 160^2, sigma 0.15/0.15.

SARF note: the reference runs sarf with a near-zero camera LR
(`sarf/main.py`: 4e-9), i.e. effectively frozen cameras — we probe both
that reference behavior (pose should stay ~flat) and the garf recipe.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.experiments import garf_main

SIZE, STEPS = 160, 6000
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
    "--bf16",  # gabor/sarf have no mega-kernel yet -> XLA step
]

CONFIGS = {
    "gabor_recipe": ["--activation", "gabor"],
    "sarf_recipe": ["--activation", "sarf"],
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
         "psnr_end": rows[-1]["psnr"]}), flush=True)
