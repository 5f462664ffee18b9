"""SARF camera-freeze-during-ramp probe (NEXT #7 open knob).

The converged SARF run (runs/quality_sarf_joint, RESULTS.md) reached
-88.7% pose at 59k while the activations were still Gaussian, then the
gamma ramp (60-95% window tuned on GaborF) injected enough photometric
gradient noise to push the cameras back out (-80.9% at cutoff). Mitigation
built for it: `--camera_freeze_during_anneal` zeroes the camera-group LR
over exactly the ramp window (training/optim.py freeze window).

This probe validates the mechanism at probe scale (the full run is 100k
steps / ~1.6 h; this is 16k / ~15 min): calibrate pre-ramp, freeze+ramp
over 50-80% of the schedule, then run the last 20% LIVE at full gamma.
Success criteria:
  (a) pose error is CONSTANT through the freeze window (by construction —
      asserts the plumbing end-to-end on hardware),
  (b) train PSNR keeps improving through the ramp (the scene net adapts to
      the unlocked oscillation without camera motion),
  (c) pose error does NOT blow back up in the post-ramp live window at
      gamma = 1 (the failure mode of the unfrozen run).

Reference context: `sarf/main.py` ships camera LR 4e-9 (frozen cameras
throughout) — the reference never jointly calibrates SARF at all.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_experiments_tpu.data import synthetic

SIZE = int(os.environ.get("PROBE_SIZE", 160))
STEPS = int(os.environ.get("PROBE_STEPS", 16000))
A0 = float(os.environ.get("ANNEAL_START", 0.50))
A1 = float(os.environ.get("ANNEAL_END", 0.80))
SCENE = os.environ.get("PROBE_SCENE", f"/tmp/netpu_quality_scene_{SIZE}")
OUT = os.environ.get("PROBE_OUT", "runs/probe_sarf_freeze")

if not os.path.exists(os.path.join(SCENE, "transforms_train.json")):
    synthetic.generate_dataset(SCENE, n_train=24, n_val=4, n_test=6,
                               image_size=SIZE, n_samples=128)

from nerf_experiments_tpu.experiments import garf_main  # noqa: E402

spe = 24 * SIZE * SIZE // 1024
epochs = STEPS / spe

args = garf_main.parse_args([
    "--activation", "sarf",
    "--scene_path", SCENE, "--image_size", str(SIZE),
    "--batch_size", "1024", "--max_steps", str(STEPS),
    "--camera_origin_noise_sigma", "0.15",
    "--camera_rotation_noise_sigma", "0.15",
    "--radiance_learning_rate_decay_end", str(epochs),
    "--proposal_learning_rate_decay_end", str(0.7 * epochs),
    # camera-eps recipe (RESULTS.md ablation winner)
    "--camera_learning_rate_start", "4e-2",
    "--camera_learning_rate_stop", "4e-3",
    "--camera_learning_rate_decay_end", str(epochs),
    "--camera_adam_eps", "1e-2", "--no_interlevel_camera_grads",
    "--conv_blur", "--blur_relative_sigma_start", "0.08",
    "--blur_relative_sigma_decay", "0.9995",
    "--activation_learning_rate_factor", "4",
    "--bf16", "--fused_kernel",
    "--act_anneal_start_epoch", str(A0 * epochs),
    "--act_anneal_end_epoch", str(A1 * epochs),
    "--camera_freeze_during_anneal",
    "--log_every_n_steps", "100",
    "--out_dir", OUT,
])
cfg, state, trainer = garf_main.build(args)
state = trainer.fit(state)

rows = [json.loads(l) for l in open(os.path.join(OUT, "metrics.jsonl"))]
pe = [(r["step"], r["pose_error"]) for r in rows if "pose_error" in r]
psnr = [(r["step"], r["psnr"]) for r in rows if "psnr" in r]
f0, f1 = cfg.camera_freeze_start_step, cfg.camera_freeze_end_step
inside = [p for s, p in pe if f0 < s - 1 < f1]
pre = [p for s, p in pe if s - 1 <= f0]
post = [p for s, p in pe if s - 1 >= f1]
psnr_at = lambda lo, hi: [v for s, v in psnr if lo <= s <= hi]


def tail_mean(xs, n=5):
    xs = xs[-n:]
    return sum(xs) / len(xs) if xs else float("nan")


summary = {
    "steps": STEPS, "freeze_window": [f0, f1],
    "pose_start": pe[0][1] if pe else None,
    "pose_pre_ramp": pre[-1] if pre else None,
    "pose_frozen_min": min(inside) if inside else None,
    "pose_frozen_max": max(inside) if inside else None,
    "pose_end": pe[-1][1] if pe else None,
    "pose_post_min": min(post) if post else None,
    "psnr_ramp_start": tail_mean(psnr_at(f0 - 500, f0)),
    "psnr_ramp_end": tail_mean(psnr_at(f1 - 500, f1)),
    "psnr_end": tail_mean([v for _, v in psnr]),
}
print("SARF_FREEZE", json.dumps(summary), flush=True)
