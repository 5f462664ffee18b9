"""Full-length GaborF / SARF joint-calibration runs with activation
annealing (NEXT #7 closing run).

The 10k probes (scripts/probe_actfam_anneal.py, RESULTS.md) established
that holding the oscillation term at gamma=0 until 60% of the schedule
converts both families from diverging to converging (gabor -20%, sarf
-29% at 10k, descending at cutoff). This runs the winning recipe at the
full GARF-joint schedule length (100k steps, the budget that took GARF
itself to -93.6%), with held-out test renders at the end.

Reference context: `sarf/main.py` ships camera LR 4e-9 (frozen cameras) —
the thesis author did not calibrate sarf; this recipe goes beyond the
reference by making both families calibrate jointly.

Usage: python scripts/quality_actfam.py [gabor|sarf]
Env: Q_STEPS (default 100000), Q_SIZE (160), ANNEAL_START/END (0.60/0.95).
"""
import os
import subprocess
import sys

FAMILY = sys.argv[1] if len(sys.argv) > 1 else "gabor"
SIZE = int(os.environ.get("Q_SIZE", 160))
STEPS = int(os.environ.get("Q_STEPS", 100_000))
A0 = float(os.environ.get("ANNEAL_START", 0.60))
A1 = float(os.environ.get("ANNEAL_END", 0.95))
# SARF fix (VERDICT r3 #5): the gamma ramp destabilizes the calibrated
# cameras — freeze them across the anneal window so the ramp can only
# change the radiance field, not push the poses back out
FREEZE = os.environ.get("FREEZE_DURING_ANNEAL") == "1"
# GaborF sharp-end fix (VERDICT r3 #5): 0.9995 reaches a sharp ladder only
# at ~78% of a 100k run — a faster decay gives the sharp targets more of
# the schedule (0.999 -> sharp at ~53%)
BLUR_DECAY = os.environ.get("BLUR_DECAY", "0.9995")

VIEWS = int(os.environ.get("Q_VIEWS", 24))
steps_per_epoch = VIEWS * SIZE * SIZE // 1024
epochs = STEPS / steps_per_epoch

env = dict(os.environ)
env.update({
    "Q_SIZE": str(SIZE),
    "Q_STEPS": str(STEPS),
    "Q_FUSED": "1",
    "Q_OUT": os.environ.get("Q_OUT", f"runs/quality_{FAMILY}_joint"),
    "Q_EXTRA": " ".join([
        "--activation", FAMILY,
        # camera-eps recipe (RESULTS.md ablation winner)
        "--camera_learning_rate_start", "4e-2",
        "--camera_learning_rate_stop", "4e-3",
        "--camera_adam_eps", "1e-2",
        "--no_interlevel_camera_grads",
        # strong conv-blur ladder, sharp by the end of 100k
        "--conv_blur",
        "--blur_relative_sigma_start", "0.08",
        "--blur_relative_sigma_decay", BLUR_DECAY,
        "--activation_learning_rate_factor", "4",
        # activation coarse-to-fine anneal: Gaussian until A0, full
        # oscillation by A1 (probe winner: 0.60-0.95)
        "--act_anneal_start_epoch", str(A0 * epochs),
        "--act_anneal_end_epoch", str(A1 * epochs),
        # in-run checkpoints so a queue-timeout cut still leaves a
        # renderable state (render_garf_ckpt.py recovery path)
        "--checkpoint_every_n_epochs", str(max(2.0, epochs / 12)),
    ] + (["--camera_freeze_during_anneal"] if FREEZE else [])),
})

script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "quality_garf.py")
raise SystemExit(subprocess.call([sys.executable, script], env=env))
