#!/bin/bash
# Round-4 TPU queue B — runs after r4_queueA.sh exits ($1 = its pid).
# B1: GaborF sharp-end run (VERDICT #5 — blur_decay 0.999, anneal 0.55-0.85)
# B2: 2-D real-photo fits (VERDICT #8)
# B3: INGP encoder x table study (VERDICT #4 measurement basis)
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queueA pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queueB start $(date +%H:%M:%S) ==="

if [ -d runs/quality_ingp3d_v100/ckpt ] && \
   [ ! -d runs/quality_ingp3d_v100/novel_views_bestval ]; then
  echo "=== B0: INGP-100 best-val checkpoint render $(date +%H:%M:%S) ==="
  python - <<'PYEOF' > /tmp/q_ingp_bestval.log 2>&1
import json, os, sys
sys.path.insert(0, os.getcwd())
OUT = "runs/quality_ingp3d_v100"
rows = [json.loads(l) for l in open(os.path.join(OUT, "metrics.jsonl"))]
val = [(r["step"], r["val_psnr"]) for r in rows if "val_psnr" in r]
ckpts = sorted(int(d) for d in os.listdir(os.path.join(OUT, "ckpt")) if d.isdigit())
peak = max(val, key=lambda t: t[1])[0]
best = min(ckpts, key=lambda c: abs(c - peak))
print("val peak", peak, "-> ckpt", best, "of", ckpts)
if best == ckpts[-1]:
    print("latest IS best; skip")
else:
    from nerf_experiments_tpu.experiments import render_views
    s = render_views.main([
        "--entry", "ingp", "--ckpt_dir", os.path.abspath(os.path.join(OUT, "ckpt")),
        "--ckpt_step", str(best),
        "--scene_path", "/tmp/netpu_quality_scene_160_v100", "--image_size", "160",
        "--batch_size", "1024", "--samples_per_ray", "64",
        "--samples_per_ray_proposal", "32",
        "--hidden_dim", "64", "--n_hidden", "2",
        "--ingp_n_levels", "4", "--ingp_n_features", "8",
        "--ingp_table_size", "65536", "--ingp_encoder", "fused",
        "--bf16", "--split", "test",
        "--out_dir", os.path.join(OUT, "novel_views_bestval")])
    print(json.dumps({"bestval": s, "ckpt": best}, default=str))
PYEOF
  echo "bestval exit=$? $(date +%H:%M:%S)"
  python scripts/persist_evidence.py runs/quality_ingp3d_v100 --name quality_ingp3d_v100 || true
  tail -3 /tmp/q_ingp_bestval.log
fi

echo "=== B1: GaborF sharp-end run $(date +%H:%M:%S) ==="
ANNEAL_START=0.55 ANNEAL_END=0.85 BLUR_DECAY=0.999 \
  Q_STEPS=${GABOR_STEPS:-40000} Q_OUT=runs/quality_gabor_joint \
  timeout 4500 python -u scripts/quality_actfam.py gabor > /tmp/q_gabor.log 2>&1
echo "gabor exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_gabor_joint --name quality_gabor_r4 || true
tail -5 /tmp/q_gabor.log

echo "=== B2: 2D real-photo fits $(date +%H:%M:%S) ==="
Q_STEPS=20000 timeout 1800 python -u scripts/quality_2d_real.py > /tmp/q_2d.log 2>&1
echo "2d exit=$? $(date +%H:%M:%S)"
tail -10 /tmp/q_2d.log

echo "=== B3: INGP encoder x table study (trimmed — the pallas probe and
the C0b quality run cover the rest) $(date +%H:%M:%S) ==="
S_BATCH=4096 S_STEPS=20 S_TABLES=8192,16384 S_GEOS=wide_4x8 \
  timeout 1500 python -u scripts/study_ingp_encoder.py > /tmp/q_ingp_enc.log 2>&1
echo "ingp_enc exit=$? $(date +%H:%M:%S)"
tail -20 /tmp/q_ingp_enc.log

echo "=== queueB done $(date +%H:%M:%S) ==="
