#!/bin/bash
# Round-4 TPU queue A — ordered by VERDICT r3 priority. Strictly serial
# (concurrent TPU clients wedge the tunnel); each job persists evidence
# immediately so a cutoff loses at most one job.
#
# $1 (optional): pid of an in-flight TPU job to wait for before starting
# (round 4 inherited the r3 queue's SARF freeze-run mid-flight — exactly
# VERDICT item #5's recipe — so it is allowed to finish first).
#
# A0: persist the inherited SARF run's evidence.
# A1: 3-D INGP at 100 views (VERDICT top item: the r3 24-view run overfit
#     to 40 dB train / 15.9 dB val; the reference uses the full 100-image
#     lego train split).
# A2: block-coarse TRAINING quality study (VERDICT #2 — the blk4 611k
#     config shipped unvalidated).
# A3: serving-quality PSNR table (VERDICT #2 — RESULTS.md promises it).
# A4: jax.profiler trace (VERDICT #3 — two rounds overdue).
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for inherited TPU job pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
  echo "inherited job done $(date +%H:%M:%S)"
fi

echo "=== A0: persist inherited SARF evidence $(date +%H:%M:%S) ==="
python scripts/persist_evidence.py runs/quality_sarf_joint --name quality_sarf_r4 || true
tail -4 /tmp/q_sarf.log 2>/dev/null

echo "=== probe $(date +%H:%M:%S) ==="
timeout 600 python -u -c "import jax, jax.numpy as jnp; print('tunnel ok', float(jnp.ones((8,8)).sum()))" 2>&1 | grep -v WARNING
echo "probe exit=$?"

echo "=== A0b: Pallas hash-matmul probe (kernel iteration data) $(date +%H:%M:%S) ==="
timeout 1800 python -u scripts/probe_hash_pallas.py > /tmp/q_hashpl.log 2>&1
echo "hashpl exit=$? $(date +%H:%M:%S)"
tail -12 /tmp/q_hashpl.log

echo "=== A1: 3-D INGP quality, 100 views $(date +%H:%M:%S) ==="
Q_SIZE=160 Q_STEPS=12000 Q_BATCH=4096 Q_LEVELS=4 Q_FEATURES=8 \
  Q_TABLE=65536 Q_ENCODER=fused Q_SAMPLES=64 Q_COARSE=32 Q_VIEWS=100 \
  Q_OUT=runs/quality_ingp3d_v100 \
  timeout 6000 python -u scripts/quality_ingp3d.py > /tmp/q_ingp100.log 2>&1
echo "ingp100 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_ingp3d_v100 --name quality_ingp3d_v100 || true
tail -5 /tmp/q_ingp100.log

echo "=== A2: block-coarse TRAINING quality study $(date +%H:%M:%S) ==="
S_BLOCKS=1,4,8 Q_SIZE=160 Q_STEPS=12000 \
  timeout 4200 python -u scripts/study_train_block.py > /tmp/q_trainblk.log 2>&1
echo "trainblk exit=$? $(date +%H:%M:%S)"
tail -8 /tmp/q_trainblk.log

echo "=== A3: serving-quality validation (prop16/blk PSNR) $(date +%H:%M:%S) ==="
Q_SIZE=160 Q_STEPS=12000 Q_OUT=runs/serving_quality \
  timeout 3600 python -u scripts/study_serving_quality.py > /tmp/q_servq.log 2>&1
echo "servq exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/serving_quality --name serving_quality || true
tail -8 /tmp/q_servq.log

echo "=== A4: profiler trace $(date +%H:%M:%S) ==="
P_CONFIG=occ timeout 1800 python -u scripts/profile_trace.py > /tmp/q_profile.log 2>&1
echo "profile exit=$? $(date +%H:%M:%S)"
tail -15 /tmp/q_profile.log

echo "=== queueA done $(date +%H:%M:%S) ==="
