#!/bin/bash
# Round-3 (continuation) TPU queue: the prior session's queue results were
# lost to the environment reset before they could be recorded. This rerun is
# ordered by VERDICT value-per-minute, and each quality job persists its
# evidence into docs/evidence/ IMMEDIATELY so a mid-queue cutoff loses at
# most one job. Strictly serial (concurrent TPU clients wedge the tunnel —
# verify SKILL.md).
set -u
cd /root/repo

echo "=== probe $(date +%H:%M:%S) ==="
timeout 600 python -u -c "import jax, jax.numpy as jnp; print('tunnel ok', float(jnp.ones((8,8)).sum()))" 2>&1 | grep -v WARNING
echo "probe exit=$?"

echo "=== job 1: serving study (north-star serving >=1.8M) $(date +%H:%M:%S) ==="
timeout 2100 python -u scripts/study_serving.py > /tmp/q_serving.log 2>&1
echo "serving exit=$? $(date +%H:%M:%S)"
tail -20 /tmp/q_serving.log

echo "=== job 2: 3-D INGP quality 160^2 (VERDICT weak #2) $(date +%H:%M:%S) ==="
Q_SIZE=160 Q_STEPS=12000 Q_BATCH=4096 Q_LEVELS=4 Q_FEATURES=8 \
  Q_TABLE=65536 Q_ENCODER=fused Q_SAMPLES=64 Q_COARSE=32 \
  Q_OUT=runs/quality_ingp3d \
  timeout 4200 python -u scripts/quality_ingp3d.py > /tmp/q_ingp3d.log 2>&1
echo "ingp3d exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_ingp3d --name quality_ingp3d || true
tail -5 /tmp/q_ingp3d.log

echo "=== job 3: SARF fix run (late ramp + camera freeze) $(date +%H:%M:%S) ==="
FREEZE_DURING_ANNEAL=1 ANNEAL_START=0.80 ANNEAL_END=0.97 \
  Q_STEPS=${SARF_STEPS:-40000} Q_OUT=runs/quality_sarf_joint \
  timeout 4500 python -u scripts/quality_actfam.py sarf > /tmp/q_sarf.log 2>&1
echo "sarf exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_sarf_joint --name quality_sarf_r3 || true
tail -5 /tmp/q_sarf.log

echo "=== job 4: GaborF sharp-end run (faster blur decay) $(date +%H:%M:%S) ==="
ANNEAL_START=0.55 ANNEAL_END=0.85 BLUR_DECAY=0.999 \
  Q_STEPS=${GABOR_STEPS:-40000} Q_OUT=runs/quality_gabor_joint \
  timeout 4500 python -u scripts/quality_actfam.py gabor > /tmp/q_gabor.log 2>&1
echo "gabor exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_gabor_joint --name quality_gabor_r3 || true
tail -5 /tmp/q_gabor.log

echo "=== job 5: INGP encoder x table study $(date +%H:%M:%S) ==="
S_BATCH=4096 S_STEPS=20 S_TABLES=8192,16384,65536 \
  timeout 2700 python -u scripts/study_ingp_encoder.py > /tmp/q_ingp_enc.log 2>&1
echo "ingp_enc exit=$? $(date +%H:%M:%S)"
tail -20 /tmp/q_ingp_enc.log

echo "=== job 6: 2D real-photo fits $(date +%H:%M:%S) ==="
Q_STEPS=20000 timeout 1800 python -u scripts/quality_2d_real.py > /tmp/q_2d.log 2>&1
echo "2d exit=$? $(date +%H:%M:%S)"
tail -10 /tmp/q_2d.log

echo "=== job 7: profiler trace $(date +%H:%M:%S) ==="
P_CONFIG=occ timeout 1200 python -u scripts/profile_trace.py > /tmp/q_profile.log 2>&1
echo "profile exit=$? $(date +%H:%M:%S)"
tail -10 /tmp/q_profile.log

echo "=== queue3 done $(date +%H:%M:%S) ==="
