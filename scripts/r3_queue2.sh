#!/bin/bash
# Round-3 TPU queue v2: short studies first, long quality runs last, so a
# slow job can't starve the cheap evidence. Strictly serial; generous
# timeouts (fire only on a true hang).
set -u
cd /root/repo

echo "=== probe $(date +%H:%M:%S) ==="
timeout 600 python -u -c "import jax, jax.numpy as jnp; print('tunnel ok', float(jnp.ones((8,8)).sum()))" 2>&1 | grep -v WARNING
echo "probe exit=$?"

echo "=== job A: INGP encoder x table study $(date +%H:%M:%S) ==="
S_BATCH=4096 S_STEPS=20 S_TABLES=8192,16384,65536 \
  timeout 2700 python -u scripts/study_ingp_encoder.py > /tmp/q_ingp_enc.log 2>&1
echo "ingp_enc exit=$? $(date +%H:%M:%S)"

echo "=== job B: serving study $(date +%H:%M:%S) ==="
timeout 1800 python -u scripts/study_serving.py > /tmp/q_serving.log 2>&1
echo "serving exit=$? $(date +%H:%M:%S)"

echo "=== job C: profiler trace $(date +%H:%M:%S) ==="
P_CONFIG=occ timeout 1200 python -u scripts/profile_trace.py > /tmp/q_profile.log 2>&1
echo "profile exit=$? $(date +%H:%M:%S)"

echo "=== job D: 2D real-photo fits $(date +%H:%M:%S) ==="
Q_STEPS=20000 timeout 1500 python -u scripts/quality_2d_real.py > /tmp/q_2d.log 2>&1
echo "2d exit=$? $(date +%H:%M:%S)"

echo "=== job E: 3-D INGP quality (fast geometry) $(date +%H:%M:%S) ==="
Q_SIZE=160 Q_STEPS=12000 Q_BATCH=4096 Q_LEVELS=4 Q_FEATURES=8 \
  Q_TABLE=65536 Q_ENCODER=fused Q_SAMPLES=64 Q_COARSE=32 \
  Q_OUT=runs/quality_ingp3d \
  timeout 3600 python -u scripts/quality_ingp3d.py > /tmp/q_ingp3d.log 2>&1
echo "ingp3d exit=$? $(date +%H:%M:%S)"

echo "=== job F: SARF fix run (time-boxed) $(date +%H:%M:%S) ==="
FREEZE_DURING_ANNEAL=1 ANNEAL_START=0.80 ANNEAL_END=0.97 \
  Q_STEPS=${SARF_STEPS:-40000} Q_OUT=runs/quality_sarf_joint \
  timeout 7200 python -u scripts/quality_actfam.py sarf > /tmp/q_sarf.log 2>&1
echo "sarf exit=$? $(date +%H:%M:%S)"

echo "=== queue2 done $(date +%H:%M:%S) ==="
