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

echo "=== B3: INGP encoder x table study $(date +%H:%M:%S) ==="
S_BATCH=4096 S_STEPS=20 S_TABLES=4096,8192,16384,65536 \
  timeout 2700 python -u scripts/study_ingp_encoder.py > /tmp/q_ingp_enc.log 2>&1
echo "ingp_enc exit=$? $(date +%H:%M:%S)"
tail -20 /tmp/q_ingp_enc.log

echo "=== queueB done $(date +%H:%M:%S) ==="
