#!/bin/bash
# Round-4 TPU queue D — bonus jobs after r4_queueC.sh ($1 = its pid).
# D1: INGP fast-config quality run (matmul encoder, T=16384) — pairs the
#     VERDICT #4 throughput bar with its quality validation.
# D2: SARF 100k freeze recipe (pre-ramp budget -> target >=-89% pose);
#     runs last, survives partial via persist_evidence.
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queueC pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queueD start $(date +%H:%M:%S) ==="

echo "=== D0: train-step batch-size probe (8k/16k/32k) $(date +%H:%M:%S) ==="
P_STEPS=20 timeout 2400 python -u scripts/probe_train_batch.py > /tmp/q_trainbatch.log 2>&1
echo "trainbatch exit=$? $(date +%H:%M:%S)"
grep -v WARNING /tmp/q_trainbatch.log | tail -14

echo "=== D1: INGP fast-config quality (matmul T=16384) $(date +%H:%M:%S) ==="
Q_SIZE=160 Q_STEPS=12000 Q_BATCH=4096 Q_LEVELS=4 Q_FEATURES=8 \
  Q_TABLE=16384 Q_ENCODER=matmul Q_SAMPLES=64 Q_COARSE=32 Q_VIEWS=100 \
  Q_WD=1e-6 \
  Q_OUT=runs/quality_ingp3d_fast \
  timeout 4800 python -u scripts/quality_ingp3d.py > /tmp/q_ingpfast.log 2>&1
echo "ingpfast exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_ingp3d_fast --name quality_ingp3d_fast || true
tail -5 /tmp/q_ingpfast.log

echo "=== D2: SARF 100k freeze recipe $(date +%H:%M:%S) ==="
FREEZE_DURING_ANNEAL=1 ANNEAL_START=0.80 ANNEAL_END=0.97 \
  Q_STEPS=100000 Q_OUT=runs/quality_sarf_100k \
  timeout 9000 python -u scripts/quality_actfam.py sarf > /tmp/q_sarf100k.log 2>&1
echo "sarf100k exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_sarf_100k --name quality_sarf_100k || true
tail -5 /tmp/q_sarf100k.log

echo "=== queueD done $(date +%H:%M:%S) ==="
