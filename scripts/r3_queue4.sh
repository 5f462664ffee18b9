#!/bin/bash
# Round-3 follow-on TPU queue: runs after r3_queue3.sh's bash pid exits.
# Highest-value-first: quality-validate the >=1.8M serving knobs on a
# trained checkpoint, re-run the 400^2 BARF capstone so its evidence can be
# committed (the round-2 artifact was lost to the environment reset), then
# refresh bench.py with the new headline logic.
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queue3 pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

echo "=== queue4 start $(date +%H:%M:%S) ==="

echo "=== job Q1: serving-quality validation (prop16/blk4/blk8 PSNR) ==="
Q_SIZE=160 Q_STEPS=12000 Q_OUT=runs/serving_quality \
  timeout 3600 python -u scripts/study_serving_quality.py > /tmp/q_servq.log 2>&1
echo "servq exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/serving_quality --name serving_quality || true
tail -8 /tmp/q_servq.log

echo "=== job Q2: 400^2 BARF capstone rerun (evidence for the headline quality claim) ==="
Q_SIZE=400 Q_STEPS=60000 Q_BATCH=4096 Q_FUSED=1 Q_PROPOSAL=64 \
  Q_CAM_LR=1e-2 Q_CAM_EPS=1e-2 Q_OUT=runs/quality_barf_400 \
  timeout 5400 python -u scripts/quality_barf.py > /tmp/q_barf400.log 2>&1
echo "barf400 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_barf_400 --name quality_barf_400 || true
tail -5 /tmp/q_barf400.log

echo "=== job Q3: final bench refresh ==="
timeout 3000 python -u bench.py > /tmp/q_bench.log 2>&1
echo "bench exit=$? $(date +%H:%M:%S)"
tail -2 /tmp/q_bench.log

echo "=== queue4 done $(date +%H:%M:%S) ==="
