#!/bin/bash
# Round-4 TPU queue D — last bonus job after r4_queueC.sh ($1 = pid).
# D1: SARF 100k freeze recipe (pre-ramp budget -> target >=-89% pose).
# Likely cut by round end; partial metrics are committed by the end-of-
# round snapshot and show the pre-ramp pose trajectory.
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queueC pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queueD start $(date +%H:%M:%S) ==="

echo "=== D1: SARF 100k freeze recipe $(date +%H:%M:%S) ==="
FREEZE_DURING_ANNEAL=1 ANNEAL_START=0.80 ANNEAL_END=0.97 \
  Q_STEPS=100000 Q_OUT=runs/quality_sarf_100k \
  timeout 9000 python -u scripts/quality_actfam.py sarf > /tmp/q_sarf100k.log 2>&1
echo "sarf100k exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_sarf_100k --name quality_sarf_100k || true
tail -5 /tmp/q_sarf100k.log

echo "=== queueD done $(date +%H:%M:%S) ==="
