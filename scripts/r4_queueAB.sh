#!/bin/bash
# Round-4 interstitial queue: Pallas hash-kernel diagnostics between the
# quality queues ($1 = queue A bash pid). Cheap (<20 min) and gives the
# kernel-iteration data a same-day turnaround.
set -u
cd /root/repo
if [ "${1:-}" != "" ]; then
  echo "waiting for queueA pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== AB1: bisect hash-pallas compile failure $(date +%H:%M:%S) ==="
timeout 900 python -u scripts/bisect_hash_pallas.py > /tmp/q_bisect.log 2>&1
echo "bisect exit=$? $(date +%H:%M:%S)"
cat /tmp/q_bisect.log | grep -v WARNING | tail -8
echo "=== AB1b: blk1 at blk4's wall-clock budget (equal-time comparison) $(date +%H:%M:%S) ==="
# blk4 reached 29.17 dB in 577 s (12k steps); blk1 needs 1099 s for 29.59.
# The fair promotion test for a THROUGHPUT headline is quality at equal
# wall-clock: run blk1 for ~6.3k steps (blk4's budget) and compare.
S_BLOCKS=1 Q_SIZE=160 Q_STEPS=6300 Q_OUT=runs/train_block_eqtime \
  timeout 1500 python -u scripts/study_train_block.py > /tmp/q_trainblk_eq.log 2>&1
echo "trainblk_eq exit=$? $(date +%H:%M:%S)"
grep -a '"blk' /tmp/q_trainblk_eq.log | tail -2

echo "=== AB2: hash probe rerun (fixed sync, clean process) $(date +%H:%M:%S) ==="
P_STEPS=20 timeout 1500 python -u scripts/probe_hash_pallas.py > /tmp/q_hashpl2.log 2>&1
echo "hashpl2 exit=$? $(date +%H:%M:%S)"
grep -v WARNING /tmp/q_hashpl2.log | tail -6
echo "=== queueAB done $(date +%H:%M:%S) ==="
