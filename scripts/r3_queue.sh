#!/bin/bash
# Round-3 TPU job queue: strictly serialized (concurrent TPU clients through
# the axon tunnel wedge it — verify SKILL.md). Each job logs to /tmp/q_*.log
# and is bounded by its own timeout; jobs are never killed mid-flight by
# this script beyond that timeout.
set -u
cd /root/repo

wait_for_pid_exit() {
  local pid=$1
  while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

if [ "${1:-}" != "" ]; then
  echo "waiting for pid $1 (mip run) to exit..."
  wait_for_pid_exit "$1"
fi

echo "=== queue start $(date +%H:%M:%S) ==="

echo "--- job 1: SARF fix run (late gentle ramp + camera freeze) ---"
FREEZE_DURING_ANNEAL=1 ANNEAL_START=0.80 ANNEAL_END=0.97 \
  Q_STEPS=100000 Q_OUT=runs/quality_sarf_joint \
  timeout 4500 python -u scripts/quality_actfam.py sarf \
  > /tmp/q_sarf.log 2>&1
echo "sarf exit=$? $(date +%H:%M:%S)"

echo "--- job 2: GaborF sharp-end run (faster blur decay, earlier ramp) ---"
ANNEAL_START=0.55 ANNEAL_END=0.85 BLUR_DECAY=0.999 \
  Q_STEPS=100000 Q_OUT=runs/quality_gabor_joint \
  timeout 4500 python -u scripts/quality_actfam.py gabor \
  > /tmp/q_gabor.log 2>&1
echo "gabor exit=$? $(date +%H:%M:%S)"

echo "--- job 3: INGP encoder x table-size study ---"
S_BATCH=4096 S_STEPS=20 S_TABLES=8192,16384,65536 \
  timeout 2400 python -u scripts/study_ingp_encoder.py \
  > /tmp/q_ingp_enc.log 2>&1
echo "ingp_enc exit=$? $(date +%H:%M:%S)"

echo "--- job 4: serving throughput study ---"
timeout 1800 python -u scripts/study_serving.py > /tmp/q_serving.log 2>&1
echo "serving exit=$? $(date +%H:%M:%S)"

echo "--- job 5: jax.profiler trace ---"
P_CONFIG=occ timeout 900 python -u scripts/profile_trace.py \
  > /tmp/q_profile.log 2>&1
echo "profile exit=$? $(date +%H:%M:%S)"

echo "--- job 6: 2D real-photo fits ---"
Q_STEPS=20000 timeout 1800 python -u scripts/quality_2d_real.py \
  > /tmp/q_2d.log 2>&1
echo "2d exit=$? $(date +%H:%M:%S)"

echo "=== queue done $(date +%H:%M:%S) ==="
