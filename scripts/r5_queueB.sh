#!/bin/bash
# Round-5 TPU queue B — after r5_queueA.sh ($1 = its pid). Calibration
# families + reference-protocol capstones; droppable from the tail.
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queueA pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queueB start $(date +%H:%M:%S) ==="

echo "=== B0: INGP rolled F=4 quality (the >=150k config) $(date +%H:%M:%S) ==="
Q_SIZE=160 Q_STEPS=12000 Q_BATCH=4096 Q_LEVELS=4 Q_FEATURES=4 \
  Q_TABLE=16384 Q_ENCODER=rolled Q_SAMPLES=64 Q_COARSE=32 Q_VIEWS=100 \
  Q_WD=1e-6 Q_OUT=runs/quality_ingp3d_rolled_f4 \
  timeout 4500 python -u scripts/quality_ingp3d.py > /tmp/r5/q_ingp_f4.log 2>&1
echo "ingp_f4 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_ingp3d_rolled_f4 --name quality_ingp3d_rolled_f4 || true
grep -a "novel_view_summary" /tmp/r5/q_ingp_f4.log | head -c 300; echo

echo "=== B1: SARF 100k freeze recipe (VERDICT #5) $(date +%H:%M:%S) ==="
FREEZE_DURING_ANNEAL=1 Q_STEPS=100000 Q_OUT=runs/quality_sarf_100k \
  timeout 7200 python -u scripts/quality_actfam.py sarf \
  > /tmp/r5/q_sarf100k.log 2>&1
echo "sarf100k exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_sarf_100k --name quality_sarf_100k || true
grep -a "novel_view_summary" /tmp/r5/q_sarf100k.log | head -c 300; echo

echo "=== B2: GaborF 48-view coverage fix (VERDICT #6) $(date +%H:%M:%S) ==="
# the r4 winning recipe (anneal 0.55-0.85, blur_decay 0.999) + 2x views
ANNEAL_START=0.55 ANNEAL_END=0.85 BLUR_DECAY=0.999 \
  Q_STEPS=40000 Q_VIEWS=48 \
  Q_SCENE=/tmp/netpu_scene_160_v48 Q_OUT=runs/quality_gabor_v48 \
  timeout 5400 python -u scripts/quality_actfam.py gabor \
  > /tmp/r5/q_gabor48.log 2>&1
echo "gabor48 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_gabor_v48 --name quality_gabor_v48 || true
grep -a "novel_view_summary" /tmp/r5/q_gabor48.log | head -c 300; echo

echo "=== B3: BARF 400^2 at 100 views (VERDICT #4a) $(date +%H:%M:%S) ==="
# equal-ray analog of the reference protocol: 60k x 4096 = 245M rays vs the
# reference's 200k x 1024 = 205M (`barf/run_barf.py:44-59`)
Q_SIZE=400 Q_STEPS=60000 Q_BATCH=4096 Q_FUSED=1 Q_PROPOSAL=64 \
  Q_VIEWS=100 Q_SCENE=/tmp/netpu_scene_400_v100 \
  Q_CAM_LR=1e-2 Q_CAM_EPS=1e-2 Q_OUT=runs/quality_barf_400_v100 \
  timeout 10000 python -u scripts/watchdog_run.py \
    --out-dir runs/quality_barf_400_v100 --stall-sec 420 -- \
    python -u scripts/quality_barf.py > /tmp/r5/q_barf400v100.log 2>&1
echo "barf400v100 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_barf_400_v100 --name quality_barf_400_v100 || true
grep -a "novel_view_summary" /tmp/r5/q_barf400v100.log | head -c 300; echo

echo "=== B4: mip_NeRF standalone at 800^2/100 views (VERDICT #4b) $(date +%H:%M:%S) ==="
Q_SIZE=800 Q_STEPS=40000 Q_BATCH=2048 Q_VIEWS=100 \
  Q_SCENE=/tmp/netpu_scene_800_v100 Q_OUT=runs/quality_mip_standalone_800 \
  timeout 10800 python -u scripts/watchdog_run.py \
    --out-dir runs/quality_mip_standalone_800 --stall-sec 420 -- \
    python -u scripts/quality_mip_standalone.py > /tmp/r5/q_mip800.log 2>&1
echo "mip800 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_standalone_800 --name quality_mip_standalone_800 || true
grep -a "novel_view_summary" /tmp/r5/q_mip800.log | head -c 300; echo

echo "=== queueB done $(date +%H:%M:%S) ==="
