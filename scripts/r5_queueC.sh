#!/bin/bash
# Round-5 TPU queue C — reordered tail after B1 (SARF 100k): the conv-blur
# families run ~61-96 ms/step, so the original B2-B4 order would have cut
# the VERDICT-#4 capstones. Priority here: SARF render recovery (if B1's
# render was timeout-cut) -> BARF 400^2 @100 views -> mip 800^2 -> GaborF.
set -u
cd /root/repo

echo "=== queueC start $(date +%H:%M:%S) ==="

if [ ! -f runs/quality_sarf_100k/novel_views.json ]; then
  echo "=== C0: SARF render recovery (B1 render was cut) $(date +%H:%M:%S) ==="
  Q_OUT=runs/quality_sarf_100k Q_ACTIVATION=sarf \
    timeout 1500 python -u scripts/render_garf_ckpt.py > /tmp/r5/sarf_render.log 2>&1
  echo "sarf_render exit=$? $(date +%H:%M:%S)"
  grep -a "novel_view_summary" /tmp/r5/sarf_render.log | head -c 300; echo
fi
python scripts/persist_evidence.py runs/quality_sarf_100k --name quality_sarf_100k || true

echo "=== C1: BARF 400^2 at 100 views (VERDICT #4a) $(date +%H:%M:%S) ==="
Q_SIZE=400 Q_STEPS=60000 Q_BATCH=4096 Q_FUSED=1 Q_PROPOSAL=64 \
  Q_VIEWS=100 Q_SCENE=/tmp/netpu_scene_400_v100 \
  Q_CAM_LR=1e-2 Q_CAM_EPS=1e-2 Q_CKPT_EPOCHS=2 Q_OUT=runs/quality_barf_400_v100 \
  timeout 6000 python -u scripts/watchdog_run.py \
    --out-dir runs/quality_barf_400_v100 --stall-sec 420 -- \
    python -u scripts/quality_barf.py > /tmp/r5/q_barf400v100.log 2>&1
echo "barf400v100 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_barf_400_v100 --name quality_barf_400_v100 || true
grep -a "novel_view_summary" /tmp/r5/q_barf400v100.log | head -c 300; echo

echo "=== C2: mip_NeRF standalone at 800^2/100 views (VERDICT #4b) $(date +%H:%M:%S) ==="
Q_SIZE=800 Q_STEPS=40000 Q_BATCH=2048 Q_VIEWS=100 \
  Q_SCENE=/tmp/netpu_scene_800_v100 Q_OUT=runs/quality_mip_standalone_800 \
  timeout 5400 python -u scripts/watchdog_run.py \
    --out-dir runs/quality_mip_standalone_800 --stall-sec 420 -- \
    python -u scripts/quality_mip_standalone.py > /tmp/r5/q_mip800.log 2>&1
echo "mip800 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_standalone_800 --name quality_mip_standalone_800 || true
grep -a "novel_view_summary" /tmp/r5/q_mip800.log | head -c 300; echo

echo "=== C3: GaborF 48-view coverage fix (VERDICT #6) $(date +%H:%M:%S) ==="
ANNEAL_START=0.55 ANNEAL_END=0.85 BLUR_DECAY=0.999 \
  Q_STEPS=40000 Q_VIEWS=48 \
  Q_SCENE=/tmp/netpu_scene_160_v48 Q_OUT=runs/quality_gabor_v48 \
  timeout 5400 python -u scripts/quality_actfam.py gabor \
  > /tmp/r5/q_gabor48.log 2>&1
echo "gabor48 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_gabor_v48 --name quality_gabor_v48 || true
grep -a "novel_view_summary" /tmp/r5/q_gabor48.log | head -c 300; echo

echo "=== queueC done $(date +%H:%M:%S) ==="
