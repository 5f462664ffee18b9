#!/bin/bash
# Round-4 TPU queue C (final order) — after r4_queueB.sh ($1 = pid).
# Essentials first; droppable probes last (the round clock cuts from the
# tail). The driver's own post-round bench run records BENCH_r04, so no
# in-queue bench refresh is needed.
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queueB pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queueC start $(date +%H:%M:%S) ==="

echo "=== Cpre: GaborF checkpoint render (B1 render phase was timeout-cut) $(date +%H:%M:%S) ==="
Q_OUT=runs/quality_gabor_joint Q_ACTIVATION=gabor \
  timeout 1200 python -u scripts/render_garf_ckpt.py > /tmp/q_gabor_render.log 2>&1
echo "gabor_render exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_gabor_joint --name quality_gabor_r4 || true
grep -a novel_view_summary /tmp/q_gabor_render.log | head -c 300

echo "=== C3: mip_NeRF standalone quality run (256^2) $(date +%H:%M:%S) ==="
Q_SIZE=256 Q_STEPS=30000 \
  timeout 3600 python -u scripts/quality_mip_standalone.py > /tmp/q_mipstandalone.log 2>&1
echo "mipstandalone exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_standalone --name quality_mip_standalone || true
tail -5 /tmp/q_mipstandalone.log

echo "=== C1: Mip-BARF 200k (reference schedule length) $(date +%H:%M:%S) ==="
Q_SIZE=256 Q_STEPS=200000 Q_BATCH=4096 Q_CAM_LR=1e-2 Q_CAM_EPS=1e-2 \
  Q_SIGMA_END_FRAC=0.3 Q_OUT=runs/quality_mip_200k \
  timeout 10800 python -u scripts/quality_mip.py > /tmp/q_mip200k.log 2>&1
echo "mip200k exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_200k --name quality_mip_200k || true
tail -5 /tmp/q_mip200k.log

echo "=== C2: 400^2 BARF capstone rerun $(date +%H:%M:%S) ==="
Q_SIZE=400 Q_STEPS=60000 Q_BATCH=4096 Q_FUSED=1 Q_PROPOSAL=64 \
  Q_CAM_LR=1e-2 Q_CAM_EPS=1e-2 Q_OUT=runs/quality_barf_400 \
  timeout 5400 python -u scripts/quality_barf.py > /tmp/q_barf400.log 2>&1
echo "barf400 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_barf_400 --name quality_barf_400 || true
tail -5 /tmp/q_barf400.log

echo "=== C0: train-step batch-size probe $(date +%H:%M:%S) ==="
P_STEPS=20 timeout 2400 python -u scripts/probe_train_batch.py > /tmp/q_trainbatch.log 2>&1
echo "trainbatch exit=$? $(date +%H:%M:%S)"
grep -v WARNING /tmp/q_trainbatch.log | tail -14

echo "=== C0b: INGP fast-config quality (matmul T=16384 + wd) $(date +%H:%M:%S) ==="
Q_SIZE=160 Q_STEPS=12000 Q_BATCH=4096 Q_LEVELS=4 Q_FEATURES=8 \
  Q_TABLE=16384 Q_ENCODER=matmul Q_SAMPLES=64 Q_COARSE=32 Q_VIEWS=100 \
  Q_WD=1e-6 \
  Q_OUT=runs/quality_ingp3d_fast \
  timeout 4800 python -u scripts/quality_ingp3d.py > /tmp/q_ingpfast.log 2>&1
echo "ingpfast exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_ingp3d_fast --name quality_ingp3d_fast || true
tail -5 /tmp/q_ingpfast.log

echo "=== queueC done $(date +%H:%M:%S) ==="
