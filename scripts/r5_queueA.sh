#!/bin/bash
# Round-5 TPU queue A — highest-VERDICT-rank jobs first; the round clock
# cuts from the tail. $1 (optional) = pid to wait for (the LR-scaling arms).
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queueA start $(date +%H:%M:%S) ==="

echo "=== A1: rolled-encoder probe (VERDICT #1) $(date +%H:%M:%S) ==="
P_STEPS=20 timeout 2700 python -u scripts/probe_rolled.py \
  > /tmp/r5/probe_rolled.log 2>&1
echo "probe_rolled exit=$? $(date +%H:%M:%S)"
grep -a '^{' /tmp/r5/probe_rolled.log | tail -3

echo "=== A2: GARF blk4 bench probe (VERDICT #7) $(date +%H:%M:%S) ==="
timeout 1800 python -u - > /tmp/r5/garf_blk4.log 2>&1 <<'EOF'
import json
import jax.numpy as jnp
import bench
for blk in (1, 4):
    r = bench.bench_garf(4096, 20, jnp.bfloat16, fused=True, coarse_block=blk)
    print(json.dumps({f"garf_fused_blk{blk}": r}), flush=True)
EOF
echo "garf_blk4 exit=$? $(date +%H:%M:%S)"
grep -a '^{' /tmp/r5/garf_blk4.log

echo "=== A3: INGP rolled quality (fast-config protocol) $(date +%H:%M:%S) ==="
Q_SIZE=160 Q_STEPS=12000 Q_BATCH=4096 Q_LEVELS=4 Q_FEATURES=8 \
  Q_TABLE=16384 Q_ENCODER=rolled Q_SAMPLES=64 Q_COARSE=32 Q_VIEWS=100 \
  Q_WD=1e-6 Q_OUT=runs/quality_ingp3d_rolled \
  timeout 5400 python -u scripts/quality_ingp3d.py > /tmp/r5/q_ingp_rolled.log 2>&1
echo "ingp_rolled exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_ingp3d_rolled --name quality_ingp3d_rolled || true
grep -a "novel_view_summary" /tmp/r5/q_ingp_rolled.log | head -c 300; echo

echo "=== A4: Mip-BARF sharp-encoder recipe (VERDICT #3) $(date +%H:%M:%S) ==="
Q_SIZE=256 Q_STEPS=60000 Q_BATCH=4096 Q_PROPOSAL=64 Q_CAM_LR=1e-2 \
  Q_CAM_EPS=1e-2 Q_SIGMA_END_FRAC=0.25 Q_OUT=runs/quality_mip_sharp \
  timeout 9000 python -u scripts/quality_mip.py > /tmp/r5/q_mip_sharp.log 2>&1
echo "mip_sharp exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_sharp --name quality_mip_sharp || true
grep -a "novel_view_summary" /tmp/r5/q_mip_sharp.log | head -c 300; echo

echo "=== queueA done $(date +%H:%M:%S) ==="
