#!/bin/bash
# Round-4 TPU queue D — after r4_queueC.sh ($1 = pid).
# D0: mip_NeRF standalone RERUN with the density-scale parity fix
#     (MAGIC_NUMBER=7 -> scale 21, `mip_NeRF/model_interpolation.py:8,216`;
#     the first C3 attempt ran before the fix and stayed at ~10 dB).
# D1: SARF 100k freeze recipe (will be cut by round end; partial metrics
#     are committed by the end-of-round snapshot).
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queueC pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
echo "=== queueD start $(date +%H:%M:%S) ==="

if [ -d runs/quality_mip_200k/ckpt ] && [ ! -d runs/quality_mip_200k/novel_views ]; then
  echo "=== Dpre0: mip-200k render salvage (C1 cut before renders) $(date +%H:%M:%S) ==="
  timeout 1500 python -u -m nerf_experiments_tpu.experiments.render_views \
    --entry bip \
    --ckpt_dir "$(pwd)/runs/quality_mip_200k/ckpt" \
    --scene_path /tmp/netpu_quality_scene_256 --image_size 256 \
    --batch_size 4096 \
    --camera_origin_noise_sigma 0.15 --camera_rotation_noise_sigma 0.15 \
    --start_blur_sigma 128 \
    --bf16 --split test --out_dir runs/quality_mip_200k/novel_views \
    > /tmp/q_mip200k_salvage.log 2>&1
  echo "mip200k salvage exit=$? $(date +%H:%M:%S)"
  python scripts/persist_evidence.py runs/quality_mip_200k --name quality_mip_200k || true
  grep -a mean_psnr /tmp/q_mip200k_salvage.log | head -c 200
fi

echo "=== Dpre: Pallas hash hybrid e2e compile+bench check $(date +%H:%M:%S) ==="
timeout 1200 python -u -c "
import os, jax.numpy as jnp, bench
os.environ['NETPU_PALLAS_HASH']='1'
r = bench.bench_ingp(4096, 10, jnp.bfloat16, samples=64, n_levels=4,
                     n_features=8, table_size=8192, encoder='matmul')
print('hybrid e2e:', r)
" > /tmp/q_hybride2e.log 2>&1
echo "hybride2e exit=$? $(date +%H:%M:%S)"
grep -a "hybrid e2e" /tmp/q_hybride2e.log | head -c 300

echo "=== D0: mip_NeRF standalone (density-scale fix) $(date +%H:%M:%S) ==="
Q_SIZE=256 Q_STEPS=30000 Q_OUT=runs/quality_mip_standalone \
  timeout 3300 python -u scripts/quality_mip_standalone.py > /tmp/q_mipstandalone2.log 2>&1
echo "mipstandalone2 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_standalone --name quality_mip_standalone || true
tail -5 /tmp/q_mipstandalone2.log

echo "=== D1: SARF 100k freeze recipe $(date +%H:%M:%S) ==="
FREEZE_DURING_ANNEAL=1 ANNEAL_START=0.80 ANNEAL_END=0.97 \
  Q_STEPS=100000 Q_OUT=runs/quality_sarf_100k \
  timeout 9000 python -u scripts/quality_actfam.py sarf > /tmp/q_sarf100k.log 2>&1
echo "sarf100k exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_sarf_100k --name quality_sarf_100k || true
tail -5 /tmp/q_sarf100k.log

echo "=== queueD done $(date +%H:%M:%S) ==="
