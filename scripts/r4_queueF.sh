#!/bin/bash
# Round-4 queue F — final jobs after the in-flight render ($1 = pid).
# F0: any remaining ingp_fast render (bestval) if E2 was cut mid-loop.
# F1: mip_NeRF standalone CLEAN rerun (the D0 rerun converged but its
#     checkpoints collided with the broken run's orbax steps — saves were
#     silently skipped; fresh out_dir this time).
set -u
cd /root/repo
if [ "${1:-}" != "" ]; then
  echo "waiting for render pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi
echo "=== queueF start $(date +%H:%M:%S) ==="

if [ ! -d runs/quality_ingp3d_fast/novel_views_bestval ]; then
  echo "=== F0: ingp_fast bestval render $(date +%H:%M:%S) ==="
  timeout 1200 python -u -m nerf_experiments_tpu.experiments.render_views \
    --entry ingp --ckpt_step 5001 \
    --ckpt_dir "$(pwd)/runs/quality_ingp3d_fast/ckpt" \
    --scene_path /tmp/netpu_quality_scene_160_v100 --image_size 160 \
    --batch_size 1024 --samples_per_ray 64 --samples_per_ray_proposal 32 \
    --hidden_dim 64 --n_hidden 2 \
    --ingp_n_levels 4 --ingp_n_features 8 --ingp_table_size 16384 \
    --ingp_encoder matmul --ingp_weight_decay 1e-6 \
    --bf16 --split test \
    --out_dir runs/quality_ingp3d_fast/novel_views_bestval \
    > /tmp/q_ingpfast_render_bestval.log 2>&1
  echo "bestval exit=$? $(date +%H:%M:%S)"
  grep -a mean_psnr /tmp/q_ingpfast_render_bestval.log | head -c 200
fi
python scripts/persist_evidence.py runs/quality_ingp3d_fast --name quality_ingp3d_fast || true

echo "=== F1: mip_NeRF standalone CLEAN rerun $(date +%H:%M:%S) ==="
rm -rf runs/quality_mip_standalone2
Q_SIZE=256 Q_STEPS=30000 Q_OUT=runs/quality_mip_standalone2 \
  timeout 3600 python -u scripts/quality_mip_standalone.py > /tmp/q_mipstandalone3.log 2>&1
echo "mipstandalone3 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_standalone2 --name quality_mip_standalone || true
grep -a novel_view_summary /tmp/q_mipstandalone3.log | head -c 300

echo "=== queueF done $(date +%H:%M:%S) ==="
