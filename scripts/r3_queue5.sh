#!/bin/bash
# Round-3 queue 5: runs after r3_queue4.sh exits. Salvages the 3-D INGP
# renders if queue3's job 2 hit its timeout mid-training (checkpoints are
# written every 4 epochs), quality-validates block-coarse TRAINING, and
# refreshes the bench.
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for queue4 pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

echo "=== queue5 start $(date +%H:%M:%S) ==="

if [ ! -f runs/quality_ingp3d/novel_views/*.json ] 2>/dev/null && \
   [ -d runs/quality_ingp3d/ckpt ]; then
  echo "=== job R1: 3-D INGP render salvage from last checkpoint ==="
  timeout 1800 python -u -m nerf_experiments_tpu.experiments.render_views \
    --entry ingp \
    --ckpt_dir "$(pwd)/runs/quality_ingp3d/ckpt" \
    --scene_path /tmp/netpu_quality_scene_160 --image_size 160 \
    --batch_size 1024 --samples_per_ray 64 --samples_per_ray_proposal 32 \
    --hidden_dim 64 --n_hidden 2 \
    --ingp_n_levels 4 --ingp_n_features 8 --ingp_table_size 65536 \
    --ingp_encoder fused --bf16 \
    --split test --out_dir runs/quality_ingp3d/novel_views \
    > /tmp/q_ingp_salvage.log 2>&1
  echo "ingp salvage exit=$? $(date +%H:%M:%S)"
  python scripts/persist_evidence.py runs/quality_ingp3d --name quality_ingp3d || true
  tail -3 /tmp/q_ingp_salvage.log
fi

echo "=== job R2: block-coarse TRAINING quality study ==="
S_BLOCKS=1,4,8 Q_SIZE=160 Q_STEPS=12000 \
  timeout 3600 python -u scripts/study_train_block.py > /tmp/q_trainblk.log 2>&1
echo "trainblk exit=$? $(date +%H:%M:%S)"
tail -8 /tmp/q_trainblk.log

echo "=== job R3: bench refresh ==="
timeout 3000 python -u bench.py > /tmp/q_bench2.log 2>&1
echo "bench exit=$? $(date +%H:%M:%S)"
tail -2 /tmp/q_bench2.log

echo "=== queue5 done $(date +%H:%M:%S) ==="
