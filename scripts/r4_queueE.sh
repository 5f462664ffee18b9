#!/bin/bash
# Round-4 TPU queue E — final corrections, after the D0 python ($1 = pid).
# E1: corrected mip-200k novel-view render (canonical quality_mip flags:
#     samples 126, fp32, batch 1024 — the salvage used bf16/128/4096 and
#     read 25.4 dB; re-measure before recording).
# E2: INGP fast-config renders (final + best-val) with the weight-decay
#     restore fix.
# E3: SARF 100k with whatever time remains.
set -u
cd /root/repo

if [ "${1:-}" != "" ]; then
  echo "waiting for D0 pid $1 to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
echo "=== queueE start $(date +%H:%M:%S) ==="

echo "=== E1: corrected mip-200k render $(date +%H:%M:%S) ==="
timeout 1500 python -u -m nerf_experiments_tpu.experiments.render_views \
  --entry bip \
  --ckpt_dir "$(pwd)/runs/quality_mip_200k/ckpt" \
  --scene_path /tmp/netpu_quality_scene_256 --image_size 256 \
  --batch_size 1024 --samples_per_ray 126 \
  --start_blur_sigma 128 \
  --camera_origin_noise_sigma 0.15 --camera_rotation_noise_sigma 0.15 \
  --split test --out_dir runs/quality_mip_200k/novel_views_canonical \
  > /tmp/q_mip200k_render2.log 2>&1
echo "mip200k render2 exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_mip_200k --name quality_mip_200k || true
grep -a mean_psnr /tmp/q_mip200k_render2.log | head -c 200

echo "=== E2: INGP fast-config renders (wd restore fix) $(date +%H:%M:%S) ==="
for tag_step in "final:" "bestval:5001"; do
  tag="${tag_step%%:*}"; step="${tag_step##*:}"
  extra=""
  if [ -n "$step" ]; then extra="--ckpt_step $step"; fi
  timeout 1200 python -u -m nerf_experiments_tpu.experiments.render_views \
    --entry ingp $extra \
    --ckpt_dir "$(pwd)/runs/quality_ingp3d_fast/ckpt" \
    --scene_path /tmp/netpu_quality_scene_160_v100 --image_size 160 \
    --batch_size 1024 --samples_per_ray 64 --samples_per_ray_proposal 32 \
    --hidden_dim 64 --n_hidden 2 \
    --ingp_n_levels 4 --ingp_n_features 8 --ingp_table_size 16384 \
    --ingp_encoder matmul --ingp_weight_decay 1e-6 \
    --bf16 --split test \
    --out_dir "runs/quality_ingp3d_fast/novel_views_$tag" \
    > "/tmp/q_ingpfast_render_$tag.log" 2>&1
  echo "ingpfast render $tag exit=$? $(date +%H:%M:%S)"
  grep -a mean_psnr "/tmp/q_ingpfast_render_$tag.log" | head -c 200
done
python scripts/persist_evidence.py runs/quality_ingp3d_fast --name quality_ingp3d_fast || true

echo "=== E3: SARF 100k freeze recipe $(date +%H:%M:%S) ==="
FREEZE_DURING_ANNEAL=1 ANNEAL_START=0.80 ANNEAL_END=0.97 \
  Q_STEPS=100000 Q_OUT=runs/quality_sarf_100k \
  timeout 9000 python -u scripts/quality_actfam.py sarf > /tmp/q_sarf100k.log 2>&1
echo "sarf100k exit=$? $(date +%H:%M:%S)"
python scripts/persist_evidence.py runs/quality_sarf_100k --name quality_sarf_100k || true
tail -5 /tmp/q_sarf100k.log

echo "=== queueE done $(date +%H:%M:%S) ==="
