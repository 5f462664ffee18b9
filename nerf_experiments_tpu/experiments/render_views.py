"""Render full views from a trained checkpoint + report test-split PSNR.

The serving/eval analogue of the reference's image-logger path (SURVEY.md
§3.4): loads an orbax checkpoint produced by run_barf / run_bip_barf /
run_vanilla_as_barf, re-renders whole images (train space through the
learned extrinsics, val/test space through the Kabsch gauge), writes PNGs,
and prints per-image + mean PSNR as one JSON line.

    python -m nerf_experiments_tpu.experiments.render_views \
        --ckpt_dir runs/latest/ckpt --scene_path synthetic --split test
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.cameras import calibration
from nerf_experiments_tpu.experiments import common, run_barf
from nerf_experiments_tpu.ops.metrics import psnr
from nerf_experiments_tpu.systems import barf as barf_sys
from nerf_experiments_tpu.training.checkpoints import CheckpointManager


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", type=str, required=True)
    p.add_argument("--ckpt_step", type=int, default=None)
    p.add_argument("--entry", choices=["barf", "mip", "bip", "ingp"],
                   default="barf",
                   help="which experiment entry built the checkpoint: "
                        "run_barf-family configs, run_mip_nerf (IPE cone "
                        "casting, near/far from its own defaults), "
                        "run_bip_barf (Mip-BARF: IPE + sigma schedule), or "
                        "run_3d_ingp (hash-grid NeRF)")
    # run_3d_ingp grid flags (used when --entry ingp rebuilds the model)
    p.add_argument("--ingp_n_levels", type=int, default=16)
    p.add_argument("--ingp_n_features", type=int, default=2)
    p.add_argument("--ingp_table_size", type=int, default=2**16)
    p.add_argument("--ingp_resolution_max", type=int, default=512)
    p.add_argument("--ingp_encoder", choices=("fused", "matmul", "rolled"),
                   default="fused")
    p.add_argument("--ingp_weight_decay", type=float, default=0.0,
                   help="must match training (the optimizer chain shape "
                        "is part of the checkpoint)")
    p.add_argument("--split", choices=["train", "val", "test"], default="test")
    p.add_argument("--serve_block", type=int, default=1,
                   help="serving-only block-coarse render: each group of N "
                        "raster-consecutive rays shares its first ray's "
                        "coarse PDF (systems.barf.render_block_coarse); "
                        "1 = standard path")
    p.add_argument("--n_images", type=int, default=None, help="limit rendered views")
    p.add_argument("--chunk", type=int, default=2048)
    # run_barf config flags needed to rebuild the same model
    run_barf_args = [
        "--camera_origin_noise_sigma", "--camera_rotation_noise_sigma",
        "--start_blur_sigma", "--n_blur_sigmas", "--samples_per_ray",
        "--samples_per_ray_proposal", "--hidden_dim", "--n_hidden",
        "--n_segments", "--fourier_levels_pos", "--fourier_levels_dir",
        "--proposal_hidden_dim", "--proposal_n_hidden",
        "--occ_grid_resolution", "--occ_grid_coarse",
        "--occ_grid_update_every", "--occ_grid_aabb_half",
    ]
    defaults = run_barf.parse_args([])
    for flag in run_barf_args:
        name = flag.lstrip("-")
        p.add_argument(flag, type=type(getattr(defaults, name)),
                       default=getattr(defaults, name))
    common.add_common_args(p)
    return p.parse_args(argv)


def _build_mip(args):
    from nerf_experiments_tpu.experiments import run_mip_nerf

    mip_args = run_mip_nerf.parse_args([
        "--scene_path", args.scene_path, "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--samples_per_ray", str(args.samples_per_ray),
        "--samples_per_ray_proposal", str(args.samples_per_ray_proposal),
        "--hidden_dim", str(args.hidden_dim), "--n_hidden", str(args.n_hidden),
        "--n_segments", str(args.n_segments),
        "--checkpoint_every_n_epochs", "0",
        "--seed", str(args.seed), "--out_dir", args.out_dir,
    ] + (["--bf16"] if args.bf16 else []))
    return run_mip_nerf.build(mip_args)


def _build_bip(args):
    from nerf_experiments_tpu.experiments import run_bip_barf

    bip_args = run_bip_barf.parse_args([
        "--scene_path", args.scene_path, "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--camera_origin_noise_sigma", str(args.camera_origin_noise_sigma),
        "--camera_rotation_noise_sigma", str(args.camera_rotation_noise_sigma),
        "--samples_per_ray", str(args.samples_per_ray),
        "--samples_per_ray_proposal", str(args.samples_per_ray_proposal),
        "--hidden_dim", str(args.hidden_dim), "--n_hidden", str(args.n_hidden),
        "--start_blur_sigma", str(args.start_blur_sigma),
        "--max_blur_sigma", str(args.start_blur_sigma),
        "--checkpoint_every_n_epochs", "0",
        "--seed", str(args.seed), "--out_dir", args.out_dir,
    ] + (["--bf16"] if args.bf16 else []))
    return run_bip_barf.build(bip_args)


def _build_ingp(args):
    from nerf_experiments_tpu.experiments import run_3d_ingp

    ingp_args = run_3d_ingp.parse_args([
        "--scene_path", args.scene_path, "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--samples_per_ray_fine", str(args.samples_per_ray),
        "--samples_per_ray_coarse", str(args.samples_per_ray_proposal),
        "--n_levels", str(args.ingp_n_levels),
        "--n_features", str(args.ingp_n_features),
        "--table_size", str(args.ingp_table_size),
        "--resolution_max", str(args.ingp_resolution_max),
        "--weight_decay", str(args.ingp_weight_decay),
        "--encoder", args.ingp_encoder,
        "--hidden_dim", str(args.hidden_dim), "--n_hidden", str(args.n_hidden),
        "--checkpoint_every_n_epochs", "0",
        "--seed", str(args.seed), "--out_dir", args.out_dir,
    ] + (["--bf16"] if args.bf16 else []))
    return run_3d_ingp.build(ingp_args)


def main(argv=None):
    args = parse_args(argv)
    if args.entry == "mip":
        return _render(args, _build_mip(args))
    if args.entry == "bip":
        return _render(args, _build_bip(args))
    if args.entry == "ingp":
        return _render(args, _build_ingp(args))
    # rebuild the experiment config (weights come from the checkpoint)
    barf_args = run_barf.parse_args([
        "--scene_path", args.scene_path, "--image_size", str(args.image_size),
        "--batch_size", str(args.batch_size),
        "--camera_origin_noise_sigma", str(args.camera_origin_noise_sigma),
        "--camera_rotation_noise_sigma", str(args.camera_rotation_noise_sigma),
        "--samples_per_ray", str(args.samples_per_ray),
        "--samples_per_ray_proposal", str(args.samples_per_ray_proposal),
        "--hidden_dim", str(args.hidden_dim), "--n_hidden", str(args.n_hidden),
        "--n_segments", str(args.n_segments),
        "--proposal_hidden_dim", str(args.proposal_hidden_dim),
        "--proposal_n_hidden", str(args.proposal_n_hidden),
        "--occ_grid_resolution", str(args.occ_grid_resolution),
        "--occ_grid_coarse", str(args.occ_grid_coarse),
        "--occ_grid_update_every", str(args.occ_grid_update_every),
        "--occ_grid_aabb_half", str(args.occ_grid_aabb_half),
        "--checkpoint_every_n_epochs", "0",
        "--seed", str(args.seed), "--out_dir", args.out_dir,
    ] + (["--bf16"] if args.bf16 else []))
    return _render(args, run_barf.build(barf_args))


def _render(args, exp):
    mgr = CheckpointManager(args.ckpt_dir)
    state = mgr.restore(exp.state, step=args.ckpt_step)

    dm = exp.dm
    if args.split == "test":
        dm.setup("test")
    dataset = {"train": dm.dataset_train, "val": dm.dataset_val,
               "test": dm.dataset_test}[args.split]
    assert dataset is not None, f"split {args.split} not available"

    raw = jnp.asarray(dm.dataset_train.camera_origins)
    noisy = jnp.asarray(dm.dataset_train.camera_origins_noisy)

    # gauge depends only on params — computed ONCE outside the render jit
    # (also avoids a libtpu regalloc RET_CHECK when SVD + the renderer share
    # one program)
    gauge = jax.jit(lambda p: barf_sys.val_gauge(p, raw, noisy))(state.params)
    gauge = tuple(jax.device_put(g) for g in gauge)

    fused_render = barf_sys.use_fused_render(exp.cfg)

    @jax.jit
    def render_chunk(params, gauge, origs, dirs, pw):
        o, d = calibration.validation_transform_rays(origs, dirs, gauge)
        enc = exp.cfg.radiance.position_encoder if hasattr(exp.cfg.radiance, "position_encoder") else None
        a_pos = jnp.asarray(float(getattr(enc, "levels", 0)))
        if args.serve_block > 1:
            # chunks arrive in raster order, the contract render_block_coarse
            # needs; the dataset's real pixel_width is threaded so mip/IPE
            # checkpoints keep their cone footprint under block serving
            rgb = barf_sys.render_block_coarse(
                params, exp.cfg, o, d, a_pos, jnp.asarray(4.0),
                block=args.serve_block,
                pixel_width=float(dataset.pixel_width))
        else:
            rgb, _ = barf_sys.forward(
                params, exp.cfg, None, o, d, pw, a_pos, jnp.asarray(4.0),
                stratified=False, fused=fused_render,
            )
        return jnp.clip(rgb, 0.0, 1.0)

    h, w = dataset.image_height, dataset.image_width
    hw = h * w
    results = []
    os.makedirs(os.path.join(args.out_dir, "renders"), exist_ok=True)
    n_images = min(args.n_images or dataset.n_images, dataset.n_images)
    for i in range(n_images):
        origs = dataset.ray_origins[i]
        dirs = dataset.ray_directions[i]
        out = np.empty((hw, 3), np.float32)
        for lo in range(0, hw, args.chunk):
            hi = min(lo + args.chunk, hw)
            n = hi - lo
            pad = (-n) % args.serve_block  # block-coarse needs n % block == 0
            o_c = np.concatenate([origs[lo:hi], origs[hi - pad:hi]]) if pad else origs[lo:hi]
            d_c = np.concatenate([dirs[lo:hi], dirs[hi - pad:hi]]) if pad else dirs[lo:hi]
            out[lo:hi] = np.asarray(render_chunk(
                state.params, gauge, jnp.asarray(o_c), jnp.asarray(d_c),
                jnp.full((n + pad, 1), dataset.pixel_width),
            ))[:n]
        target = dataset.images[i, :, :, -1, :].reshape(hw, 3)
        m = float(np.mean((out - target) ** 2))
        img_psnr = float(psnr(jnp.asarray(m)))
        name = dataset.image_index_to_name[i]
        results.append({"image": name, "psnr": img_psnr})
        try:
            from PIL import Image

            Image.fromarray((out.reshape(h, w, 3) * 255).astype(np.uint8)).save(
                os.path.join(args.out_dir, "renders", f"{args.split}_{name}.png")
            )
        except ImportError:
            pass

    mean_psnr = float(np.mean([r["psnr"] for r in results]))
    summary = {"split": args.split, "mean_psnr": mean_psnr, "per_image": results,
               "ckpt_step": mgr.latest_step() if args.ckpt_step is None else args.ckpt_step,
               "serve_block": args.serve_block}
    print(json.dumps(summary))
    # committable artifact: persist_evidence collects *summary.json files
    # from the run dir, so the novel-view PSNR travels with the evidence
    with open(os.path.join(args.out_dir, "render_summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


if __name__ == "__main__":
    main()
