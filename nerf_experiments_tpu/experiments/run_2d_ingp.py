"""2-D multiresolution hash-grid image fitting ("Gigapixel").

Parity with `2d-ingp/main.py` + `2d-ingp/model.py`: INGPEncoding (16 levels,
2 features, 2^16 tables, geometric resolutions) + small ReLU MLP + sigmoid,
Adam 1e-3 + ReduceLROnPlateau(0.5, patience 5), single-image pixel dataset.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import optax

from nerf_experiments_tpu.data import single_image
from nerf_experiments_tpu.models import ingp
from nerf_experiments_tpu.ops import hashgrid
from nerf_experiments_tpu.ops.metrics import psnr
from nerf_experiments_tpu.training.loggers import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_path", type=str, default=None)
    p.add_argument("--image_size", type=int, default=256)
    p.add_argument("--n_levels", type=int, default=16)
    p.add_argument("--n_features", type=int, default=2)
    p.add_argument("--table_size", type=int, default=2**16)
    p.add_argument("--resolution_min", type=int, default=16)
    p.add_argument("--resolution_max", type=int, default=2048)
    p.add_argument("--n_hidden", type=int, default=2)
    p.add_argument("--hidden_dim", type=int, default=64)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--encoder", choices=("fused", "matmul", "rolled"), default="fused")
    p.add_argument("--batch_size", type=int, default=8192)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/2d_ingp")
    p.add_argument("--save_image", action="store_true", default=False,
                   help="write recon.png (full-image reconstruction) + "
                        "full-image PSNR into out_dir")
    return p.parse_args(argv)


def train(args):
    if args.image_path:
        data = single_image.load_path(args.image_path, pixel_shuffle_seed=args.seed)
    else:
        img = single_image.procedural_test_image(args.image_size, args.seed)
        data = single_image.load(img, pixel_shuffle_seed=args.seed)

    grid = hashgrid.HashGridConfig(
        dim=2,
        resolution_min=args.resolution_min,
        resolution_max=args.resolution_max,
        table_size=args.table_size,
        n_features=args.n_features,
        n_levels=args.n_levels,
    )
    cfg = ingp.GigapixelConfig(grid=grid, n_hidden=args.n_hidden,
                               hidden_dim=args.hidden_dim, encoder=args.encoder)
    params = ingp.gigapixel_init(jax.random.PRNGKey(args.seed), cfg)
    # Instant-NGP-style Adam: betas (0.9, 0.99), eps 1e-15 (`3d-ingp/model.py:503-510`)
    tx = optax.chain(
        optax.adam(args.learning_rate, b1=0.9, b2=0.99, eps=1e-15),
        # plateau per ~epoch (accumulated), not per batch — see run_2d_reconstruction
        optax.contrib.reduce_on_plateau(factor=0.5, patience=5, accumulation_size=100),
    )
    opt_state = tx.init(params)

    coords = jnp.asarray(data.splits["train"][0])
    colors = jnp.asarray(data.splits["train"][1])
    val_coords = jnp.asarray(data.splits["val"][0])
    val_colors = jnp.asarray(data.splits["val"][1])

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (args.batch_size,), 0, coords.shape[0])

        def loss_fn(p):
            return jnp.mean((ingp.gigapixel_apply(p, cfg, coords[idx]) - colors[idx]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params, value=loss)
        return optax.apply_updates(params, updates), new_opt, loss

    @jax.jit
    def val_loss(params):
        return jnp.mean((ingp.gigapixel_apply(params, cfg, val_coords) - val_colors) ** 2)

    logger = MetricLogger(args.out_dir)
    key = jax.random.PRNGKey(args.seed + 1)
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if (i + 1) % 200 == 0:
            vl = float(val_loss(params))
            logger.log({"train_loss": float(loss), "val_loss": vl,
                        "val_psnr": float(psnr(jnp.asarray(vl)))}, i + 1)

    final = float(val_loss(params))
    result = {"val_loss": final, "val_psnr": float(psnr(jnp.asarray(final)))}
    if args.save_image:
        import os

        apply_fn = jax.jit(lambda c: ingp.gigapixel_apply(params, cfg, c))
        recon = single_image.reconstruct_image(apply_fn, data)
        single_image.save_png(os.path.join(args.out_dir, "recon.png"), recon)
        result["full_image_psnr"] = single_image.full_image_psnr(recon, data)
        with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
            json.dump(result, f)
    print(json.dumps(result))
    return params, cfg, result


def main(argv=None):
    return train(parse_args(argv))


if __name__ == "__main__":
    main()
