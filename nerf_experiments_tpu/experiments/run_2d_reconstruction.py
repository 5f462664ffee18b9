"""2-D image reconstruction: Fourier-feature MLP fits one image.

Parity with `2d-reconstruction/main.py` + `model.py`: Nerf2d (tanh MLP over
2-D Fourier features, sigmoid rgb), Adam + ReduceLROnPlateau(factor 0.5,
patience 20), seeded pixel shuffle with (0.9, 0.05, 0.05) split. The minimal
end-to-end slice of the framework (SURVEY.md §7.2 step 4).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_experiments_tpu.data import single_image
from nerf_experiments_tpu.models import nerf2d
from nerf_experiments_tpu.ops.metrics import psnr
from nerf_experiments_tpu.training.loggers import MetricLogger


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--image_path", type=str, default=None,
                   help="image to fit; default = procedural test image")
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--fourier_levels", type=int, default=10)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--lr_decay", type=float, default=0.5)
    p.add_argument("--lr_decay_patience", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=4096)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="runs/2d")
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

    cfg = nerf2d.Nerf2dConfig(
        fourier_levels=args.fourier_levels,
        hidden_dim=args.hidden_dim,
        learning_rate=args.learning_rate,
    )
    params = nerf2d.init(jax.random.PRNGKey(args.seed), cfg)
    tx = optax.chain(
        optax.adam(args.learning_rate),
        # plateau checks once per ~epoch of steps (accumulation), matching
        # the reference's per-epoch ReduceLROnPlateau — NOT per batch, which
        # collapses the LR within a few hundred steps
        optax.contrib.reduce_on_plateau(
            factor=args.lr_decay, patience=args.lr_decay_patience,
            accumulation_size=100,
        ),
    )
    opt_state = tx.init(params)

    coords = jnp.asarray(data.splits["train"][0])
    colors = jnp.asarray(data.splits["train"][1])
    val_coords = jnp.asarray(data.splits["val"][0])
    val_colors = jnp.asarray(data.splits["val"][1])

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (args.batch_size,), 0, coords.shape[0])
        x, y = coords[idx], colors[idx]

        def loss_fn(p):
            return jnp.mean((nerf2d.apply(p, cfg, x) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = tx.update(grads, opt_state, params, value=loss)
        return optax.apply_updates(params, updates), new_opt, loss

    @jax.jit
    def val_loss(params):
        return jnp.mean((nerf2d.apply(params, cfg, val_coords) - val_colors) ** 2)

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
        apply_fn = jax.jit(lambda c: nerf2d.apply(params, cfg, c))
        recon = single_image.reconstruct_image(apply_fn, data)
        single_image.save_png(os.path.join(args.out_dir, "recon.png"), recon)
        result["full_image_psnr"] = single_image.full_image_psnr(recon, data)
        with open(os.path.join(args.out_dir, "summary.json"), "w") as f:
            json.dump(result, f)
    print(json.dumps(result))
    return params, cfg, result


def main(argv=None):
    args = parse_args(argv)
    return train(args)


if __name__ == "__main__":
    main()
