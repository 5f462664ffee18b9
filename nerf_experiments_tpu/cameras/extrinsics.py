"""Learnable per-train-image camera extrinsics (so3 rotation + translation).

Semantics from `barf/model_camera_extrinsics.py:7-85` (`CameraExtrinsics`):
one so3 vector and one translation per training image, initialized to zero;
`forward(i, o, d)` translates ray origins by t[i] and rotates ray directions
by exp(hat(so3[i])). The translation is divided by
MAGIC_NUMBER_THE_SECOND (=1, `barf/magic.py:2`).

Pure-pytree version: params = {"rotation": (N,3), "translation": (N,3)};
application is a gather + batched rotation — fully vectorized, no per-image
Python loop, jit/shard_map-safe.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.ops.lie import so3_exp
from nerf_experiments_tpu.utils.magic import MAGIC_NUMBER_THE_SECOND


def init(n_train_images: int, dtype=jnp.float32) -> Dict:
    return {
        "rotation": jnp.zeros((n_train_images, 3), dtype),
        "translation": jnp.zeros((n_train_images, 3), dtype),
    }


def rotations(params: Dict, img_idx: jnp.ndarray) -> jnp.ndarray:
    """SO(3) matrices for the given image indices: (B,) -> (B, 3, 3)."""
    return so3_exp(params["rotation"])[img_idx]


def forward_origins(
    params: Dict, img_idx: jnp.ndarray, origins: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Translate origins into the predicted camera space (`:61-74`)."""
    t = params["translation"][img_idx] / MAGIC_NUMBER_THE_SECOND
    return origins + t, t


def forward(
    params: Dict, img_idx: jnp.ndarray, origins: jnp.ndarray, directions: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(new_origins, new_directions, R, t) — parity with `forward:77-85`."""
    new_o, t = forward_origins(params, img_idx, origins)
    R = rotations(params, img_idx)
    new_d = jnp.einsum("bij,bj->bi", R, directions)
    return new_o, new_d, R, t
