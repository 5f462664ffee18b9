"""2D image-fitting MLP (the minimal end-to-end slice).

From `2d-reconstruction/model.py:6-102` (`Nerf2d`): Fourier features over
2-D pixel coords → 3×(Linear 256 + Tanh) → Linear 3 + Sigmoid, Adam +
ReduceLROnPlateau.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.encodings.fourier import Fourier
from nerf_experiments_tpu.models.common import linear_apply, linear_init


@dataclasses.dataclass(frozen=True)
class Nerf2dConfig:
    fourier_levels: int = 10
    hidden_dim: int = 256
    learning_rate: float = 1e-3
    compute_dtype: Any = None

    @property
    def encoder(self) -> Fourier:
        # reference uses scale = pi (2**j * pi), space dim 2
        return Fourier(levels=self.fourier_levels, scale=jnp.pi, space_dimensions=2)


def init(key: jax.Array, cfg: Nerf2dConfig) -> Dict:
    ks = jax.random.split(key, 4)
    in_dim = cfg.encoder.output_dim
    return {
        "layers": [
            linear_init(ks[0], in_dim, cfg.hidden_dim),
            linear_init(ks[1], cfg.hidden_dim, cfg.hidden_dim),
            linear_init(ks[2], cfg.hidden_dim, cfg.hidden_dim),
            linear_init(ks[3], cfg.hidden_dim, 3),
        ]
    }


def apply(params: Dict, cfg: Nerf2dConfig, x: jnp.ndarray) -> jnp.ndarray:
    h = cfg.encoder(x)
    for layer in params["layers"][:-1]:
        h = jnp.tanh(linear_apply(layer, h, cfg.compute_dtype))
    return jax.nn.sigmoid(linear_apply(params["layers"][-1], h, cfg.compute_dtype))
