"""SIREN NeRF: omega-scaled sine layers with residual color head.

From `nerf-siren/nerf_model.py:7-74` and `nerf-siren/linear_sine.py:8-45`:
density trunk 3→256 (ω=input_scale on the raw input)→256→256→256, skip
re-inject pos, →256→256→256→(256+3+1) linear; density =
softplus(z[256+3] − 1); rgb = sigmoid(rgb_base + residual color head).
Per-feature ω vectors (1 for hidden features, input_scale for the re-injected
raw position) are reproduced exactly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.models.common import linear_apply, linear_init, softplus8

HIDDEN = 256


@dataclasses.dataclass(frozen=True)
class SirenConfig:
    input_scale: float = 30.0
    compute_dtype: Any = None


def _sine_layer_init(key, in_features, out_features, scale, first_layer):
    """SIREN init (`linear_sine.py:31-40`): first layer U(-1,1)/in, else
    U(-1,1)·sqrt(6/in)/ω (per-input-feature ω). The ω scale vector is NOT a
    parameter — it is a static buffer derived from the config (storing it in
    the pytree would both double-donate shared buffers and let the optimizer
    "train" a constant)."""
    kw, kb = jax.random.split(key)
    w = jax.random.uniform(kw, (in_features, out_features), minval=-1.0, maxval=1.0)
    if first_layer:
        w = w / in_features
    else:
        w = w * (jnp.sqrt(6.0 / in_features) / scale)[:, None]
    bound = 1.0 / jnp.sqrt(in_features)
    b = jax.random.uniform(kb, (out_features,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def _sine_apply(layer, scale, x, compute_dtype):
    return jnp.sin(linear_apply(layer, x * scale, compute_dtype))


def _scales(cfg: "SirenConfig"):
    """Per-layer static ω vectors (`nerf-siren/nerf_model.py:14-53`)."""
    s = cfg.input_scale
    ones_h = jnp.ones(HIDDEN)
    skip = jnp.concatenate([ones_h, jnp.ones(3) * s])
    return {
        "density1": [jnp.ones(3) * s, ones_h, ones_h, ones_h],
        "density2": [skip, ones_h, ones_h],
        "color_sine": skip,
    }


def init(key: jax.Array, cfg: SirenConfig) -> Dict:
    ks = jax.random.split(key, 10)
    s = cfg.input_scale
    ones_h = jnp.ones(HIDDEN)
    skip_scale = jnp.concatenate([ones_h, jnp.ones(3) * s])
    return {
        "density1": [
            _sine_layer_init(ks[0], 3, HIDDEN, jnp.ones(3) * s, first_layer=True),
            _sine_layer_init(ks[1], HIDDEN, HIDDEN, ones_h, False),
            _sine_layer_init(ks[2], HIDDEN, HIDDEN, ones_h, False),
            _sine_layer_init(ks[3], HIDDEN, HIDDEN, ones_h, False),
        ],
        "density2": [
            _sine_layer_init(ks[4], HIDDEN + 3, HIDDEN, skip_scale, False),
            _sine_layer_init(ks[5], HIDDEN, HIDDEN, ones_h, False),
            _sine_layer_init(ks[6], HIDDEN, HIDDEN, ones_h, False),
        ],
        "density2_out": linear_init(ks[7], HIDDEN, HIDDEN + 3 + 1),
        "color_sine": _sine_layer_init(ks[8], HIDDEN + 3, HIDDEN, skip_scale, False),
        "color_out": linear_init(ks[9], HIDDEN, 3),
    }


def apply(
    params: Dict, cfg: SirenConfig, pos: jnp.ndarray, dir: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(density, rgb) — matches `nerf_model.py:58-74`."""
    scales = _scales(cfg)
    z = pos
    for layer, sc in zip(params["density1"], scales["density1"]):
        z = _sine_apply(layer, sc, z, cfg.compute_dtype)
    z = jnp.concatenate([z, pos.astype(z.dtype)], axis=-1)
    for layer, sc in zip(params["density2"], scales["density2"]):
        z = _sine_apply(layer, sc, z, cfg.compute_dtype)
    z = linear_apply(params["density2_out"], z, cfg.compute_dtype)

    density = softplus8(z[:, HIDDEN + 3].astype(jnp.float32) - 1.0)
    rgb_latent = z[:, :HIDDEN]
    rgb_base = z[:, HIDDEN : HIDDEN + 3]
    h = _sine_apply(params["color_sine"], scales["color_sine"],
                    jnp.concatenate([rgb_latent, dir.astype(z.dtype)], axis=-1),
                    cfg.compute_dtype)
    rgb_res = linear_apply(params["color_out"], h, cfg.compute_dtype)
    rgb = jax.nn.sigmoid((rgb_base + rgb_res).astype(jnp.float32))
    return density, rgb
