"""Instant-NGP-style models: 2-D Gigapixel image fitter + 3-D hash-grid NeRF.

From `2d-ingp/model.py:118-176` (Gigapixel: hash encoding → small ReLU MLP →
sigmoid rgb) and `3d-ingp/model.py:151-193` (NerfModelINGP: hash pos encoding
→ density MLP (hidden+1 out, softplus(z-1)) + Fourier dir → color head).
The 3-D variant hardcodes position normalization x/8 + 0.5 into the unit cube
(`3d-ingp/model.py:117`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.encodings.fourier import Fourier
from nerf_experiments_tpu.models.common import linear_apply, linear_init, softplus8
from nerf_experiments_tpu.ops import hashgrid


def _encode(params, grid_cfg, x, compute_dtype, encoder: str):
    """Table-access path switch: 'fused' = flattened bf16 gather with
    scatter-add backward (hashgrid.encode_fused); 'matmul' = gather-free
    factorized one-hot MXU path (hashgrid.encode_matmul) — wins when the
    table is small enough that 2*R*T_eff*F FLOPs beat the per-row
    transaction pace of XLA's dynamic gather; 'rolled' = additive-hash
    pre-rolled table with ONE wide-row gather per point per level
    (hashgrid.encode_rolled) — the TPU-native fast path (RESULTS.md r5)."""
    if encoder == "matmul":
        return hashgrid.encode_matmul(params, grid_cfg, x,
                                      compute_dtype or jnp.float32)
    if encoder == "rolled":
        return hashgrid.encode_rolled(params, grid_cfg, x,
                                      compute_dtype or jnp.float32)
    return hashgrid.encode_fused(params, grid_cfg, x, compute_dtype)


@dataclasses.dataclass(frozen=True)
class GigapixelConfig:
    grid: hashgrid.HashGridConfig
    n_hidden: int = 2
    hidden_dim: int = 64
    compute_dtype: Any = None
    encoder: str = "fused"  # "fused" | "matmul" | "rolled"


def gigapixel_init(key: jax.Array, cfg: GigapixelConfig) -> Dict:
    kg, km = jax.random.split(key)
    grid_params = hashgrid.init(kg, cfg.grid)
    ks = jax.random.split(km, cfg.n_hidden + 1)
    in_dim = cfg.grid.output_dim
    if cfg.n_hidden == 0:
        layers = [linear_init(ks[0], in_dim, 3)]
    else:
        layers = [linear_init(ks[0], in_dim, cfg.hidden_dim)]
        for i in range(cfg.n_hidden - 1):
            layers.append(linear_init(ks[i + 1], cfg.hidden_dim, cfg.hidden_dim))
        layers.append(linear_init(ks[cfg.n_hidden], cfg.hidden_dim, 3))
    return {"grid": grid_params, "layers": layers}


def gigapixel_apply(params: Dict, cfg: GigapixelConfig, pos: jnp.ndarray) -> jnp.ndarray:
    """pos (B, 2) in [0,1]^2 -> rgb (B, 3)."""
    h = _encode(params["grid"], cfg.grid, pos, cfg.compute_dtype, cfg.encoder)
    for i, layer in enumerate(params["layers"]):
        h = linear_apply(layer, h, cfg.compute_dtype)
        if i < len(params["layers"]) - 1:
            h = jax.nn.relu(h)
    return jax.nn.sigmoid(h)


@dataclasses.dataclass(frozen=True)
class NerfINGPConfig:
    grid: hashgrid.HashGridConfig
    direction_encoder: Fourier = Fourier(levels=4, scale=1.0, space_dimensions=3)
    n_hidden: int = 2
    hidden_dim: int = 64
    pos_normalization_scale: float = 8.0  # x/8 + 0.5 (`3d-ingp/model.py:117`)
    compute_dtype: Any = None
    encoder: str = "fused"  # "fused" | "matmul" | "rolled"


def nerf_ingp_init(key: jax.Array, cfg: NerfINGPConfig) -> Dict:
    kg, kd, kc1, kc2 = jax.random.split(key, 4)
    grid_params = hashgrid.init(kg, cfg.grid)
    ks = jax.random.split(kd, cfg.n_hidden + 1)
    in_dim = cfg.grid.output_dim
    if cfg.n_hidden == 0:
        density = [linear_init(ks[0], in_dim, cfg.hidden_dim + 1)]
    else:
        density = [linear_init(ks[0], in_dim, cfg.hidden_dim)]
        for i in range(cfg.n_hidden - 1):
            density.append(linear_init(ks[i + 1], cfg.hidden_dim, cfg.hidden_dim))
        density.append(linear_init(ks[cfg.n_hidden], cfg.hidden_dim, cfg.hidden_dim + 1))
    color = [
        linear_init(kc1, cfg.hidden_dim + cfg.direction_encoder.output_dim, cfg.hidden_dim // 2),
        linear_init(kc2, cfg.hidden_dim // 2, 3),
    ]
    return {"grid": grid_params, "density": density, "color": color}


def nerf_ingp_apply(
    params: Dict, cfg: NerfINGPConfig, pos: jnp.ndarray, dir: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(density, rgb), matching `NerfModelINGP.forward:184-193`."""
    x = pos / cfg.pos_normalization_scale + 0.5
    h = _encode(params["grid"], cfg.grid, jnp.clip(x, 0.0, 1.0 - 1e-6),
                cfg.compute_dtype, cfg.encoder)
    for i, layer in enumerate(params["density"]):
        h = linear_apply(layer, h, cfg.compute_dtype)
        if i < len(params["density"]) - 1:
            h = jax.nn.relu(h)
    density = softplus8(h[:, cfg.hidden_dim] - 1.0)
    dir_enc = cfg.direction_encoder(dir)
    c = jnp.concatenate([h[:, : cfg.hidden_dim], dir_enc], axis=-1)
    c = jax.nn.relu(linear_apply(params["color"][0], c, cfg.compute_dtype))
    rgb = jax.nn.sigmoid(linear_apply(params["color"][1], c, cfg.compute_dtype))
    return density, rgb
