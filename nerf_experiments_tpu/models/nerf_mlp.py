"""Segmented NeRF MLP ("interpolation between naive and vanilla NeRF").

Architecture semantics from `barf/model_interpolation_architecture.py:33-168`
(`NerfModel`): `n_segments` MLP segments, the encoded position re-injected at
the start of every segment; `delayed_direction` feeds the encoded direction
only to the color head; `delayed_density` reads density from the color head
instead of the last segment; softplus(threshold=8) density; sigmoid rgb;
color head is hidden_dim -> hidden_dim//2 -> 3(+1).

TPU notes: all layers are (in, out) matmuls evaluated over the flattened
(n_rays * samples_per_ray) batch — a single large MXU-friendly GEMM chain.
The encoding annealing coefficient `alpha` (and mip `pixel_width_sigma`) are
explicit traced arguments instead of module state.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.encodings.fourier import Encoding
from nerf_experiments_tpu.models.common import (
    ParamGroup,
    linear_apply,
    linear_init,
    softplus8,
)


@dataclasses.dataclass(frozen=True)
class NerfMLPConfig:
    position_encoder: Encoding
    direction_encoder: Encoding
    n_hidden: int = 4
    hidden_dim: int = 256
    delayed_direction: bool = True
    delayed_density: bool = False
    n_segments: int = 2
    learning_rate_start: float = 5e-4
    learning_rate_stop: float = 5e-5
    learning_rate_decay_end: int = 0
    compute_dtype: Any = None  # e.g. jnp.bfloat16 for MXU speed

    @property
    def param_group(self) -> ParamGroup:
        return ParamGroup(
            self.learning_rate_start,
            self.learning_rate_stop,
            self.learning_rate_decay_end,
        )


def _segment_dims(cfg: NerfMLPConfig, segment_idx: int) -> Tuple[int, int]:
    pos_dim = cfg.position_encoder.output_dim
    dir_dim = cfg.direction_encoder.output_dim
    in_dim = (
        pos_dim
        + (0 if cfg.delayed_direction else dir_dim)
        + (cfg.hidden_dim if segment_idx > 0 else 0)
    )
    out_dim = cfg.hidden_dim + (
        0 if cfg.delayed_density else int(segment_idx == cfg.n_segments - 1)
    )
    return in_dim, out_dim


def init(key: jax.Array, cfg: NerfMLPConfig) -> Dict:
    """Build parameters: segments (each an n_hidden-deep ReLU FFNN) + color head."""
    if cfg.n_segments == 0:
        raise NotImplementedError("n_segments must be greater than 0")
    keys = jax.random.split(key, cfg.n_segments + 2)
    segments = []
    for i in range(cfg.n_segments):
        in_dim, out_dim = _segment_dims(cfg, i)
        layer_keys = jax.random.split(keys[i], max(cfg.n_hidden + 1, 1))
        layers = []
        if cfg.n_hidden == 0:
            layers.append(linear_init(layer_keys[0], in_dim, out_dim))
        else:
            layers.append(linear_init(layer_keys[0], in_dim, cfg.hidden_dim))
            for j in range(cfg.n_hidden - 1):
                layers.append(linear_init(layer_keys[j + 1], cfg.hidden_dim, cfg.hidden_dim))
            layers.append(linear_init(layer_keys[cfg.n_hidden], cfg.hidden_dim, out_dim))
        segments.append({"layers": layers})

    dir_dim = cfg.direction_encoder.output_dim
    color_in = cfg.hidden_dim + (dir_dim if cfg.delayed_direction else 0)
    color = [
        linear_init(keys[-2], color_in, cfg.hidden_dim // 2),
        linear_init(keys[-1], cfg.hidden_dim // 2, 3 + int(cfg.delayed_density)),
    ]
    return {"segments": segments, "color": color}


def _apply_segment(layers, x, compute_dtype):
    """FFNN with ReLU between layers (none after the last — the inter-segment
    ReLU is applied by the caller, matching `forward:109-115`)."""
    h = x
    for i, layer in enumerate(layers):
        h = linear_apply(layer, h, compute_dtype)
        if i < len(layers) - 1:
            h = jax.nn.relu(h)
    return h


def apply(
    params: Dict,
    cfg: NerfMLPConfig,
    pos: jnp.ndarray,
    dir: jnp.ndarray,
    pixel_width: Optional[jnp.ndarray] = None,
    t_start: Optional[jnp.ndarray] = None,
    t_end: Optional[jnp.ndarray] = None,
    alpha_pos: Optional[jnp.ndarray] = None,
    alpha_dir: Optional[jnp.ndarray] = None,
    pixel_width_sigma: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(density, rgb) for flattened samples.

    pos/dir: (B, 3); pixel_width/t_start/t_end: (B, 1) (used by integrated
    encodings); alpha_*: BARF annealing scalars for the two encoders.
    Mirrors `NerfModel.forward:96-141`.
    """
    try:
        # integrated (Mip) encoders take the scheduled extra-blur variance;
        # pixel_width_sigma may be a traced scalar, so dispatch on signature
        # (TypeError), never on its value
        pos_enc = cfg.position_encoder(
            pos, dir, pixel_width, t_start, t_end, alpha=alpha_pos,
            pixel_width_sigma=pixel_width_sigma,
        )
    except TypeError:
        pos_enc = cfg.position_encoder(pos, dir, pixel_width, t_start, t_end, alpha=alpha_pos)
    dir_enc = cfg.direction_encoder(dir, alpha=alpha_dir)
    if cfg.compute_dtype is not None:
        # store the (B, 63/27) encodings at compute width — they are re-read
        # by every segment and by the backward pass (HBM-bound step)
        pos_enc = pos_enc.astype(cfg.compute_dtype)
        dir_enc = dir_enc.astype(cfg.compute_dtype)

    z = jnp.zeros((pos_enc.shape[0], 0), dtype=pos_enc.dtype)
    for i, segment in enumerate(params["segments"]):
        if not cfg.delayed_direction:
            z = jnp.concatenate([z, dir_enc], axis=-1)
        z = _apply_segment(segment["layers"], jnp.concatenate([z, pos_enc], axis=-1),
                           cfg.compute_dtype)
        if i < cfg.n_segments - 1:
            z = jax.nn.relu(z)

    length = z.shape[-1] - (0 if cfg.delayed_density else 1)
    if cfg.delayed_direction:
        final_input = jnp.concatenate([z[:, :length], dir_enc], axis=-1)
    else:
        final_input = z[:, :length]

    h = jax.nn.relu(linear_apply(params["color"][0], final_input, cfg.compute_dtype))
    final_output = linear_apply(params["color"][1], h, cfg.compute_dtype)

    density_raw = final_output[:, -1] if cfg.delayed_density else z[:, -1]
    # heads back to fp32: compositing + MSE loss stay full precision
    density = softplus8(density_raw.astype(jnp.float32))
    rgb = jax.nn.sigmoid(final_output[:, :3].astype(jnp.float32))
    return density, rgb
