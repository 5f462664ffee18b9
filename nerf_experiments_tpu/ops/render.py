"""Volume rendering (alpha compositing) — pure-JAX reference implementation.

Two call conventions exist in the reference and both are reproduced:
  * `barf/model_interpolation.py:316-353` `_render_rays`: density scaled by
    3*MAGIC_NUMBER (=1 with MAGIC_NUMBER=1/3, `barf/magic.py`), transmittance
    via exp(cumsum), returns (rgb, weights).
  * nerfacc `rendering` (`barf/model_garf.py:236-243`): returns rgb, opacity,
    depth and the per-sample transmittance ("trans" extra) used by the
    proposal loss.

The Pallas fused kernel in `render_pallas.py` implements the same math; this
module is the semantic reference and the CPU/test fallback.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

MAGIC_NUMBER = 1.0 / 3.0  # `barf/magic.py:1` — density scale fudge constant
DENSITY_SCALE = 3.0 * MAGIC_NUMBER  # net effect = 1.0, kept for parity clarity


def render_weights(
    densities: jnp.ndarray, dists: jnp.ndarray, density_scale: float = DENSITY_SCALE
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compositing weights from densities.

    densities, dists: (N, S). Returns (weights, alpha, trans), each (N, S):
      blocking_neg = -sigma * delta * density_scale
      alpha_i      = 1 - exp(blocking_neg_i)
      trans_i      = exp(sum_{j<i} blocking_neg_j)
      weights_i    = trans_i * alpha_i
    """
    blocking_neg = -densities * dists * density_scale
    alpha = 1.0 - jnp.exp(blocking_neg)
    cum = jnp.cumsum(blocking_neg, axis=-1)
    trans = jnp.exp(jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], axis=-1))
    return trans * alpha, alpha, trans


def render_rays(
    densities: jnp.ndarray,
    colors: jnp.ndarray,
    dists: jnp.ndarray,
    density_scale: float = DENSITY_SCALE,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Equation-3 alpha compositing (`_render_rays:316-353`).

    densities (N, S), colors (N, S, 3), dists (N, S) -> rgb (N, 3), weights (N, S).
    """
    weights, _, _ = render_weights(densities, dists, density_scale)
    rgb = jnp.sum(weights[..., None] * colors, axis=-2)
    return rgb, weights


def use_pallas_renderer() -> bool:
    """Fused Pallas kernel on TPU; pure-JAX fallback elsewhere (and under the
    NETPU_NO_PALLAS=1 escape hatch)."""
    import os

    if os.environ.get("NETPU_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def render_rays_auto(densities, colors, dists, density_scale: float = DENSITY_SCALE):
    if use_pallas_renderer():
        from nerf_experiments_tpu.ops.render_pallas import render_rays_pallas

        return render_rays_pallas(densities, colors, dists, density_scale)
    return render_rays(densities, colors, dists, density_scale)


def render_full_auto(densities, colors, t_start, t_end,
                     density_scale: float = DENSITY_SCALE):
    if use_pallas_renderer():
        from nerf_experiments_tpu.ops.render_pallas import render_full_pallas

        return render_full_pallas(densities, colors, t_start, t_end, density_scale)
    return render_full(densities, colors, t_start, t_end, density_scale)


def render_full(
    densities: jnp.ndarray,
    colors: jnp.ndarray,
    t_start: jnp.ndarray,
    t_end: jnp.ndarray,
    density_scale: float = DENSITY_SCALE,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """nerfacc.rendering-equivalent: rgb, opacity, depth, extras{"trans","weights"}.

    depth = sum_i w_i * (t_start_i + t_end_i)/2 (nerfacc convention).
    """
    dists = t_end - t_start
    weights, alpha, trans = render_weights(densities, dists, density_scale)
    rgb = jnp.sum(weights[..., None] * colors, axis=-2)
    opacity = jnp.sum(weights, axis=-1, keepdims=True)
    t_mid = (t_start + t_end) / 2.0
    depth = jnp.sum(weights * t_mid, axis=-1, keepdims=True)
    return rgb, opacity, depth, {"trans": trans, "weights": weights, "alpha": alpha}
