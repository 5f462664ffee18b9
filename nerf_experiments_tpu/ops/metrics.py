"""Scalar metrics.

PSNR definition from `barf/model_interpolation.py:588-597` (−10·log10(mse));
pose error from `barf/model_camera_calibration.py:340-346` (mean L2 between
Kabsch-aligned predicted camera origins and true origins).
"""
from __future__ import annotations

import jax.numpy as jnp

from nerf_experiments_tpu.ops.kabsch import kabsch, apply_similarity


def psnr(mse: jnp.ndarray) -> jnp.ndarray:
    """PSNR = -10 * log10(mse). NaN below the reference's 1e-7 guard."""
    return jnp.where(mse <= 1e-7, jnp.nan, -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)))


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def pose_error(origs_raw: jnp.ndarray, origs_pred: jnp.ndarray) -> jnp.ndarray:
    """Mean distance between true origins and aligned predicted origins.

    Aligns predicted -> raw (reference: `compute_pose_error` with
    from_raw_to_pred=False) with outlier-rejected Kabsch, then means the
    per-camera L2 errors.
    """
    R, t, c = kabsch(origs_pred, origs_raw, remove_outliers=True)
    aligned = apply_similarity(R, t, c, origs_pred)
    return jnp.mean(jnp.linalg.norm(origs_raw - aligned, axis=-1))
