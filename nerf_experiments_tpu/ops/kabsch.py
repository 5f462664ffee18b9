"""Kabsch alignment with scale and fixed-shape outlier rejection.

Semantics from `barf/model_camera_calibration.py:69-156` (`kabsch_algorithm`):
align point_cloud_from to point_cloud_to with R, t, c such that
``to_hat = (R @ from) * c + t``; with ``remove_outliers=True`` the algorithm
runs once, drops the top-10% largest-residual points, and re-runs.

TPU-first delta: boolean indexing is replaced with *weighted* Kabsch over a
fixed-size mask so the whole thing jits with static shapes (SURVEY.md §7.3
hard part 4). Weighted Kabsch with 0/1 weights is mathematically identical
to dropping the points.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _weighted_kabsch(
    pts_from: jnp.ndarray, pts_to: jnp.ndarray, w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted similarity (Kabsch + scale) alignment.

    Solves min ||(R @ from_i) * c + t - to_i||^2 over rotations R, scale c,
    translation t, weighted by w (N,).

    Returns (R (3,3), t (1,3), c scalar).
    """
    w = w.astype(pts_from.dtype)
    w_sum = jnp.sum(w) + 1e-12
    wn = (w / w_sum)[:, None]

    mean_from = jnp.sum(wn * pts_from, axis=0, keepdims=True)
    mean_to = jnp.sum(wn * pts_to, axis=0, keepdims=True)

    cf = pts_from - mean_from
    ct = pts_to - mean_to

    # Scale: ratio of weighted RMS radii (reference: sqrt(sum to^2)/sqrt(sum from^2))
    c = jnp.sqrt(jnp.sum(wn * ct * ct)) / (jnp.sqrt(jnp.sum(wn * cf * cf)) + 1e-12)

    # Rotation via SVD of the weighted covariance. Reference solves
    # ||P - Q@R||^2 with H = P^T Q, R = V^T K U^T; equivalent formulation:
    H = (wn * cf).T @ ct  # (3, 3)
    U, S, Vt = jnp.linalg.svd(H.astype(jnp.float32))
    d = jnp.linalg.det(Vt.T @ U.T)
    K = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=jnp.float32)).at[-1, -1].set(d)
    R = (Vt.T @ K @ U.T).astype(pts_from.dtype)

    t = mean_to - (R @ mean_from.T).T * c
    return R, t, c


def kabsch(
    pts_from: jnp.ndarray,
    pts_to: jnp.ndarray,
    remove_outliers: bool = True,
    outlier_quantile: float = 0.9,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Kabsch + scale, optionally re-run without the top-(1-q) residuals.

    Matches `barf/model_camera_calibration.py:69-156`: first pass over all
    points; residual distances; keep points with distance strictly below the
    `outlier_quantile` quantile; second pass with those weights.
    """
    ones = jnp.ones(pts_from.shape[0], dtype=pts_from.dtype)
    R, t, c = _weighted_kabsch(pts_from, pts_to, ones)
    if not remove_outliers:
        return R, t, c

    pred = (pts_from @ R.T) * c + t
    dist = jnp.linalg.norm(pred - pts_to, axis=1)
    thresh = jnp.quantile(dist, outlier_quantile)
    keep = (dist < thresh).astype(pts_from.dtype)
    # Degenerate guard: if everything is an "outlier" (all distances equal),
    # fall back to uniform weights.
    keep = jnp.where(jnp.sum(keep) < 3, ones, keep)
    return _weighted_kabsch(pts_from, pts_to, keep)


def apply_similarity(
    R: jnp.ndarray, t: jnp.ndarray, c: jnp.ndarray, pts: jnp.ndarray
) -> jnp.ndarray:
    """Apply (R, t, c): pts (..., 3) -> (R @ pts) * c + t."""
    return jnp.einsum("ij,...j->...i", R, pts) * c + t
