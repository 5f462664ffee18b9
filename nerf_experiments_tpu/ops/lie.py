"""so(3)/SO(3) and se(3)/SE(3) exponential maps.

Semantics of the reference's two implementations:
  * `barf/model_camera_extrinsics.py:22-43` (`so3_to_SO3` via matrix_exp of
    the cross-product matrix) — the main path.
  * `barf/Lie_barf.py:3-82` (Taylor-series maps from the BARF paper repo).

Here both collapse into one closed-form Rodrigues implementation with a
Taylor fallback near theta=0 so it is jit-safe and exactly differentiable
(no data-dependent branching; `jnp.where` on both branches with safe
arguments).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_TAYLOR_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Cross-product (skew-symmetric) matrix of w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([zeros, -wz, wy], axis=-1),
            jnp.stack([wz, zeros, -wx], axis=-1),
            jnp.stack([-wy, wx, zeros], axis=-1),
        ],
        axis=-2,
    )


def _sin_t_over_t(t2: jnp.ndarray) -> jnp.ndarray:
    """sin(t)/t with Taylor fallback, as a function of t^2 (smooth at 0)."""
    t = jnp.sqrt(jnp.maximum(t2, _TAYLOR_EPS))
    taylor = 1.0 - t2 / 6.0 + t2 * t2 / 120.0
    return jnp.where(t2 < _TAYLOR_EPS, taylor, jnp.sin(t) / t)


def _one_minus_cos_over_t2(t2: jnp.ndarray) -> jnp.ndarray:
    """(1-cos(t))/t^2 with Taylor fallback."""
    t2_safe = jnp.maximum(t2, _TAYLOR_EPS)  # also keeps the unselected
    t = jnp.sqrt(t2_safe)  # branch's gradient finite at t2=0
    taylor = 0.5 - t2 / 24.0 + t2 * t2 / 720.0
    return jnp.where(t2 < _TAYLOR_EPS, taylor, (1.0 - jnp.cos(t)) / t2_safe)


def _t_minus_sin_over_t3(t2: jnp.ndarray) -> jnp.ndarray:
    """(t-sin(t))/t^3 with Taylor fallback (for the SE(3) V matrix)."""
    t2_safe = jnp.maximum(t2, _TAYLOR_EPS)
    t = jnp.sqrt(t2_safe)
    taylor = 1.0 / 6.0 - t2 / 120.0 + t2 * t2 / 5040.0
    return jnp.where(t2 < _TAYLOR_EPS, taylor, (t - jnp.sin(t)) / (t2_safe * t))


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3) (Rodrigues). (..., 3) -> (..., 3, 3).

    Matches `CameraExtrinsics.so3_to_SO3` (matrix_exp of hat(w)) exactly in
    the fp32 sense; tested against matrix power series.
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = jnp.matmul(W, W, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + _sin_t_over_t(theta2) * W + _one_minus_cos_over_t2(theta2) * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3). (..., 3, 3) -> (..., 3).

    Stable away from theta=pi (sufficient for tests / pose noise scales).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    vee = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    t2 = (theta * theta)[..., None]
    # vee = 2 sin(theta)/theta * w  =>  w = vee / (2 sinc(theta))
    return vee / (2.0 * _sin_t_over_t(t2[..., 0])[..., None] + 1e-12)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3). xi = (w, v): (..., 6) -> (..., 4, 4).

    Parity with the reference's kept-for-ablation Taylor implementation
    (`barf/Lie_barf.py:30-50`).
    """
    w, v = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    W = hat(w)
    W2 = jnp.matmul(W, W, precision=jax.lax.Precision.HIGHEST)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = eye + _sin_t_over_t(theta2) * W + _one_minus_cos_over_t2(theta2) * W2
    V = eye + _one_minus_cos_over_t2(theta2) * W + _t_minus_sin_over_t3(theta2) * W2
    t = jnp.matmul(V, v[..., None], precision=jax.lax.Precision.HIGHEST)[..., 0]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=xi.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rotate(R: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply rotation matrices to vectors: (..., 3, 3) @ (..., 3) -> (..., 3)."""
    return jnp.einsum("...ij,...j->...i", R, x, precision=jax.lax.Precision.HIGHEST)
