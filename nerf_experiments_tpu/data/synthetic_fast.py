"""Device-accelerated procedural scene generation.

`synthetic.generate_dataset` renders ground truth with a single-threaded
numpy ray marcher — ~15 s per 400^2 image on a 1-vCPU host, i.e. ~28 minutes
for the reference-protocol 100-train-view split before training can start
(the reference's lego split is ~100 images: `barf/dataset.py:161-248`).
This module is a JAX port of the same analytic scene + emission-absorption
integrator (`synthetic._scene_density_color` / `render_image`): lax.scan
over the sample axis, everything else batched over the full image, so one
jit call renders a whole view (~100 ms on a v5e chip, 15 s for the full
110-view 400^2 dataset).

Poses, file layout, and transforms JSON come from the unchanged
`generate_dataset` — only `render_image` is swapped — so the two paths are
interchangeable. `validate()` checks the port against the numpy oracle
per-run before any dataset is written.

The matmul precision is scoped with a context manager, NOT the global
config: at default TPU precision a boundary ray can land on the other side
of one of the scene's hard density edges vs numpy, and a global "highest"
would silently de-optimize bf16 training running later in the same process.
"""
import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.data import synthetic

_SPHERES = [
    ((0.0, 0.0, 0.2), 0.55, (0.9, 0.2, 0.15)),
    ((0.55, 0.3, -0.1), 0.3, (0.2, 0.75, 0.25)),
    ((-0.5, -0.25, 0.0), 0.35, (0.2, 0.35, 0.9)),
    ((0.1, -0.55, 0.45), 0.22, (0.95, 0.85, 0.2)),
]


def _scene_density_color_jax(pts):
    """jnp port of synthetic._scene_density_color (same constants)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    density = jnp.zeros(pts.shape[:-1], jnp.float32)
    color = jnp.zeros(pts.shape[:-1] + (3,), jnp.float32)
    for center, radius, rgb in _SPHERES:
        d2 = jnp.sum((pts - jnp.asarray(center)) ** 2, axis=-1)
        sigma = jnp.where(d2 < radius**2,
                          60.0 * jnp.exp(-d2 / (2 * (radius / 2) ** 2)), 0.0)
        take = sigma > density
        density = jnp.where(take, sigma, density)
        color = jnp.where(take[..., None], jnp.asarray(rgb), color)
    in_box = (jnp.abs(x) < 0.8) & (jnp.abs(y) < 0.8) & (z > -0.55) & (z < -0.35)
    checker = (jnp.floor(x * 5) + jnp.floor(y * 5)) % 2
    box_color = jnp.stack(
        [0.6 + 0.3 * checker, 0.5 + 0.2 * checker, 0.4 + 0.1 * checker], -1)
    density = jnp.where(in_box, 80.0, density)
    color = jnp.where(in_box[..., None], box_color, color)
    return density, color


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _render_device(c2w, W, H, camera_angle_x, n_samples, near=2.0, far=6.5):
    focal = W / 2.0 / math.tan(camera_angle_x / 2.0)
    ys = -(jnp.arange(H) - (H - 1) / 2) / focal
    xs = (jnp.arange(W) - (W - 1) / 2) / focal
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    dirs_cam = jnp.stack([xx, yy, -jnp.ones_like(xx)], -1)
    dirs_cam = dirs_cam / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs = dirs_cam @ c2w[:3, :3].T
    origin = c2w[:3, 3]
    t = jnp.linspace(near, far, n_samples)
    dt = t[1] - t[0]

    def body(carry, ti):
        rgb_acc, trans = carry
        sigma, col = _scene_density_color_jax(origin + dirs * ti)
        alpha = 1.0 - jnp.exp(-sigma * dt)
        w = trans * alpha
        return (rgb_acc + w[..., None] * col, trans * (1.0 - alpha)), None

    (rgb, trans), _ = jax.lax.scan(
        body, (jnp.zeros((H, W, 3)), jnp.ones((H, W))), t)
    return jnp.concatenate([rgb, (1.0 - trans)[..., None]], -1)


def render_image(c2w, image_width, image_height,
                 camera_angle_x=synthetic.CAMERA_ANGLE_X,
                 n_samples=128, near=2.0, far=6.5):
    """Drop-in for synthetic.render_image, device-accelerated."""
    with jax.default_matmul_precision("highest"):
        out = _render_device(jnp.asarray(c2w, jnp.float32), image_width,
                             image_height, camera_angle_x, n_samples,
                             near, far)
    return np.asarray(out).astype(np.float64)


def validate(size=64, n_samples=64):
    """Device port vs the numpy oracle on one pose.

    fp32-vs-fp64 sample positions can cross the scene's HARD density edges
    differently, flipping isolated boundary pixels — so the criterion is
    perceptual: >=98% of pixels within 1/255 and small mean error. A
    transpose/flip/convention bug fails this by a mile (a wrong render
    agrees on <50% of pixels; the correct one measures 98.8% on CPU fp32
    and 100% on TPU at highest matmul precision).
    """
    c2w = synthetic.look_at_c2w(np.array([2.5, 2.0, 2.2]), np.zeros(3),
                                np.array([0.0, 0.0, 1.0]))
    ref = synthetic.render_image(c2w, size, size, n_samples=n_samples)
    fast = render_image(c2w, size, size, n_samples=n_samples)
    d = np.abs(ref - fast)
    frac_same = float((d.max(axis=-1) < 1.0 / 255.0).mean())
    mean_err = float(d.mean())
    if not (frac_same >= 0.98 and mean_err < 1e-3):
        raise AssertionError(
            f"device scene render mismatch vs numpy: frac_same="
            f"{frac_same:.4f} mean_err={mean_err:.2e}")
    return frac_same, mean_err


def generate_dataset(out_dir, **kwargs):
    """synthetic.generate_dataset with the device renderer swapped in.

    Validates the port against the numpy oracle first, then monkeypatches
    `synthetic.render_image` for the duration of the call.
    """
    validate()
    prev = synthetic.render_image
    synthetic.render_image = render_image
    try:
        return synthetic.generate_dataset(out_dir, **kwargs)
    finally:
        synthetic.render_image = prev
