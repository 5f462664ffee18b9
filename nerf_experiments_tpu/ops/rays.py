"""Ray generation and camera-space transforms.

Conventions copied (semantically) from `barf/dataset.py`:
  * focal length from the horizontal camera angle:
    f = W / 2 / tan(camera_angle_x / 2)          (`_load_camera_info:303`)
  * camera looks down -z, y flipped, pixel grid centered:
    direction(i_row, j_col) ∝ (x, y, -1) normalized   (`_get_directions_meshgrid:406-451`)
  * rays in world space: rotate directions by c2w[:3,:3], origin = c2w[:3,3]
    (`_meshgrid_to_world:453-482`)
  * space transform: origins' translation removed then everything scaled;
    default scale = 3 * max pairwise camera distance, default translate =
    mean camera position (`_transform_camera_to_world:315-381`)
  * pose noise: per-camera translation noise added to origins, rotation
    noise applied to directions (`_apply_noise:513-561`)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.ops.lie import so3_exp


def focal_length(image_width: int, camera_angle_x: float) -> float:
    return image_width / 2.0 / jnp.tan(camera_angle_x / 2.0)


def directions_meshgrid(
    image_height: int, image_width: int, focal: float, dtype=jnp.float32
) -> jnp.ndarray:
    """Unit direction vectors in camera space, flattened row-major (H*W, 3).

    Pixel (i, j) maps to row i*W + j, matching the reference's image-pixel
    ordering so per-pixel colors line up with rays.
    """
    ys = -jnp.linspace(-(image_height - 1) / 2, (image_height - 1) / 2, image_height) / focal
    xs = jnp.linspace(-(image_width - 1) / 2, (image_width - 1) / 2, image_width) / focal
    y, x = jnp.meshgrid(ys.astype(dtype), xs.astype(dtype), indexing="ij")
    d = jnp.stack([x, y, -jnp.ones_like(x)], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d.reshape(-1, 3)


def space_transform_params(
    camera_positions: jnp.ndarray,
    scale: Optional[float] = None,
    translate: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Auto space-transform: translate = mean camera pos, scale = 3 * max
    pairwise camera distance (reference `_transform_camera_to_world:352-358`)."""
    if scale is None:
        diff = camera_positions[:, None, :] - camera_positions[None, :, :]
        scale = 3.0 * jnp.max(jnp.linalg.norm(diff, axis=-1))
    if translate is None:
        translate = jnp.mean(camera_positions, axis=0)
    return jnp.asarray(scale), jnp.asarray(translate)


def transform_c2w(
    c2w: jnp.ndarray, scale: jnp.ndarray, translate: jnp.ndarray
) -> jnp.ndarray:
    """Apply the space transform to (N, 4, 4) camera-to-world matrices.

    original = transformed * scale + translate (on the translation column);
    the rotation block is unchanged (reference divides the whole matrix by a
    scale matrix that is 1 everywhere except the translation column).
    """
    out = c2w.at[:, :3, 3].set((c2w[:, :3, 3] - translate) / scale)
    return out


def rays_from_c2w(
    meshgrid: jnp.ndarray, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """World-space rays for every camera.

    meshgrid: (H*W, 3) camera-space unit dirs; c2w: (N, 4, 4).
    Returns origins (N, H*W, 3) and directions (N, H*W, 3).
    """
    origins = jnp.broadcast_to(c2w[:, None, :3, 3], (c2w.shape[0], meshgrid.shape[0], 3))
    dirs = jnp.einsum("nij,pj->npi", c2w[:, :3, :3], meshgrid)
    return origins, dirs


def camera_origins_and_directions(c2w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-camera origin and central viewing direction (reference
    `_get_cam_origs_and_directions:384-404`)."""
    origins = c2w[:, :3, 3]
    directions = jnp.einsum("nij,j->ni", c2w[:, :3, :3], jnp.array([0.0, 0.0, -1.0]))
    return origins, directions


def apply_pose_noise(
    key: jax.Array,
    camera_origins: jnp.ndarray,
    camera_directions: jnp.ndarray,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    rotation_noise_sigma: float,
    translation_noise_sigma: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-camera pose noise (reference `_apply_noise:513-561`).

    Translation noise is added to origins; rotation noise (random so3,
    sigma in radians) rotates direction vectors about the world origin.
    """
    n = camera_origins.shape[0]
    k_rot, k_trans = jax.random.split(key)
    R_noise = so3_exp(jax.random.normal(k_rot, (n, 3)) * rotation_noise_sigma)
    t_noise = jax.random.normal(k_trans, (n, 3)) * translation_noise_sigma

    camera_origins_noisy = camera_origins + t_noise
    ray_origins_noisy = ray_origins + t_noise[:, None, :]
    camera_directions_noisy = jnp.einsum("nij,nj->ni", R_noise, camera_directions)
    ray_directions_noisy = jnp.einsum("nij,npj->npi", R_noise, ray_directions)
    return (
        camera_origins_noisy,
        camera_directions_noisy,
        ray_origins_noisy,
        ray_directions_noisy,
    )
