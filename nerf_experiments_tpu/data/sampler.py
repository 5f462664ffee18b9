"""On-device ray-batch sampling + blur-pyramid color interpolation.

Replaces the reference's torch DataLoader worker processes
(`barf/data_module.py:202-263`) with a single device-resident tensor store:
all rays/colors live in HBM as flat (N*H*W, ...) arrays and every train step
gathers a random index batch under jit. This removes the host↔device
boundary from the hot path entirely (SURVEY.md §7.2 step 3).

`blurred_pixel_colors` reproduces `get_blurred_pixel_colors`
(`barf/data_module.py:276-369`): linear interpolation between the two
nearest blur-pyramid levels; below sigma 0.25 the sharp image is used;
above the max sigma the most-blurred level is used. Output packs
[interpolated, sharp] like the reference's (N, 2, 3).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.data.blender import ImagePoseData


@dataclasses.dataclass
class RayStore:
    """Flat device arrays over all pixels of a split."""

    origins_raw: jnp.ndarray  # (R, 3)
    origins_noisy: jnp.ndarray  # (R, 3)
    dirs_raw: jnp.ndarray  # (R, 3)
    dirs_noisy: jnp.ndarray  # (R, 3)
    colors: jnp.ndarray  # (R, n_sigmas, 3)
    img_idx: jnp.ndarray  # (R,) int32 — ORIGINAL image indices (index_to_index)
    pixel_width: float
    gaussian_blur_sigmas: Tuple[float, ...]
    camera_origins_raw: jnp.ndarray  # (N, 3)
    camera_origins_noisy: jnp.ndarray  # (N, 3)
    hw: int = 0  # rays per image (H*W); 0 = unknown (hand-built stores)

    @property
    def n_rays(self) -> int:
        return self.origins_raw.shape[0]

    def arrays(self) -> dict:
        """The device arrays as a pytree (for passing into jitted steps)."""
        return {
            "origins_raw": self.origins_raw,
            "origins_noisy": self.origins_noisy,
            "dirs_raw": self.dirs_raw,
            "dirs_noisy": self.dirs_noisy,
            "colors": self.colors,
            "img_idx": self.img_idx,
        }


def make_ray_store(data: ImagePoseData, device=None) -> RayStore:
    n, h, w = data.n_images, data.image_height, data.image_width
    hw = h * w
    to_dev = lambda x: jax.device_put(jnp.asarray(x), device)
    img_idx = np.repeat(
        np.array([data.index_to_index[i] for i in range(n)], np.int32), hw
    )
    return RayStore(
        origins_raw=to_dev(data.ray_origins.reshape(-1, 3)),
        origins_noisy=to_dev(data.ray_origins_noisy.reshape(-1, 3)),
        dirs_raw=to_dev(data.ray_directions.reshape(-1, 3)),
        dirs_noisy=to_dev(data.ray_directions_noisy.reshape(-1, 3)),
        colors=to_dev(data.images.reshape(n * hw, len(data.gaussian_blur_sigmas), 3)),
        img_idx=to_dev(img_idx),
        pixel_width=data.pixel_width,
        gaussian_blur_sigmas=tuple(data.gaussian_blur_sigmas),
        camera_origins_raw=to_dev(data.camera_origins),
        camera_origins_noisy=to_dev(data.camera_origins_noisy),
        hw=hw,
    )


def sample_batch(store: RayStore, key: jax.Array, batch_size: int):
    """Random ray batch — the device-side `__getitem__` + shuffle.

    Returns dict with origs_raw/origs_noisy/dirs_raw/dirs_noisy (B,3),
    colors (B,n_sigmas,3), img_idx (B,), pixel_width (B,1).
    """
    idx = jax.random.randint(key, (batch_size,), 0, store.n_rays)
    return gather_batch(store, idx)


def gather_batch(store: RayStore, idx: jnp.ndarray):
    return gather_batch_arrays(store.arrays(), store.pixel_width, idx)


def gather_batch_arrays(arrays: dict, pixel_width: float, idx: jnp.ndarray):
    """Batch gather from the flat ray arrays — jit this together with the
    train step (one fused device program per step; anything eager costs a
    device-tunnel roundtrip per op)."""
    b = idx.shape[0]
    return {
        "origs_raw": arrays["origins_raw"][idx],
        "origs_noisy": arrays["origins_noisy"][idx],
        "dirs_raw": arrays["dirs_raw"][idx],
        "dirs_noisy": arrays["dirs_noisy"][idx],
        "colors": arrays["colors"][idx],
        "img_idx": arrays["img_idx"][idx],
        "pixel_width": jnp.full((b, 1), pixel_width),
    }


def blurred_pixel_colors(
    colors: jnp.ndarray, sigmas: Sequence[float], sigma: jnp.ndarray
) -> jnp.ndarray:
    """(B, n_sigmas, 3), pyramid sigmas (descending, last = 0), traced sigma
    -> (B, 2, 3) = [interpolated-at-sigma, sharp].

    Branchless version of the reference's three Python cases: the piecewise
    interpolation is computed for every adjacent sigma pair and selected with
    jnp.where, so `sigma` may be a traced scalar from the BARF/Mip schedule.
    """
    sigmas = list(sigmas)
    if sigmas != sorted(sigmas, reverse=True):
        raise ValueError(
            f"gaussian_blur_sigmas must be descending (most-blurred first, "
            f"sharp last), got {sigmas}")
    sharp = colors[:, -1]
    sigma = jnp.asarray(sigma)

    # default: the sharp image (sigma <= 0.25)
    out = sharp
    # clamp above: most blurred level
    out = jnp.where(sigma >= max(sigmas), colors[:, 0], out)
    # interior intervals: for each adjacent (high=s_i, low=s_{i+1}) with
    # s_i > s_{i+1}, reference picks index_low/index_high around sigma and
    # lerps with l = (sigma - s_high)/(s_low - s_high).
    for i in range(len(sigmas) - 1):
        s_hi, s_lo = sigmas[i], sigmas[i + 1]
        if s_hi <= s_lo:
            continue
        coeff = (sigma - s_hi) / (s_lo - s_hi + 1e-8)
        lerp = colors[:, i + 1] * coeff + colors[:, i] * (1.0 - coeff)
        inside = jnp.logical_and(sigma < s_hi, sigma >= s_lo)
        out = jnp.where(inside, lerp, out)
    out = jnp.where(sigma <= 0.25, sharp, out)
    return jnp.stack([out, sharp], axis=1)
