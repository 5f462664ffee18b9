"""On-device separable Gaussian image blur with sigma decay (PARITY 1b).

TPU-native equivalent of the gaborf/mip_barf at-fetch-time conv blur
(`gaborf/dataset.py:324-440`, `mip_barf/dataset.py:30-74`): the reference
rebuilds a separable kernel per `gaussian_blur_step()` (sigma <- sigma *
decay) and convolves an 81-tap neighborhood around each fetched pixel with
reflect padding. Per-pixel neighborhood gathers are a TPU anti-pattern;
blurring the WHOLE device-resident image stack is two band-matrix MXU
matmuls (rows then columns) and costs ~10 GFLOP at 400^2 x 100 images —
microseconds — so the trainer simply re-blurs the full target stack on
every sigma-decay step and swaps it into the train arrays (no retrace:
same shapes).

Kernel parity: weights exp(-x^2 / (2*(rel_sigma*max_side)^2)) sampled at
linspace(-K/2, K/2, K) (the reference's half-integer positions), normalized;
a Dirac kernel when sigma ~ 0; reflect (no-edge-repeat) boundary handling —
all folded into the band matrices.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel(kernel_size: int, relative_sigma, max_side_length: int):
    """1-D blur taps, matching `_get_gaussian_blur_kernel:324-340`.

    relative_sigma may be a traced scalar; the Dirac case is a branchless
    where() so sigma can be annealed without retracing.
    """
    x = jnp.linspace(-kernel_size / 2.0, kernel_size / 2.0, kernel_size)
    sigma_abs = relative_sigma * max_side_length
    g = jnp.exp(-(x ** 2) / (2.0 * jnp.maximum(sigma_abs, 1e-12) ** 2))
    g = g / jnp.sum(g)
    dirac = (jnp.arange(kernel_size) == kernel_size // 2).astype(g.dtype)
    return jnp.where(sigma_abs <= 1e-7 * max_side_length, dirac, g)


def _reflect_index(i: np.ndarray, n: int) -> np.ndarray:
    """np.pad-style 'reflect' (no edge repeat) index folding."""
    period = 2 * (n - 1) if n > 1 else 1
    i = np.abs(i) % period
    return np.where(i >= n, period - i, i)


@functools.lru_cache(maxsize=16)
def _tap_matrix_np(n: int, kernel_size: int):
    """(K, n, n) one-hot tap placement: tap j of output pixel v reads input
    pixel reflect(v - K//2 + j). Contracting with the kernel gives the
    (n, n) band blur matrix including reflect boundary handling."""
    half = kernel_size // 2
    v = np.arange(n)[None, :]
    j = np.arange(kernel_size)[:, None]
    src = _reflect_index(v - half + j, n)  # (K, n)
    mats = np.zeros((kernel_size, n, n), np.float32)
    k_idx, v_idx = np.meshgrid(np.arange(kernel_size), np.arange(n), indexing="ij")
    mats[k_idx, v_idx, src] = 1.0
    return mats


def blur_matrix(n: int, kernel: jnp.ndarray) -> jnp.ndarray:
    """(n, n) matrix M with (M @ img_col) == 1-D reflect-padded conv."""
    taps = jnp.asarray(_tap_matrix_np(n, int(kernel.shape[0])))
    return jnp.einsum("k,kvw->vw", kernel, taps)


def separable_gaussian_blur(
    images: jnp.ndarray,  # (..., H, W, C)
    kernel: jnp.ndarray,  # (K,)
) -> jnp.ndarray:
    """Reflect-padded separable blur as two MXU matmuls (rows, then cols)."""
    h, w = images.shape[-3], images.shape[-2]
    m_h = blur_matrix(h, kernel)
    m_w = blur_matrix(w, kernel)
    out = jnp.einsum("vh,...hwc->...vwc", m_h, images)
    return jnp.einsum("uw,...hwc->...huc", m_w, out)


class ConvBlurTargets:
    """Trainer callback implementing the reference's decaying at-fetch blur.

    Holds the raw train image stack on device; at every epoch-fraction
    milestone (`mip_barf/data_module.py:150-170` cadence) it decays sigma
    (sigma <- sigma * decay, the reference's `gaussian_blur_step`) and swaps
    a freshly blurred flat color stack into the trainer's train arrays (ray
    order == image-major pixel order, so the flattened stack aligns with ray
    indices).
    """

    def __init__(
        self,
        images,               # (N, H, W, 3) raw train images
        kernel_size: int = 81,
        relative_sigma_start: float = 0.0,
        relative_sigma_decay: float = 0.99,
        epoch_fraction_period: float = 0.02,
        n_sigma_slots: int = 1,
    ):
        self.images = jnp.asarray(images)
        self.kernel_size = kernel_size
        self.sigma0 = float(relative_sigma_start)
        self.sigma = self.sigma0
        self.decay = float(relative_sigma_decay)
        self.period = float(epoch_fraction_period)
        self.n_sigma_slots = n_sigma_slots
        self.max_side = max(self.images.shape[1], self.images.shape[2])
        self._blur = jax.jit(self._blur_flat)
        self._n_applied = 0

    def _blur_flat(self, images, sigma):
        k = gaussian_kernel(self.kernel_size, sigma, self.max_side)
        blurred = separable_gaussian_blur(images, k)
        flat = blurred.reshape(-1, 3)
        # colors layout (R, n_sigmas, 3): the GARF-family loss reads the
        # LAST slot as its target (`garf_system.loss_fn`, c_b in the
        # reference's (c_r, c_b) pair); earlier slots keep the raw colors
        raw = images.reshape(-1, 3)
        slots = [raw] * (self.n_sigma_slots - 1) + [flat]
        return jnp.stack(slots, axis=1)

    def sync_to(self, epoch_frac: float) -> None:
        """Jump the ladder to the state an uninterrupted run would have at
        `epoch_frac` (checkpoint resume)."""
        n = int(epoch_frac // self.period)
        self._n_applied = n
        self.sigma = self.sigma0 * self.decay**n

    def flat_colors(self):
        return self._blur(self.images, jnp.asarray(self.sigma, jnp.float32))

    def __call__(self, trainer, state, step: int, epoch_frac: float) -> None:
        # sigma is a CLOSED-FORM function of the epoch fraction
        # (sigma0 * decay^milestones), not incremental host state, so a
        # resumed run lands on exactly the blur an uninterrupted run had.
        n = int(epoch_frac // self.period)
        if n <= self._n_applied:
            return
        self._n_applied = n
        self.sigma = self.sigma0 * self.decay**n  # n x gaussian_blur_step()
        trainer.swap_train_colors(self.flat_colors())
