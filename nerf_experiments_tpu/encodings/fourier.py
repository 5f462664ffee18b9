"""Positional encodings: Identity / Fourier / BARF-annealed / Integrated (Mip)
/ Integrated-BARF.

Semantics from `barf/positional_encodings.py:7-282`, re-designed for JAX:
the reference threads the BARF annealing coefficient alpha through a
stateful module buffer updated by the training loop; here alpha is an
explicit traced scalar argument so schedules stay outside jit and the
forward stays pure (SURVEY.md §7.3 hard part 5).

Feature ordering matches the reference exactly (channel-major:
[cos(x·2^0..2^L), cos(y·...), cos(z·...), sin(x·...), ...], identity
prepended when enabled) so weights and tests are comparable.

All encodings share one uniform signature:
    encode(x, dir=None, pixel_width=None, t_start=None, t_end=None, alpha=None)
mirroring `PositionalEncoding.forward` (`positional_encodings.py:13`).
"""
from __future__ import annotations

import dataclasses
import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


@dataclasses.dataclass(frozen=True)
class Encoding:
    """Base config. `output_dim` is what networks size their inputs by."""

    space_dimensions: int = 3

    @property
    def output_dim(self) -> int:
        raise NotImplementedError

    def __call__(self, x, dir=None, pixel_width=None, t_start=None, t_end=None, alpha=None):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Encoding):
    """`IdentityPositionalEncoding` (`positional_encodings.py:17-25`)."""

    @property
    def output_dim(self) -> int:
        return self.space_dimensions

    def __call__(self, x, dir=None, pixel_width=None, t_start=None, t_end=None, alpha=None):
        return x


def _fourier_args(x: jnp.ndarray, levels: int, scale: float) -> jnp.ndarray:
    """Channel-major arguments: x repeat_interleave(levels) * scale * 2^j."""
    freq = scale * (2.0 ** jnp.arange(levels, dtype=x.dtype))  # (L,)
    # (N, D) -> (N, D, L) -> (N, D*L), channel-major like repeat_interleave
    return (x[..., None] * freq).reshape(*x.shape[:-1], -1)


def _barf_mask(levels: int, space_dimensions: int, alpha: jnp.ndarray, dtype) -> jnp.ndarray:
    """Coarse-to-fine cosine-edge mask (`compute_mask:105-122`).

    mask_k = 1 for k < floor(alpha); (1 - cos((alpha - k)π))/2 at the ramp
    level; 0 above. Implemented branchless: clip(alpha - k, 0, 1) through the
    cosine ramp reproduces all three cases.
    """
    k = jnp.arange(levels, dtype=dtype)
    ramp = jnp.clip(alpha - k, 0.0, 1.0)
    mask = (1.0 - jnp.cos(ramp * jnp.pi)) / 2.0
    return jnp.tile(mask, space_dimensions)


def barf_alpha_schedule(
    epoch: jnp.ndarray, levels: int, alpha_start: float, start_epoch: float, end_epoch: float
) -> jnp.ndarray:
    """Linear alpha ramp (`update_alpha:84-103`), as a pure function of the
    (fractional) epoch."""
    frac = jnp.clip((epoch - start_epoch) / (end_epoch - start_epoch + 1e-12), 0.0, 1.0)
    return alpha_start + frac * (levels - alpha_start)


@dataclasses.dataclass(frozen=True)
class Fourier(Encoding):
    """`FourierFeatures` (`positional_encodings.py:28-57`)."""

    levels: int = 10
    scale: float = _TWO_PI

    @property
    def output_dim(self) -> int:
        return self.levels * 2 * self.space_dimensions

    def __call__(self, x, dir=None, pixel_width=None, t_start=None, t_end=None, alpha=None):
        args = _fourier_args(x, self.levels, self.scale)
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


@dataclasses.dataclass(frozen=True)
class Barf(Encoding):
    """`BarfPositionalEncoding` (`positional_encodings.py:61-148`).

    alpha is an explicit argument (defaults to all-levels-on = levels).
    """

    levels: int = 10
    scale: float = _TWO_PI
    include_identity: bool = True
    alpha_start: float = 0.0
    alpha_increase_start_epoch: float = 0.0
    alpha_increase_end_epoch: float = 1.0

    @property
    def output_dim(self) -> int:
        return (self.levels * 2 + int(self.include_identity)) * self.space_dimensions

    def alpha_at(self, epoch) -> jnp.ndarray:
        return barf_alpha_schedule(
            jnp.asarray(epoch, jnp.float32),
            self.levels,
            self.alpha_start,
            self.alpha_increase_start_epoch,
            self.alpha_increase_end_epoch,
        )

    def __call__(self, x, dir=None, pixel_width=None, t_start=None, t_end=None, alpha=None):
        if alpha is None:
            alpha = jnp.asarray(float(self.levels), x.dtype)
        args = _fourier_args(x, self.levels, self.scale)
        mask = _barf_mask(self.levels, self.space_dimensions, alpha, x.dtype)
        parts = [mask * jnp.cos(args), mask * jnp.sin(args)]
        if self.include_identity:
            parts.insert(0, x)
        return jnp.concatenate(parts, axis=-1)


def _ipe_moments(pos, dir, pixel_width, t_start, t_end, pixel_width_sigma):
    """Conical-frustum mean/variances (Mip-NeRF eqs 7, 8 + the reference's
    `pixel_width_sigma` extra-blur term, `positional_encodings.py:185-207`)."""
    t_mu = (t_start + t_end) / 2.0
    t_delta = (t_end - t_start) / 2.0

    mu_diff = 2.0 * t_mu * t_delta**2 / (3.0 * t_mu**2 + t_delta**2)
    pos_mu = pos + mu_diff * dir

    r_dot = pixel_width * 2.0 / jnp.sqrt(12.0)
    sigma_t_sq = t_delta**2 / 3.0 - (
        4.0 * t_delta**4 * (12.0 * t_mu**2 - t_delta**2)
    ) / (15.0 * (3.0 * t_mu**2 + t_delta**2) ** 2)
    sigma_r_sq = r_dot**2 * (
        t_mu**2 / 4.0
        + 5.0 * t_delta**2 / 12.0
        - 4.0 * t_delta**4 / (15.0 * (3.0 * t_mu**2 + t_delta**2))
    )

    # Extra variance from the Mip-BARF image-blur schedule; the reference
    # gates it at sigma > 0.25 in Python — reproduced branchless.
    add_sigma = jnp.where(
        jnp.asarray(pixel_width_sigma) > 0.25,
        (pixel_width_sigma * pixel_width * t_mu) ** 2,
        0.0,
    )
    return pos_mu, sigma_t_sq + add_sigma, sigma_r_sq + add_sigma


@dataclasses.dataclass(frozen=True)
class Integrated(Encoding):
    """`IntegratedFourierFeatures` — Mip-NeRF IPE (`positional_encodings.py:151-240`).

    `pixel_width_sigma` is passed per-call (traced) because Mip-BARF
    schedules it per step (`barf/model_mip.py:252`).
    """

    levels: int = 10
    scale: float = _TWO_PI
    include_identity: bool = True
    distribute_variance: bool = False

    @property
    def output_dim(self) -> int:
        return (self.levels * 2 + int(self.include_identity)) * self.space_dimensions

    def __call__(
        self,
        x,
        dir=None,
        pixel_width=None,
        t_start=None,
        t_end=None,
        alpha=None,
        pixel_width_sigma: float = 0.0,
    ):
        pos_mu, sigma_t_sq, sigma_r_sq = _ipe_moments(
            x, dir, pixel_width, t_start, t_end, pixel_width_sigma
        )
        scale4 = jnp.tile(4.0 ** jnp.arange(self.levels, dtype=x.dtype), self.space_dimensions)

        if self.distribute_variance:
            Sigma = (sigma_t_sq + sigma_r_sq * 2.0) / self.space_dimensions * scale4
            weight = jnp.exp(-Sigma / 2.0)
        else:
            diag_Sigma = sigma_t_sq * dir**2 + sigma_r_sq * (
                1.0 - dir**2 / jnp.sum(dir**2, axis=-1, keepdims=True)
            )  # eq 16
            rep = jnp.repeat(diag_Sigma, self.levels, axis=-1)
            weight = jnp.exp(-rep * scale4 / 2.0)  # eq 14

        args = _fourier_args(pos_mu, self.levels, self.scale)
        ipe = jnp.concatenate([weight * jnp.cos(args), weight * jnp.sin(args)], axis=-1)
        if self.include_identity:
            ipe = jnp.concatenate([pos_mu, ipe], axis=-1)
        return ipe


@dataclasses.dataclass(frozen=True)
class IntegratedBarf(Encoding):
    """`IntegratedBarfFourierFeatures` — IPE × BARF mask
    (`positional_encodings.py:242-282`)."""

    levels: int = 10
    scale: float = _TWO_PI
    include_identity: bool = True
    distribute_variance: bool = True
    alpha_start: float = 0.0
    alpha_increase_start_epoch: float = 0.0
    alpha_increase_end_epoch: float = 1.0

    @property
    def output_dim(self) -> int:
        return (self.levels * 2 + int(self.include_identity)) * self.space_dimensions

    def alpha_at(self, epoch) -> jnp.ndarray:
        return barf_alpha_schedule(
            jnp.asarray(epoch, jnp.float32),
            self.levels,
            self.alpha_start,
            self.alpha_increase_start_epoch,
            self.alpha_increase_end_epoch,
        )

    def __call__(
        self,
        x,
        dir=None,
        pixel_width=None,
        t_start=None,
        t_end=None,
        alpha=None,
        pixel_width_sigma: float = 0.0,
    ):
        if alpha is None:
            alpha = jnp.asarray(float(self.levels), x.dtype)
        ipe_enc = Integrated(
            space_dimensions=self.space_dimensions,
            levels=self.levels,
            scale=self.scale,
            include_identity=self.include_identity,
            distribute_variance=self.distribute_variance,
        )
        ipe = ipe_enc(
            x, dir, pixel_width, t_start, t_end, pixel_width_sigma=pixel_width_sigma
        )
        mask = _barf_mask(self.levels, self.space_dimensions, alpha, x.dtype)
        size = self.levels * self.space_dimensions
        if self.include_identity:
            pos, cos_part, sin_part = (
                ipe[..., : self.space_dimensions],
                ipe[..., self.space_dimensions : self.space_dimensions + size],
                ipe[..., self.space_dimensions + size :],
            )
            return jnp.concatenate([pos, mask * cos_part, mask * sin_part], axis=-1)
        cos_part, sin_part = ipe[..., :size], ipe[..., size:]
        return jnp.concatenate([mask * cos_part, mask * sin_part], axis=-1)
