"""Training schedules: LeNice LR decay, BARF blur sigma, Mip-BARF sigma.

All schedules are pure functions of the step / epoch fraction so they can be
computed on the host and fed to jitted steps as scalars, or traced directly.

  * `le_nice`: the closed-form exponential decay of `SchedulerLeNice`
    (`barf/model_interpolation.py:30-67`): lr(step) =
    start * exp(log(stop/start)/n * min(step, n)); no-decay when n <= 0 or
    start == 0.
  * `garf_exponential`: garf's per-subnet ExponentialLR with factor
    2^(log2(stop/start)/steps) applied every step, unclamped
    (`garf/model_garf.py:356-362`).
  * `barf_sigma_alpha`: sigma_max * 2^(-alpha), zeroed below 1/4
    (`barf/model_barf.py:14-23`).
  * `mip_sigma_schedule`: exponential decay from 1 at decay-start to
    0.25/start_sigma at decay-end, then 0 (`barf/model_mip.py:170-204`).
  * `barf_alpha`: linear alpha ramp lives with the encodings
    (`encodings.fourier.barf_alpha_schedule`).
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp


def le_nice(
    start_lr: float, stop_lr: float, number_of_steps: Optional[int]
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Closed-form per-group exponential decay schedule (SchedulerLeNice)."""
    if not number_of_steps or number_of_steps <= 0 or start_lr == 0:
        return lambda step: jnp.asarray(start_lr, jnp.float32)
    log_decay = (math.log(stop_lr) - math.log(start_lr)) / number_of_steps

    def schedule(step):
        clamped = jnp.minimum(jnp.asarray(step, jnp.float32), float(number_of_steps))
        return start_lr * jnp.exp(log_decay * clamped)

    return schedule


def garf_exponential(
    start_lr: float, stop_lr: float, number_of_steps: Optional[int]
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """garf's ExponentialLR: gamma^step with gamma = 2^(log2(stop/start)/n),
    NOT clamped at n (the torch scheduler keeps decaying)."""
    if not number_of_steps or number_of_steps <= 0 or start_lr == 0:
        return lambda step: jnp.asarray(start_lr, jnp.float32)
    log_gamma = (math.log(stop_lr) - math.log(start_lr)) / number_of_steps

    def schedule(step):
        return start_lr * jnp.exp(log_gamma * jnp.asarray(step, jnp.float32))

    return schedule


def quantized_exponential(
    start_lr: float,
    stop_lr: float,
    number_of_steps: Optional[int],
    steps_per_period: int,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """gaborf's rate-limited scheduler stepping (`gaborf/model_gaborf.py:284-303`):
    the ExponentialLR is stepped only at epoch-fraction milestones, so the LR
    decays in a staircase — gamma^(floor(step / steps_per_period)) with gamma
    chosen per period so the endpoints match garf_exponential's."""
    if not number_of_steps or number_of_steps <= 0 or start_lr == 0:
        return lambda step: jnp.asarray(start_lr, jnp.float32)
    n_periods = max(number_of_steps // max(steps_per_period, 1), 1)
    log_gamma = (math.log(stop_lr) - math.log(start_lr)) / n_periods

    def schedule(step):
        k = jnp.floor(jnp.asarray(step, jnp.float32) / steps_per_period)
        return start_lr * jnp.exp(log_gamma * k)

    return schedule


def barf_sigma_alpha(alpha: jnp.ndarray, sigma_max: float) -> jnp.ndarray:
    """Blur sigma coupled to the BARF annealing alpha (`get_sigma_alpha`)."""
    sigma = sigma_max * 2.0 ** (-alpha)
    return jnp.where(sigma < 0.25, 0.0, sigma)


def mip_sigma_schedule(
    current_step: jnp.ndarray,
    decay_start_step: int,
    decay_end_step: int,
    start_blur_sigma: float,
    start_pixel_width_sigma: float,
) -> jnp.ndarray:
    """Mip-BARF sigma_schedule multiplier (`update_sigma_schedule:170-204`):
    1 before start, exp decay to 0.25/max(start sigmas) at end, 0 after."""
    start_sigma = max(start_blur_sigma, start_pixel_width_sigma, 1e-8)
    step = jnp.asarray(current_step, jnp.float32)
    denom = max(decay_end_step - decay_start_step, 1)
    frac = (step - decay_start_step) / denom
    decayed = (0.25 / start_sigma) ** frac
    out = jnp.where(step < decay_start_step, 1.0, decayed)
    return jnp.where(step > decay_end_step, 0.0, out)


def sigma_floor(sigma: jnp.ndarray) -> jnp.ndarray:
    """Sigmas below 1/4 are treated as no blur (`model_mip.py:207-225`)."""
    return jnp.where(sigma < 0.25, 0.0, sigma)


def epoch_fraction(step: int, batch_size: int, dataset_size_rays: int) -> float:
    """iterations -> fractional epochs (`run_barf.py:19-20` inverted)."""
    return step * batch_size / dataset_size_rays
