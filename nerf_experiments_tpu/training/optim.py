"""Multi-group optimizer: optax Adam with per-group LeNice schedules.

Reproduces the reference's two optimizer styles with ONE optax transform:
  (a) single Adam(eps=1e-5) over NerfBaseModel param_groups + SchedulerLeNice
      (`barf/model_interpolation.py:543-584`);
  (b) garf's one-Adam-per-subnet manual optimization with per-subnet
      ExponentialLR (`garf/model_garf.py:365-428`) — Adam state is per-leaf,
      so N separate Adams over disjoint trees == one multi_transform'd Adam
      with per-label schedules; the update math is identical.

NaN containment: the reference swaps a NaN loss for a dummy constant so the
step becomes a no-op (`model_interpolation.py:522-525`,
`model_garf.py:283-289`). Here `guard_nonfinite` zeroes the gradient tree
when any leaf is non-finite — same effect (no parameter motion, optimizer
state untouched by garbage), branchless and jit-safe.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from nerf_experiments_tpu.models.common import ParamGroup
from nerf_experiments_tpu.training.schedules import (
    garf_exponential,
    le_nice,
    quantized_exponential,
)


def multi_group_adam(
    groups: Dict[str, ParamGroup],
    labels,
    eps: float = 1e-5,
    schedule_kind: str = "le_nice",
    adam_b1: float = 0.9,
    adam_b2: float = 0.999,
    scheduler_steps_per_period: int = 1,
) -> optax.GradientTransformation:
    """Build the optimizer.

    groups: label -> ParamGroup hyperparameters.
    labels: pytree (same structure as params) of label strings, or a callable
            params -> labels for optax.multi_transform.
    schedule_kind: "le_nice" (clamped closed-form), "garf_exponential"
    (unclamped per-step), or "quantized_exponential" (gaborf's epoch-fraction
    staircase with `scheduler_steps_per_period` steps per LR update).
    """
    scheds = group_lr_schedules(groups, schedule_kind, scheduler_steps_per_period)
    transforms = {}
    for label, g in groups.items():
        sched = scheds[label]
        g_eps = eps if g.adam_eps is None else g.adam_eps
        chain = []
        if g.freeze_end_step > g.freeze_start_step:
            # Gate the grads, not just the LR: otherwise scale_by_adam keeps
            # accumulating mu/nu from ramp-noise gradients during the freeze
            # and the first post-unfreeze updates replay an EMA of exactly the
            # noise the freeze exists to exclude. With zeroed grads the Adam
            # moments decay toward 0 through the window instead.
            chain.append(
                _zero_grads_in_window(g.freeze_start_step, g.freeze_end_step)
            )
        chain.append(optax.scale_by_adam(b1=adam_b1, b2=adam_b2, eps=g_eps))
        if g.weight_decay:
            chain.append(optax.add_decayed_weights(g.weight_decay))
        chain.append(optax.scale_by_schedule(lambda s, _f=sched: -_f(s)))
        transforms[label] = optax.chain(*chain)
    return optax.multi_transform(transforms, labels)


def _zero_grads_in_window(lo: int, hi: int) -> optax.GradientTransformation:
    """Zero incoming updates while the internal step count is in [lo, hi)."""

    def init(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        del params
        inside = jnp.logical_and(state.count >= lo, state.count < hi)
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(inside, jnp.zeros_like(u), u), updates
        )
        return updates, optax.ScaleByScheduleState(
            count=optax.safe_int32_increment(state.count)
        )

    return optax.GradientTransformation(init, update)


def group_lr_schedules(
    groups: Dict[str, ParamGroup],
    schedule_kind: str = "le_nice",
    scheduler_steps_per_period: int = 1,
):
    """label -> closed-form LR schedule, exactly as the optimizer applies it.

    Also serves the LearningRateMonitor role (`barf/run_barf.py:139-141`):
    because schedules are pure functions of the step, the trainer can emit
    `lr_<group>` metric rows without touching optimizer state."""
    if schedule_kind == "le_nice":
        schedule_fn = le_nice
    elif schedule_kind == "garf_exponential":
        schedule_fn = garf_exponential
    elif schedule_kind == "quantized_exponential":
        schedule_fn = lambda a, b, c: quantized_exponential(
            a, b, c, scheduler_steps_per_period
        )
    else:
        raise ValueError(f"unknown schedule_kind {schedule_kind!r}")

    def build(g: ParamGroup):
        base = schedule_fn(
            g.learning_rate_start, g.learning_rate_stop, g.learning_rate_decay_end
        )
        if g.freeze_end_step <= g.freeze_start_step:
            return base
        lo, hi = g.freeze_start_step, g.freeze_end_step

        def frozen(step, _base=base, _lo=lo, _hi=hi):
            s = jnp.asarray(step)
            inside = jnp.logical_and(s >= _lo, s < _hi)
            return jnp.where(inside, 0.0, _base(step))

        return frozen

    return {label: build(g) for label, g in groups.items()}


def lr_row_fn(
    groups: Dict[str, ParamGroup],
    schedule_kind: str = "le_nice",
    scheduler_steps_per_period: int = 1,
):
    """(step) -> {"lr_<group>": float} for the trainer's metric rows."""
    scheds = group_lr_schedules(groups, schedule_kind, scheduler_steps_per_period)
    return lambda step: {
        f"lr_{label}": float(s(step)) for label, s in scheds.items()
    }


def guard_nonfinite(grads):
    """Zero the whole gradient tree if ANY leaf contains a non-finite value."""
    leaves = jax.tree_util.tree_leaves(grads)
    ok = jnp.array(True)
    for leaf in leaves:
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(leaf)))
    return jax.tree_util.tree_map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads), ok


def constant_labels(params, label: str):
    """Label every leaf of a subtree with the same group label."""
    return jax.tree_util.tree_map(lambda _: label, params)
