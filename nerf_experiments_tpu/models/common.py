"""Shared building blocks for the pure-pytree model layer.

Models in this framework are (init, apply) pairs over plain dict pytrees —
no Module system. This keeps everything jit/pjit/shard_map-transparent and
makes param-group labeling for optax.multi_transform trivial.

Param groups reproduce `NerfBaseModel._add_param_group`
(`barf/model_interpolation_architecture.py:11-29`): every group carries
(learning_rate_start, learning_rate_stop, learning_rate_decay_end,
weight_decay) and the optimizer builds one schedule per group.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ParamGroup:
    """Hyperparameters of one optimizer param group (LeNice schedule knobs)."""

    learning_rate_start: float
    learning_rate_stop: float
    learning_rate_decay_end: int  # in steps; <=0 disables decay
    weight_decay: float = 0.0
    # None -> optimizer default. A LARGE eps (>> sqrt(v)) makes Adam updates
    # gradient-proportional (update ~ lr * g / eps) instead of
    # sign-normalized — used for camera extrinsics, where noise-level
    # photometric gradients must not turn into LR-sized random steps.
    adam_eps: float = None
    # Freeze window: LR forced to 0 for steps in [freeze_start_step,
    # freeze_end_step). Disabled when end <= start. Used to hold the camera
    # extrinsics still while the scene net crosses a known-destabilizing
    # phase (e.g. the gabor/sarf activation-anneal gamma ramp, which injects
    # photometric gradient noise that pushes converged cameras back out —
    # RESULTS.md, runs/quality_sarf_joint).
    freeze_start_step: int = 0
    freeze_end_step: int = 0


def linear_init(key: jax.Array, in_features: int, out_features: int, dtype=jnp.float32):
    """torch nn.Linear default init: W, b ~ U(-1/sqrt(in), 1/sqrt(in)).

    Stored as (in, out) so `x @ w + b` maps straight onto the MXU.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_features)
    return {
        "w": jax.random.uniform(kw, (in_features, out_features), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_features,), dtype, -bound, bound),
    }


def linear_apply(params, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """x @ W + b; optionally casts inputs/weights to a compute dtype (bf16)
    while accumulating in fp32 (preferred_element_type) for MXU throughput.

    With a compute dtype set, the OUTPUT is also stored in that dtype: the
    hot path is HBM-bandwidth-bound on activations, so halving their width
    matters more than the last bits of an already-fp32-accumulated matmul.
    Heads that need fp32 (density/rgb) cast back after the final layer.
    """
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = y + b
    return y.astype(compute_dtype) if compute_dtype is not None else y


def softplus8(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.Softplus(threshold=8): linear above 8 for stability."""
    return jnp.where(x > 8.0, x, jax.nn.softplus(jnp.minimum(x, 8.0)))


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
