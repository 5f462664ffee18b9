"""Sharded training steps: DP over rays (+optional TP) in two idioms.

1. `pjit_train_step` — sharding-annotated jit (the default): params live
   replicated (or model-sharded), the batch arrives data-sharded, XLA
   inserts the gradient all-reduce. Zero code difference from the
   single-chip step.
2. `shard_map_train_step` — explicit-collective shard_map variant: per-shard
   loss/grads with an explicit `psum` over the data axis, optimizer update
   computed identically on every device. Useful when XLA's propagation needs
   to be pinned down or when fusing custom collectives later.

Both produce bitwise-identical parameter trajectories to the single-chip
step when the global batch is identical (tested in tests/test_parallel.py).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from nerf_experiments_tpu.parallel.mesh import DATA_AXIS, batch_sharding
from nerf_experiments_tpu.training import optim as optim_lib


def pjit_train_step(train_step_fn: Callable, mesh, donate: bool = True):
    """Wrap an (unjitted) train_step(state, batch, *scalars) with sharding
    constraints on the batch; everything else follows by propagation."""
    b_sh = batch_sharding(mesh)

    def stepped(state, batch, *args):
        batch = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, b_sh), batch
        )
        return train_step_fn(state, batch, *args)

    return jax.jit(stepped, donate_argnums=(0,) if donate else ())


def sharded_render(forward_fn: Callable, mesh, chunk_pad: int = 0):
    """Whole-image rendering fanned across the mesh (SURVEY.md §5.8: eval
    fans image rays across chips; pixels gathered back).

    forward_fn(params, origs, dirs, pixel_width) -> rgb (N, 3). Returns
    render(params, origs, dirs, pixel_width) that shards the ray axis over
    "data", runs the forward SPMD, and returns a fully-replicated result
    (XLA inserts the all-gather). Ray count is padded to the data-axis size.
    """
    from nerf_experiments_tpu.parallel.mesh import batch_sharding, replicated

    b_sh = batch_sharding(mesh)
    r_sh = replicated(mesh)

    jitted = jax.jit(
        lambda params, o, d, pw: forward_fn(
            params,
            jax.lax.with_sharding_constraint(o, b_sh),
            jax.lax.with_sharding_constraint(d, b_sh),
            jax.lax.with_sharding_constraint(pw, b_sh),
        ),
        out_shardings=r_sh,
    )

    def render(params, origs, dirs, pixel_width):
        from nerf_experiments_tpu.parallel.mesh import data_axes

        n = origs.shape[0]
        n_batch_devices = 1
        for ax in data_axes(mesh):
            n_batch_devices *= mesh.shape[ax]
        pad = (-n) % n_batch_devices
        if pad:
            zpad = lambda x: jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
            )
            origs, dirs, pixel_width = zpad(origs), zpad(dirs), zpad(pixel_width)
        out = jitted(params, origs, dirs, pixel_width)
        return out[:n] if pad else out

    return render


def shard_map_train_step(loss_fn: Callable, tx: optax.GradientTransformation, mesh,
                         n_scalar_args: int):
    """Full train step with explicit collectives.

    loss_fn(params, batch, *scalars) -> (loss, metrics).
    Returns jitted step(state_params, opt_state, batch, *scalars).
    """
    from jax.sharding import PartitionSpec as P

    def per_shard(params, opt_state, batch, *args):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, *args
        )
        grads = jax.lax.pmean(grads, DATA_AXIS)
        grads, ok = optim_lib.guard_nonfinite(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        metrics = jax.tree_util.tree_map(lambda m: jax.lax.pmean(m, DATA_AXIS), metrics)
        return params, opt_state, loss, dict(metrics, grads_finite=ok)

    mapped = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), *([P()] * n_scalar_args)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0, 1))


def shard_map_train_step_fused(cfg, tx: optax.GradientTransformation, mesh,
                               donate: bool = True):
    """Data-parallel BARF mega-kernel step: every device runs the Pallas
    training kernel (`ops/train_megakernel.py`) on its ray shard; gradients
    pmean over the data axis; the optimizer update is computed identically
    on every device (replicated params stay bitwise-synchronized).

    Rays are independent, so the kernel needs NO cross-chip communication —
    the only collective is the gradient reduction, exactly SURVEY §5.8's
    layout. Returns step(state, batch, key, alpha_pos, alpha_dir, sigma).
    """
    from jax.sharding import PartitionSpec as P

    from nerf_experiments_tpu.systems import barf as barf_sys

    def per_shard(state, batch, key, a_pos, a_dir, sigma):
        return barf_sys.train_step_fused(
            state, cfg, tx, batch, key, a_pos, a_dir, sigma,
            axis_name=DATA_AXIS)

    mapped = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())
