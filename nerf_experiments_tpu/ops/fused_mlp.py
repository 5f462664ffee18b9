"""Fused Pallas MLP chain: all activations stay in VMEM across layers.

The NeRF train step is HBM-bandwidth-bound: XLA writes/reads every (B*S, 256)
layer activation to HBM (13+ tensors per forward, 2x in backward). This
kernel runs an entire ReLU dense chain per batch tile with weights and
activations resident in VMEM — activation HBM traffic drops from
O(layers * B * width) to O(B * (D_in + D_out)) (tiny-cuda-nn's fully-fused
MLP, done the Pallas way).

Custom VJP: the backward kernel RECOMPUTES the forward per tile in VMEM
(free — it's the same on-chip GEMM chain), then backprops; dW/db accumulate
across the sequential TPU grid in revisited output blocks (initialized at
tile 0), so no atomics and no extra HBM roundtrips.

Used by `FusedNerfMLPDef` (systems/barf.py plug) to evaluate the segmented
NerfModel's segments + color head; the segment concats (hidden ⊕ pos_enc)
remain in XLA — 3 small HBM roundtrips instead of 13 large ones.

MEASURED STATUS (v5e, canonical BARF shapes): a single isolated chain beats
the equivalent XLA chain by ~1.4x (aligned dims), but inside the FULL train
step the pallas_call boundaries force chain inputs/outputs + separate bwd
kernels to materialize, losing more than VMEM residency gains — 19.3 ms vs
8.8 ms/step. XLA's whole-graph fusion is the better default here; this
kernel stays as a correct, tested opt-in (BENCH_FUSED_MLP=1) and the
starting point for a future mega-kernel that also fuses the encodings and
compositing per ray tile (that is where the remaining ~3x to speed-of-light
lives).
"""
from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_B = 512


def _dot(a, w, compute_dtype):
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        w = w.astype(compute_dtype)
        return jnp.dot(a, w, preferred_element_type=jnp.float32)
    return jnp.dot(a, w, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _dot_general(a, b, dims, compute_dtype):
    """Contraction without materialized transposes (in-kernel relayouts on
    TPU are expensive; let the MXU handle the operand orientation)."""
    if compute_dtype is not None:
        a = a.astype(compute_dtype)
        b = b.astype(compute_dtype)
        return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _fwd_kernel(n_layers, compute_dtype, *refs):
    # refs: x, w_0, b_0, ..., w_{L-1}, b_{L-1}, out
    x_ref = refs[0]
    out_ref = refs[1 + 2 * n_layers]
    h = x_ref[:]
    for i in range(n_layers):
        w = refs[1 + 2 * i][:]
        b = refs[2 + 2 * i][:]
        h = _dot(h, w, compute_dtype) + b
        if i < n_layers - 1:
            h = jax.nn.relu(h)
            if compute_dtype is not None:
                h = h.astype(compute_dtype)
    out_ref[:] = h.astype(out_ref.dtype)


def _bwd_kernel(n_layers, compute_dtype, *refs):
    # refs: x, w_0, b_0, ..., g, dx, dw_0, db_0, ...
    x_ref = refs[0]
    g_ref = refs[1 + 2 * n_layers]
    dx_ref = refs[2 + 2 * n_layers]
    dw_refs = [refs[3 + 2 * n_layers + 2 * i] for i in range(n_layers)]
    db_refs = [refs[4 + 2 * n_layers + 2 * i] for i in range(n_layers)]

    first_tile = pl.program_id(0) == 0

    # recompute forward, keeping pre-activation signs + activations in VMEM
    acts = [x_ref[:]]
    h = acts[0]
    for i in range(n_layers):
        w = refs[1 + 2 * i][:]
        b = refs[2 + 2 * i][:]
        z = _dot(h, w, compute_dtype) + b
        if i < n_layers - 1:
            h = jax.nn.relu(z)
            if compute_dtype is not None:
                h = h.astype(compute_dtype)
        else:
            h = z
        acts.append(h)

    # backprop
    g = g_ref[:].astype(jnp.float32)
    for i in range(n_layers - 1, -1, -1):
        a_prev = acts[i]
        # dW = a_prev^T @ g, contracted over the batch dim (no transpose)
        dw = _dot_general(a_prev, g, (((0,), (0,)), ((), ())), compute_dtype)
        db = jnp.sum(g, axis=0, keepdims=True)

        @pl.when(first_tile)
        def _(dw_ref=dw_refs[i], db_ref=db_refs[i], dw=dw, db=db):
            dw_ref[:] = dw
            db_ref[:] = db

        @pl.when(jnp.logical_not(first_tile))
        def _(dw_ref=dw_refs[i], db_ref=db_refs[i], dw=dw, db=db):
            dw_ref[:] = dw_ref[:] + dw
            db_ref[:] = db_ref[:] + db

        w = refs[1 + 2 * i][:]
        # g @ W^T, contracted over the output dim (no transpose)
        g = _dot_general(g, w, (((1,), (1,)), ((), ())), compute_dtype)
        if i > 0:
            # relu' of the PRE-activation == (post-activation > 0). Compare in
            # fp32: Mosaic rejects bf16 comparisons ("Target does not support
            # this comparison").
            g = g * (acts[i].astype(jnp.float32) > 0.0).astype(g.dtype)
    dx_ref[:] = g.astype(dx_ref.dtype)  # g is now dL/dx (no relu on the input)


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)


def _tile_spec(width):
    return pl.BlockSpec((TILE_B, width), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _run_fwd(x, flat_wb, dims, compute_dtype, interpret):
    n_layers = len(dims) - 1
    n = x.shape[0]
    grid = (pl.cdiv(n, TILE_B),)
    in_specs = [_tile_spec(dims[0])]
    for i in range(n_layers):
        in_specs += [_full_spec((dims[i], dims[i + 1])), _full_spec((1, dims[i + 1]))]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_layers, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=_tile_spec(dims[-1]),
        out_shape=jax.ShapeDtypeStruct((n, dims[-1]), jnp.float32),
        interpret=interpret,
    )(x, *flat_wb)


def _run_bwd(x, flat_wb, g, dims, compute_dtype, interpret):
    n_layers = len(dims) - 1
    n = x.shape[0]
    grid = (pl.cdiv(n, TILE_B),)
    in_specs = [_tile_spec(dims[0])]
    for i in range(n_layers):
        in_specs += [_full_spec((dims[i], dims[i + 1])), _full_spec((1, dims[i + 1]))]
    in_specs.append(_tile_spec(dims[-1]))

    out_specs = [_tile_spec(dims[0])]
    out_shapes = [jax.ShapeDtypeStruct((n, dims[0]), jnp.float32)]
    for i in range(n_layers):
        out_specs += [_full_spec((dims[i], dims[i + 1])), _full_spec((1, dims[i + 1]))]
        out_shapes += [
            jax.ShapeDtypeStruct((dims[i], dims[i + 1]), jnp.float32),
            jax.ShapeDtypeStruct((1, dims[i + 1]), jnp.float32),
        ]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_layers, compute_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(x, *flat_wb, g)


def _chain_impl(x, flat_wb, dims, compute_dtype, interpret):
    return _run_fwd(x, flat_wb, dims, compute_dtype, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _chain(x, flat_wb, dims, compute_dtype, interpret):
    return _chain_impl(x, flat_wb, dims, compute_dtype, interpret)


def _chain_fwd(x, flat_wb, dims, compute_dtype, interpret):
    return _chain_impl(x, flat_wb, dims, compute_dtype, interpret), (x, flat_wb)


def _chain_bwd(dims, compute_dtype, interpret, res, g):
    x, flat_wb = res
    outs = _run_bwd(x, flat_wb, g, dims, compute_dtype, interpret)
    dx = outs[0]
    dwb = []
    n_layers = len(dims) - 1
    for i in range(n_layers):
        dwb.append(outs[1 + 2 * i])
        dwb.append(outs[2 + 2 * i][0])  # (1, D) -> (D,)
    return dx, tuple(dwb)


_chain.defvjp(_chain_fwd, _chain_bwd)


def fused_chain(
    x: jnp.ndarray,
    layers: Sequence[dict],
    compute_dtype: Any = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """ReLU dense chain y = W_L(...relu(W_1 x + b_1)...) + b_L, fully fused.

    x (B, D_0); layers: [{"w": (D_{i-1}, D_i), "b": (D_i,)}]. Returns
    (B, D_L) float32. B is padded to the tile size internally.
    """
    dims = tuple([x.shape[-1]] + [l["w"].shape[-1] for l in layers])
    flat_wb = []
    for l in layers:
        flat_wb.append(l["w"].astype(jnp.float32))
        flat_wb.append(l["b"].astype(jnp.float32).reshape(1, -1))
    n = x.shape[0]
    pad = (-n) % TILE_B
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)], axis=0)
    out = _chain(x.astype(jnp.float32), tuple(flat_wb), dims, compute_dtype, interpret)
    return out[:n] if pad else out
