"""Multiresolution hash-grid encoding (Instant-NGP style), 2-D and 3-D.

Semantics from `2d-ingp/model.py:13-115` and `3d-ingp/model.py:14-121`:
  * per-level table of (table_size, n_features), init U(-1e-4, 1e-4);
  * BIJECTIVE dense indexing when table_size >= (res+1)^d — index =
    sum(corner_i * (res+1)^i); otherwise spatial hash
    xor(pi_i * x_i) mod table_size with primes (1, 2654435761, 805459861);
  * 2^d corner gather with multilinear interpolation weights prod(1 - |dx|);
  * geometric level progression b = exp((ln r_max - ln r_min)/(L-1)),
    per-level resolution floor(r_min * b^l).

TPU design: corner gathers are FLATTENED 1-D gathers (multi-dim indexed
gathers trip a pathological ~300s libtpu compile — see
`ops/sampling.py:take_along_last`); the backward pass is XLA's scatter-add
into the table. All levels share one stacked (L, T, F) table parameter;
`encode` walks the L levels in a small unrolled Python loop (levels differ
only in resolution, so XLA fuses the unrolled bodies — a vmap over the
stacked table was measured equivalent and the loop keeps the per-level
bijective/hash switch in Python).
"""
from __future__ import annotations

import dataclasses
import math
import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

DEFAULT_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    dim: int  # 2 or 3
    resolution_min: int = 16
    resolution_max: int = 512
    table_size: int = 2**16
    n_features: int = 2
    n_levels: int = 16
    primes: Tuple[int, ...] = DEFAULT_PRIMES

    @property
    def output_dim(self) -> int:
        return self.n_features * self.n_levels

    @property
    def level_resolutions(self) -> Tuple[int, ...]:
        if self.n_levels == 1:
            return (self.resolution_min,)
        b = math.exp(
            (math.log(self.resolution_max) - math.log(self.resolution_min))
            / (self.n_levels - 1)
        )
        return tuple(int(math.floor(self.resolution_min * b**l)) for l in range(self.n_levels))

    def bijective(self, resolution: int) -> bool:
        return self.table_size >= (resolution + 1) ** self.dim


def init(key: jax.Array, cfg: HashGridConfig) -> Dict:
    """One stacked table (L, T, F), U(-1e-4, 1e-4). Bijective levels only use
    the first (res+1)^d rows; rows are padded to table_size for stacking."""
    t = jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features), minval=-1e-4, maxval=1e-4
    )
    return {"table": t}


def _corner_offsets(dim: int) -> jnp.ndarray:
    """(2^d, d) binary corner offsets in the reference's idx_list order."""
    n = 2**dim
    bits = ((jnp.arange(n)[:, None] >> jnp.arange(dim - 1, -1, -1)[None, :]) & 1)
    return bits.astype(jnp.int32)


def _level_indices(
    corners: jnp.ndarray, resolution: int, cfg: HashGridConfig
) -> jnp.ndarray:
    """corners (B, 2^d, d) int32 -> table row indices (B, 2^d)."""
    if cfg.bijective(resolution):
        corners = jnp.clip(corners, 0, resolution)
        strides = jnp.array(
            [(resolution + 1) ** i for i in range(cfg.dim)], dtype=jnp.uint32
        )
        return jnp.sum(corners.astype(jnp.uint32) * strides, axis=-1).astype(jnp.int32)
    acc = corners[..., 0].astype(jnp.uint32) * jnp.uint32(cfg.primes[0])
    for i in range(1, cfg.dim):
        acc = jax.lax.bitwise_xor(
            acc, corners[..., i].astype(jnp.uint32) * jnp.uint32(cfg.primes[i])
        )
    return (acc % jnp.uint32(cfg.table_size)).astype(jnp.int32)


def _encode_level(
    table: jnp.ndarray, x: jnp.ndarray, resolution: int, cfg: HashGridConfig
) -> jnp.ndarray:
    """x (B, d) in [0,1]^d -> (B, F) multilinearly interpolated features."""
    x_scaled = x * resolution
    x_floor = jnp.floor(x_scaled)
    offsets = _corner_offsets(cfg.dim)  # (2^d, d)
    corners = (x_floor[:, None, :].astype(jnp.int32) + offsets[None, :, :])  # (B, 2^d, d)

    idx = _level_indices(corners, resolution, cfg)  # (B, 2^d)
    # gather with FLATTENED indices: multi-dim index gathers trip a ~400s
    # pathological compile in libtpu's AOT pipeline; 1-D gathers compile in
    # ~1s and lower to the same vectorized dynamic-gather
    n_corners = idx.shape[1]
    features = table[idx.reshape(-1)].reshape(-1, n_corners, cfg.n_features)

    x_diff = jnp.abs(x_scaled[:, None, :] - corners.astype(x.dtype))
    weights = jnp.prod(1.0 - x_diff, axis=-1)  # (B, 2^d)
    return jnp.sum(features * weights[..., None], axis=1)


def encode(params: Dict, cfg: HashGridConfig, x: jnp.ndarray) -> jnp.ndarray:
    """x (B, d) in [0,1]^d -> (B, L*F) concatenated level features."""
    outs = [
        _encode_level(params["table"][l], x, res, cfg)
        for l, res in enumerate(cfg.level_resolutions)
    ]
    return jnp.concatenate(outs, axis=-1)


# ------------------------------------------------------------------ fused
# TPU fast path. Measured on v5e at the 3-D bench workload (262,144 points,
# 16 levels, scripts/probe_ingp.py):
#   * ONE flattened gather across all levels (global row = l*T + idx_l)
#     instead of L separate gathers: fwd 359 -> 223 ms.
#   * gather from a bf16 view of the table: TPU dynamic-gather throughput
#     scales with row bytes moved (fp32 fwd 359 ms, bf16 101 ms).
#   * backward stays XLA's scatter-add but accumulates in fp32 regardless
#     of gather dtype. (A sort + segment_sum backward was tried and is 4x
#     WORSE — a 33M-element argsort costs more than the collisions.)
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gather_interp(table: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                   gather_dtype=None):
    """table (L, T, F), idx (L, B, C) int32 LOCAL per-level rows,
    w (L, B, C) -> (L, B, F) fp32.

    Forward: L per-level gathers at `gather_dtype` — a level's bf16 table
    slice is 256 KB, small enough that the gather runs out of fast memory
    (measured 101 ms vs 213 ms for one global (L*T, F) gather at the 3-D
    bench workload). Backward: L per-level fp32 scatter-adds — a single
    global scatter was measured ~4x slower still."""
    L, T, F = table.shape
    t = table if gather_dtype is None else table.astype(gather_dtype)
    feats = jnp.stack([
        t[l][idx[l].reshape(-1)].reshape(idx.shape[1:] + (F,))
        for l in range(L)
    ])
    return jnp.sum(
        feats.astype(jnp.float32) * w[..., None].astype(jnp.float32), axis=-2)


def _gather_interp_fwd(t, idx, w, gather_dtype):
    return _gather_interp(t, idx, w, gather_dtype), (t, idx, w)


def _gather_interp_bwd(gather_dtype, res, g):
    t, idx, w = res
    L, T, F = t.shape
    contrib = (w[..., None].astype(jnp.float32)
               * g[:, :, None, :].astype(jnp.float32))    # (L, B, C, F)
    dt = jnp.stack([
        jnp.zeros((T, F), jnp.float32).at[idx[l].reshape(-1)].add(
            contrib[l].reshape(-1, F))
        for l in range(L)
    ])
    tg = t if gather_dtype is None else t.astype(gather_dtype)
    feats = jnp.stack([
        tg[l][idx[l].reshape(-1)].reshape(idx.shape[1:] + (F,))
        for l in range(L)
    ])
    dw = jnp.sum(
        feats.astype(jnp.float32) * g[:, :, None, :].astype(jnp.float32),
        axis=-1).astype(w.dtype)
    return dt.astype(t.dtype), None, dw


_gather_interp.defvjp(_gather_interp_fwd, _gather_interp_bwd)


def encode_fused(
    params: Dict,
    cfg: HashGridConfig,
    x: jnp.ndarray,
    gather_dtype=None,
) -> jnp.ndarray:
    """`encode` semantics via one global gather. With gather_dtype=bf16 the
    gather moves half the bytes (3.5x faster on TPU); the table parameter
    and its gradient stay fp32 (the cast is elementwise and cheap)."""
    table = params["table"]  # (L, T, F)
    L, T, F = table.shape
    offsets = _corner_offsets(cfg.dim)
    idx_all, w_all = [], []
    for l, res in enumerate(cfg.level_resolutions):
        xs = x * res
        xf = jnp.floor(xs)
        corners = xf[:, None, :].astype(jnp.int32) + offsets[None, :, :]
        idx_all.append(_level_indices(corners, res, cfg))  # LOCAL rows
        xd = jnp.abs(xs[:, None, :] - corners.astype(x.dtype))
        w_all.append(jnp.prod(1.0 - xd, axis=-1))
    idx = jnp.stack(idx_all)                  # (L, B, 2^d)
    w = jnp.stack(w_all)
    out = _gather_interp(table, idx, w, gather_dtype)      # (L, B, F) fp32
    return jnp.moveaxis(out, 0, 1).reshape(x.shape[0], L * F)
