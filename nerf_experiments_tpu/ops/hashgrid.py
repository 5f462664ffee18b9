"""Multiresolution hash-grid encoding (Instant-NGP style), 2-D and 3-D.

Semantics from `2d-ingp/model.py:13-115` and `3d-ingp/model.py:14-121`:
  * per-level table of (table_size, n_features), init U(-1e-4, 1e-4);
  * BIJECTIVE dense indexing when table_size >= (res+1)^d — index =
    sum(corner_i * (res+1)^i); otherwise spatial hash
    xor(pi_i * x_i) mod table_size with primes (1, 2654435761, 805459861);
  * 2^d corner gather with multilinear interpolation weights prod(1 - |dx|);
  * geometric level progression b = exp((ln r_max - ln r_min)/(L-1)),
    per-level resolution floor(r_min * b^l).

TPU design — three encoders over one stacked (L, T, F) table parameter:
  * `encode` / `encode_fused`: reference xor-hash semantics with FLATTENED
    1-D gathers (multi-dim indexed gathers trip a pathological ~300s
    libtpu compile — see `ops/sampling.py:take_along_last`); backward is
    XLA's scatter-add into the table.
  * `encode_matmul`: gather-free factorized one-hot MXU path (both table
    access directions as matmuls) — xor semantics, wins at small tables.
  * `encode_rolled` (the r5 TPU fast path): ADDITIVE hash, one pre-rolled
    wide-row gather per point per level — 8x fewer gather transactions;
    bijective levels bit-identical to `encode`. See its design note below.
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


# ----------------------------------------------------------------- matmul
# Encode-as-matmul: the gather/scatter-free TPU path. The per-row one-hot
# over table rows factorizes through idx = hi * n_lo + lo as
# onehot_T(idx) = onehot_hi(hi) (x) onehot_lo(lo), so both directions of
# the table access become MXU matmuls:
#   forward   feats = onehot @ T           -> M1 = A @ T.reshape(n_hi, n_lo*F)
#                                             feats[i,f] = sum_l B[i,l] M1[i,l,f]
#   backward  dT = onehot^T @ contrib      -> dT += A^T @ (B (*) contrib)
# FLOPs are 2*R*T_eff*F per direction per level — T_eff times the
# information floor of a gather, but they run at MXU pace (~114 TFLOP/s on
# this chip) instead of the ~3 ns/row transaction pace of XLA's dynamic
# gather, and the backward replaces XLA's serializing scatter-add entirely
# (measured the dominant INGP cost: step time tracks level count —
# RESULTS.md INGP study). Bijective levels use their true (res+1)^d row
# count, so low-res levels are nearly free.
def _matmul_factors(t_eff: int) -> Tuple[int, int]:
    """(n_hi, n_lo) with n_hi * n_lo >= t_eff, MXU-friendly dims."""
    n_lo = 128 if t_eff <= 16384 else 256
    n_hi = -(-t_eff // n_lo)
    n_hi = ((n_hi + 7) // 8) * 8  # sublane-align the hi dimension
    return n_hi, n_lo


def _effective_rows(cfg: HashGridConfig, resolution: int) -> int:
    return min((resolution + 1) ** cfg.dim, cfg.table_size) \
        if cfg.bijective(resolution) else cfg.table_size


def _use_pallas_hash() -> bool:
    """Opt-in Pallas lowering of the matmul table access (builds the one-hot
    operands in VMEM instead of materializing them through HBM).

    MEASURED (v5e, 2M rows, scripts/probe_hash_pallas.py): the Pallas
    FORWARD is 1.6x (T=8192/16384) to 4.0x (T=65536) faster than the XLA
    scan and nearly table-size-independent (7.9-8.3 ms); the Pallas dtable
    is 2x SLOWER than XLA's chunked scan (per-grid-step accumulator RMW
    dominates its small GEMMs), so NETPU_PALLAS_HASH=1 selects the HYBRID:
    Pallas forward + XLA transpose."""
    import os

    return os.environ.get("NETPU_PALLAS_HASH", "0") == "1"


def _level_matmul_fwd(table_l, idx, w, t_eff, chunk, compute_dtype):
    """table_l (T, F), idx/w (R,) flat rows -> feats (R, F) compute_dtype
    (the gathered rows; the caller applies the interpolation weight)."""
    T, F = table_l.shape
    n_hi, n_lo = _matmul_factors(t_eff)
    if _use_pallas_hash():
        from nerf_experiments_tpu.ops import hashgrid_pallas

        feats = hashgrid_pallas.level_matmul_fwd_pallas(
            table_l, idx, t_eff, n_hi, n_lo,
            compute_dtype=compute_dtype)
        return feats.astype(compute_dtype)
    # only the first t_eff rows are ever indexed at this level (bijective
    # levels use (res+1)^d rows of the padded stacked table)
    tbl = jnp.zeros((n_hi * n_lo, F), compute_dtype).at[:t_eff].set(
        table_l[:t_eff].astype(compute_dtype)).reshape(n_hi, n_lo * F)
    R = idx.shape[0]
    pad = (-R) % chunk
    idx_p = jnp.pad(idx, (0, pad))
    hi = (idx_p // n_lo).reshape(-1, chunk)
    lo = (idx_p % n_lo).reshape(-1, chunk)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, n_hi), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, n_lo), 1)

    def body(_, hl):
        h, l = hl
        A = (h[:, None] == iota_hi).astype(compute_dtype)          # (c, n_hi)
        M1 = jnp.dot(A, tbl, preferred_element_type=jnp.float32)   # (c, n_lo*F)
        B = (l[:, None] == iota_lo)                                # (c, n_lo)
        feats = jnp.sum(
            jnp.where(B[:, :, None], M1.reshape(chunk, n_lo, F), 0.0), axis=1)
        return None, feats.astype(compute_dtype)

    _, feats = jax.lax.scan(body, None, (hi, lo))
    feats = feats.reshape(-1, F)[:R]
    return feats


def _level_matmul_dtable(idx, contrib, t_eff, table_rows, chunk, compute_dtype):
    """Transpose direction: dT (table_rows, F) fp32 = onehot(idx)^T @ contrib."""
    F = contrib.shape[-1]
    n_hi, n_lo = _matmul_factors(t_eff)
    # NOTE: no Pallas branch here — the measured hybrid keeps XLA for the
    # transpose direction (see _use_pallas_hash docstring); the Pallas
    # dtable kernel remains available in hashgrid_pallas for benchmarking.
    R = idx.shape[0]
    pad = (-R) % chunk
    idx_p = jnp.pad(idx, (0, pad))
    c_p = jnp.pad(contrib, ((0, pad), (0, 0)))
    hi = (idx_p // n_lo).reshape(-1, chunk)
    lo = (idx_p % n_lo).reshape(-1, chunk)
    cc = c_p.reshape(-1, chunk, F)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, n_hi), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, n_lo), 1)

    def body(acc, hlc):
        h, l, c = hlc
        A = (h[:, None] == iota_hi).astype(compute_dtype)           # (c, n_hi)
        E = jnp.where((l[:, None] == iota_lo)[:, :, None],
                      c[:, None, :].astype(jnp.float32), 0.0)       # (c, n_lo, F)
        acc = acc + jnp.dot(A.T, E.reshape(chunk, n_lo * F).astype(compute_dtype),
                            preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((n_hi, n_lo * F), jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (hi, lo, cc))
    dt = acc.reshape(n_hi * n_lo, F)
    if dt.shape[0] < table_rows:  # bijective level: pad to the stacked table
        dt = jnp.pad(dt, ((0, table_rows - dt.shape[0]), (0, 0)))
    return dt[:table_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _matmul_interp(table, idx, w, t_effs, table_rows, chunk=65536,
                   compute_dtype=jnp.bfloat16):
    """Same contract as _gather_interp — table (L, T, F), idx/w (L, B, C) ->
    (L, B, F) fp32 — but both table-access directions are MXU matmuls."""
    out, _ = _matmul_interp_fwd(table, idx, w, t_effs, table_rows, chunk,
                                compute_dtype)
    return out


def _matmul_interp_fwd(table, idx, w, t_effs, table_rows, chunk, compute_dtype):
    L, T, F = table.shape
    B, C = idx.shape[1], idx.shape[2]
    outs, feats_all = [], []
    for l in range(L):
        feats = _level_matmul_fwd(
            table[l], idx[l].reshape(-1), w[l].reshape(-1), t_effs[l],
            chunk, compute_dtype)                                   # (R, F)
        feats_all.append(feats)
        fw = feats.astype(jnp.float32).reshape(B, C, F) \
            * w[l][..., None].astype(jnp.float32)
        outs.append(jnp.sum(fw, axis=1))
    return jnp.stack(outs), (jnp.stack(feats_all), idx, w)


def _matmul_interp_bwd(t_effs, table_rows, chunk, compute_dtype, res, g):
    feats_all, idx, w = res
    L = idx.shape[0]
    B, C = idx.shape[1], idx.shape[2]
    F = feats_all.shape[-1]
    dts, dws = [], []
    for l in range(L):
        contrib = (w[l][..., None].astype(jnp.float32)
                   * g[l][:, None, :].astype(jnp.float32)).reshape(-1, F)
        dts.append(_level_matmul_dtable(
            idx[l].reshape(-1), contrib, t_effs[l], table_rows,
            chunk, compute_dtype))
        dws.append(jnp.sum(
            feats_all[l].astype(jnp.float32).reshape(B, C, F)
            * g[l][:, None, :].astype(jnp.float32), axis=-1))
    dt = jnp.stack(dts)
    return dt, None, jnp.stack(dws).astype(w.dtype)


_matmul_interp.defvjp(_matmul_interp_fwd, _matmul_interp_bwd)


# ----------------------------------------------------------------- rolled
# Encode via ONE wide gather per point per level — the TPU-native fast path.
#
# The xor spatial hash makes every corner's table row independent, so the
# gather/matmul paths above pay for 2^d separate NARROW row accesses per
# point per level (8.4M 4-16 B rows at the 3-D bench workload — exactly the
# access pattern TPU gathers are worst at: cost is per-row transactions).
# Replacing the xor mix with an ADDITIVE hash (Σ x_i·p_i mod T, same primes;
# T is a power of two so uint32 wraparound is exactly compatible with the
# mod) makes the 2^d corner indices (base + δ_c) mod T with FIXED per-level
# offsets δ_c = Σ c_i·p_i mod T. Pre-rolling the level table by each δ_c and
# concatenating along features gives tblcat (T, 2^d·F) where one row holds
# ALL corner features for a point: the encode becomes a single gather of a
# wide (2^d·F = 64-byte bf16 at F=8, d=3) row per point per level — 8x fewer
# transactions, each wide enough to run at HBM bandwidth. Bijective levels
# are ALREADY additive (strided sums, `2d-ingp/model.py:22-31`), so their
# indices — and hence their output — are bit-identical to `encode`; only
# hashed levels change hash family (quality revalidated: see RESULTS.md).
# Backward: dtblcat via sorted-segment-sum over point rows; dtable flows
# through the rolls (XLA autodiff of jnp.roll = inverse roll, cheap).
# Semantics source: `3d-ingp/model.py:58-121`, `2d-ingp/model.py:13-115`.
def _rolled_level_base_and_deltas(cfg: HashGridConfig, resolution: int,
                                  x_floor: jnp.ndarray):
    """x_floor (B, d) int32 -> (base (B,) int32 rows into the level's t_eff
    rows, deltas (2^d,) static ints). Additive index: corner idx =
    (base + delta_c) mod t_eff (hashed) / + delta_c exactly (bijective)."""
    # corner bit c_i for corner c, in _corner_offsets' (dim-1 .. 0) bit order
    # — pure Python (deltas must be static under jit)
    def bit(c, i):
        return (c >> (cfg.dim - 1 - i)) & 1

    if cfg.bijective(resolution):
        strides = [(resolution + 1) ** i for i in range(cfg.dim)]
        base = sum(x_floor[:, i] * strides[i] for i in range(cfg.dim))
        deltas = [sum(bit(c, i) * strides[i] for i in range(cfg.dim))
                  for c in range(2 ** cfg.dim)]
        return base.astype(jnp.int32), deltas
    T = cfg.table_size  # power of two: uint32 wrap == mod-T compatible
    acc = x_floor[:, 0].astype(jnp.uint32) * jnp.uint32(cfg.primes[0])
    for i in range(1, cfg.dim):
        acc = acc + x_floor[:, i].astype(jnp.uint32) * jnp.uint32(cfg.primes[i])
    base = (acc % jnp.uint32(T)).astype(jnp.int32)
    deltas = [sum(bit(c, i) * cfg.primes[i] for i in range(cfg.dim)) % T
              for c in range(2 ** cfg.dim)]
    return base, deltas


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _rolled_gather(tbl2d, idx, compute_dtype, sorted_bwd=False):
    """tbl2d (M, W) -> rows (N, W) at compute_dtype; backward accumulates
    fp32 row contributions into the table. MEASURED (v5e, 1M x 64-f32 rows
    into 64k destinations, scripts/probe_rolled.py): plain XLA scatter-add
    17.9 ms vs argsort+permute+segment_sum 25.6 ms — with WIDE rows the
    scatter's collision serialization costs less than the sort's payload
    permutation, the opposite of the narrow-row regime that motivated
    encode_fused's sorted backward. Default is therefore the scatter;
    sorted_bwd=True keeps the sorted path for probes."""
    t = tbl2d if compute_dtype is None else tbl2d.astype(compute_dtype)
    return t[idx]


def _rolled_gather_fwd(tbl2d, idx, compute_dtype, sorted_bwd):
    return _rolled_gather(tbl2d, idx, compute_dtype, sorted_bwd), (tbl2d, idx)


def _rolled_gather_bwd(compute_dtype, sorted_bwd, res, g):
    tbl2d, idx = res
    M = tbl2d.shape[0]
    g = g.astype(jnp.float32)
    if sorted_bwd:
        # sort rows by destination: the permutation gather moves WIDE rows
        # (bandwidth-bound, fast) and the segment sum then sees sorted ids
        order = jnp.argsort(idx)
        dt = jax.ops.segment_sum(g[order], idx[order], num_segments=M,
                                 indices_are_sorted=True)
    else:
        dt = jnp.zeros((M, g.shape[1]), jnp.float32).at[idx].add(g)
    return dt.astype(tbl2d.dtype), None


_rolled_gather.defvjp(_rolled_gather_fwd, _rolled_gather_bwd)


def encode_rolled(
    params: Dict,
    cfg: HashGridConfig,
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """`encode` semantics with an additive hash and one wide-row gather per
    point per level (see the design note above). Bit-identical to `encode`
    on bijective levels; hashed levels use the additive hash family."""
    table = params["table"]  # (L, T, F)
    L, T, F = table.shape
    C = 2 ** cfg.dim
    if T & (T - 1):
        raise ValueError(
            "encode_rolled needs a power-of-two table_size (uint32 index "
            f"arithmetic is exact only when table_size | 2^32); got {T}")
    offsets = _corner_offsets(cfg.dim)

    bases, weights, cats = [], [], []
    for l, res in enumerate(cfg.level_resolutions):
        xs = x * res
        xf = jnp.floor(xs)
        base, deltas = _rolled_level_base_and_deltas(
            cfg, res, xf.astype(jnp.int32))
        t_eff = _effective_rows(cfg, res)
        # interpolation weights vs the (unclipped) corners, as in `encode`
        corners = xf[:, None, :] + offsets[None, :, :].astype(x.dtype)
        xd = jnp.abs(xs[:, None, :] - corners)
        weights.append(jnp.prod(1.0 - xd, axis=-1))  # (B, C)
        # tblcat_l: row b holds corner features [T[b+d0] | T[b+d1] | ...]
        live = table[l][:t_eff]
        cat = jnp.concatenate(
            [jnp.roll(live, -d, axis=0) for d in deltas], axis=1)  # (t_eff, C*F)
        if t_eff < T:
            cat = jnp.pad(cat, ((0, T - t_eff), (0, 0)))
        cats.append(cat)
        bases.append(base + l * T)

    tblcat = jnp.concatenate(cats, axis=0)          # (L*T, C*F)
    idx = jnp.concatenate(bases)                    # (L*B,)
    rows = _rolled_gather(tblcat, idx, compute_dtype)   # (L*B, C*F)
    B = x.shape[0]
    w = jnp.stack(weights)                          # (L, B, C)
    out = jnp.sum(rows.reshape(L, B, C, F).astype(jnp.float32)
                  * w[..., None].astype(jnp.float32), axis=2)  # (L, B, F)
    return jnp.moveaxis(out, 0, 1).reshape(B, L * F)


def encode_matmul(
    params: Dict,
    cfg: HashGridConfig,
    x: jnp.ndarray,
    compute_dtype=jnp.bfloat16,
    chunk: int = 65536,
) -> jnp.ndarray:
    """`encode` semantics with gather-free table access (see _matmul_interp).
    Reference semantics: `2d-ingp/model.py:13-115`, `3d-ingp/model.py:14-121`."""
    table = params["table"]
    L, T, F = table.shape
    offsets = _corner_offsets(cfg.dim)
    idx_all, w_all = [], []
    for l, res in enumerate(cfg.level_resolutions):
        xs = x * res
        xf = jnp.floor(xs)
        corners = xf[:, None, :].astype(jnp.int32) + offsets[None, :, :]
        idx_all.append(_level_indices(corners, res, cfg))
        xd = jnp.abs(xs[:, None, :] - corners.astype(x.dtype))
        w_all.append(jnp.prod(1.0 - xd, axis=-1))
    idx = jnp.stack(idx_all)
    w = jnp.stack(w_all)
    t_effs = tuple(_effective_rows(cfg, r) for r in cfg.level_resolutions)
    out = _matmul_interp(table, idx, w, t_effs, T, chunk, compute_dtype)
    return jnp.moveaxis(out, 0, 1).reshape(x.shape[0], L * F)
