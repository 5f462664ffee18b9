"""Pallas kernels for the hash-grid matmul table access.

The XLA `hashgrid.encode_matmul` path expresses the table access as one-hot
MXU matmuls (idx = hi * n_lo + lo factorizes the one-hot as a Kronecker
product — see `ops/hashgrid.py`), but XLA must MATERIALIZE the one-hot
operands through HBM: per 65536-row chunk the A matrix alone is
chunk x n_hi bf16 (8–64 MB), so the measured step time sits ~10x above the
FLOP floor. These kernels build A inside VMEM per row tile and feed the MXU
directly, so HBM traffic drops to the ids/contrib/feats streams.

Per level (reference semantics `2d-ingp/model.py:13-115`,
`3d-ingp/model.py:14-121` — this is only a faster lowering of the same
math):
  forward   feats[r] = table[idx_r]            = select_lo(A @ tbl)
  backward  dT[t]    = sum_{r: idx_r == t} c_r = A^T @ (onehot_lo * c)

Layout notes (TPU, mirroring the train-megakernel conventions that are
known-good under this tunnel's compiler):
  * hi/lo are PACKED as an (R, 8) int32 block (col 0 = hi, col 1 = lo) —
    8-lane blocks like the megakernel's rows8; single-lane column blocks
    are avoided.
  * the one-hot compare broadcasts the (TILE_R, 1) slice of the packed
    block against a lane iota to yield A (TILE_R, n_hi) in VMEM.
  * the lo-selection runs as F per-feature lane masks + lane reductions
    (F <= 8, cheap VPU work); feats are written as an (R, 8) lane-padded
    stats-style block and sliced outside.
  * dtable accumulates into a FLAT (F*n_hi, n_lo) f32 output across
    sequential grid steps (TPU grids are sequential); un-interleaved to
    (rows, F) outside the kernel (table-sized reshape, cheap in XLA).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F_PAD = 8  # feats output lane pad (stats-block style)


def _tile_rows(n_lo: int, n_feat: int) -> int:
    """Row-tile size bounded by VMEM: the fp32 M1 intermediate is
    TILE_R x (n_lo*F) — cap it at ~2 MB so the kernel (with its inputs,
    one-hot A, and double buffering) stays inside the ~16 MB VMEM. An
    oversized tile crashes the remote Mosaic compile (observed as an
    opaque HTTP 500 from the tunnel's compile helper at F=8)."""
    cap = (2 * 1024 * 1024) // (n_lo * n_feat * 4)
    return max(256, min(4096, (cap // 256) * 256))


def _default_interpret() -> bool:
    """Compiled on TPU; interpret-mode elsewhere (tests on CPU)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except RuntimeError:
        return True


def _fwd_kernel(ids_ref, tbl_ref, out_ref, *, n_hi, n_lo, n_feat,
                compute_dtype):
    hi = ids_ref[:, 0:1]                             # (TILE_R, 1) int32
    lo = ids_ref[:, 1:2]                             # (TILE_R, 1) int32
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, n_hi), 1)
    a = (hi == iota_hi).astype(compute_dtype)        # (TILE_R, n_hi)
    m1 = jnp.dot(a, tbl_ref[:], preferred_element_type=jnp.float32)
    # (TILE_R, n_lo * n_feat); select column lo*F + f per feature.
    # NOTE width-tiling M1 (to keep 2048-row tiles at F=8) was tried and
    # rejected on this compiler: unrolled chunks keep every chunk's f32
    # intermediate live (33-38 MB scoped VMEM vs the 16 MB limit), a
    # fori_loop serializes and runs 19.4k rays/s e2e (vs 37.9k for this
    # shape), and bf16 matmul accumulation is rejected ("Expected matmul
    # acc to be 32-bit"). The VMEM-budgeted ROW tile (_tile_rows) is the
    # best compiling point; at F=2 it keeps 2048-row tiles and wins
    # 1.6-4.0x over the XLA lowering (RESULTS.md).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_lo * n_feat), 1)
    cols = [
        jnp.sum(jnp.where(lane == lo * n_feat + f, m1, 0.0),
                axis=1, keepdims=True)
        for f in range(n_feat)
    ]
    cols += [jnp.zeros_like(cols[0])] * (_F_PAD - n_feat)
    out_ref[:] = jnp.concatenate(cols, axis=1)


def _dtable_kernel(ids_ref, c_ref, out_ref, *, n_hi, n_lo, n_feat,
                   compute_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    hi = ids_ref[:, 0:1]
    lo = ids_ref[:, 1:2]
    c = c_ref[:]                                     # (TILE_R, 8) f32
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, n_hi), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, n_lo), 1)
    a = (hi == iota_hi).astype(compute_dtype)        # (TILE_R, n_hi)
    onehot_lo = lo == iota_lo                        # (TILE_R, n_lo) bool
    for f in range(n_feat):
        e = jnp.where(onehot_lo, c[:, f:f + 1], 0.0).astype(compute_dtype)
        # dT_f (n_hi, n_lo) = A^T @ E — contract the row dimension
        d = jax.lax.dot_general(
            a, e, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[f * n_hi:(f + 1) * n_hi, :] += d


def _pack_ids(idx, pad_rows, n_lo, n_hi):
    """(R,) flat rows -> (R+pad, 8) int32 [hi, lo, 0...]; padded rows get
    hi = n_hi (matches no one-hot lane, contributes nothing anywhere)."""
    idx_p = jnp.pad(idx, (0, pad_rows), constant_values=n_hi * n_lo)
    hi = (idx_p // n_lo).astype(jnp.int32)
    lo = (idx_p % n_lo).astype(jnp.int32)
    zeros = jnp.zeros_like(hi)
    return jnp.stack([hi, lo] + [zeros] * 6, axis=1)


def level_matmul_fwd_pallas(table_l, idx, t_eff, n_hi, n_lo,
                            compute_dtype=jnp.bfloat16, interpret=None):
    """table_l (T, F), idx (R,) int32 -> feats (R, F) f32.

    Same contract as `hashgrid._level_matmul_fwd` (minus the unused w arg);
    `n_hi * n_lo >= t_eff` with idx < t_eff guaranteed by the caller.
    """
    if interpret is None:
        interpret = _default_interpret()
    T, F = table_l.shape
    tile_r = _tile_rows(n_lo, F)
    tbl = jnp.zeros((n_hi * n_lo, F), compute_dtype).at[:t_eff].set(
        table_l[:t_eff].astype(compute_dtype)).reshape(n_hi, n_lo * F)
    R = idx.shape[0]
    pad = (-R) % tile_r
    ids = _pack_ids(idx, pad, n_lo, n_hi)
    grid = ((R + pad) // tile_r,)
    feats = pl.pallas_call(
        functools.partial(_fwd_kernel, n_hi=n_hi, n_lo=n_lo, n_feat=F,
                          compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_hi, n_lo * F), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, _F_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R + pad, _F_PAD), jnp.float32),
        interpret=interpret,
    )(ids, tbl)
    return feats[:R, :F]


def level_matmul_dtable_pallas(idx, contrib, t_eff, table_rows, n_hi, n_lo,
                               compute_dtype=jnp.bfloat16, interpret=None):
    """idx (R,) int32, contrib (R, F) f32 -> dT (table_rows, F) f32.

    Same contract as `hashgrid._level_matmul_dtable`.
    """
    if interpret is None:
        interpret = _default_interpret()
    R, F = contrib.shape
    tile_r = _tile_rows(n_lo, F)
    pad = (-R) % tile_r
    ids = _pack_ids(idx, pad, n_lo, n_hi)
    c_p = jnp.zeros((R + pad, _F_PAD), jnp.float32).at[:R, :F].set(
        contrib.astype(jnp.float32))
    grid = ((R + pad) // tile_r,)
    acc = pl.pallas_call(
        functools.partial(_dtable_kernel, n_hi=n_hi, n_lo=n_lo, n_feat=F,
                          compute_dtype=compute_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_r, _F_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((F * n_hi, n_lo), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F * n_hi, n_lo), jnp.float32),
        interpret=interpret,
    )(ids, c_p)
    # (F*n_hi, n_lo) -> rows-major (n_hi*n_lo, F)
    dt = jnp.transpose(acc.reshape(F, n_hi, n_lo), (1, 2, 0)).reshape(
        n_hi * n_lo, F)
    if dt.shape[0] < table_rows:
        dt = jnp.pad(dt, ((0, table_rows - dt.shape[0]), (0, 0)))
    return dt[:table_rows]
