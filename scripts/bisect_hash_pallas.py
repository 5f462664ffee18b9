"""Bisect which construct in the hash-matmul Pallas kernels kills the
axon remote compiler (HTTP 500 with no Mosaic diagnostics).

Runs a ladder of minimal pallas_calls on the real chip, each in
try/except, printing one JSON line per stage. Shapes mirror the real
kernels at T=8192 (n_hi=64, n_lo=128, F=2) with a small R.
"""
import functools
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = int(os.environ.get("B_TILE", 512))
N_HI, N_LO, F = 64, 128, 2
R = TILE_R * 4


def run(name, fn):
    try:
        out = jax.jit(fn)()
        jnp.sum(jnp.asarray(out)).block_until_ready()
        s = float(jnp.sum(out))
        print(json.dumps({name: {"ok": True, "sum": round(s, 3)}}), flush=True)
    except Exception:
        err = traceback.format_exc(limit=3)[-500:]
        print(json.dumps({name: {"ok": False, "err": err}}), flush=True)


col_spec = pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
hi = jnp.zeros((R, 1), jnp.int32)
lo = jnp.zeros((R, 1), jnp.int32)
tbl = jnp.ones((N_HI, N_LO * F), jnp.bfloat16)
c = jnp.ones((R, F), jnp.float32)


def stage1_kernel(hi_ref, out_ref):
    # column int32 block + iota compare + cast
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, N_HI), 1)
    a = (hi_ref[:] == iota_hi).astype(jnp.bfloat16)
    out_ref[:] = jnp.sum(a.astype(jnp.float32), axis=1, keepdims=True)


run("s1_onehot_from_column", lambda: pl.pallas_call(
    stage1_kernel, grid=(R // TILE_R,),
    in_specs=[col_spec],
    out_specs=pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
)(hi))


def stage2_kernel(hi_ref, tbl_ref, out_ref):
    # one-hot @ table on the MXU
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, N_HI), 1)
    a = (hi_ref[:] == iota_hi).astype(jnp.bfloat16)
    m1 = jnp.dot(a, tbl_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.sum(m1, axis=1, keepdims=True)


run("s2_onehot_matmul", lambda: pl.pallas_call(
    stage2_kernel, grid=(R // TILE_R,),
    in_specs=[col_spec,
              pl.BlockSpec((N_HI, N_LO * F), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
)(hi, tbl))


def stage3_kernel(hi_ref, lo_ref, tbl_ref, out_ref):
    # full forward: lane select per feature + concat store
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, N_HI), 1)
    a = (hi_ref[:] == iota_hi).astype(jnp.bfloat16)
    m1 = jnp.dot(a, tbl_ref[:], preferred_element_type=jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N_LO * F), 1)
    lo_v = lo_ref[:]
    cols = [jnp.sum(jnp.where(lane == lo_v * F + f, m1, 0.0),
                    axis=1, keepdims=True) for f in range(F)]
    out_ref[:] = jnp.concatenate(cols, axis=1)


run("s3_full_fwd", lambda: pl.pallas_call(
    stage3_kernel, grid=(R // TILE_R,),
    in_specs=[col_spec, col_spec,
              pl.BlockSpec((N_HI, N_LO * F), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((TILE_R, F), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
)(hi, lo, tbl))


def stage4_kernel(hi_ref, lo_ref, c_ref, out_ref):
    # dtable with FLAT 2-D accumulator (F*n_hi, n_lo), static row slices
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, N_HI), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, N_LO), 1)
    a = (hi_ref[:] == iota_hi).astype(jnp.bfloat16)
    onehot_lo = lo_ref[:] == iota_lo
    cc = c_ref[:]
    for f in range(F):
        e = jnp.where(onehot_lo, cc[:, f:f + 1], 0.0).astype(jnp.bfloat16)
        d = jax.lax.dot_general(a, e, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[f * N_HI:(f + 1) * N_HI, :] += d


run("s4_dtable_flat2d", lambda: pl.pallas_call(
    stage4_kernel, grid=(R // TILE_R,),
    in_specs=[col_spec, col_spec,
              pl.BlockSpec((TILE_R, F), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((F * N_HI, N_LO), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((F * N_HI, N_LO), jnp.float32),
)(hi, lo, c))


def stage5_kernel(hi_ref, lo_ref, c_ref, out_ref):
    # dtable with 3-D accumulator (the shipped kernel's layout)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (1, N_HI), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (1, N_LO), 1)
    a = (hi_ref[:] == iota_hi).astype(jnp.bfloat16)
    onehot_lo = lo_ref[:] == iota_lo
    cc = c_ref[:]
    for f in range(F):
        e = jnp.where(onehot_lo, cc[:, f:f + 1], 0.0).astype(jnp.bfloat16)
        d = jax.lax.dot_general(a, e, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        out_ref[f] += d


run("s5_dtable_3d", lambda: pl.pallas_call(
    stage5_kernel, grid=(R // TILE_R,),
    in_specs=[col_spec, col_spec,
              pl.BlockSpec((TILE_R, F), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((F, N_HI, N_LO), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((F, N_HI, N_LO), jnp.float32),
)(hi, lo, c))


# --- the shipped (megakernel-convention) layout: packed (R, 8) ids ---
from nerf_experiments_tpu.ops import hashgrid_pallas  # noqa: E402

idx = jnp.zeros((R,), jnp.int32)
table_l = jnp.ones((N_HI * N_LO, F), jnp.float32)
contrib = jnp.ones((R, F), jnp.float32)

run("s6_shipped_fwd", lambda: hashgrid_pallas.level_matmul_fwd_pallas(
    table_l, idx, N_HI * N_LO, N_HI, N_LO, jnp.bfloat16, interpret=False))
run("s7_shipped_dtable", lambda: hashgrid_pallas.level_matmul_dtable_pallas(
    idx, contrib, N_HI * N_LO, N_HI * N_LO, N_HI, N_LO, jnp.bfloat16,
    interpret=False))

print(json.dumps({"done": True, "tile": TILE_R}))
