"""Mosaic GEMM-chain MFU probe: one dependent 11-GEMM chain at ROWS rows
vs TWO interleaved independent chains at ROWS/2 each (same total FLOPs).

Question: is the mega-kernel's forward gap (56% MFU on a bare chain)
dependency-stall-bound — i.e., can cross-chain ILP hide the per-GEMM
relu/latency bubbles? If the interleaved variant wins >15%, restructure
the training kernel forward into paired half-tiles.

Env: ROWS (default 1024), D (256), N_GEMM (11), MODE (single|interleaved),
STEPS (50).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

f32 = jnp.float32
bf16 = jnp.bfloat16


def _mm(a, w):
    return jax.lax.dot_general(
        a.astype(bf16), w, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)


def _kernel_single(n_gemm, x_ref, *refs):
    w = [refs[i] for i in range(n_gemm)]
    o = refs[n_gemm]
    h = x_ref[:].astype(bf16)
    for i in range(n_gemm):
        h = jnp.maximum(_mm(h, w[i][:]), 0.0).astype(bf16)
    o[:] = h.astype(f32)


def _kernel_interleaved(n_gemm, x_ref, *refs):
    w = [refs[i] for i in range(n_gemm)]
    o = refs[n_gemm]
    x = x_ref[:]
    half = x.shape[0] // 2
    ha = x[:half].astype(bf16)
    hb = x[half:].astype(bf16)
    for i in range(n_gemm):
        za = _mm(ha, w[i][:])
        zb = _mm(hb, w[i][:])
        ha = jnp.maximum(za, 0.0).astype(bf16)
        hb = jnp.maximum(zb, 0.0).astype(bf16)
    o[:] = jnp.concatenate([ha, hb], axis=0).astype(f32)


def main():
    rows = int(os.environ.get("ROWS", 1024))
    d = int(os.environ.get("D", 256))
    n_gemm = int(os.environ.get("N_GEMM", 11))
    steps = int(os.environ.get("STEPS", 50))
    mode = os.environ.get("MODE", "single")
    grid = int(os.environ.get("GRID", 128))

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (grid * rows, d), f32)
    ws = [jax.random.normal(jax.random.fold_in(key, i), (d, d), f32)
          .astype(bf16) * 0.05 for i in range(n_gemm)]

    kern = (_kernel_single if mode == "single" else _kernel_interleaved)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    @jax.jit
    def f(x, *ws):
        return pl.pallas_call(
            functools.partial(kern, n_gemm),
            grid=(grid,),
            in_specs=[pl.BlockSpec((rows, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + [full(w.shape) for w in ws],
            out_specs=pl.BlockSpec((rows, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * rows, d), f32),
        )(x, *ws)

    out = f(x, *ws)
    float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(x, *ws)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / steps
    flops = 2 * grid * rows * d * d * n_gemm
    print(json.dumps({
        "mode": mode, "rows": rows, "d": d, "n_gemm": n_gemm, "grid": grid,
        "ms": round(1000 * dt, 3),
        "tflops": round(flops / dt / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
