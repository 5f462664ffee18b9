"""Micro-probe: where do the INGP hash-grid milliseconds go on TPU?

bench.py r2 measured 966 ms/step (4.2k rays/s) for the 3-D INGP config —
pathological. This probe times, at the bench workload (262,144 points,
16 levels, 8 corners, table 2^16 x 2):
  1. encode fwd only
  2. encode fwd+bwd (isolates the scatter-add backward)
  3. gather-layout variants:
     a. per-level gathers from (T, 2)          [current]
     b. one fused gather from (L*T, 2) with global indices
     c. feature-padded table (T, 8)
     d. bf16 table
  4. backward variants: XLA scatter-add vs sort+segment_sum
Timings sync via float() (tunnel acks block_until_ready early).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.ops import hashgrid

B = int(os.environ.get("P_B", 262144))
cfg = hashgrid.HashGridConfig(dim=3, n_levels=16, n_features=2,
                              table_size=2**16, resolution_min=16,
                              resolution_max=512)
key = jax.random.PRNGKey(0)
params = hashgrid.init(key, cfg)
x = jax.random.uniform(jax.random.PRNGKey(1), (B, 3))


def timeit(name, fn, *args, n=10):
    r = fn(*args)
    r = jax.tree_util.tree_leaves(r)[0]
    float(r.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(jax.tree_util.tree_leaves(r)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt*1000:9.2f} ms")
    return dt


# 1. fwd only
fwd = jax.jit(lambda p, x: hashgrid.encode(p, cfg, x).sum())
timeit("encode fwd", fwd, params, x)

# 2. fwd+bwd (current scatter-add)
grad = jax.jit(jax.grad(lambda p, x: hashgrid.encode(p, cfg, x).sum()))
timeit("encode fwd+bwd", grad, params, x)


# 3b. fused single gather across levels
def encode_fused(p, x):
    table = p["table"]  # (L, T, F)
    L, T, F = table.shape
    flat = table.reshape(L * T, F)
    idx_all = []
    w_all = []
    for l, res in enumerate(cfg.level_resolutions):
        xs = x * res
        xf = jnp.floor(xs)
        off = hashgrid._corner_offsets(cfg.dim)
        corners = xf[:, None, :].astype(jnp.int32) + off[None, :, :]
        idx = hashgrid._level_indices(corners, res, cfg) + l * T
        xd = jnp.abs(xs[:, None, :] - corners.astype(x.dtype))
        w = jnp.prod(1.0 - xd, axis=-1)
        idx_all.append(idx)
        w_all.append(w)
    idx = jnp.stack(idx_all, 0).reshape(-1)        # (L*B*8,)
    w = jnp.stack(w_all, 0)                        # (L, B, 8)
    feats = flat[idx].reshape(L, B, 8, F)
    out = jnp.sum(feats * w[..., None], axis=2)    # (L, B, F)
    return jnp.moveaxis(out, 0, 1).reshape(B, L * F)


fused = jax.jit(lambda p, x: encode_fused(p, x).sum())
timeit("fused-gather fwd", fused, params, x)
gfused = jax.jit(jax.grad(lambda p, x: encode_fused(p, x).sum()))
timeit("fused-gather fwd+bwd", gfused, params, x)

# 3c. feature-padded (T, 8) table
cfg8 = hashgrid.HashGridConfig(dim=3, n_levels=16, n_features=8,
                               table_size=2**16, resolution_min=16,
                               resolution_max=512)
params8 = hashgrid.init(key, cfg8)
fwd8 = jax.jit(lambda p, x: hashgrid.encode(p, cfg8, x).sum())
timeit("F=8 fwd", fwd8, params8, x)
grad8 = jax.jit(jax.grad(lambda p, x: hashgrid.encode(p, cfg8, x).sum()))
timeit("F=8 fwd+bwd", grad8, params8, x)

# 3d. bf16 table
pb = {"table": params["table"].astype(jnp.bfloat16)}
fwdb = jax.jit(lambda p, x: hashgrid.encode(p, cfg, x).sum())
timeit("bf16 fwd", fwdb, pb, x)


# 4. sort+segment backward for ONE level (cost model for the alternative)
def seg_backward(g, idx):
    # g (B*8, F) cotangents, idx (B*8,) table rows
    order = jnp.argsort(idx)
    return jax.ops.segment_sum(g[order], idx[order], num_segments=cfg.table_size)


g_ct = jax.random.normal(jax.random.PRNGKey(2), (B * 8, 2))
idx1 = jax.random.randint(jax.random.PRNGKey(3), (B * 8,), 0, cfg.table_size)
segf = jax.jit(seg_backward)
timeit("sort+segment_sum (1 level)", segf, g_ct, idx1)


def scat_backward(g, idx):
    z = jnp.zeros((cfg.table_size, 2))
    return z.at[idx].add(g)


scatf = jax.jit(scat_backward)
timeit("scatter-add (1 level)", scatf, g_ct, idx1)

# unsorted segment_sum
segu = jax.jit(functools.partial(jax.ops.segment_sum,
                                 num_segments=cfg.table_size))
timeit("segment_sum unsorted (1 level)", segu, g_ct, idx1)
