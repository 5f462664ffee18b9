"""Probe: encode_matmul (gather-free factorized one-hot MXU path) vs
encode_fused (flattened bf16 gather + XLA scatter-add backward) on the real
chip, at the two bench INGP geometries (VERDICT r2 weak #2).

Measures fwd and fwd+bwd(table) wall time on the TPU; prints a JSON line per
(geometry, path). Env knobs: P_POINTS (default 262144 = 4096 rays x 64
samples), P_CHUNK (matmul row chunk), P_REPS.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.ops import hashgrid

POINTS = int(os.environ.get("P_POINTS", 262144))
CHUNK = int(os.environ.get("P_CHUNK", 65536))
REPS = int(os.environ.get("P_REPS", 5))

GEOMETRIES = {
    "ref_16x2": dict(n_levels=16, n_features=2),
    "wide_4x8": dict(n_levels=4, n_features=8),
}


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    # force a device->host transfer as the sync point (tunnel acks early)
    _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    ts = []
    for _i in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (POINTS, 3), minval=0.0, maxval=0.999)
    results = {}
    for name, geo in GEOMETRIES.items():
        cfg = hashgrid.HashGridConfig(dim=3, resolution_min=16,
                                      resolution_max=512, table_size=2**16,
                                      **geo)
        params = hashgrid.init(jax.random.PRNGKey(1), cfg)

        def loss_g(p):
            return jnp.sum(hashgrid.encode_fused(p, cfg, x, jnp.bfloat16) ** 2)

        def loss_m(p):
            return jnp.sum(hashgrid.encode_matmul(p, cfg, x,
                                                  jnp.bfloat16, CHUNK) ** 2)

        row = {}
        row["gather_fwd_ms"] = timeit(
            jax.jit(lambda p: hashgrid.encode_fused(p, cfg, x, jnp.bfloat16)),
            params) * 1e3
        row["gather_fwdbwd_ms"] = timeit(jax.jit(jax.grad(loss_g)), params) * 1e3
        row["matmul_fwd_ms"] = timeit(
            jax.jit(lambda p: hashgrid.encode_matmul(p, cfg, x,
                                                     jnp.bfloat16, CHUNK)),
            params) * 1e3
        row["matmul_fwdbwd_ms"] = timeit(jax.jit(jax.grad(loss_m)), params) * 1e3
        results[name] = {k: round(v, 2) for k, v in row.items()}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"points": POINTS, "chunk": CHUNK, **results}))


if __name__ == "__main__":
    main()
