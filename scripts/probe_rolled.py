"""Probe: encode_rolled vs fused/matmul at the INGP bench workload.

Measures (device->host-synced, tunnel gotcha):
  1. isolated encode fwd and fwd+bwd for each encoder at the bench shapes
     (262,144 points, L=4, F=8) across table sizes;
  2. the rolled backward's two scatter strategies (sorted segment-sum vs
     XLA .at[].add) in isolation;
  3. the full INGP train step (bench_ingp config) for each encoder.

Env: P_STEPS (20), P_POINTS (262144), P_TABLES ("8192,16384,65536").
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.ops import hashgrid

STEPS = int(os.environ.get("P_STEPS", 20))
POINTS = int(os.environ.get("P_POINTS", 262144))
TABLES = [int(t) for t in os.environ.get("P_TABLES", "8192,16384,65536").split(",")]


def timed(fn, *args):
    r = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.ravel(a)[0]), r)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = fn(*args)
    jax.tree_util.tree_map(lambda a: float(jnp.ravel(a)[0]), r)
    return 1000 * (time.perf_counter() - t0) / STEPS


def main():
    out = {}
    x = jax.random.uniform(jax.random.PRNGKey(1), (POINTS, 3))
    for T in TABLES:
        cfg = hashgrid.HashGridConfig(
            dim=3, n_levels=4, n_features=8, table_size=T,
            resolution_min=16, resolution_max=512)
        params = hashgrid.init(jax.random.PRNGKey(0), cfg)
        row = {}
        for name, enc in (
            ("fused", lambda p, x: hashgrid.encode_fused(p, cfg, x, jnp.bfloat16)),
            ("matmul", lambda p, x: hashgrid.encode_matmul(p, cfg, x, jnp.bfloat16)),
            ("rolled", lambda p, x: hashgrid.encode_rolled(p, cfg, x, jnp.bfloat16)),
        ):
            try:
                fwd = jax.jit(lambda p, xx, e=enc: e(p, xx).sum())
                row[f"{name}_fwd_ms"] = round(timed(fwd, params, x), 2)
                bwd = jax.jit(jax.grad(
                    lambda p, xx, e=enc: (e(p, xx) ** 2).sum()))
                row[f"{name}_fwdbwd_ms"] = round(timed(bwd, params, x), 2)
            except Exception as e:  # noqa: BLE001
                row[f"{name}_error"] = str(e)[:200]
        out[f"T{T}"] = row
        print(json.dumps({f"T{T}": row}), flush=True)

    # scatter-strategy isolation at T=16384 (L*T rows, wide payload)
    T = 16384
    M, W = 4 * T, 64
    idx = jax.random.randint(jax.random.PRNGKey(2), (4 * POINTS,), 0, M)
    g = jax.random.normal(jax.random.PRNGKey(3), (4 * POINTS, W), jnp.float32)

    def sorted_scatter(idx, g):
        order = jnp.argsort(idx)
        return jax.ops.segment_sum(g[order], idx[order], num_segments=M,
                                   indices_are_sorted=True)

    def add_scatter(idx, g):
        return jnp.zeros((M, W), jnp.float32).at[idx].add(g)

    out["scatter_sorted_ms"] = round(timed(jax.jit(sorted_scatter), idx, g), 2)
    out["scatter_add_ms"] = round(timed(jax.jit(add_scatter), idx, g), 2)
    print(json.dumps({"scatter": {k: out[k] for k in
                                  ("scatter_sorted_ms", "scatter_add_ms")}}),
          flush=True)

    # full train step per encoder (bench_ingp config)
    import bench

    for name, enc, F in (("matmul", "matmul", 8), ("rolled", "rolled", 8),
                         ("rolled_f4", "rolled", 4)):
        try:
            r = bench.bench_ingp(4096, STEPS, jnp.bfloat16, n_levels=4,
                                 n_features=F, table_size=16384, encoder=enc)
            out[f"step_{name}"] = r
            print(json.dumps({f"step_{name}": r}), flush=True)
        except Exception as e:  # noqa: BLE001
            out[f"step_{name}_error"] = str(e)[:300]
            print(json.dumps({f"step_{name}_error": out[f"step_{name}_error"]}),
                  flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
