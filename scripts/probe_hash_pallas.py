"""Measure the Pallas hash-matmul lowering vs the XLA lax.scan lowering.

Three layers of measurement on the real chip:
  1. level primitives (fwd + dtable) at the bench row count;
  2. full encode_matmul fwd+bwd;
  3. the bench_ingp train step with NETPU_PALLAS_HASH=0/1.

Env: P_ROWS (2097152 = 262144 points x 8 corners), P_TABLES
("8192,16384,65536"), P_F (2), P_STEPS (20).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.ops import hashgrid, hashgrid_pallas

ROWS = int(os.environ.get("P_ROWS", 2097152))
TABLES = [int(t) for t in os.environ.get("P_TABLES", "8192,16384,65536").split(",")]
F = int(os.environ.get("P_F", 2))
STEPS = int(os.environ.get("P_STEPS", 20))


def timeit(fn, *args):
    # sync via device->host transfer: the tunnel acks block_until_ready
    # early (RESULTS.md header)
    out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / STEPS * 1000  # ms


def main():
    results = {}
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    for T in TABLES:
        n_hi, n_lo = hashgrid._matmul_factors(T)
        table_l = jax.random.normal(k1, (T, F))
        idx = jax.random.randint(k2, (ROWS,), 0, T)
        w = jnp.ones((ROWS,))
        contrib = jax.random.normal(k3, (ROWS, F))

        xla_fwd = jax.jit(lambda t, i, w_: hashgrid._level_matmul_fwd(
            t, i, w_, T, 65536, jnp.bfloat16))
        pl_fwd = jax.jit(lambda t, i: hashgrid_pallas.level_matmul_fwd_pallas(
            t, i, T, n_hi, n_lo, jnp.bfloat16, interpret=False))
        xla_dt = jax.jit(lambda i, c: hashgrid._level_matmul_dtable(
            i, c, T, T, 65536, jnp.bfloat16))
        pl_dt = jax.jit(lambda i, c: hashgrid_pallas.level_matmul_dtable_pallas(
            i, c, T, T, n_hi, n_lo, jnp.bfloat16, interpret=False))

        # force the XLA branch for the xla lambdas regardless of env
        os.environ["NETPU_PALLAS_HASH"] = "0"
        row = {
            "xla_fwd_ms": round(timeit(xla_fwd, table_l, idx, w), 3),
            "xla_dtable_ms": round(timeit(xla_dt, idx, contrib), 3),
        }
        os.environ["NETPU_PALLAS_HASH"] = "0"  # pallas fns called directly
        row["pallas_fwd_ms"] = round(timeit(pl_fwd, table_l, idx), 3)
        row["pallas_dtable_ms"] = round(timeit(pl_dt, idx, contrib), 3)
        results[f"T{T}"] = row
        print(json.dumps({f"T{T}": row}), flush=True)

    # full train-step comparison at the bench ingp_matmul config
    import bench

    for flag in ("0", "1"):
        os.environ["NETPU_PALLAS_HASH"] = flag
        try:
            r = bench.bench_ingp(4096, 10, jnp.bfloat16, samples=64,
                                 table_size=8192, encoder="matmul")
        except Exception as e:  # noqa: BLE001
            r = {"error": f"{type(e).__name__}: {e}"[:300]}
        results[f"bench_ingp_matmul_pallas{flag}"] = r
        print(json.dumps({f"bench_ingp_matmul_pallas{flag}": r}), flush=True)

    print(json.dumps({"rows": ROWS, "steps": STEPS, "results": results}))


if __name__ == "__main__":
    main()
