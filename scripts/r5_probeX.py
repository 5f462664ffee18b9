"""Interim round-5 probes (run between queue A and B):
  1. INGP rolled full step with the scatter-add backward default
     (the A1 probe ran the sorted backward) + the F=4 arm;
  2. GARF fused blk4 at larger batches (amortization headroom).
Prints one JSON line per config."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

import bench

STEPS = int(os.environ.get("P_STEPS", 20))

for name, kwargs in (
    ("ingp_rolled_scatter", dict(n_levels=4, n_features=8, table_size=16384,
                                 encoder="rolled")),
    ("ingp_rolled_f4", dict(n_levels=4, n_features=4, table_size=16384,
                            encoder="rolled")),
    ("ingp_rolled_T8k", dict(n_levels=4, n_features=8, table_size=8192,
                             encoder="rolled")),
):
    try:
        r = bench.bench_ingp(4096, STEPS, jnp.bfloat16, **kwargs)
        print(json.dumps({name: r}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({f"{name}_error": str(e)[:300]}), flush=True)

for batch in (8192, 16384):
    try:
        r = bench.bench_garf(batch, STEPS, jnp.bfloat16, fused=True,
                             coarse_block=4)
        print(json.dumps({f"garf_fused_blk4_b{batch}": r}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({f"garf_blk4_b{batch}_error": str(e)[:300]}),
              flush=True)
