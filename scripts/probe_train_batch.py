"""Train-step throughput vs batch size for the headline configs.

The fused north-star configs have only been benched at 8192; serving
showed larger batches amortize fixed overhead (prop16@16384 = 1.83M).
This measures the blk4/blk1 TRAIN step at 8192/16384/32768 to see whether
the same amortization applies to training (regalloc chokepoint permitting).

Env: P_BATCHES ("8192,16384,32768"), P_STEPS (20).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

BATCHES = [int(b) for b in os.environ.get("P_BATCHES", "8192,16384,32768").split(",")]
STEPS = int(os.environ.get("P_STEPS", 20))

results = {}
for occ in (False, True):
    for blk in (1, 4):
        for b in BATCHES:
            name = f"{'occ' if occ else 'prop'}_S32_blk{blk}_b{b}"
            try:
                r = bench.bench_barf(b, 32, STEPS, jnp.bfloat16, fused=True,
                                     proposal=not occ, occ=occ,
                                     train_block=blk)
            except Exception as e:  # noqa: BLE001
                r = {"error": f"{type(e).__name__}: {e}"[:300]}
            results[name] = r
            print(json.dumps({name: r}), flush=True)

print(json.dumps({"probe_train_batch": results, "steps": STEPS}))
