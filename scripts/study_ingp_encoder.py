"""INGP encoder study (VERDICT r2 weak #2): full-train-step throughput of
the gather path (encode_fused) vs the gather-free factorized one-hot MXU
path (encode_matmul) across table sizes, at the two bench geometries.

The matmul path's FLOPs are 2*R*T_eff*F per direction per level — linear in
the table size — so the question is at which T it overtakes the per-row
transaction pace of XLA's dynamic gather (which is T-independent). Quality
vs table size is a separate axis (hash collisions); see quality runs.

Env: S_BATCH (4096), S_STEPS (20), S_GEOS ("wide_4x8,ref_16x2"),
S_TABLES ("8192,16384,65536"), S_ENCODERS ("fused,matmul").
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

BATCH = int(os.environ.get("S_BATCH", 4096))
STEPS = int(os.environ.get("S_STEPS", 20))
GEOS = {
    "ref_16x2": dict(n_levels=16, n_features=2),
    "wide_4x8": dict(n_levels=4, n_features=8),
}
SEL = os.environ.get("S_GEOS", "wide_4x8,ref_16x2").split(",")
TABLES = [int(t) for t in os.environ.get("S_TABLES", "8192,16384,65536").split(",")]
ENCODERS = os.environ.get("S_ENCODERS", "fused,matmul").split(",")


def main():
    results = {}
    for geo_name in SEL:
        geo = GEOS[geo_name]
        for table in TABLES:
            for enc in ENCODERS:
                key = f"{geo_name}_T{table}_{enc}"
                try:
                    row = bench.bench_ingp(
                        BATCH, STEPS, jnp.bfloat16, samples=64,
                        table_size=table, encoder=enc, **geo)
                except Exception as e:  # noqa: BLE001
                    row = {"error": f"{type(e).__name__}: {e}"[:200]}
                results[key] = row
                print(json.dumps({key: row}), flush=True)
    print(json.dumps({"batch": BATCH, "steps": STEPS, "results": results}))


if __name__ == "__main__":
    main()
