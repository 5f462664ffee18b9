"""Capture ONE jax.profiler trace of the fused train step through the axon
tunnel and print a per-op device-time attribution (VERDICT r2 weak #8).

The step-phase StepTimer gives phase granularity only; this script gives
kernel-level attribution: it traces N steps of the north-star S=32 config
(or dense, P_CONFIG=dense), parses the xplane proto with tensorflow's
bundled protobuf, and aggregates device-plane event durations by op name.

Usage: python scripts/profile_trace.py          # writes /tmp/netpu_trace
Env: P_CONFIG (s32|occ|dense), P_BATCH (8192), P_STEPS (10), P_TOP (40).
"""
import collections
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

CONFIG = os.environ.get("P_CONFIG", "occ")
BATCH = int(os.environ.get("P_BATCH", 8192))
STEPS = int(os.environ.get("P_STEPS", 10))
TOP = int(os.environ.get("P_TOP", 40))
OUT = os.environ.get("P_OUT", "/tmp/netpu_trace")


def build_step():
    import bench

    kwargs = dict(fused=True)
    if CONFIG == "s32":
        kwargs["proposal"] = True
        samples = 32
    elif CONFIG == "occ":
        kwargs["occ"] = True
        samples = 32
    else:
        samples = 128
    # reuse bench's construction but stop before its timing loop
    from __graft_entry__ import _example_batch
    from nerf_experiments_tpu.systems import barf as barf_sys

    cfg_kwargs = {}
    if kwargs.get("proposal"):
        cfg_kwargs = dict(
            samples_per_ray_proposal=64,
            proposal=bench._mlp_cfg(jnp.bfloat16, hidden_dim=64, n_hidden=1))
    if kwargs.get("occ"):
        from nerf_experiments_tpu.ops import occgrid

        cfg_kwargs = dict(occ=occgrid.OccGridConfig(
            resolution=64, n_coarse=64, update_every=16))
    cfg = barf_sys.BarfConfig(
        radiance=bench._mlp_cfg(jnp.bfloat16), n_training_images=100,
        near=2.0, far=8.0, samples_per_ray_radiance=samples,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=-1.0,
        **cfg_kwargs)
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)
    step = barf_sys.make_train_step(cfg, tx, donate=True, fused=True)
    batch = _example_batch(jax.random.PRNGKey(1), BATCH)
    scalars = (jnp.asarray(10.0), jnp.asarray(4.0), jnp.asarray(0.0))
    keys = jax.random.split(jax.random.PRNGKey(2), STEPS + 2)
    return step, state, batch, scalars, keys


def run_traced():
    step, state, batch, scalars, keys = build_step()
    # warmup/compile outside the trace
    state, metrics = step(state, batch, keys[0], *scalars)
    _ = float(metrics["loss"])
    with jax.profiler.trace(OUT):
        for i in range(STEPS):
            state, metrics = step(state, batch, keys[i + 1], *scalars)
        _ = float(metrics["loss"])  # device->host sync INSIDE the trace
    return True


def analyze():
    paths = glob.glob(os.path.join(OUT, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print(json.dumps({"error": "no xplane.pb produced", "out": OUT}))
        return
    path = max(paths, key=os.path.getmtime)
    # the xplane proto ships under different roots per TF/TSL packaging
    xplane_pb2 = None
    for mod in ("tensorflow.tsl.profiler.protobuf.xplane_pb2",
                "tensorflow.core.profiler.protobuf.xplane_pb2",
                "tsl.profiler.protobuf.xplane_pb2"):
        try:
            import importlib

            xplane_pb2 = importlib.import_module(mod)
            break
        except ImportError:
            continue
    if xplane_pb2 is None:
        print(json.dumps({"error": "no xplane proto module found"}))
        return

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    report = {}
    for plane in space.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        total_by_name = collections.Counter()
        n_by_name = collections.Counter()
        plane_total = 0
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                dur_us = ev.duration_ps / 1e6
                total_by_name[name] += dur_us
                n_by_name[name] += 1
                plane_total += dur_us
        rows = [
            {"op": k, "total_us": round(v, 1), "n": n_by_name[k],
             "us_per_step": round(v / STEPS, 1)}
            for k, v in total_by_name.most_common(TOP)
        ]
        report[plane.name] = {"plane_total_us": round(plane_total, 1),
                              "per_step_us": round(plane_total / STEPS, 1),
                              "top": rows}
    payload = {"trace": path, "config": CONFIG, "batch": BATCH,
               "steps": STEPS, "planes": report}
    print(json.dumps(payload, indent=1))
    # committable evidence (VERDICT r3 #3: trace summary under docs/evidence)
    ev_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "evidence", "studies")
    os.makedirs(ev_dir, exist_ok=True)
    with open(os.path.join(ev_dir, f"profile_trace_{CONFIG}.json"), "w") as f:
        json.dump(payload, f, indent=1)


if __name__ == "__main__":
    ok = run_traced()
    analyze()
