"""Serving-throughput study toward the >=1.8M rays/s target (VERDICT r2 #3).

The full hierarchical render is 1.27M rays/s vs 1.81M for the fine kernel
alone — the gap is the coarse stage (XLA proposal-net eval + PDF resample).
At SERVING the coarse stage only shapes a PDF, so its budget is a free
knob independent of how the model was trained: this sweeps coarse bins
(64/32/16), the occ-grid stage, and the render batch, measuring the fused
render path end-to-end on the real chip.

Env: S_BATCHES ("8192,16384"), S_STEPS (30), S_COARSE ("64,32,16").
Prints one JSON line per config.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from __graft_entry__ import _example_batch
from nerf_experiments_tpu.systems import barf as barf_sys

BATCHES = [int(b) for b in os.environ.get("S_BATCHES", "8192,16384").split(",")]
STEPS = int(os.environ.get("S_STEPS", 30))
COARSE = [int(c) for c in os.environ.get("S_COARSE", "64,32,16").split(",")]


def build(coarse, occ=False):
    kwargs = {}
    if occ:
        from nerf_experiments_tpu.ops import occgrid

        kwargs = dict(occ=occgrid.OccGridConfig(
            resolution=64, n_coarse=coarse, update_every=16))
    else:
        kwargs = dict(
            samples_per_ray_proposal=coarse,
            proposal=bench._mlp_cfg(jnp.bfloat16, hidden_dim=64, n_hidden=1))
    cfg = barf_sys.BarfConfig(
        radiance=bench._mlp_cfg(jnp.bfloat16), n_training_images=100,
        near=2.0, far=8.0, samples_per_ray_radiance=32,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=-1.0,
        **kwargs)
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    return cfg, state


def time_render(cfg, state, batch_size):
    rb = _example_batch(jax.random.PRNGKey(3), batch_size)

    @jax.jit
    def render_fused(params, origs, dirs):
        rgb, _ = barf_sys.forward(
            params, cfg, None, origs, dirs,
            jnp.full((origs.shape[0], 1), 1e-3),
            jnp.asarray(10.0), jnp.asarray(4.0),
            stratified=False, fused=True)
        return rgb

    r = render_fused(state.params, rb["origs_raw"], rb["dirs_raw"])
    float(r[0, 0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = render_fused(state.params, rb["origs_raw"], rb["dirs_raw"])
    float(r[0, 0])
    dt = time.perf_counter() - t0
    return {"rays_per_sec": round(batch_size * STEPS / dt, 1),
            "ms": round(1000 * dt / STEPS, 3)}


def time_render_block(cfg, state, batch_size, block):
    rb = _example_batch(jax.random.PRNGKey(3), batch_size)

    @jax.jit
    def render_block(params, origs, dirs):
        return barf_sys.render_block_coarse(
            params, cfg, origs, dirs,
            jnp.asarray(10.0), jnp.asarray(4.0), block=block)

    r = render_block(state.params, rb["origs_raw"], rb["dirs_raw"])
    float(r[0, 0])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = render_block(state.params, rb["origs_raw"], rb["dirs_raw"])
    float(r[0, 0])
    dt = time.perf_counter() - t0
    return {"rays_per_sec": round(batch_size * STEPS / dt, 1),
            "ms": round(1000 * dt / STEPS, 3)}


def main():
    results = {}
    for occ in (False, True):
        for coarse in COARSE:
            cfg, state = build(coarse, occ=occ)
            for b in BATCHES:
                name = f"{'occ' if occ else 'prop'}{coarse}_S32_b{b}"
                try:
                    row = time_render(cfg, state, b)
                except Exception as e:  # noqa: BLE001
                    row = {"error": f"{type(e).__name__}: {e}"[:160]}
                results[name] = row
                print(json.dumps({name: row}), flush=True)
        # block-coarse serving (render_block_coarse): coarse stage on one
        # representative ray per block of raster neighbors
        cfg, state = build(COARSE[0], occ=occ)
        for block in (2, 4, 8):
            b = BATCHES[0]
            name = f"{'occ' if occ else 'prop'}{COARSE[0]}_S32_b{b}_blk{block}"
            try:
                row = time_render_block(cfg, state, b, block)
            except Exception as e:  # noqa: BLE001
                row = {"error": f"{type(e).__name__}: {e}"[:160]}
            results[name] = row
            print(json.dumps({name: row}), flush=True)
    print(json.dumps({"steps": STEPS, "results": results}))


if __name__ == "__main__":
    main()
