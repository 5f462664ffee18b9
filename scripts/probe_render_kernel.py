"""Perf probe: forward-only render mega-kernel vs the XLA render path
(canonical flagship model, eval/serving workload). Sweeps ray-tile rows.

Run on TPU: python scripts/probe_render_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.systems import barf as barf_sys
from __graft_entry__ import _example_batch
from bench import _mlp_cfg

BATCH = int(os.environ.get("PROBE_BATCH", 4096))
STEPS = int(os.environ.get("PROBE_STEPS", 30))
S = 128

cfg = barf_sys.BarfConfig(
    radiance=_mlp_cfg(jnp.bfloat16), n_training_images=100,
    near=2.0, far=8.0, samples_per_ray_radiance=S,
    uniform_sampling_strategy="equidistant",
    uniform_sampling_offset_size=-1.0,
)
state = barf_sys.init(jax.random.PRNGKey(0), cfg)
batch = _example_batch(jax.random.PRNGKey(1), BATCH)
a_pos, a_dir = jnp.asarray(5.0), jnp.asarray(2.0)


def timeit(fn):
    r = fn()
    float(np.asarray(r[0, 0]))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        r = fn()
    float(np.asarray(r[0, 0]))
    return BATCH * STEPS / (time.perf_counter() - t0)


@jax.jit
def render_xla(params, origs, dirs, pw):
    rgb, _ = barf_sys.forward(params, cfg, None, origs, dirs, pw,
                              a_pos, a_dir, stratified=False)
    return rgb


@jax.jit
def render_fused(params, origs, dirs, pw):
    rgb, _ = barf_sys.forward(params, cfg, None, origs, dirs, pw,
                              a_pos, a_dir, stratified=False, fused=True)
    return rgb


args = (state.params, batch["origs_raw"], batch["dirs_raw"],
        batch["pixel_width"])
rps_xla = timeit(lambda: render_xla(*args))
print(f"xla      batch={BATCH}: {rps_xla:,.0f} rays/s", flush=True)

rgb_x = np.asarray(render_xla(*args), np.float32)
for rows in (1024, 2048, 4096):
    os.environ["NETPU_RENDER_TILE_ROWS"] = str(rows)
    render_fused_v = jax.jit(render_fused.__wrapped__)
    try:
        rps = timeit(lambda: render_fused_v(*args))
        rgb_f = np.asarray(render_fused_v(*args), np.float32)
        err = float(np.max(np.abs(rgb_f - rgb_x)))
        print(f"fused rows={rows} (tile {rows // S} rays): {rps:,.0f} rays/s"
              f"  max|Δrgb|={err:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"fused rows={rows}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
