"""Decompose the fused hierarchical step's non-kernel overhead.

At 8192x(64 proposal + 32 radiance) the fused step measures ~19.2 ms while
the radiance mega-kernel alone is ~11 ms (43.985 * 32/128) — so ~8 ms is
coarse stage + PDF resample + camera vjp. This probe times each piece in
isolation (jitted, float() sync) to aim the next optimization.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from nerf_experiments_tpu.ops import render, sampling
from nerf_experiments_tpu.systems import barf as barf_sys
from __graft_entry__ import _example_batch

N = int(os.environ.get("P_BATCH", 8192))
S_PROP = 64
S_RAD = int(os.environ.get("P_SRAD", 32))
STEPS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.ravel(x)[0]), out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.ravel(x)[0]), out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:34s} {1000*dt:8.3f} ms", flush=True)
    return out


cfg = barf_sys.BarfConfig(
    radiance=bench._mlp_cfg(jnp.bfloat16),
    proposal=bench._mlp_cfg(jnp.bfloat16, hidden_dim=64, n_hidden=1),
    n_training_images=100, near=2.0, far=8.0,
    samples_per_ray_radiance=S_RAD, samples_per_ray_proposal=S_PROP,
    uniform_sampling_strategy="equidistant",
    uniform_sampling_offset_size=-1.0,
)
state = barf_sys.init(jax.random.PRNGKey(0), cfg)
batch = _example_batch(jax.random.PRNGKey(1), N)
origs, dirs, pw = batch["origs_raw"], batch["dirs_raw"], batch["pixel_width"]
params = state.params

tc_start, tc_end = sampling.sample_stratified(
    None, N, S_PROP, cfg.near, cfg.far, "equidistant", 0.0)

prop_model = barf_sys._model_def(cfg.proposal)


@jax.jit
def coarse_fwd(prop_p, origs_, dirs_):
    dens_c, rgb_c = barf_sys._eval_model(
        prop_model, prop_p, origs_, dirs_, tc_start, tc_end,
        pw, jnp.asarray(5.0), jnp.asarray(2.0), cfg.integration_strategy)
    return render.render_rays_auto(dens_c, rgb_c, tc_end - tc_start)


@jax.jit
def coarse_vjp(prop_p, origs_, dirs_):
    (rgb_c, w), vjp = jax.vjp(
        lambda p, o, d: coarse_fwd.__wrapped__(p, o, d), prop_p, origs_, dirs_)
    return vjp((jnp.ones_like(rgb_c), jnp.zeros_like(w)))


@jax.jit
def pdf_resample(w):
    return sampling.sample_pdf_weighted_intervals(
        tc_start, tc_end, w, S_RAD, cfg.far)


rgb_c, weights = timeit("coarse forward (64x1 net, S=64)", coarse_fwd,
                        params["proposal"], origs, dirs)
timeit("coarse fwd+vjp", coarse_vjp, params["proposal"], origs, dirs)
timeit(f"pdf resample 64->{S_RAD}", pdf_resample, weights)

# full fused step for reference
r = bench.bench_barf(N, S_RAD, STEPS, jnp.bfloat16, fused=True, proposal=True)
print("full fused hierarchical step      ", r["step_ms"], "ms ->",
      r["rays_per_sec"], "rays/s")
r = bench.bench_barf(N, S_RAD, STEPS, jnp.bfloat16, fused=True)
print("dense fused step at same S        ", r["step_ms"], "ms ->",
      r["rays_per_sec"], "rays/s")
