"""TPU bench: fused train mega-kernel step vs the XLA train step.

Also checks numeric agreement of the loss trajectory over a few steps.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from __graft_entry__ import _example_batch
from nerf_experiments_tpu.encodings.fourier import Barf
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.systems import barf as barf_sys


def build(samples, compute_dtype):
    radiance = nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=10, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=4, scale=1.0, include_identity=True),
        n_hidden=4, hidden_dim=256, delayed_direction=True,
        delayed_density=False, n_segments=2,
        learning_rate_start=5e-4, learning_rate_stop=1e-5,
        learning_rate_decay_end=200_000,
        compute_dtype=compute_dtype,
    )
    return barf_sys.BarfConfig(
        radiance=radiance, n_training_images=100, near=2.0, far=8.0,
        samples_per_ray_radiance=samples,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=-1.0,
    )


def run(fused, batch_size=1024, samples=128, steps=30, dtype=jnp.bfloat16):
    cfg = build(samples, dtype)
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)
    step = barf_sys.make_train_step(cfg, tx, donate=True, fused=fused)
    batch = _example_batch(jax.random.PRNGKey(1), batch_size)
    a = (jnp.asarray(5.0), jnp.asarray(2.0), jnp.asarray(0.0))
    keys = jax.random.split(jax.random.PRNGKey(2), steps + 5)
    t_c0 = time.perf_counter()
    losses = []
    for i in range(5):
        state, metrics = step(state, batch, keys[i], *a)
        losses.append(float(metrics["loss"]))
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch, keys[5 + i], *a)
    losses.append(float(metrics["loss"]))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "fused": fused, "batch": batch_size,
        "step_ms": round(1000 * dt / steps, 3),
        "rays_per_sec": round(batch_size * steps / dt, 1),
        "compile_s": round(compile_s, 1),
        "losses_first5_and_last": [round(l, 6) for l in losses],
    }), flush=True)


if __name__ == "__main__":
    b = int(os.environ.get("B", 1024))
    if os.environ.get("XLA_ONLY"):
        run(fused=False, batch_size=b)
    else:
        run(fused=True, batch_size=b)
