"""Phase breakdown of the canonical BARF train step on the real chip.

Times, at several batch sizes: forward only, value_and_grad, and the full
train step (grads + guard + multi-group Adam). All timings force a
device->host transfer as the sync point (tunnel acks block_until_ready
early).
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


def build(samples=128, compute_dtype=jnp.bfloat16):
    radiance = nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=10, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=4, scale=1.0, include_identity=True),
        n_hidden=4, hidden_dim=256, delayed_direction=True,
        delayed_density=False, n_segments=2,
        learning_rate_start=5e-4, learning_rate_stop=1e-5,
        learning_rate_decay_end=200_000,
        compute_dtype=compute_dtype,
    )
    cfg = barf_sys.BarfConfig(
        radiance=radiance, n_training_images=100, near=2.0, far=8.0,
        samples_per_ray_radiance=samples,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=-1.0,
    )
    return cfg


def timeit(fn, sync, n=30):
    fn(); sync(fn())
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn()
    sync(out)
    return 1000 * (time.perf_counter() - t0) / n


def main():
    cfg = build()
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)
    a_pos, a_dir, sigma = jnp.asarray(5.0), jnp.asarray(2.0), jnp.asarray(0.0)

    for batch_size in (1024, 2048, 4096):
        batch = _example_batch(jax.random.PRNGKey(1), batch_size)
        key = jax.random.PRNGKey(2)

        fwd = jax.jit(lambda p, b: barf_sys.loss_fn(
            p, cfg, b, key, a_pos, a_dir, sigma)[0])
        vg = jax.jit(lambda p, b: jax.value_and_grad(
            barf_sys.loss_fn, has_aux=True)(p, cfg, b, key, a_pos, a_dir, sigma)[0][0])
        step = barf_sys.make_train_step(cfg, tx, donate=False)

        r = {}
        r["fwd_ms"] = timeit(lambda: fwd(state.params, batch), lambda x: float(x))
        r["fwd_bwd_ms"] = timeit(lambda: vg(state.params, batch), lambda x: float(x))
        full = lambda: step(state, batch, key, a_pos, a_dir, sigma)
        r["step_ms"] = timeit(full, lambda out: float(out[1]["loss"]))
        r["rays_per_sec"] = round(batch_size / (r["step_ms"] / 1000), 1)
        r = {k: round(v, 3) for k, v in r.items()}
        print(json.dumps({"batch": batch_size, **r}), flush=True)


if __name__ == "__main__":
    main()
