"""Benchmark: BARF training throughput (rays/sec) on one chip.

Canonical workload = the reference's flagship config (`barf/run_barf.py`):
lego-scale shapes, batch 1024 rays x 128 samples/ray, NerfModel 4x256 hidden
x 2 segments, BARF encodings, camera extrinsics optimized jointly. The full
jitted train step (ray transform -> sampling -> MLP -> composite -> loss ->
grads -> multi-group Adam) is timed after warmup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is relative to the 5M rays/s/chip north-star target
(BASELINE.md — the reference publishes no numbers of its own).
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

NORTH_STAR_RAYS_PER_SEC = 5e6


def bench_garf(batch_size: int, steps: int, compute_dtype):
    """GARF canonical workload: 64 proposal + 192 radiance samples, lindisp
    stratified estimator (`garf/main.py` defaults)."""
    from nerf_experiments_tpu.models import garf as garf_models
    from nerf_experiments_tpu.systems import garf_system
    from __graft_entry__ import _example_batch

    cfg = garf_system.GarfSystemConfig(
        n_train_images=100,
        net=garf_models.GarfConfig(init_min=0.5, init_max=2.0,
                                   learning_rate_decay_end=10_000,
                                   compute_dtype=compute_dtype),
    )
    state = garf_system.init(jax.random.PRNGKey(0), cfg)
    tx = garf_system.make_optimizer(cfg, state.params)
    step = garf_system.make_train_step(cfg, tx, donate=True)
    batch = _example_batch(jax.random.PRNGKey(1), batch_size)
    keys = jax.random.split(jax.random.PRNGKey(2), steps + 5)
    for i in range(5):
        state, metrics = step(state, batch, keys[i])
    float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch, keys[5 + i])
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    rays_per_sec = batch_size * steps / dt
    print(json.dumps({
        "metric": "garf_train_rays_per_sec_1chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC, 4),
        "detail": {
            "batch_size": batch_size, "steps_timed": steps,
            "samples": "64 proposal + 192 radiance (lindisp)",
            "step_ms": round(1000 * dt / steps, 3),
            "compute_dtype": "bf16" if compute_dtype is not None else "fp32",
            "device": str(jax.devices()[0]),
        },
    }))


def main():
    from nerf_experiments_tpu.encodings.fourier import Barf
    from nerf_experiments_tpu.models import nerf_mlp
    from nerf_experiments_tpu.systems import barf as barf_sys
    from __graft_entry__ import _example_batch

    batch_size = int(os.environ.get("BENCH_BATCH", 1024))
    samples = int(os.environ.get("BENCH_SAMPLES", 128))
    steps = int(os.environ.get("BENCH_STEPS", 50))
    compute_dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else None

    if os.environ.get("BENCH_SYSTEM") == "garf":
        return bench_garf(batch_size, steps, compute_dtype)

    radiance = nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=10, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=4, scale=1.0, include_identity=True),
        n_hidden=4, hidden_dim=256, delayed_direction=True,
        delayed_density=False, n_segments=2,
        learning_rate_start=5e-4, learning_rate_stop=1e-5,
        learning_rate_decay_end=200_000,
        compute_dtype=compute_dtype,
    )
    radiance_def = radiance
    if os.environ.get("BENCH_FUSED_MLP"):
        radiance_def = barf_sys.FusedNerfMLPDef(radiance)
    cfg = barf_sys.BarfConfig(
        radiance=radiance_def, n_training_images=100,
        near=2.0, far=8.0,
        samples_per_ray_radiance=samples,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=-1.0,
    )
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)
    step = barf_sys.make_train_step(cfg, tx, donate=True)

    batch = _example_batch(jax.random.PRNGKey(1), batch_size)
    a_pos, a_dir, sigma = jnp.asarray(5.0), jnp.asarray(2.0), jnp.asarray(0.0)
    keys = jax.random.split(jax.random.PRNGKey(2), steps + 5)

    # warmup / compile. NOTE: a host transfer (float()) is the only reliable
    # completion barrier through the axon device tunnel — block_until_ready
    # acknowledges early there, inflating rays/s ~20x. Do not "optimize" this.
    for i in range(5):
        state, metrics = step(state, batch, keys[i], a_pos, a_dir, sigma)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch, keys[5 + i], a_pos, a_dir, sigma)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    rays_per_sec = batch_size * steps / dt

    # inference/render throughput (the image-logger / serving path): forward
    # only, deterministic sampling, no gradients
    @jax.jit
    def render(params, origs, dirs, pw):
        rgb, _ = barf_sys.forward(
            params, cfg, None, origs, dirs, pw, a_pos, a_dir, stratified=False
        )
        return rgb

    r = render(state.params, batch["origs_raw"], batch["dirs_raw"], batch["pixel_width"])
    float(r[0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        r = render(state.params, batch["origs_raw"], batch["dirs_raw"], batch["pixel_width"])
    float(r[0, 0])
    render_rays_per_sec = batch_size * steps / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "barf_train_rays_per_sec_1chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC, 4),
        "detail": {
            "batch_size": batch_size,
            "samples_per_ray": samples,
            "steps_timed": steps,
            "step_ms": round(1000 * dt / steps, 3),
            "compute_dtype": "bf16" if compute_dtype is not None else "fp32",
            "fused_mlp": bool(os.environ.get("BENCH_FUSED_MLP")),
            "device": str(jax.devices()[0]),
            "samples_per_sec": round(rays_per_sec * samples, 1),
            "render_rays_per_sec": round(render_rays_per_sec, 1),
        },
    }))


if __name__ == "__main__":
    main()
