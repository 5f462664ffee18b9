"""Two quick TPU probes: (1) does Mosaic lower bf16 comparisons now?
(2) GARF step phase breakdown (sampling/estimator vs radiance train)."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe_bf16_cmp():
    def kern(x_ref, o_ref):
        x = x_ref[:]
        o_ref[:] = jnp.where(x > 0, x, jnp.zeros_like(x))

    x = jnp.linspace(-1, 1, 8 * 128, dtype=jnp.bfloat16).reshape(8, 128)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ok = bool(jnp.all(out == jnp.maximum(x, 0)))
        print(json.dumps({"bf16_cmp_in_pallas": "ok" if ok else "wrong"}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bf16_cmp_in_pallas": f"fail: {str(e)[:200]}"}))


def probe_bf16_dot_preferred():
    def kern(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], ((((1,), (0,))), ((), ())),
            preferred_element_type=jnp.bfloat16)

    a = jnp.ones((128, 256), jnp.bfloat16)
    b = jnp.ones((256, 128), jnp.bfloat16)
    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)
        print(json.dumps({"bf16_preferred_dot": float(out[0, 0])}))
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"bf16_preferred_dot": f"fail: {str(e)[:200]}"}))


def garf_phases(batch=1024, steps=20):
    from __graft_entry__ import _example_batch
    from nerf_experiments_tpu.models import garf as garf_models
    from nerf_experiments_tpu.systems import garf_system

    cfg = garf_system.GarfSystemConfig(
        n_train_images=100,
        net=garf_models.GarfConfig(init_min=0.5, init_max=2.0,
                                   learning_rate_decay_end=10_000,
                                   compute_dtype=jnp.bfloat16),
    )
    state = garf_system.init(jax.random.PRNGKey(0), cfg)
    tx = garf_system.make_optimizer(cfg, state.params)
    b = _example_batch(jax.random.PRNGKey(1), batch)
    key = jax.random.PRNGKey(2)

    full = garf_system.make_train_step(cfg, tx, donate=False)

    fwd_loss = jax.jit(lambda p: garf_system.loss_fn(p, cfg, b, key)[0])

    def timeit(fn, sync, n=steps):
        sync(fn())
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        sync(out)
        return round(1000 * (time.perf_counter() - t0) / n, 3)

    r = {}
    r["full_step_ms"] = timeit(lambda: full(state, b, key),
                               lambda o: float(o[1]["loss"]))
    r["fwd_loss_ms"] = timeit(lambda: fwd_loss(state.params), float)
    r["rays_per_sec"] = round(batch / (r["full_step_ms"] / 1000), 1)
    print(json.dumps({"garf_phases": r}))


if __name__ == "__main__":
    probe_bf16_cmp()
    probe_bf16_dot_preferred()
    garf_phases()
