"""Minimal repro for the libtpu regalloc RET_CHECK (live_range_finder.cc).

Mode 1 (XLA dense train step, ~1M ray-samples in one program): a 2-layer MLP
evaluated at batch x samples points with a loss+grad in ONE jit. At
BATCH=4096 (524k samples) it compiles and runs; at BATCH=8192 (1.05M) the
AOT compile aborts the process with
  RET_CHECK failure ... live_range_finder.cc ...

Usage (deliberately opt-in; this CRASHES the process on current libtpu):
  REPRO_BATCH=4096 python scripts/repro_regalloc.py   # control: passes
  REPRO_BATCH=8192 python scripts/repro_regalloc.py   # crash repro

Tracked by the central guard `nerf_experiments_tpu/utils/regalloc.py` —
if this repro stops crashing after a libtpu upgrade, relax the thresholds
there.
"""
import os

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("REPRO_BATCH", 4096))
SAMPLES = int(os.environ.get("REPRO_SAMPLES", 128))
WIDTH = 256


def main():
    print(f"device={jax.devices()[0]} batch={BATCH} samples={SAMPLES} "
          f"({BATCH * SAMPLES} ray-samples/program)")
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "w1": jax.random.normal(k1, (63, WIDTH), jnp.float32) * 0.1,
        "w2": jax.random.normal(k2, (WIDTH, WIDTH), jnp.float32) * 0.1,
        "w3": jax.random.normal(k3, (WIDTH, 4), jnp.float32) * 0.1,
    }
    x = jax.random.normal(key, (BATCH, SAMPLES, 3), jnp.float32)

    def encode(p):  # 10-level Fourier PE: 3 + 60 = 63 features
        feats = [p]
        for lv in range(10):
            feats += [jnp.sin((2.0**lv) * p), jnp.cos((2.0**lv) * p)]
        return jnp.concatenate(feats, -1)

    def loss(params, x):
        h = jnp.maximum(encode(x) @ params["w1"], 0.0)
        h = jnp.maximum(h @ params["w2"], 0.0)
        out = h @ params["w3"]
        rgb, density = jax.nn.sigmoid(out[..., :3]), jax.nn.relu(out[..., 3])
        # volume-render-ish reduction over the samples axis (the structure
        # that inflates live ranges: per-sample activations kept for bwd)
        w = density / (1e-6 + density.sum(-1, keepdims=True))
        c = (w[..., None] * rgb).sum(-2)
        return jnp.mean((c - 0.5) ** 2)

    step = jax.jit(jax.grad(loss))
    g = step(params, x)
    jax.block_until_ready(g)
    print("survived: grads ok", float(g["w1"].mean()))


if __name__ == "__main__":
    main()
