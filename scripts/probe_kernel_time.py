"""Isolated timing of the training mega-kernel (flagship_train_grads)
without the surrounding train step (no sampling/ray-transform/optimizer):
measures the kernel launch itself at a given batch/tile, for perf bisects.

Env: B (rays), S (samples), TILE (NETPU_TRAIN_TILE_ROWS), VMEM
(NETPU_TRAIN_VMEM_MB), FWD (NETPU_TRAIN_FWD_ONLY).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.encodings.fourier import Barf
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.ops import train_megakernel as tmk


def main():
    B = int(os.environ.get("B", 8192))
    S = int(os.environ.get("S", 128))
    steps = int(os.environ.get("STEPS", 30))
    cfg = nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=10, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=4, scale=1.0, include_identity=True),
        n_hidden=4, hidden_dim=256, delayed_direction=True,
        delayed_density=False, n_segments=2,
        learning_rate_start=5e-4, learning_rate_stop=1e-5,
        learning_rate_decay_end=200_000,
        compute_dtype=jnp.bfloat16,
    )
    key = jax.random.PRNGKey(0)
    params = nerf_mlp.init(key, cfg)
    k1, k2, k3 = jax.random.split(key, 3)
    origs = jax.random.normal(k1, (B, 3))
    dirs = jax.random.normal(k2, (B, 3))
    t = jnp.sort(jax.random.uniform(k3, (B, S + 1)) * 6.0 + 2.0, axis=-1)
    t_start, t_end = t[:, :-1], t[:, 1:]
    targets = jax.random.uniform(key, (B, 3))

    @jax.jit
    def f(params, origs, dirs, t_start, t_end, targets):
        rgb, grads, d_o, d_d = tmk.flagship_train_grads(
            params, cfg, origs, dirs, t_start, t_end, targets,
            jnp.asarray(5.0), jnp.asarray(2.0))
        return rgb, grads, d_o, d_d

    out = f(params, origs, dirs, t_start, t_end, targets)
    float(out[0][0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = f(params, origs, dirs, t_start, t_end, targets)
    float(out[0][0, 0])
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "B": B, "S": S,
        "tile_rows": os.environ.get("NETPU_TRAIN_TILE_ROWS", "default"),
        "vmem_mb": os.environ.get("NETPU_TRAIN_VMEM_MB", "auto"),
        "fwd_only": os.environ.get("NETPU_TRAIN_FWD_ONLY", "0"),
        "kernel_ms": round(1000 * dt, 3),
        "rays_per_sec": round(B / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
