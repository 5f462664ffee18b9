"""Time the mega-kernel alone (no XLA glue) in full vs fwd-only modes."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from nerf_experiments_tpu.encodings.fourier import Barf
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.ops import sampling
from nerf_experiments_tpu.ops.train_megakernel import flagship_train_grads

cfg = nerf_mlp.NerfMLPConfig(
    position_encoder=Barf(levels=10, scale=1.0, include_identity=True),
    direction_encoder=Barf(levels=4, scale=1.0, include_identity=True),
    n_hidden=4, hidden_dim=256, delayed_direction=True,
    delayed_density=False, n_segments=2, compute_dtype=jnp.bfloat16)
params = nerf_mlp.init(jax.random.PRNGKey(0), cfg)
n, S = 1024, 128
ks = jax.random.split(jax.random.PRNGKey(1), 3)
dirs = jax.random.normal(ks[0], (n,3)); dirs /= jnp.linalg.norm(dirs,axis=-1,keepdims=True)
origs = jax.random.normal(ks[1], (n,3))*0.3
tgt = jax.random.uniform(ks[2], (n,3))
t0_, t1_ = sampling.sample_stratified(None, n, S, 2.0, 8.0, "equidistant", 0.0)
fn = jax.jit(lambda p: flagship_train_grads(p, cfg, origs, dirs, t0_, t1_, tgt, 5.0, 2.0))
out = fn(params); float(out[0][0,0])
t0 = time.perf_counter()
for _ in range(30): out = fn(params)
float(out[0][0,0])
ms = 1000*(time.perf_counter()-t0)/30
print(json.dumps({"mode": "fwd_only" if os.environ.get("NETPU_TRAIN_FWD_ONLY") else "full",
                  "kernel_call_ms": round(ms,3)}))
