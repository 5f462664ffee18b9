"""One serialized TPU perf session: kernel bisects, tile sweeps, INGP probe.

Run when the chip is otherwise idle (never stack TPU processes — tunnel
wedges). Each phase is a subprocess so env-var knobs (tile rows, fwd-only
modes) take effect per run and a crash in one phase doesn't kill the rest.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(name, cmd, env=None):
    e = dict(os.environ)
    if env:
        e.update(env)
    print(f"=== {name} {'(' + str(env) + ')' if env else ''}", flush=True)
    r = subprocess.run(cmd, cwd=REPO, env=e, capture_output=True, text=True,
                       timeout=1200)
    out = (r.stdout or "").strip().splitlines()
    for line in out[-4:]:
        print(line, flush=True)
    if r.returncode != 0:
        print("FAILED rc", r.returncode, (r.stderr or "")[-500:], flush=True)


PY = [sys.executable]

# 1. BARF train mega-kernel v3 bisect: tile rows x fwd-only modes
for rows in ("512", "1024"):
    for mode in ("0", "1", "2"):
        run(f"bisect tile={rows} fwd_only={mode}",
            PY + ["scripts/bisect_kernel.py"],
            {"NETPU_TRAIN_TILE_ROWS": rows, "NETPU_TRAIN_FWD_ONLY": mode}
            if mode != "0" else {"NETPU_TRAIN_TILE_ROWS": rows})

# 2. INGP probe (gather/scatter variants)
run("probe_ingp", PY + ["scripts/probe_ingp.py"])

# 3. GARF radiance kernel tile sweep
for rows in ("384", "768"):
    run(f"garf tile={rows}", PY + ["-c", """
import json, os, sys, time
sys.path.insert(0, '.')
import jax, jax.numpy as jnp
from nerf_experiments_tpu.models import garf
from nerf_experiments_tpu.ops.garf_megakernel import garf_radiance_train_grads
cfg = garf.GarfConfig(compute_dtype=jnp.bfloat16)
params = garf.radiance_init(jax.random.PRNGKey(0), cfg)
n, S = 1024, 192
ks = jax.random.split(jax.random.PRNGKey(1), 4)
dirs = jax.random.normal(ks[0], (n,3)); dirs /= jnp.linalg.norm(dirs,axis=-1,keepdims=True)
origs = jax.random.normal(ks[1], (n,3))*0.3
t0_ = jnp.sort(jax.random.uniform(ks[2], (n,S), minval=2., maxval=7.), axis=-1)
t1_ = t0_ + 0.02
tgt = jax.random.uniform(ks[3], (n,3))
fn = jax.jit(lambda p: garf_radiance_train_grads(p, cfg, origs, dirs, t0_, t1_, tgt))
out = fn(params); float(out[0][0,0])
t = time.perf_counter()
for _ in range(30): out = fn(params)
float(out[0][0,0])
print(json.dumps({'garf_kernel_ms': round(1000*(time.perf_counter()-t)/30, 3)}))
"""], {"NETPU_GARF_TILE_ROWS": rows})

print("=== perf session done", flush=True)
