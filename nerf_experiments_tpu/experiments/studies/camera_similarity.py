"""Camera-similarity studies: alignment by gradient descent vs closed form,
and Gauss-activation scale response.

Parity with `test-camera-similarity/` (SURVEY.md §2.3 #32):
  * `optimize.py:6-98` `iterative_optimize` — fit a linear map A by SGD to
    align paired point clouds (optionally with an orthogonality penalty),
    reporting loss/rotation-error curves;
  * `optimize.py:100-143` `align_rotation` / `align_paired_point_clouds` —
    the closed-form Kabsch answer to the same problem (shared with the main
    pipeline via ops.kabsch);
  * `main.py:36-81` + `model.py:52-79` — a Gaussian-activation MLP fitting a
    family of scale-conditioned 1-D functions, probing how the learnable
    bandwidth responds to target frequency/scale.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf_experiments_tpu.encodings.activations import gauss_from_isd
from nerf_experiments_tpu.models.common import linear_init, linear_apply
from nerf_experiments_tpu.ops.kabsch import kabsch, apply_similarity


def iterative_align(
    x: jnp.ndarray,
    target: jnp.ndarray,
    reg: float = 0.0,
    lr: float = 1e-3,
    max_iter: int = 1000,
    seed: int = 1,
) -> Dict:
    """SGD fit of linear map A minimizing ||x @ A - target||^2
    (+ reg * ||A^T A - I||^2). Returns loss/rot-penalty curves + final A."""
    dim = x.shape[1]
    A = jax.random.normal(jax.random.PRNGKey(seed), (dim, target.shape[1]))
    tx = optax.sgd(lr)
    opt_state = tx.init(A)

    @jax.jit
    def step(A, opt_state):
        def loss_fn(A):
            pred = x @ A
            l = jnp.mean((target - pred) ** 2)
            rot_pen = jnp.sum((A.T @ A - jnp.eye(A.shape[1])) ** 2)
            return l + reg * rot_pen, rot_pen

        (l, rot_pen), g = jax.value_and_grad(loss_fn, has_aux=True)(A)
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(A, updates), opt_state, l, rot_pen

    losses, rot_pens = [], []
    for _ in range(max_iter):
        A, opt_state, l, rp = step(A, opt_state)
        losses.append(float(l))
        rot_pens.append(float(rp))
    return {"A": np.asarray(A), "loss": losses, "rot_penalty": rot_pens}


def closed_form_align(pts_from: jnp.ndarray, pts_to: jnp.ndarray) -> Dict:
    """Closed-form Kabsch alignment (align_paired_point_clouds parity)."""
    R, t, c = kabsch(pts_from, pts_to, remove_outliers=False)
    residual = float(
        jnp.mean(jnp.linalg.norm(apply_similarity(R, t, c, pts_from) - pts_to, axis=1))
    )
    return {"R": np.asarray(R), "t": np.asarray(t), "c": float(c), "residual": residual}


@dataclasses.dataclass(frozen=True)
class GaussMLPConfig:
    hidden_dim: int = 64
    n_layers: int = 3
    init_min: float = 0.0
    init_max: float = 1.0


def gauss_mlp_init(key, cfg: GaussMLPConfig, in_dim: int = 2):
    ks = jax.random.split(key, cfg.n_layers + 1)
    dims = [in_dim] + [cfg.hidden_dim] * (cfg.n_layers - 1) + [1]
    layers, acts = [], []
    for i in range(len(dims) - 1):
        layers.append(linear_init(ks[i], dims[i], dims[i + 1]))
        if i < len(dims) - 2:
            acts.append(
                jax.random.uniform(ks[-1], (dims[i + 1],))
                * (cfg.init_max - cfg.init_min)
                + cfg.init_min
            )
    return {"layers": layers, "isd": acts}


def gauss_mlp_apply(params, x):
    h = x
    for i, layer in enumerate(params["layers"]):
        h = linear_apply(layer, h)
        if i < len(params["layers"]) - 1:
            h = gauss_from_isd(h, params["isd"][i])
    return h[..., 0]


def scale_response_study(
    scales=(0.5, 1.0, 2.0, 4.0), n_points: int = 256, steps: int = 800, seed: int = 0
) -> Dict:
    """Fit f_s(x) = sin(s * 2pi * x) for each scale s with a scale-conditioned
    Gauss-act MLP; report final loss and learned mean |isd| per scale
    (the reference's probe of bandwidth-vs-frequency response)."""
    key = jax.random.PRNGKey(seed)
    x = jnp.linspace(-1, 1, n_points)[:, None]
    results = {}
    for s in scales:
        target = jnp.sin(s * 2 * jnp.pi * x[:, 0])
        inp = jnp.concatenate([x, jnp.full_like(x, s)], axis=1)
        params = gauss_mlp_init(key, GaussMLPConfig(init_min=0.5, init_max=2.0))
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                return jnp.mean((gauss_mlp_apply(p, inp) - target) ** 2)

            l, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, l

        for _ in range(steps):
            params, opt_state, l = step(params, opt_state)
        isd_mean = float(np.mean([np.abs(np.asarray(a)).mean() for a in params["isd"]]))
        results[s] = {"final_loss": float(l), "mean_abs_isd": isd_mean}
    return results


if __name__ == "__main__":
    import json

    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (50, 3))
    from nerf_experiments_tpu.ops.lie import so3_exp

    R_true = so3_exp(jnp.array([0.4, -0.2, 0.9]))
    target = apply_similarity(R_true, jnp.array([[1.0, 2.0, -0.5]]), 1.3, pts)
    cf = closed_form_align(pts, target)
    it = iterative_align(pts, target - jnp.mean(target, 0), max_iter=400)
    print(json.dumps({
        "closed_form_residual": cf["residual"],
        "iterative_final_loss": it["loss"][-1],
        "scale_response": scale_response_study(scales=(1.0, 2.0), steps=300),
    }, indent=2))
