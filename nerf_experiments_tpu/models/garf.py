"""GARF-family networks: Gaussian/Gabor/SARF-activated radiance + proposal MLPs.

Architecture from `barf/model_garf_radiance.py:10-113` (RadianceNetwork:
3→1024→256→128→128, skip re-inject pos, →512→256→128→129; density =
softplus(z2[:,128] − 1); color head on z1[:,:128]+z2[:,:128] ⊕ dir →256→3
sigmoid) and `barf/model_garf_proposal.py:10-77` (ProposalNetwork:
3→512→256→128→1 softplus).

The activation kind is a config switch (gauss | gabor | sarf), unifying the
garf/gaborf/sarf copy-dirs into one parameterized model. Linear vs activation
parameters live in separate subtrees so they can get different LRs
(gaussian_learning_rate_factor, `model_garf_radiance.py:63-77`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.encodings.activations import (
    gabor_from_isd,
    gauss_from_isd,
    sarf_act,
)
from nerf_experiments_tpu.models.common import (
    ParamGroup,
    linear_apply,
    linear_init,
    softplus8,
)

RADIANCE_D1_DIMS = [(3, 1024), (1024, 256), (256, 128), (128, 128)]
RADIANCE_D2_DIMS = [(128 + 3, 512), (512, 256), (256, 128), (128, 128 + 1)]
RADIANCE_COLOR_DIMS = [(128 + 3, 256), (256, 3)]
PROPOSAL_DIMS = [(3, 512), (512, 256), (256, 128), (128, 1)]


@dataclasses.dataclass(frozen=True)
class GarfConfig:
    activation: str = "gauss"  # gauss | gabor | sarf
    init_min: float = 0.0
    init_max: float = 1.0
    learning_rate_start: float = 1e-4
    learning_rate_stop: float = 1e-5
    learning_rate_decay_end: int = 10000
    activation_learning_rate_factor: float = 1.0
    weight_decay: float = 0.0
    compute_dtype: Any = None

    @property
    def linear_group(self) -> ParamGroup:
        return ParamGroup(
            self.learning_rate_start,
            self.learning_rate_stop,
            self.learning_rate_decay_end,
            self.weight_decay,
        )

    @property
    def activation_group(self) -> ParamGroup:
        f = self.activation_learning_rate_factor
        return ParamGroup(
            self.learning_rate_start * f,
            self.learning_rate_stop * f,
            self.learning_rate_decay_end,
            self.weight_decay,
        )


def _act_init(key: jax.Array, cfg: GarfConfig, features: int) -> Dict:
    """Per-feature activation params. Gauss/Gabor: inv_standard_deviation
    ~ U(init_min, init_max) (+ spread ~ U(0, 2π) for Gabor); SARF: frequency."""
    if cfg.activation == "gauss":
        return {
            "isd": jax.random.uniform(key, (features,)) * (cfg.init_max - cfg.init_min)
            + cfg.init_min
        }
    if cfg.activation == "gabor":
        k1, k2 = jax.random.split(key)
        return {
            "isd": jax.random.uniform(k1, (features,)) * (cfg.init_max - cfg.init_min)
            + cfg.init_min,
            "spread": jax.random.uniform(k2, (features,)) * 2.0 * jnp.pi,
        }
    if cfg.activation == "sarf":
        return {
            "freq": jax.random.uniform(key, (features,)) * (cfg.init_max - cfg.init_min)
            + cfg.init_min
        }
    raise ValueError(f"unknown activation {cfg.activation!r}")


def _act_apply(cfg: GarfConfig, act_params: Dict, x: jnp.ndarray,
               anneal=1.0) -> jnp.ndarray:
    """anneal scales the oscillatory term of gabor/sarf (1.0 = reference
    semantics; gauss has no oscillation and ignores it) — the activation
    coarse-to-fine schedule used for joint camera calibration."""
    if cfg.activation == "gauss":
        return gauss_from_isd(x, act_params["isd"])
    if cfg.activation == "gabor":
        return gabor_from_isd(x, act_params["isd"], act_params["spread"], anneal)
    if cfg.activation == "sarf":
        return sarf_act(x, act_params["freq"], anneal)
    raise ValueError(cfg.activation)


def _init_stack(key: jax.Array, cfg: GarfConfig, dims, act_after_last: bool):
    """Alternating linear/activation stack. Returns {"linear": [...], "act": [...]}."""
    keys = jax.random.split(key, 2 * len(dims))
    linear = [linear_init(keys[2 * i], d_in, d_out) for i, (d_in, d_out) in enumerate(dims)]
    n_act = len(dims) if act_after_last else len(dims) - 1
    act = [_act_init(keys[2 * i + 1], cfg, dims[i][1]) for i in range(n_act)]
    return {"linear": linear, "act": act}


def _apply_stack(cfg: GarfConfig, stack: Dict, x: jnp.ndarray,
                 anneal=1.0) -> jnp.ndarray:
    h = x
    for i, lin in enumerate(stack["linear"]):
        h = linear_apply(lin, h, cfg.compute_dtype)
        if i < len(stack["act"]):
            h = _act_apply(cfg, stack["act"][i], h, anneal)
    return h


# --------------------------------------------------------------- Radiance
def radiance_init(key: jax.Array, cfg: GarfConfig) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "density1": _init_stack(k1, cfg, RADIANCE_D1_DIMS, act_after_last=True),
        "density2": _init_stack(k2, cfg, RADIANCE_D2_DIMS, act_after_last=False),
        "color": _init_stack(k3, cfg, RADIANCE_COLOR_DIMS, act_after_last=False),
    }


def radiance_apply(
    params: Dict, cfg: GarfConfig, pos: jnp.ndarray, dir: jnp.ndarray,
    act_anneal=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(rgb, density) — argument/return order matches RadianceNetwork.forward."""
    z1 = _apply_stack(cfg, params["density1"], pos, act_anneal)
    z2 = _apply_stack(cfg, params["density2"],
                      jnp.concatenate([z1, pos.astype(z1.dtype)], axis=-1),
                      act_anneal)
    density = softplus8(z2[:, 128].astype(jnp.float32) - 1.0)
    color_in = jnp.concatenate(
        [z1[:, :128] + z2[:, :128], dir.astype(z1.dtype)], axis=-1
    )
    rgb = jax.nn.sigmoid(
        _apply_stack(cfg, params["color"], color_in, act_anneal)
        .astype(jnp.float32)
    )
    return rgb, density


# --------------------------------------------------------------- Proposal
def proposal_init(key: jax.Array, cfg: GarfConfig) -> Dict:
    return {"net": _init_stack(key, cfg, PROPOSAL_DIMS, act_after_last=False)}


def proposal_apply(params: Dict, cfg: GarfConfig, pos: jnp.ndarray,
                   act_anneal=1.0) -> jnp.ndarray:
    """Density-only network; softplus(threshold=8) output, squeezed to (B,)."""
    out = _apply_stack(cfg, params["net"], pos, act_anneal)
    return softplus8(out[..., 0].astype(jnp.float32))


def param_labels(params: Dict, linear_label: str, act_label: str) -> Dict:
    """Label pytree for optax.multi_transform: linear weights vs activation
    bandwidth params (different LR factor, `model_garf_radiance.py:63-77`)."""

    def label_stack(stack):
        return {
            "linear": [jax.tree_util.tree_map(lambda _: linear_label, l) for l in stack["linear"]],
            "act": [jax.tree_util.tree_map(lambda _: act_label, a) for a in stack["act"]],
        }

    return {k: label_stack(v) for k, v in params.items()}
