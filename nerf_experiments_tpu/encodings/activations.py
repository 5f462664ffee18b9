"""Learnable-bandwidth activations: Gaussian (GARF), Gabor (GaborF), SARF, SIREN.

The reference implements each with a hand-written `th.autograd.Function`
backward (`barf/gaussian.py:8-31`, `gaborf/gabor.py:8-29`,
`sarf/activation.py:8-37`) purely to save memory — the gradients are exact.
On TPU the same effect falls out of `jax.custom_vjp` + XLA fusion; we define
custom VJPs that recompute the cheap transcendentals in the backward pass
instead of saving them (rematerialization), matching the reference's
memory-saving intent the XLA way.

Parameterization parity:
  * GaussAct: learnable `inv_standard_deviation` per feature; forward uses
    inv_variance = isd**2 + 1e-6 (`barf/gaussian.py:57-63`).
  * GaborAct: adds learnable `spread`; exp(-v x^2) cos(s x) (`gaborf/gabor.py`).
  * SarfAct: the LIVE forward is the damped cosine
    cos(f / (x^2 + 1/f^2)) * exp(-x^2) with the sign-safe x shift
    (`sarf/activation.py:62-65`) — NOT the sin(fx)/x autograd.Function above
    it, which is dead code. Both are provided; `sarf_act` is the live one.
  * SIREN: sin(omega * Wx + b) with the SIREN init (`nerf-siren/linear_sine.py`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- Gaussian
@jax.custom_vjp
def gauss_act(x: jnp.ndarray, inv_variance: jnp.ndarray) -> jnp.ndarray:
    """exp(-x^2 * v). v broadcasts over the feature (last) axis."""
    return jnp.exp(-(x**2) * inv_variance)


def _gauss_fwd(x, v):
    return gauss_act(x, v), (x, v)


def _gauss_bwd(res, g):
    x, v = res
    x2 = x**2
    g_exp = g * jnp.exp(-x2 * v)
    dx = -g_exp * 2.0 * x * v
    dv_full = -g_exp * x2
    # reduce over broadcasted batch dims
    dv = jnp.sum(dv_full.reshape(-1, v.shape[-1]), axis=0) if dv_full.ndim > v.ndim else dv_full
    return dx, dv.reshape(v.shape)


gauss_act.defvjp(_gauss_fwd, _gauss_bwd)


def gauss_from_isd(x: jnp.ndarray, inv_standard_deviation: jnp.ndarray) -> jnp.ndarray:
    """GaussAct.forward parity: v = isd^2 + 1e-6."""
    return gauss_act(x, inv_standard_deviation**2 + 1e-6)


# ------------------------------------------------------------------- Gabor
@jax.custom_vjp
def gabor_act(x: jnp.ndarray, inv_variance: jnp.ndarray, spread: jnp.ndarray) -> jnp.ndarray:
    """exp(-v x^2) cos(s x)."""
    return jnp.exp(-inv_variance * x**2) * jnp.cos(spread * x)


def _gabor_fwd(x, v, s):
    return gabor_act(x, v, s), (x, v, s)


def _gabor_bwd(res, g):
    x, v, s = res
    go_mevx2 = -jnp.exp(-v * x**2) * g
    dx = go_mevx2 * (2.0 * jnp.cos(s * x) * v * x + s * jnp.sin(s * x))
    dv_full = go_mevx2 * x**2 * jnp.cos(s * x)
    ds_full = go_mevx2 * x * jnp.sin(s * x)
    if dv_full.ndim > v.ndim:
        dv = jnp.sum(dv_full.reshape(-1, v.shape[-1]), axis=0).reshape(v.shape)
        ds = jnp.sum(ds_full.reshape(-1, s.shape[-1]), axis=0).reshape(s.shape)
    else:
        dv, ds = dv_full, ds_full
    return dx, dv, ds


gabor_act.defvjp(_gabor_fwd, _gabor_bwd)


def gabor_from_isd(x, inv_standard_deviation, spread, anneal=1.0):
    """anneal in [0, 1] scales the oscillation frequency (spread): at 0 the
    activation is exactly GaussAct (which calibrates cameras — RESULTS.md),
    at 1 the full Gabor. The coarse-to-fine activation annealing is this
    framework's family-specific analog of BARF's encoding-alpha window —
    the reference never calibrates gaborf/sarf (e.g. `sarf/main.py` ships
    camera LR 4e-9, i.e. frozen cameras)."""
    return gabor_act(x, inv_standard_deviation**2 + 1e-6, spread * anneal)


# -------------------------------------------------------------------- SARF
def _sign_safe(x: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    """(signbit(x)*2-1) * (|x| + eps) — the reference's zero-avoidance shift.

    NOTE torch `signbit` is True for negatives, so this maps x>=0 to
    -( x + eps) and x<0 to (|x|+eps)... i.e. it also flips sign. Reproduced
    exactly (it only matters through even powers in the live formula).
    """
    return (jnp.signbit(x).astype(x.dtype) * 2.0 - 1.0) * (jnp.abs(x) + eps)


def sarf_act(x: jnp.ndarray, frequency: jnp.ndarray, anneal=1.0) -> jnp.ndarray:
    """Live SARF forward (`sarf/activation.py:63-65`):
    cos(f / (x'^2 + 1/f^2)) * exp(-x'^2) with x' sign-safe-shifted.

    anneal in [0, 1] scales the cosine's phase argument: at 0 the
    activation is the pure Gaussian bump exp(-x'^2) (calibration-friendly),
    at 1 the full damped cosine — see gabor_from_isd."""
    xs = _sign_safe(x)
    theta = frequency / (xs**2 + 1.0 / frequency**2)
    return jnp.cos(anneal * theta) * jnp.exp(-(xs**2))


def sarf_sinc_act(x: jnp.ndarray, frequency: jnp.ndarray) -> jnp.ndarray:
    """The dead-code sin(fx)/x variant (`sarf/activation.py:8-37`), kept for
    ablation parity."""
    xs = _sign_safe(x)
    return jnp.sin(frequency * xs) / xs


# ------------------------------------------------------------------- SIREN
def siren_init(key: jax.Array, in_features: int, out_features: int, omega: float, first_layer: bool):
    """SIREN weight init (`nerf-siren/linear_sine.py:31-40`): U(-1,1) scaled
    by 1/in for the first layer, sqrt(6/in)/omega otherwise. Bias: torch
    nn.Linear default U(-1/sqrt(in), 1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    if first_layer:
        width = 1.0 / in_features
    else:
        width = jnp.sqrt(6.0 / in_features) / omega
    w = jax.random.uniform(kw, (in_features, out_features), minval=-1.0, maxval=1.0) * width
    bound = 1.0 / jnp.sqrt(in_features)
    b = jax.random.uniform(kb, (out_features,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def siren_apply(params, x: jnp.ndarray, omega: float) -> jnp.ndarray:
    """sin(W (omega*x) + b) — the reference scales the INPUT by omega."""
    return jnp.sin((omega * x) @ params["w"] + params["b"])
