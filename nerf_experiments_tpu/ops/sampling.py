"""t-sampling along rays: stratified/equidistant init + inverse-CDF resampling.

Reference semantics:
  * `barf/model_interpolation.py:135-180` `_sample_t_stratified_uniform`:
    n equally sized bins over [near, far], either one uniform sample per bin
    ("stratified_uniform") or the left edges ("equidistant"); optionally the
    whole comb shifted by a shared uniform offset in
    [0, interval * offset_size) (offset_size may be negative).
  * `:114-132` `_get_intervals`: t_start = t, t_end = next t (last = far).
  * `:193-277` `_sample_t_pdf_weighted`: deterministic proposal-guided
    re-sampling — each coarse bin receives floor(w_i * (n - n_bins)) (+1)
    samples spread evenly inside the bin. That allocator is order-dependent
    and self-repairing (SURVEY.md §7.3); here it is replaced by the
    shape-static equivalent: deterministic inverse-CDF sampling with evenly
    spaced quantiles and linear in-bin placement, which realizes the same
    "evenly spread, density-proportional" distribution without the
    pathological integer allocation loop.
  * lindisp (uniform in inverse depth) init sampling for the nerfacc-style
    proposal estimator (`barf/model_garf.py:222-233` sampling_type="lindisp").
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def take_along_last(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """take_along_axis(a, idx, axis=-1) via a FLATTENED 1-D gather.

    jnp.take_along_axis's multi-dim gather trips a ~300s pathological compile
    in this libtpu AOT pipeline; the flattened equivalent compiles in ~1s
    and lowers to the same vectorized gather. a (N, W), idx (N, S) -> (N, S).
    """
    n, w = a.shape
    flat_idx = (idx + jnp.arange(n)[:, None] * w).reshape(-1)
    return a.reshape(-1)[flat_idx].reshape(idx.shape)


def searchsorted_rows(
    sorted_arr: jnp.ndarray, queries: jnp.ndarray, side: str = "right"
) -> jnp.ndarray:
    """Row-wise searchsorted as a comparison-SUM instead of binary search.

    Binary search lowers to a serial chain of dynamic gathers — slow on TPU
    (measured: dominates the proposal estimator). For the bin counts here
    (W <= a few hundred) the dense (N, S, W) comparison is a trivial VPU
    reduction and ~10x faster end-to-end.
    sorted_arr (N, W), queries (N, S) -> indices (N, S) int32.
    """
    if side == "right":
        cmp = sorted_arr[:, None, :] <= queries[:, :, None]
    else:
        cmp = sorted_arr[:, None, :] < queries[:, :, None]
    return jnp.sum(cmp.astype(jnp.int32), axis=-1)


def onehot_select(values: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """values (N, W), idx (N, Q) -> values[n, idx[n, q]] via a one-hot MXU
    einsum (TPU gathers run on the scalar unit; for W up to a few hundred
    the dense one-hot matmul is much faster)."""
    w = values.shape[-1]
    oh = (idx[..., None] == jnp.arange(w, dtype=idx.dtype)).astype(values.dtype)
    return jnp.einsum("nqw,nw->nq", oh, values, precision=jax.lax.Precision.HIGHEST)


def intervals_from_t(t: jnp.ndarray, far: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """t (N, S) sorted -> (t_start, t_end) with t_end[-1] = far."""
    t_start = t
    t_end = jnp.concatenate([t[:, 1:], jnp.full_like(t[:, :1], far)], axis=1)
    return t_start, t_end


def sample_stratified(
    key: Optional[jax.Array],
    n_rays: int,
    n_samples: int,
    near: float,
    far: float,
    strategy: str = "stratified_uniform",
    offset_size: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform-bin coarse sampling. Returns (t_start, t_end), each (N, S)."""
    interval = (far - near) / n_samples
    t = jnp.broadcast_to(
        jnp.linspace(near, far - interval, n_samples), (n_rays, n_samples)
    )
    if strategy == "stratified_uniform":
        if key is None:
            raise ValueError("stratified_uniform requires a PRNG key")
        key, sub = jax.random.split(key)
        t = t + jax.random.uniform(sub, (n_rays, n_samples)) * interval
    elif strategy == "equidistant":
        pass
    else:
        raise ValueError(f"unknown sampling strategy {strategy!r}")

    if offset_size != 0.0:
        if key is None:
            raise ValueError("offset_size != 0 requires a PRNG key")
        _, sub = jax.random.split(key)
        t = t + jax.random.uniform(sub, (n_rays, 1)) * interval * offset_size

    return intervals_from_t(t, far)


def t_query(t_start: jnp.ndarray, t_end: jnp.ndarray, strategy: str = "middle") -> jnp.ndarray:
    """Integration query point per bin (`_get_t_query:279-286`)."""
    if strategy == "left":
        return t_start
    if strategy == "middle":
        return (t_start + t_end) / 2.0
    raise ValueError(f"unknown integration strategy {strategy!r}")


def sample_pdf(
    t_edges: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    key: Optional[jax.Array] = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Inverse-CDF resampling from a piecewise-constant PDF over bins.

    t_edges: (N, B+1) bin edges; weights: (N, B) nonnegative bin masses.
    Returns sorted t samples (N, n_samples). Deterministic (evenly spaced
    quantiles) when key is None — the shape-static replacement for the
    reference's allocator; stratified-jittered quantiles when key is given
    (used by the proposal estimator during training).
    """
    n_rays, n_bins = weights.shape
    w = weights + eps
    pdf = w / jnp.sum(w, axis=-1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros((n_rays, 1), w.dtype), jnp.cumsum(pdf, axis=-1)], axis=-1
    )  # (N, B+1), last column == 1

    if key is None:
        u = (jnp.arange(n_samples, dtype=w.dtype) + 0.5) / n_samples
        u = jnp.broadcast_to(u, (n_rays, n_samples))
    else:
        u = (
            jnp.arange(n_samples, dtype=w.dtype)[None, :]
            + jax.random.uniform(key, (n_rays, n_samples), dtype=w.dtype)
        ) / n_samples

    # Bin selection as a ONE-HOT MATMUL: gathers on TPU run on the scalar
    # unit and dominated the estimator (measured); the (N, S, B) one-hot is
    # a by-product of the dense comparison and the four "gathers" become
    # batched MXU einsums. Residual mass (u beyond cdf's last edge from fp
    # rounding) is dumped into the last bin.
    cmp = (cdf[:, None, :] <= u[:, :, None]).astype(w.dtype)  # (N, S, B+1)
    onehot = cmp[..., :-1] * (1.0 - cmp[..., 1:])  # (N, S, B)
    onehot = onehot.at[..., -1].add(1.0 - jnp.sum(onehot, axis=-1))

    def sel(vals):  # (N, B) -> (N, S)
        return jnp.einsum("nsb,nb->ns", onehot, vals,
                          precision=jax.lax.Precision.HIGHEST)

    # t = e_lo + (u - cdf_lo)/denom * (e_hi - e_lo). sel() is linear and u is
    # constant over b, so this folds into TWO selections instead of four:
    # t = sel(e_lo - cdf_lo * k) + u * sel(k), with k = d_edge / denom.
    d_cdf = cdf[:, 1:] - cdf[:, :-1]
    denom = jnp.where(d_cdf < eps, 1.0, d_cdf)
    k = (t_edges[:, 1:] - t_edges[:, :-1]) / denom
    return sel(t_edges[:, :-1] - cdf[:, :-1] * k) + u * sel(k)


def sample_pdf_weighted_intervals(
    t_coarse_start: jnp.ndarray,
    t_coarse_end: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    far: float,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for `_sample_t_pdf_weighted` (fine sampling).

    Builds bin edges from the coarse intervals, inverse-CDF samples
    n_samples points, sorts, and converts back to (t_start, t_end) bins.
    """
    edges = jnp.concatenate([t_coarse_start, t_coarse_end[:, -1:]], axis=1)
    # NOTE no sort needed: the quantiles u are monotone by construction
    # (deterministic midpoints, or stratified (k + U[0,1))/n), and inverse-CDF
    # through a monotone CDF over sorted edges preserves order.
    t = sample_pdf(edges, weights, n_samples, key=key)
    return intervals_from_t(t, far)


def lindisp_edges(
    n_rays: int,
    n_bins: int,
    near: float,
    far: float,
    stratified: bool,
    key: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Bin edges uniform in inverse depth (nerfacc "lindisp"), (N, B+1).

    With stratified=True the interior edges are jittered inside their cells
    in s-space (s = normalized inverse depth), matching nerfacc's stratified
    initial sampling semantics.
    """
    s = jnp.linspace(0.0, 1.0, n_bins + 1, dtype=dtype)
    s = jnp.broadcast_to(s, (n_rays, n_bins + 1))
    if stratified:
        if key is None:
            raise ValueError("stratified lindisp requires a PRNG key")
        delta = 1.0 / n_bins
        jitter = (jax.random.uniform(key, (n_rays, n_bins + 1), dtype=dtype) - 0.5) * delta
        # keep the outer edges pinned
        pin = jnp.concatenate(
            [jnp.zeros((n_rays, 1)), jnp.ones((n_rays, n_bins - 1)), jnp.zeros((n_rays, 1))],
            axis=1,
        )
        s = s + jitter * pin
    # s -> t uniform in disparity: 1/t = (1-s)/near + s/far
    return 1.0 / ((1.0 - s) / near + s / far)
