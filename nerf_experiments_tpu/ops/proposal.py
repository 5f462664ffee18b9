"""Transmittance-estimator sampling + proposal (interlevel) loss.

TPU-native equivalent of the reference's only CUDA dependency, nerfacc's
`PropNetEstimator` (`barf/model_garf.py:222-233` `.sampling(...,
sampling_type="lindisp", stratified=training)` and `:279`
`.compute_loss(trans)`), re-designed as pure fixed-shape JAX:

  1. initial bin edges uniform in normalized inverse depth (s-space),
     stratified-jittered during training;
  2. proposal network sigma evaluation over the bins;
  3. compositing weights -> piecewise-constant PDF over s;
  4. inverse-CDF resampling of the radiance bin edges (stratified during
     training, deterministic midpoints otherwise);
  5. the Mip-NeRF 360 interlevel ("PropNet histogram") loss between the
     recorded proposal histogram and the final radiance weights.

Everything is (n_rays, n_bins)-shaped with static shapes — no CUDA kernels,
no dynamic allocation; XLA fuses the compositing chain and the gather from
`sample_pdf` maps onto vectorized TPU gathers.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nerf_experiments_tpu.ops.render import render_weights
from nerf_experiments_tpu.ops.sampling import sample_pdf


class ProposalAux(NamedTuple):
    """Recorded proposal histograms for the interlevel loss (one per level)."""

    s_edges: Tuple[jnp.ndarray, ...]  # each (N, B_l + 1), in [0, 1]
    weights: Tuple[jnp.ndarray, ...]  # each (N, B_l)
    final_s_edges: jnp.ndarray  # (N, S + 1)


def s_to_t(s: jnp.ndarray, near: float, far: float, sampling_type: str) -> jnp.ndarray:
    if sampling_type == "lindisp":
        return 1.0 / ((1.0 - s) / near + s / far)
    if sampling_type == "uniform":
        return near + s * (far - near)
    raise ValueError(f"unknown sampling_type {sampling_type!r}")


def _initial_edges(
    key: Optional[jax.Array], n_rays: int, n_bins: int, stratified: bool, dtype=jnp.float32
) -> jnp.ndarray:
    s = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_bins + 1, dtype=dtype), (n_rays, n_bins + 1))
    if stratified:
        if key is None:
            raise ValueError("stratified sampling requires a PRNG key")
        delta = 1.0 / n_bins
        jitter = (jax.random.uniform(key, (n_rays, n_bins + 1), dtype=dtype) - 0.5) * delta
        pin = jnp.concatenate(
            [
                jnp.zeros((n_rays, 1), dtype),
                jnp.ones((n_rays, n_bins - 1), dtype),
                jnp.zeros((n_rays, 1), dtype),
            ],
            axis=1,
        )
        s = s + jitter * pin
    return s


def sampling(
    prop_sigma_fns: Sequence[Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]],
    prop_samples: Sequence[int],
    num_samples: int,
    n_rays: int,
    near_plane: float,
    far_plane: float,
    sampling_type: str = "lindisp",
    stratified: bool = False,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, ProposalAux]:
    """nerfacc `PropNetEstimator.sampling` equivalent.

    Each `prop_sigma_fns[l]` maps (t_starts, t_ends) of shape (N, B_l) to
    densities (N, B_l). Returns (t_starts, t_ends) of shape (N, num_samples)
    plus the recorded histograms for `compute_loss`.

    Gradients: like nerfacc with requires_grad=False on the sample
    positions, the resampled edges are stop-gradiented — the proposal net
    trains only through the interlevel loss, keeping the radiance gradient
    path clean and the compile graph small.
    """
    keys = (
        list(jax.random.split(key, len(prop_samples) + 2))
        if key is not None
        else [None] * (len(prop_samples) + 2)
    )

    s_edges = _initial_edges(keys[0], n_rays, prop_samples[0], stratified)
    rec_edges = []
    rec_weights = []

    for level, (fn, n_bins) in enumerate(zip(prop_sigma_fns, prop_samples)):
        t_edges = s_to_t(s_edges, near_plane, far_plane, sampling_type)
        t_starts, t_ends = t_edges[:, :-1], t_edges[:, 1:]
        sigmas = fn(t_starts, t_ends)
        weights, _, _ = render_weights(sigmas, t_ends - t_starts)

        rec_edges.append(s_edges)
        rec_weights.append(weights)

        next_n = (
            prop_samples[level + 1] if level + 1 < len(prop_samples) else num_samples
        )
        # Resample next level's edges from this level's histogram (in s-space).
        # No sort: monotone quantiles through a monotone CDF stay sorted.
        resample_key = keys[level + 1] if stratified else None
        new_s = sample_pdf(s_edges, jax.lax.stop_gradient(weights), next_n + 1, key=resample_key)
        s_edges = jax.lax.stop_gradient(new_s)

    t_edges = s_to_t(s_edges, near_plane, far_plane, sampling_type)
    aux = ProposalAux(
        s_edges=tuple(rec_edges), weights=tuple(rec_weights), final_s_edges=s_edges
    )
    return t_edges[:, :-1], t_edges[:, 1:], aux


def _outer_measure(
    edges_q: jnp.ndarray, edges_ref: jnp.ndarray, w_ref: jnp.ndarray
) -> jnp.ndarray:
    """For each query interval [edges_q_i, edges_q_{i+1}], the total ref mass
    of every ref interval that OVERLAPS it (outer measure, Mip-NeRF 360 eq. 13).

    edges_q (N, Q+1), edges_ref (N, R+1), w_ref (N, R) -> (N, Q).
    """
    # A ref interval r contributes to query q iff it OVERLAPS [q_lo, q_hi]:
    # ref_end_r >= q_lo AND ref_start_r <= q_hi. For sorted edges this is
    # exactly the searchsorted/cumsum formulation (ref mass with index in
    # [lo_idx_q, hi_idx_q)), but as ONE dense mask + ONE MXU einsum instead
    # of two comparison-sum searchsorteds + two one-hot selections
    # (binary search / gathers are TPU anti-patterns here).
    ref_start = edges_ref[:, None, :-1]  # (N, 1, R)
    ref_end = edges_ref[:, None, 1:]
    q_lo = edges_q[:, :-1, None]         # (N, Q, 1)
    q_hi = edges_q[:, 1:, None]
    overlap = jnp.logical_and(ref_end >= q_lo, ref_start <= q_hi)
    return jnp.einsum(
        "nqr,nr->nq", overlap.astype(w_ref.dtype), w_ref,
        precision=jax.lax.Precision.HIGHEST)


def compute_loss(
    aux: ProposalAux, final_weights: jnp.ndarray, eps: float = 1e-7
) -> jnp.ndarray:
    """Interlevel (PropNet histogram) loss — nerfacc `compute_loss` parity.

    Penalizes proposal histograms that under-estimate mass where the final
    radiance weights put mass: mean over proposal bins of
    clip(outer(final) - w_prop, 0)^2 / (w_prop + eps).
    """
    final_weights = jax.lax.stop_gradient(final_weights)
    loss = 0.0
    for s_edges, w_prop in zip(aux.s_edges, aux.weights):
        w_outer = _outer_measure(s_edges, aux.final_s_edges, final_weights)
        excess = jnp.clip(jax.lax.stop_gradient(w_outer) - w_prop, 0.0, None)
        loss = loss + jnp.mean(excess**2 / (w_prop + eps))
    return loss
