"""Fused Pallas volume-rendering kernel (the nerfacc `rendering` equivalent).

One kernel computes, per ray tile, everything `ops/render.py:render_full`
does: blocking -> alpha -> transmittance -> weights -> rgb/opacity/depth,
plus a custom VJP kernel for the backward pass. Replaces the reference's
only CUDA component (nerfacc, `barf/model_garf.py:236-243`) with TPU-native
code (SURVEY.md §2.5).

TPU design notes:
  * samples live on the LANE axis; the inclusive/exclusive prefix sums over
    samples are expressed as (S, S) triangular MATMULS so they run on the
    MXU instead of a log-step shift cascade on the VPU:
        exclusive_cumsum(x)[:, j] = sum_{i<j} x[:, i] = (x @ M)[:, j],
        M[i, j] = 1 if i < j.
  * colors are passed as three (N, S) planes to keep every block
    lane-aligned (a (N, S, 3) block would pad 3 -> 128 lanes).
  * backward needs a REVERSE exclusive cumsum — the transposed mask.
  * rgb/opacity/depth are written as an (N, 8) stats block (lane-padded once
    instead of three skinny outputs).

Gradient math (b_i = -sigma_i * delta_i * scale, T_i = exp(sum_{j<i} b_j),
a_i = 1 - exp(b_i), w_i = T_i a_i):
    dL/db_j = sum_{i>j} (gw_i w_i + gT_i T_i) - gw_j T_j exp(b_j)
    dsigma_j = dL/db_j * (-delta_j * scale);  ddelta_j analogous.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_experiments_tpu.ops.render import DENSITY_SCALE

TILE_N = 256


def _strict_lower_mask(s: int, dtype) -> jnp.ndarray:
    """M[i, j] = 1 if i < j: x @ M == exclusive prefix sum over lanes."""
    i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return (i < j).astype(dtype)


def _strict_upper_mask(s: int, dtype) -> jnp.ndarray:
    """M[i, j] = 1 if i > j: x @ M == reverse exclusive suffix sum."""
    i = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return (i > j).astype(dtype)


def _fwd_kernel(dens_ref, dists_ref, tmid_ref, cr_ref, cg_ref, cb_ref,
                weights_ref, trans_ref, stats_ref, *, density_scale):
    dens = dens_ref[:]
    dists = dists_ref[:]
    s = dens.shape[-1]

    blocking = -dens * dists * density_scale
    alpha = 1.0 - jnp.exp(blocking)
    excl = jnp.dot(blocking, _strict_lower_mask(s, blocking.dtype),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(excl)
    weights = trans * alpha

    weights_ref[:] = weights
    trans_ref[:] = trans

    rgb_r = jnp.sum(weights * cr_ref[:], axis=-1)
    rgb_g = jnp.sum(weights * cg_ref[:], axis=-1)
    rgb_b = jnp.sum(weights * cb_ref[:], axis=-1)
    opacity = jnp.sum(weights, axis=-1)
    depth = jnp.sum(weights * tmid_ref[:], axis=-1)
    zeros = jnp.zeros_like(opacity)
    stats_ref[:] = jnp.stack(
        [rgb_r, rgb_g, rgb_b, opacity, depth, zeros, zeros, zeros], axis=-1
    )


def _bwd_kernel(dens_ref, dists_ref, tmid_ref, cr_ref, cg_ref, cb_ref,
                gw_ref, gt_ref, gstats_ref,
                ddens_ref, ddists_ref, dcr_ref, dcg_ref, dcb_ref, *, density_scale):
    dens = dens_ref[:]
    dists = dists_ref[:]
    s = dens.shape[-1]

    # recompute forward intermediates (cheaper than saving them)
    blocking = -dens * dists * density_scale
    exp_b = jnp.exp(blocking)
    alpha = 1.0 - exp_b
    excl = jnp.dot(blocking, _strict_lower_mask(s, blocking.dtype),
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(excl)
    weights = trans * alpha

    g_rgb_r = gstats_ref[:, 0:1]
    g_rgb_g = gstats_ref[:, 1:2]
    g_rgb_b = gstats_ref[:, 2:3]
    g_opacity = gstats_ref[:, 3:4]
    g_depth = gstats_ref[:, 4:5]

    # dL/dw_i: direct + via rgb/opacity/depth
    gw = (
        gw_ref[:]
        + cr_ref[:] * g_rgb_r
        + cg_ref[:] * g_rgb_g
        + cb_ref[:] * g_rgb_b
        + g_opacity
        + tmid_ref[:] * g_depth
    )

    # dL/db: suffix-sum of (gw*w + gT*T) over i>j, minus the diagonal term
    src = gw * weights + gt_ref[:] * trans
    db = jnp.dot(src, _strict_upper_mask(s, src.dtype),
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST) - gw * trans * exp_b

    ddens_ref[:] = db * (-dists * density_scale)
    ddists_ref[:] = db * (-dens * density_scale)
    dcr_ref[:] = weights * g_rgb_r
    dcg_ref[:] = weights * g_rgb_g
    dcb_ref[:] = weights * g_rgb_b


def _row_spec(s):
    return pl.BlockSpec((TILE_N, s), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _run_fwd(dens, dists, tmid, cr, cg, cb, density_scale, interpret):
    n, s = dens.shape
    grid = (pl.cdiv(n, TILE_N),)
    weights, trans, stats = pl.pallas_call(
        functools.partial(_fwd_kernel, density_scale=density_scale),
        grid=grid,
        in_specs=[_row_spec(s)] * 6,
        out_specs=[_row_spec(s), _row_spec(s), _row_spec(8)],
        out_shape=[
            jax.ShapeDtypeStruct((n, s), jnp.float32),
            jax.ShapeDtypeStruct((n, s), jnp.float32),
            jax.ShapeDtypeStruct((n, 8), jnp.float32),
        ],
        interpret=interpret,
    )(dens, dists, tmid, cr, cg, cb)
    return weights, trans, stats


def _run_bwd(dens, dists, tmid, cr, cg, cb, gw, gt, gstats, density_scale, interpret):
    n, s = dens.shape
    grid = (pl.cdiv(n, TILE_N),)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, density_scale=density_scale),
        grid=grid,
        in_specs=[_row_spec(s)] * 8 + [_row_spec(8)],
        out_specs=[_row_spec(s)] * 5,
        out_shape=[jax.ShapeDtypeStruct((n, s), jnp.float32)] * 5,
        interpret=interpret,
    )(dens, dists, tmid, cr, cg, cb, gw, gt, gstats)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _render_core(dens, dists, tmid, colors, density_scale, interpret):
    cr, cg, cb = colors[..., 0], colors[..., 1], colors[..., 2]
    weights, trans, stats = _run_fwd(dens, dists, tmid, cr, cg, cb,
                                     density_scale, interpret)
    return weights, trans, stats


def _render_core_fwd(dens, dists, tmid, colors, density_scale, interpret):
    out = _render_core(dens, dists, tmid, colors, density_scale, interpret)
    return out, (dens, dists, tmid, colors)


def _render_core_bwd(density_scale, interpret, res, grads):
    dens, dists, tmid, colors = res
    gw, gt, gstats = grads
    cr, cg, cb = colors[..., 0], colors[..., 1], colors[..., 2]
    ddens, ddists, dcr, dcg, dcb = _run_bwd(
        dens, dists, tmid, cr, cg, cb, gw, gt, gstats, density_scale, interpret
    )
    dcolors = jnp.stack([dcr, dcg, dcb], axis=-1)
    # no gradient for tmid through depth's t (treated as geometry constant —
    # matches nerfacc, where t gradients flow only via the sigma/rgb closures)
    return ddens, ddists, jnp.zeros_like(tmid), dcolors


_render_core.defvjp(_render_core_fwd, _render_core_bwd)


def render_full_pallas(
    densities: jnp.ndarray,
    colors: jnp.ndarray,
    t_start: jnp.ndarray,
    t_end: jnp.ndarray,
    density_scale: float = DENSITY_SCALE,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, dict]:
    """Drop-in for `ops.render.render_full`, fused on TPU."""
    dists = t_end - t_start
    tmid = (t_start + t_end) / 2.0
    weights, trans, stats = _render_core(
        densities.astype(jnp.float32), dists.astype(jnp.float32),
        tmid.astype(jnp.float32), colors.astype(jnp.float32),
        density_scale, interpret,
    )
    rgb = stats[:, 0:3]
    opacity = stats[:, 3:4]
    depth = stats[:, 4:5]
    return rgb, opacity, depth, {"trans": trans, "weights": weights}


def render_rays_pallas(
    densities: jnp.ndarray,
    colors: jnp.ndarray,
    dists: jnp.ndarray,
    density_scale: float = DENSITY_SCALE,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for `ops.render.render_rays` (rgb, weights)."""
    zeros = jnp.zeros_like(dists)
    weights, _, stats = _render_core(
        densities.astype(jnp.float32), dists.astype(jnp.float32),
        zeros, colors.astype(jnp.float32), density_scale, interpret,
    )
    return stats[:, 0:3], weights
