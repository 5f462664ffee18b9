"""Forward-only render mega-kernel: rays -> pixels in ONE Pallas program.

Per ray tile, entirely in VMEM: equidistant t bins -> sample positions ->
BARF-masked Fourier encodings (VPU transcendentals) -> segmented NerfModel
MLP (MXU GEMM chain) -> softplus/sigmoid heads -> alpha compositing
(triangular-matmul prefix sum). Zero intermediate HBM traffic: inputs are
(N, 3) rays + the weights, output is (N, 8) pixel stats.

Scope: inference/serving (the image-logger / render_views / eval path,
SURVEY.md §3.4) for the flagship architecture — Barf encodings with
include_identity, delayed_direction=True, delayed_density=False. Training
still uses the XLA path. Raises for unsupported configs.

MEASURED STATUS (v5e, 4096 rays x 128 samples, bf16): 12.2 ms vs the XLA
render path's 8.4 ms — correct but SLOWER. Constraints found: VMEM scoped
allocation caps the tile at 16 rays (2048 sample rows; 32 rays wants 29.8M
vs the 16M budget), and 2048-row GEMMs with unaligned input dims (63/319/283)
relayout per tile where XLA amortizes across the full batch. Kept as a
correct, tested EXPERIMENTAL kernel: the round-2 path is wider tiles via
streaming the chain (one weight matrix resident at a time) + padded dims.
Mosaic lowering rules learned here (integer iota only, no (T,S)->(T*S,1)
shape cast, no integer indexing) are load-bearing for any future kernel.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_experiments_tpu.ops.render import DENSITY_SCALE

TILE_R = 16  # rays per tile (TILE_R * S sample rows live in VMEM)


def _barf_mask_k(levels, alpha, dtype):
    # Mosaic iota must be integer-typed; cast after
    k = jax.lax.broadcasted_iota(jnp.int32, (1, levels), 1).astype(dtype)
    ramp = jnp.clip(alpha - k, 0.0, 1.0)
    return (1.0 - jnp.cos(ramp * jnp.pi)) / 2.0  # (1, L)


def _encode_barf(x, levels, scale, alpha, dtype):
    """x (B, 3) -> (B, 3 + 6L) Barf encoding with identity, channel-major."""
    lv = jax.lax.broadcasted_iota(jnp.int32, (1, levels), 1).astype(jnp.float32)
    freq = scale * (2.0 ** lv)  # (1, L)
    # channel-major [x*f..., y*f..., z*f...] with 2-D ops only (Mosaic kernels
    # do not lower general 3-D broadcasts/reshapes)
    args = jnp.concatenate([x[:, k : k + 1] * freq for k in range(3)], axis=-1)
    mask = jnp.tile(_barf_mask_k(levels, alpha, jnp.float32), (1, 3))  # (1, 3L)
    out = jnp.concatenate([x, mask * jnp.cos(args), mask * jnp.sin(args)], axis=-1)
    return out.astype(dtype)


def _chain(h, wb, n_layers, compute_dtype):
    for i in range(n_layers):
        w, b = wb[2 * i][:], wb[2 * i + 1][:]
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
            w = w.astype(compute_dtype)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if i < n_layers - 1:
            h = jax.nn.relu(h)
            if compute_dtype is not None:
                # keep live intermediates at compute width (VMEM budget)
                h = h.astype(compute_dtype)
    return h


def _mega_kernel(
    static, pos_ref, dirs_ref, tq_ref, dists_ref, alpha_pos_ref, alpha_dir_ref,
    *refs,
):
    """pos/dirs/tq/dists arrive as per-SAMPLE rows (T*S, .) — Mosaic cannot
    shape-cast (T, S) -> (T*S, 1), so the cheap ray->sample expansion happens
    in XLA; everything heavy (encodings, MLP, compositing) stays in-kernel."""
    (S, lv_pos, lv_dir, enc_scale, n_seg1, n_seg2, n_color,
     density_scale, compute_dtype) = static
    out_ref = refs[-1]
    wb = refs[:-1]
    wb_seg1 = wb[: 2 * n_seg1]
    wb_seg2 = wb[2 * n_seg1 : 2 * (n_seg1 + n_seg2)]
    wb_color = wb[2 * (n_seg1 + n_seg2) :]

    pos = pos_ref[:]  # (T*S, 3)
    dirs_rep = dirs_ref[:]  # (T*S, 3)
    alpha_pos = alpha_pos_ref[0, 0]
    alpha_dir = alpha_dir_ref[0, 0]
    T = pos.shape[0] // S

    pos_enc = _encode_barf(pos, lv_pos, enc_scale, alpha_pos, compute_dtype or jnp.float32)
    dir_enc = _encode_barf(dirs_rep, lv_dir, enc_scale, alpha_dir,
                           compute_dtype or jnp.float32)

    z = _chain(pos_enc, wb_seg1, n_seg1, compute_dtype)
    z = jax.nn.relu(z)
    if compute_dtype is not None:
        z = z.astype(compute_dtype)
    z = _chain(jnp.concatenate([z, pos_enc], axis=-1), wb_seg2, n_seg2, compute_dtype)

    # slice (not integer-index): integer indexing lowers to dynamic_slice,
    # which Mosaic does not implement
    density_raw = z[:, -1:].astype(jnp.float32)  # (B, 1)
    density = jnp.where(density_raw > 8.0, density_raw,
                        jax.nn.softplus(jnp.minimum(density_raw, 8.0)))

    color_in = jnp.concatenate(
        [z[:, :-1].astype(pos_enc.dtype), dir_enc], axis=-1
    )
    rgb_logits = _chain(color_in, wb_color, n_color, compute_dtype)
    rgb = jax.nn.sigmoid(rgb_logits[:, :3].astype(jnp.float32))

    # compositing (triangular-matmul exclusive prefix sum over samples);
    # (T*S, 1) -> (T, S) is the SUPPORTED shape-cast direction
    density = density.reshape(T, S)
    dists = dists_ref[:].reshape(T, S)
    t_q = tq_ref[:].reshape(T, S)
    blocking = -density * dists * density_scale
    i_m = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j_m = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    lower = (i_m < j_m).astype(jnp.float32)
    excl = jnp.dot(blocking, lower, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    trans = jnp.exp(excl)
    weights = trans * (1.0 - jnp.exp(blocking))

    cr = rgb[:, 0:1].reshape(T, S)
    cg = rgb[:, 1:2].reshape(T, S)
    cb = rgb[:, 2:3].reshape(T, S)
    out_r = jnp.sum(weights * cr, axis=-1, keepdims=True)
    out_g = jnp.sum(weights * cg, axis=-1, keepdims=True)
    out_b = jnp.sum(weights * cb, axis=-1, keepdims=True)
    opacity = jnp.sum(weights, axis=-1, keepdims=True)
    depth = jnp.sum(weights * t_q, axis=-1, keepdims=True)
    zeros = jnp.zeros_like(opacity)
    out_ref[:] = jnp.concatenate(
        [out_r, out_g, out_b, opacity, depth, zeros, zeros, zeros], axis=-1
    )


def flagship_render(
    params: dict,
    cfg,  # NerfMLPConfig with Barf encoders
    origs: jnp.ndarray,
    dirs: jnp.ndarray,
    offsets: jnp.ndarray,  # (N, 1) shared per-ray t offset (0 for deterministic)
    alpha_pos,
    alpha_dir,
    n_samples: int,
    near: float,
    far: float,
    density_scale: float = DENSITY_SCALE,
    interpret: bool = False,
) -> jnp.ndarray:
    """rgb (N, 3) for the flagship BARF architecture, one fused kernel.

    Requires: 2 encoders of type Barf with include_identity, n_segments == 2,
    delayed_direction=True, delayed_density=False (raises otherwise).
    """
    from nerf_experiments_tpu.encodings.fourier import Barf

    pe, de = cfg.position_encoder, cfg.direction_encoder
    if not (
        isinstance(pe, Barf) and isinstance(de, Barf)
        and pe.include_identity and de.include_identity
        and cfg.n_segments == 2 and cfg.delayed_direction
        and not cfg.delayed_density and pe.scale == de.scale
    ):
        raise ValueError("flagship_render supports the canonical BARF config only")

    wb = []
    counts = []
    for seg in params["segments"]:
        counts.append(len(seg["layers"]))
        for l in seg["layers"]:
            wb.append(l["w"].astype(jnp.float32))
            wb.append(l["b"].astype(jnp.float32).reshape(1, -1))
    counts.append(len(params["color"]))
    for l in params["color"]:
        wb.append(l["w"].astype(jnp.float32))
        wb.append(l["b"].astype(jnp.float32).reshape(1, -1))

    n = origs.shape[0]
    pad = (-n) % TILE_R
    if pad:
        zp = lambda x: jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)
        origs, dirs, offsets = zp(origs), zp(dirs), zp(offsets)
    n_pad = origs.shape[0]
    S = n_samples

    # ray -> sample-row expansion in XLA (cheap; fused into the input copy)
    interval = (float(far) - float(near)) / S
    s_idx = jnp.arange(S, dtype=jnp.float32)[None, :]
    t_start = float(near) + interval * s_idx + offsets
    t_end = jnp.concatenate([t_start[:, 1:], jnp.full_like(t_start[:, :1], float(far))], 1)
    dists = (t_end - t_start).reshape(n_pad * S, 1)
    t_q = ((t_start + t_end) / 2.0).reshape(n_pad * S, 1)
    pos = (origs[:, None, :] + ((t_start + t_end) / 2.0)[:, :, None]
           * dirs[:, None, :]).reshape(n_pad * S, 3)
    dirs_rep = jnp.broadcast_to(dirs[:, None, :], (n_pad, S, 3)).reshape(n_pad * S, 3)

    static = (
        S, pe.levels, de.levels,
        float(pe.scale), counts[0], counts[1], counts[2],
        float(density_scale), cfg.compute_dtype,
    )

    rows = lambda w: pl.BlockSpec((TILE_R * S, w), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    tile = lambda w: pl.BlockSpec((TILE_R, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [rows(3), rows(3), rows(1), rows(1), smem, smem]
    in_specs += [full(x.shape) for x in wb]

    stats = pl.pallas_call(
        functools.partial(_mega_kernel, static),
        grid=(pl.cdiv(n_pad, TILE_R),),
        in_specs=in_specs,
        out_specs=tile(8),
        out_shape=jax.ShapeDtypeStruct((n_pad, 8), jnp.float32),
        interpret=interpret,
    )(
        pos.astype(jnp.float32), dirs_rep.astype(jnp.float32),
        t_q.astype(jnp.float32), dists.astype(jnp.float32),
        jnp.asarray(alpha_pos, jnp.float32).reshape(1, 1),
        jnp.asarray(alpha_dir, jnp.float32).reshape(1, 1),
        *wb,
    )
    rgb = stats[:, :3]
    return rgb[:n] if pad else rgb
