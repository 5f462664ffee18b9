"""Training mega-kernel: forward + compositing + loss-grad + backward of the
flagship BARF radiance field in ONE Pallas launch per ray tile.

Why: the canonical train step (`barf/run_barf.py:183-196` workload — batch
1024 rays x 128 samples, NerfModel 4x256 x 2 segments) is HBM-bound in XLA:
every (B*S, 256) layer activation round-trips to HBM in forward AND backward
(~1.6 GB/step; measured 8.2 ms => 131k rays/s). This kernel keeps the whole
chain's activations in VMEM from forward THROUGH backward — no HBM spills,
no recompute — so total MXU work is the true 3x-forward roofline.

Design notes (Mosaic rules from round 1 + this kernel's VMEM lessons):

  * Padded-E encodings (v4). The BARF encoding [x, m*cos, m*sin] lives in
    ONE native (B, 128) buffer: A = x @ K128 (identity + duplicated freq
    selector columns, host-built), E = xm*A + mc*cos(A) + ms*sin(A) with
    (1, 128) column masks (the BARF window folded in). Every consumer is a
    single K=128 GEMM against 128-row padded weights, and the encoding
    backward is one elementwise chain + dA @ K128^T. v2/v3 used three
    split tiny-K dots per consumer (x@Wx + mcos@Wc + msin@Ws) — each
    K=3/30 dot still costs a full MXU pass, ~35% extra passes overall
    (measured: bare 11-GEMM chain runs 56% MFU, v3 forward ran ~30%).
  * ReLU masks are NOT stored (v3): the backward derives each mask from the
    stored post-relu activation itself — mask = (h > 0) with h upcast to
    fp32 for the compare (Mosaic cannot compare bf16). h = cde(max(z, 0))
    makes the recomputed mask exact: h > 0 iff z rounded to a positive
    value, and where bf16 rounding flushed a denormal-positive z to +0 the
    true gradient is itself zero at compute precision. Dropping the masks
    halves resident activation VMEM, which buys an 8-ray tile (B = 1024
    sample rows) — half the grid iterations and better GEMM shapes.
  * Static masks are kernel INPUTS, not per-tile iota builds: strict
    lower/upper triangular (S, S) for the compositing prefix/suffix sums,
    and the E (B, T) / F (B, S) row/col selectors for (T, S) <-> row-space
    conversions.
  * The hidden + density heads share one (D, D+128) GEMM (128-padded density
    columns), sliced at the 128-aligned boundary; their backward is one
    (B, D+128) cotangent concat (aligned) through the same merged weight.
  * VMEM padding: any (B, k<128) array occupies full (B, 128) lanes, so
    per-SAMPLE scalars (density, blocking, transmittance, weights) live in
    (T, S) planes (one 4 kB tile each), reached via the SUPPORTED
    (B, 1) -> (T, S) reshape. The reverse reshape does not exist in Mosaic;
    the two places a (T, S) value must return to row space (compositing
    weight w and d_density) use rowsum((E @ X_ts) * F).
  * All kernel I/O is ROW space (one packed (B, 16) input of
    pos/dirs/tq/dists/target/valid, one packed (B, 16) output of
    d_pos/d_dirs_rep/w*rgb), so the ray tile is 4 (B = 512 sample rows),
    halving resident activations vs per-ray-blocked I/O (Mosaic requires
    sublane dims divisible by 8, which would force an 8-ray tile).
    Per-ray reductions (rgb_fine, d_origs, d_dirs) are cheap XLA
    segment-sums over the row output.
  * dW/db accumulate across the sequential TPU grid in revisited fp32 output
    blocks (initialized on tile 0) — no atomics, no extra HBM traffic.
  * The MSE loss gradient (2*(rgb-target)/(N*3), masked by the per-ray valid
    flag for padding) is computed in-kernel, so one launch produces ALL
    radiance-net gradients plus per-row geometry grads for the
    camera-extrinsics chain rule (assembled in XLA via jax.vjp of the ray
    transform).

Scope: the flagship architecture only — Barf position+direction encoders
with include_identity, n_segments=2, delayed_direction=True,
delayed_density=False (`model_interpolation_architecture.py:33-168`
semantics). The generic XLA path remains for everything else.

MEASURED STATUS: see RESULTS.md (round 2) — v2 numbers recorded there after
each hardware bench; v1 (concat encodings, re-derived masks, per-tile iota
masks) measured kernel-only 7.7 ms at 1024x128 bf16, full fused step 8.3 ms
vs XLA step 8.5 ms, and sidesteps the libtpu regalloc RET_CHECK that
hard-crashes the XLA path at batch >= 8192.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_experiments_tpu.ops.render import DENSITY_SCALE

HIGHEST = jax.lax.Precision.HIGHEST


def _weight_names(n_hidden: int) -> list:
    """Flat weight/bias order shared by _flatten_weights, the kernel, and
    _unflatten_grads. L = n_hidden + 1 layers per segment."""
    L = n_hidden + 1
    names = ["w0", "b0"]
    for i in range(1, L):
        names += [f"w1_{i}", f"b1_{i}"]
    names += ["w5a", "w5b", "b5"]
    for i in range(L - 2):
        names += [f"w2_{i}", f"b2_{i}"]
    names += ["whd", "bhd", "wc0a", "wc0b", "bc0", "wc1", "bc1"]
    return names


def _enc_tables(levels_pos: int, scale_pos: float,
                levels_dir: int, scale_dir: float):
    """Host-built COMBINED padded-E encoding constants (v4.1).

    Both encoders live in ONE (B, 128) buffer:
      cols [0:3]                       pos identity
      cols [3 : 3+3Lp]                 pos cos block
      cols [3+3Lp : 3+6Lp]             pos sin block (same trig args)
      cols [off : off+3]               dir identity   (off = 3+6Lp)
      cols [off+3 : off+3+3Ld]         dir cos block
      cols [off+3+3Ld : off+3+6Ld]     dir sin block
    A = rays[:, 0:6] @ K (K (6, 128): pos rows feed pos cols, dir rows dir
    cols) — ONE MXU pass and ONE cos / ONE sin VPU pass build everything.

    Returns K (6,128); MASKS (5,128): rows = identity / cos / sin column
    selectors + pos-alpha / dir-alpha column selectors; KX (1,128): BARF
    level index per trig column."""
    Lp3, Ld3 = 3 * levels_pos, 3 * levels_dir
    off = 3 + 2 * Lp3
    assert off + 3 + 2 * Ld3 <= 128, "combined-E needs Lp+Ld <= 20"

    def blocks(levels, scale):
        j = np.arange(3 * levels)
        freq = scale * (2.0 ** (j % levels)).astype(np.float32)
        sel = ((j // levels)[:, None] == np.arange(3)[None, :]).astype(np.float32)
        return (sel * freq[:, None]).T, (j % levels).astype(np.float32)

    kp, kxp = blocks(levels_pos, scale_pos)
    kd, kxd = blocks(levels_dir, scale_dir)
    k = np.zeros((6, 128), np.float32)
    k[0:3, 0:3] = np.eye(3, dtype=np.float32)
    k[0:3, 3:3 + Lp3] = kp
    k[0:3, 3 + Lp3:3 + 2 * Lp3] = kp
    k[3:6, off:off + 3] = np.eye(3, dtype=np.float32)
    k[3:6, off + 3:off + 3 + Ld3] = kd
    k[3:6, off + 3 + Ld3:off + 3 + 2 * Ld3] = kd
    masks = np.zeros((5, 128), np.float32)
    masks[0, 0:3] = 1.0
    masks[0, off:off + 3] = 1.0
    masks[1, 3:3 + Lp3] = 1.0
    masks[1, off + 3:off + 3 + Ld3] = 1.0
    masks[2, 3 + Lp3:3 + 2 * Lp3] = 1.0
    masks[2, off + 3 + Ld3:off + 3 + 2 * Ld3] = 1.0
    masks[3, 3:3 + 2 * Lp3] = 1.0               # pos-alpha columns
    masks[4, off + 3:off + 3 + 2 * Ld3] = 1.0   # dir-alpha columns
    kx = np.zeros((1, 128), np.float32)
    kx[0, 3:3 + Lp3] = kxp
    kx[0, 3 + Lp3:3 + 2 * Lp3] = kxp
    kx[0, off + 3:off + 3 + Ld3] = kxd
    kx[0, off + 3 + Ld3:off + 3 + 2 * Ld3] = kxd
    return jnp.asarray(k), jnp.asarray(masks), jnp.asarray(kx)


def _kernel(static, rays_ref, apos_ref, adir_ref,
            k_ref, m_ref, kx_ref,
            lt_ref, ut_ref, e_ref, f_ref, *refs):
    (S, dscale, inv_n3, cd, n_hidden, fwd_only) = static
    f32 = jnp.float32
    L = n_hidden + 1
    names = _weight_names(n_hidden)
    n_w = len(names)
    W = {nm: refs[i] for i, nm in enumerate(names)}
    out_rows_ref = refs[n_w]
    Dref = {nm: refs[n_w + 1 + i] for i, nm in enumerate(names)}

    first = pl.program_id(0) == 0
    mdt = cd if cd is not None else f32  # mask / stored-activation dtype

    def cde(x):
        return x.astype(cd) if cd is not None else x

    def _dot(a, b, dims):
        if cd is None:
            return jax.lax.dot_general(
                a, b, (dims, ((), ())),
                preferred_element_type=f32, precision=HIGHEST)
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (dims, ((), ())),
            preferred_element_type=f32)

    def mm(a, w_ref):
        return _dot(a, w_ref[:], ((1,), (0,)))

    def mm_t(a, w_ref):
        """a @ W^T — contract over the OUT dim, no materialized transpose."""
        return _dot(a, w_ref[:], ((1,), (1,)))

    def outer(a, g):
        """a^T @ g contracted over rows (dW)."""
        return _dot(a, g, ((0,), (0,)))

    def fdot(a, b_ref):
        """Full-precision fp32 dot against a host constant (trig args and
        encoding-backward reductions need exact fp32)."""
        return jax.lax.dot_general(
            a, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=HIGHEST)

    def fdot_t(a, b_ref):
        """a @ const^T at full fp32 precision (encoding backward)."""
        return jax.lax.dot_general(
            a, b_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=HIGHEST)

    def accum(name, val):
        ref = Dref[name]

        @pl.when(first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] = ref[:] + val

    def bsum(g):
        return jnp.sum(g, axis=0, keepdims=True)

    rays = rays_ref[:]             # (B, 16) f32 packed rows
    pos = rays[:, 0:3]
    dirs = rays[:, 3:6]
    B = pos.shape[0]
    T = B // S
    a_pos = apos_ref[0, 0]
    a_dir = adir_ref[0, 0]

    # ---- encodings (forward): COMBINED padded-E layout (v4.1) ----
    # Both encoders in one (B, 128) buffer: A = [pos|dirs] @ K, then
    # E = xm*A + mc*cos(A) + ms*sin(A) — one MXU pass, one cos, one sin.
    A = fdot(rays[:, 0:6], k_ref)                   # (B, 128) fp32
    a_cols = m_ref[3:4] * a_pos + m_ref[4:5] * a_dir  # (1, 128)
    ramp = jnp.clip(a_cols - kx_ref[:], 0.0, 1.0)
    m3 = (1.0 - jnp.cos(ramp * jnp.pi)) / 2.0       # (1, 128) BARF window
    xm = m_ref[0:1]
    mc = m3 * m_ref[1:2]
    ms = m3 * m_ref[2:3]
    E = cde(xm * A + mc * jnp.cos(A) + ms * jnp.sin(A))

    def enc_bwd(gE):
        # dE/dA = xm - mc sin(A) + ms cos(A) (elementwise);
        # d[pos|dirs] = dA @ K^T  -> (B, 6)
        dA = gE * (xm - mc * jnp.sin(A) + ms * jnp.cos(A))
        return fdot_t(dA, k_ref)                    # (B, 6)

    def relu(z):
        """fp32 pre-activation -> post-relu at compute width.
        cde(max(z, 0)) == cde(z) * (z > 0) exactly."""
        return cde(jnp.maximum(z, 0.0))

    def mask_of(h):
        """Recompute the relu mask from the stored activation (f32 compare;
        Mosaic rejects bf16 compares)."""
        return (h.astype(f32) > 0.0).astype(mdt)

    # ---- MLP forward, activations kept in VMEM (cd width) ----
    z0 = mm(E, W["w0"]) + W["b0"][:]
    acts1 = [relu(z0)]
    for i in range(1, L):
        z = mm(acts1[-1], W[f"w1_{i}"]) + W[f"b1_{i}"][:]
        # the last entry is the INTER-SEGMENT relu (reference applies relu
        # between segments); its mask gates the grad into segment 1
        acts1.append(relu(z))
    zrel = acts1[-1]

    z5 = mm(zrel, W["w5a"]) + mm(E, W["w5b"]) + W["b5"][:]
    acts2 = [relu(z5)]
    for i in range(L - 2):
        z = mm(acts2[-1], W[f"w2_{i}"]) + W[f"b2_{i}"][:]
        acts2.append(relu(z))
    s = acts2[-1]

    Dh = W["whd"].shape[1] - 128
    zhd = mm(s, W["whd"]) + W["bhd"][:]  # (B, Dh+128) f32
    hid = cde(zhd[:, :Dh])               # raw segment output (no relu)
    dens128 = zhd[:, Dh:]                # (B, 128) f32, col 0 = density_raw

    c0_z = mm(hid, W["wc0a"]) + mm(E, W["wc0b"]) + W["bc0"][:]
    c0 = relu(c0_z)
    logits = mm(c0, W["wc1"]) + W["bc1"][:]  # (B, 128) f32, cols 0:3 = rgb
    rgb128 = jax.nn.sigmoid(logits)

    if fwd_only == 2:  # bisect probe: MLP+encodings only, no compositing
        out_rows_ref[:] = jnp.concatenate(
            [rgb128[:, :3], dens128[:, :3], jnp.zeros((B, 10), f32)], axis=-1)
        # only tile 0 zeroes the dW outputs: the revisited-block RMW
        # traffic would otherwise distort the probe (~0.7 ms at 128 tiles)
        @pl.when(first)
        def _():
            for nm in names:
                Dref[nm][:] = jnp.zeros(Dref[nm].shape, f32)
        return

    # ---- per-sample scalars -> (T, S) planes (one VMEM tile each) ----
    def ts(col):
        return col.reshape(T, S)

    density_raw = ts(dens128[:, 0:1])
    density = jnp.where(
        density_raw > 8.0, density_raw,
        jax.nn.softplus(jnp.minimum(density_raw, 8.0)))

    dists = ts(rays[:, 7:8])
    blocking = -density * dists * dscale          # (T, S) f32 (<= 0)

    def mv(m_, v):
        return jax.lax.dot_general(
            m_, v, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    excl = mv(blocking, lt_ref[:])                # exclusive in-ray prefix
    trans = jnp.exp(excl)
    alpha_c = 1.0 - jnp.exp(blocking)
    w_ts = trans * alpha_c                        # (T, S)

    cr = ts(rgb128[:, 0:1])
    cg = ts(rgb128[:, 1:2])
    cb = ts(rgb128[:, 2:3])
    wc = [w_ts * cr, w_ts * cg, w_ts * cb]
    rgb_fine = [jnp.sum(x, axis=-1, keepdims=True) for x in wc]  # 3x (T, 1)

    # per-ray target/valid: all S copies in a row-broadcast column are equal,
    # so (B,1) -> (T,S) then column 0
    tgt = [ts(rays[:, 10 + c : 11 + c])[:, :1] for c in range(3)]
    valid = ts(rays[:, 13:14])[:, :1]             # (T, 1)

    # ---- loss gradient (masked MSE), in-kernel ----
    g_fine = [2.0 * (rgb_fine[c] - tgt[c]) * inv_n3 * valid for c in range(3)]

    # ---- compositing backward (in (T, S)) ----
    g_w = g_fine[0] * cr + g_fine[1] * cg + g_fine[2] * cb   # (T, S)
    q = g_w * w_ts
    suffix = mv(q, ut_ref[:])                     # sum_{s>i} g_w_s * w_s
    d_blocking = -g_w * trans * (1.0 - alpha_c) + suffix
    d_density = d_blocking * (-dists * dscale)
    sp_grad = jnp.where(
        density_raw > 8.0, jnp.ones_like(density_raw),
        jax.nn.sigmoid(jnp.minimum(density_raw, 8.0)))
    d_density_raw = d_density * sp_grad           # (T, S)

    # ---- the two (T,S) -> row conversions: rowsum((E @ X) * F) ----
    e_mat = e_ref[:]                              # (B, T) ray-row selector
    f_mat = f_ref[:]                              # (B, S) own-column selector

    def ts_to_rows(x_ts):
        return jnp.sum(mv(e_mat, x_ts) * f_mat, axis=-1, keepdims=True)

    if fwd_only:  # perf-bisect mode (NETPU_TRAIN_FWD_ONLY): skip backward
        out_rows_ref[:] = jnp.concatenate(
            [mv(e_mat, jnp.concatenate(rgb_fine, axis=-1)),
             ts_to_rows(g_w), jnp.zeros((B, 12), f32)], axis=-1)
        @pl.when(first)
        def _():
            for nm in names:
                Dref[nm][:] = jnp.zeros(Dref[nm].shape, f32)
        return

    w_row = ts_to_rows(w_ts)                      # (B, 1)
    d_dens_row = ts_to_rows(d_density_raw)        # (B, 1)
    g_rows = mv(e_mat, jnp.concatenate(g_fine, axis=-1))  # (B, 3)
    d_rgb3 = g_rows * w_row                       # (B, 3)

    # ---- head backward ----
    zero125 = jnp.zeros((B, 125), f32)
    d_logits = (jnp.concatenate([d_rgb3, zero125], axis=-1)
                * rgb128 * (1.0 - rgb128))
    accum("wc1", outer(c0, d_logits))
    accum("bc1", bsum(d_logits))
    g_c0 = mm_t(d_logits, W["wc1"]) * mask_of(c0)
    accum("wc0a", outer(hid, g_c0))
    accum("wc0b", outer(E, g_c0))
    accum("bc0", bsum(g_c0))
    g_hid = mm_t(g_c0, W["wc0a"])                 # (B, Dh) f32 (no relu)
    g_E = mm_t(g_c0, W["wc0b"])                   # (B, 128) enc cotangent

    d_dens128 = jnp.concatenate(
        [d_dens_row, jnp.zeros((B, 127), f32)], axis=-1)
    g_hd = jnp.concatenate([g_hid, d_dens128], axis=-1)  # (B, Dh+128) aligned

    # ---- segment 2 backward ----
    accum("whd", outer(s, g_hd))
    accum("bhd", bsum(g_hd))
    g = mm_t(g_hd, W["whd"])                      # grad wrt s (post-relu)
    for li in range(L - 3, -1, -1):
        g = g * mask_of(acts2[li + 1])
        accum(f"w2_{li}", outer(acts2[li], g))
        accum(f"b2_{li}", bsum(g))
        g = mm_t(g, W[f"w2_{li}"])
    g = g * mask_of(acts2[0])
    accum("w5a", outer(zrel, g))
    accum("w5b", outer(E, g))
    accum("b5", bsum(g))
    g_E = g_E + mm_t(g, W["w5b"])
    g = mm_t(g, W["w5a"]) * mask_of(acts1[L - 1])  # inter-segment relu

    # ---- segment 1 backward ----
    for li in range(L - 1, 0, -1):
        accum(f"w1_{li}", outer(acts1[li - 1], g))
        accum(f"b1_{li}", bsum(g))
        g = mm_t(g, W[f"w1_{li}"]) * mask_of(acts1[li - 1])
    accum("w0", outer(E, g))
    accum("b0", bsum(g))
    g_E = g_E + mm_t(g, W["w0"])

    # ---- encoding backward -> per-row geometry grads ----
    dxd = enc_bwd(g_E)                            # (B, 6) = [d_pos, d_dirs]
    d_pos = dxd[:, 0:3]
    d_dirs_rep = dxd[:, 3:6]
    # col 9 = per-sample compositing weight w (already in row space): the
    # hierarchical path feeds it to the inverse-CDF fine resampler, making
    # a COARSE stage through this kernel a drop-in for the XLA proposal
    # stage (weights are stop-gradded by the caller, as in both paths).
    wrgb = jnp.concatenate(
        [mv(e_mat, jnp.concatenate(rgb_fine, axis=-1)),       # per-ray rgb
         d_pos, d_dirs_rep, w_row, jnp.zeros((B, 6), f32)], axis=-1)
    out_rows_ref[:] = wrgb


def _render_kernel(static, rays_ref, apos_ref, adir_ref,
                   k_ref, m_ref, kx_ref, lt_ref, *refs):
    """Forward-only sibling of `_kernel` for the inference/serving path
    (`render_views`, image logger, `bench.py` render metric): rays -> pixels
    in one launch, no gradient outputs, no stored-activation residency —
    each layer activation is consumed by the next GEMM, so Mosaic can reuse
    buffers and the ray tile can be wider than the training kernel's.

    Output block: (T, 128) per tile — cols 0:3 rgb, 3 opacity, 4 depth
    (nerfacc `rendering` conventions, `ops/render.py:render_full`); with
    with_weights (S <= 123) cols 5:5+S carry the per-sample compositing
    weights for the hierarchical serving path's fine resampler."""
    (S, dscale, cd, n_hidden, with_weights) = static
    f32 = jnp.float32
    L = n_hidden + 1
    names = _weight_names(n_hidden)
    W = {nm: refs[i] for i, nm in enumerate(names)}
    out_ref = refs[len(names)]

    def cde(x):
        return x.astype(cd) if cd is not None else x

    def _dot(a, b, dims):
        if cd is None:
            return jax.lax.dot_general(
                a, b, (dims, ((), ())),
                preferred_element_type=f32, precision=HIGHEST)
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (dims, ((), ())),
            preferred_element_type=f32)

    def mm(a, w_ref):
        return _dot(a, w_ref[:], ((1,), (0,)))

    def fdot(a, b_ref):
        return jax.lax.dot_general(
            a, b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=HIGHEST)

    def relu(z):
        return cde(jnp.maximum(z, 0.0))

    rays = rays_ref[:]             # (B, 8) f32: [pos, dirs, tq, dists]
    B = rays.shape[0]
    T = B // S
    a_pos = apos_ref[0, 0]
    a_dir = adir_ref[0, 0]

    # ---- combined padded-E encodings (identical to _kernel) ----
    A = fdot(rays[:, 0:6], k_ref)
    a_cols = m_ref[3:4] * a_pos + m_ref[4:5] * a_dir
    ramp = jnp.clip(a_cols - kx_ref[:], 0.0, 1.0)
    m3 = (1.0 - jnp.cos(ramp * jnp.pi)) / 2.0
    E = cde(m_ref[0:1] * A + m3 * m_ref[1:2] * jnp.cos(A)
            + m3 * m_ref[2:3] * jnp.sin(A))

    # ---- MLP forward (no stored activations) ----
    z = relu(mm(E, W["w0"]) + W["b0"][:])
    for i in range(1, L):
        z = relu(mm(z, W[f"w1_{i}"]) + W[f"b1_{i}"][:])
    s = relu(mm(z, W["w5a"]) + mm(E, W["w5b"]) + W["b5"][:])
    for i in range(L - 2):
        s = relu(mm(s, W[f"w2_{i}"]) + W[f"b2_{i}"][:])
    Dh = W["whd"].shape[1] - 128
    zhd = mm(s, W["whd"]) + W["bhd"][:]
    hid = cde(zhd[:, :Dh])
    dens128 = zhd[:, Dh:]
    c0 = relu(mm(hid, W["wc0a"]) + mm(E, W["wc0b"]) + W["bc0"][:])
    logits = mm(c0, W["wc1"]) + W["bc1"][:]
    rgb128 = jax.nn.sigmoid(logits)

    # ---- compositing in (T, S) planes ----
    def ts(col):
        return col.reshape(T, S)

    density_raw = ts(dens128[:, 0:1])
    density = jnp.where(
        density_raw > 8.0, density_raw,
        jax.nn.softplus(jnp.minimum(density_raw, 8.0)))
    dists = ts(rays[:, 7:8])
    blocking = -density * dists * dscale

    def mv(m_, v):
        return jax.lax.dot_general(
            m_, v, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    trans = jnp.exp(mv(blocking, lt_ref[:]))
    w_ts = trans * (1.0 - jnp.exp(blocking))      # (T, S)

    rgb3 = jnp.concatenate(
        [jnp.sum(w_ts * ts(rgb128[:, c:c + 1]), axis=-1, keepdims=True)
         for c in range(3)], axis=-1)             # (T, 3)
    opacity = jnp.sum(w_ts, axis=-1, keepdims=True)
    depth = jnp.sum(w_ts * ts(rays[:, 6:7]), axis=-1, keepdims=True)
    if with_weights:
        out_ref[:] = jnp.concatenate(
            [rgb3, opacity, depth, w_ts, jnp.zeros((T, 123 - S), f32)],
            axis=-1)
    else:
        out_ref[:] = jnp.concatenate(
            [rgb3, opacity, depth, jnp.zeros((T, 123), f32)], axis=-1)


def flagship_render(
    params: Dict,
    cfg,  # NerfMLPConfig (flagship shape, same gate as flagship_train_grads)
    origs: jnp.ndarray,      # (N, 3)
    dirs: jnp.ndarray,       # (N, 3)
    t_start: jnp.ndarray,    # (N, S)
    t_end: jnp.ndarray,      # (N, S)
    alpha_pos,
    alpha_dir,
    density_scale: float = DENSITY_SCALE,
    tile_rays: int = 0,      # 0 => pick from S
    interpret: bool = None,
    return_weights: bool = False,  # requires S <= 123
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward-only mega-kernel render: (rgb (N,3), opacity (N,1),
    depth (N,1)) with middle-point integration — the inference-path
    equivalent of `NerfInterpolation.forward` (`model_interpolation.py:
    417-486`) with `render_full` compositing conventions. No VJP: eval
    contexts only. return_weights=True appends the (N, S) compositing
    weights (hierarchical serving: coarse stage in this kernel, weights to
    the fine resampler)."""
    from nerf_experiments_tpu.encodings.fourier import Barf

    pe, de = cfg.position_encoder, cfg.direction_encoder
    if not (
        isinstance(pe, Barf) and isinstance(de, Barf)
        and pe.include_identity and de.include_identity
        and cfg.n_segments == 2 and cfg.delayed_direction
        and not cfg.delayed_density and pe.scale == de.scale
        and cfg.n_hidden >= 1
    ):
        raise ValueError("flagship_render supports the canonical BARF "
                         "config only")
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except RuntimeError:
            interpret = True

    n, S = t_start.shape
    cd = cfg.compute_dtype
    if return_weights and S > 123:
        raise ValueError("return_weights needs S <= 123 (output-block lanes)")
    import os as _os

    # fwd-only residency is ~2 live (B, D) activations + one (B, 128) E, so
    # the tile can be 2x the training kernel's (2048 rows validated fastest
    # on v5e at 256-wide; override with NETPU_RENDER_TILE_ROWS)
    default_rows = int(_os.environ.get("NETPU_RENDER_TILE_ROWS", 2048))
    tile = tile_rays or max(1, default_rows // S)
    if not interpret:
        # Mosaic: the (tile, 128) output block's sublane dim must be % 8
        tile = max(8, tile - tile % 8)
    pad = (-n) % tile
    if pad:
        zp = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        origs, dirs = zp(origs), zp(dirs)
        t_start, t_end = zp(t_start), zp(t_end)
        t_end = t_end.at[n:].set(t_start[n:] + 1.0)
    n_pad = origs.shape[0]
    B = tile * S

    t_q = (t_start + t_end) / 2.0
    dists = t_end - t_start
    f32 = jnp.float32
    pos_rows = (origs[:, None, :] + t_q[..., None] * dirs[:, None, :]
                ).reshape(n_pad * S, 3)
    rays_rows = jnp.concatenate([
        pos_rows.astype(f32),
        jnp.broadcast_to(dirs[:, None, :], (n_pad, S, 3)).reshape(-1, 3).astype(f32),
        t_q.reshape(-1, 1).astype(f32),
        dists.reshape(-1, 1).astype(f32),
    ], axis=-1)  # (B_total, 8): [pos, dirs, tq, dists]

    flat_w = _flatten_weights(params, cfg, cd)
    static = (S, float(density_scale), cd, cfg.n_hidden, bool(return_weights))
    kc, mc_, kxc = _enc_tables(pe.levels, float(pe.scale),
                               de.levels, float(de.scale))
    i_s, j_s = np.indices((S, S))
    lt = jnp.asarray((i_s < j_s).astype(np.float32))
    consts = [kc, mc_, kxc, lt]

    rows8 = pl.BlockSpec((B, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [rows8, smem, smem]
    in_specs += [full(x.shape) for x in consts]
    in_specs += [full(x.shape) for x in flat_w]

    vmem_mb = int(_os.environ.get("NETPU_RENDER_VMEM_MB", 0))
    if not vmem_mb and B > 1024:
        vmem_mb = 24
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        if vmem_mb else None
    )
    out = pl.pallas_call(
        functools.partial(_render_kernel, static),
        grid=(pl.cdiv(n_pad, tile),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), f32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(
        rays_rows,
        jnp.asarray(alpha_pos, f32).reshape(1, 1),
        jnp.asarray(alpha_dir, f32).reshape(1, 1),
        *consts,
        *flat_w,
    )[:n]
    if return_weights:
        return out[:, 0:3], out[:, 3:4], out[:, 4:5], out[:, 5:5 + S]
    return out[:, 0:3], out[:, 3:4], out[:, 4:5]


def _flatten_weights(params: Dict, cfg, cd) -> list:
    """Standard NerfMLP pytree -> the kernel's split/merged/padded flat
    weight list (order = _weight_names).

    Weights are cast to the compute dtype (bf16 halves their VMEM footprint);
    biases stay fp32 (added to fp32 accumulators). The density and final
    color columns are zero-padded to 128 lanes; the hidden + density heads
    are merged into one (D, D+128) matrix.
    """
    L = cfg.n_hidden + 1
    LP3 = 3 * cfg.position_encoder.levels
    LD3 = 3 * cfg.direction_encoder.levels
    s1 = params["segments"][0]["layers"]
    s2 = params["segments"][1]["layers"]
    col = params["color"]
    D = s1[0]["w"].shape[1]

    wcast = (lambda w: w.astype(cd)) if cd is not None else (lambda w: w)
    b2d = lambda b: b.astype(jnp.float32).reshape(1, -1)

    def pad_enc_rows(w, offset=0):
        """(3 + 2*l3, out) -> (128, out): the combined-E consumer weight.
        Row order [x, cos, sin] matches the E column layout; dir-encoder
        rows are placed at the dir block offset (3 + 6*levels_pos)."""
        return wcast(jnp.pad(
            w, ((offset, 128 - offset - w.shape[0]), (0, 0))))

    flat = []
    flat += [pad_enc_rows(s1[0]["w"]), b2d(s1[0]["b"])]
    for l in s1[1:]:
        flat += [wcast(l["w"]), b2d(l["b"])]
    w5 = s2[0]["w"]  # (D + P, D): rows 0:D = z-part, D:D+P = pos_enc part
    flat += [wcast(w5[:D]), pad_enc_rows(w5[D:]), b2d(s2[0]["b"])]
    for l in s2[1:L - 1]:
        flat += [wcast(l["w"]), b2d(l["b"])]
    w9 = s2[L - 1]["w"]  # (D, D + 1): cols 0:D hidden, D density
    whd = jnp.concatenate(
        [w9[:, :D], jnp.pad(w9[:, D:], ((0, 0), (0, 127)))], axis=1)
    bhd = jnp.concatenate(
        [s2[L - 1]["b"][:D], jnp.pad(s2[L - 1]["b"][D:], (0, 127))])
    flat += [wcast(whd), b2d(bhd)]
    wc0 = col[0]["w"]  # (D + Ddir, C)
    flat += [wcast(wc0[:D]), pad_enc_rows(wc0[D:], offset=3 + 2 * LP3),
             b2d(col[0]["b"])]
    wc1 = jnp.pad(col[1]["w"], ((0, 0), (0, 125)))  # (C, 3) -> (C, 128)
    bc1 = jnp.pad(col[1]["b"].reshape(1, 3), ((0, 0), (0, 125)))
    flat += [wcast(wc1), bc1.astype(jnp.float32)]
    return flat


def _unflatten_grads(outs, params: Dict, cfg) -> Dict:
    """Kernel dW/db list (same order/shapes as the flat weights, fp32) back
    into the standard radiance pytree."""
    L = cfg.n_hidden + 1
    names = _weight_names(cfg.n_hidden)
    G = dict(zip(names, outs))
    D = params["segments"][0]["layers"][0]["w"].shape[1]
    LP = 3 + 6 * cfg.position_encoder.levels   # pos block row count
    OFF = LP                                    # dir block offset in E
    LD = 3 + 6 * cfg.direction_encoder.levels

    seg1 = [{"w": G["w0"][:LP], "b": G["b0"][0]}]
    for i in range(1, L):
        seg1.append({"w": G[f"w1_{i}"], "b": G[f"b1_{i}"][0]})
    seg2 = [{"w": jnp.concatenate([G["w5a"], G["w5b"][:LP]], axis=0),
             "b": G["b5"][0]}]
    for i in range(L - 2):
        seg2.append({"w": G[f"w2_{i}"], "b": G[f"b2_{i}"][0]})
    whd, bhd = G["whd"], G["bhd"][0]
    seg2.append({
        "w": jnp.concatenate([whd[:, :D], whd[:, D : D + 1]], axis=1),
        "b": jnp.concatenate([bhd[:D], bhd[D : D + 1]]),
    })
    color = [
        {"w": jnp.concatenate([G["wc0a"], G["wc0b"][OFF:OFF + LD]], axis=0),
         "b": G["bc0"][0]},
        {"w": G["wc1"][:, :3], "b": G["bc1"][0][:3]},
    ]
    return {"segments": [{"layers": seg1}, {"layers": seg2}], "color": color}


def flagship_train_grads(
    params: Dict,
    cfg,  # NerfMLPConfig (flagship shape)
    origs: jnp.ndarray,      # (N, 3)
    dirs: jnp.ndarray,       # (N, 3)
    t_start: jnp.ndarray,    # (N, S)
    t_end: jnp.ndarray,      # (N, S)
    targets: jnp.ndarray,    # (N, 3)
    alpha_pos,
    alpha_dir,
    density_scale: float = DENSITY_SCALE,
    tile_rays: int = 0,      # 0 => pick from S
    interpret: bool = None,  # None => interpret everywhere except real TPU
    loss_scale: float = 1.0,  # coarse stages: cfg.coarse_loss_weight
    return_weights: bool = False,
) -> Tuple[jnp.ndarray, Dict, jnp.ndarray, jnp.ndarray]:
    """One fused launch: returns (rgb_fine (N,3), grads_radiance pytree,
    d_origs (N,3), d_dirs (N,3)) for loss = loss_scale * mean((rgb -
    target)^2) over (N, 3). Middle-point integration
    (`integration_strategy="middle"`).

    With return_weights=True a 5th output is appended: the per-sample
    compositing weights (N, S) — this is how a hierarchical COARSE stage
    runs through the kernel (loss_scale = coarse_loss_weight, weights feed
    the inverse-CDF fine resampler)."""
    from nerf_experiments_tpu.encodings.fourier import Barf

    pe, de = cfg.position_encoder, cfg.direction_encoder
    if not (
        isinstance(pe, Barf) and isinstance(de, Barf)
        and pe.include_identity and de.include_identity
        and cfg.n_segments == 2 and cfg.delayed_direction
        and not cfg.delayed_density and pe.scale == de.scale
        and cfg.n_hidden >= 1
    ):
        raise ValueError("flagship_train_grads supports the canonical BARF "
                         "config only (Barf encoders + 2 segments + "
                         "delayed_direction, n_hidden >= 1)")
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except RuntimeError:
            interpret = True

    n, S = t_start.shape
    cd = cfg.compute_dtype
    import os as _os

    # 1024 rows (v3 default, bf16) needs ~20M scoped VMEM — above Mosaic's
    # conservative 16M cap but well inside the physical budget (validated on
    # v5e: kernel 7.7 -> 6.95 ms at 1024x128). The cap is raised
    # automatically below; 2048 rows compiled pathologically — don't.
    # fp32 activations double the residency (~29M at 1024 rows, past the
    # validated cap) — stay at 512 rows there.
    default_rows = int(_os.environ.get(
        "NETPU_TRAIN_TILE_ROWS", 1024 if cfg.compute_dtype is not None else 512))
    tile = tile_rays or max(1, default_rows // S)
    pad = (-n) % tile
    valid = jnp.ones((n, 1), jnp.float32)
    if pad:
        zp = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        origs, dirs = zp(origs), zp(dirs)
        t_start, t_end, targets, valid = (
            zp(t_start), zp(t_end), zp(targets), zp(valid))
        # keep padded dists = 1 so blocking stays finite (grads are masked)
        t_end = t_end.at[n:].set(t_start[n:] + 1.0)
    n_pad = origs.shape[0]
    B = tile * S

    t_q = (t_start + t_end) / 2.0
    dists = t_end - t_start
    f32 = jnp.float32
    rep = lambda x: jnp.broadcast_to(
        x[:, None, :], (n_pad, S, x.shape[-1])).reshape(n_pad * S, -1)
    pos_rows = (origs[:, None, :] + t_q[..., None] * dirs[:, None, :]
                ).reshape(n_pad * S, 3)
    rays_rows = jnp.concatenate([
        pos_rows.astype(f32),
        rep(dirs).astype(f32),
        t_q.reshape(-1, 1).astype(f32),
        dists.reshape(-1, 1).astype(f32),
        jnp.zeros((n_pad * S, 2), f32),
        rep(targets).astype(f32),
        rep(valid).astype(f32),
        jnp.zeros((n_pad * S, 2), f32),
    ], axis=-1)  # (B_total, 16): [pos, dirs, tq, dists, _, _, tgt, valid, _]

    import os

    flat_w = _flatten_weights(params, cfg, cd)
    static = (
        S, float(density_scale), float(loss_scale) / (n * 3.0), cd,
        cfg.n_hidden,
        int(os.environ.get("NETPU_TRAIN_FWD_ONLY", 0)),
    )

    # host-built static mask/selector constants (hoisted out of the kernel)
    kc, mc_, kxc = _enc_tables(pe.levels, float(pe.scale),
                               de.levels, float(de.scale))
    i_s, j_s = np.indices((S, S))
    lt = jnp.asarray((i_s < j_s).astype(np.float32))   # strict "later" cols
    ut = jnp.asarray((i_s > j_s).astype(np.float32))
    i_b = np.arange(B)
    e_mat = jnp.asarray((i_b[:, None] // S == np.arange(tile)[None, :])
                        .astype(np.float32))           # (B, T)
    f_mat = jnp.asarray((i_b[:, None] % S == np.arange(S)[None, :])
                        .astype(np.float32))           # (B, S)
    consts = [kc, mc_, kxc, lt, ut, e_mat, f_mat]

    rows16 = pl.BlockSpec((B, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [rows16, smem, smem]
    in_specs += [full(x.shape) for x in consts]
    in_specs += [full(x.shape) for x in flat_w]

    out_specs = [rows16]
    out_shapes = [jax.ShapeDtypeStruct((n_pad * S, 16), f32)]
    for x in flat_w:
        out_specs.append(full(x.shape))
        out_shapes.append(jax.ShapeDtypeStruct(x.shape, f32))

    # raise the Mosaic scoped-VMEM limit for wide tiles (the 16M default is
    # the compiler's conservative cap; the physical budget is larger —
    # 24M validated on v5e for the 1024-row tile)
    vmem_mb = int(os.environ.get("NETPU_TRAIN_VMEM_MB", 0))
    if not vmem_mb and B > 512:
        vmem_mb = 24
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 1024 * 1024)
        if vmem_mb else None
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, static),
        grid=(pl.cdiv(n_pad, tile),),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=compiler_params,
    )(
        rays_rows,
        jnp.asarray(alpha_pos, f32).reshape(1, 1),
        jnp.asarray(alpha_dir, f32).reshape(1, 1),
        *consts,
        *flat_w,
    )
    # rows: [rgb_fine(replicated per ray), d_pos, d_dirs_rep, pad]
    rows = outs[0].reshape(n_pad, S, 16)[:n]
    rgb_fine = rows[:, 0, 0:3]
    d_pos = rows[:, :, 3:6]
    d_dirs_rep = rows[:, :, 6:9]
    d_origs = jnp.sum(d_pos, axis=1)
    d_dirs = jnp.sum(t_q[:n, :, None] * d_pos + d_dirs_rep, axis=1)

    grads = _unflatten_grads(outs[1:], params, cfg)
    # match the pytree's leaf dtypes (optax requires grads dtype == param dtype)
    grads = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), grads, params)
    if return_weights:
        return rgb_fine, grads, d_origs, d_dirs, rows[:, :, 9]
    return rgb_fine, grads, d_origs, d_dirs
