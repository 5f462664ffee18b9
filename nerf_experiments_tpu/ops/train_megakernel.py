"""Training mega-kernel: forward + compositing + loss-grad + backward of the
flagship BARF radiance field in ONE Pallas launch per ray tile.

Why: the canonical train step (`barf/run_barf.py:183-196` workload — batch
1024 rays x 128 samples, NerfModel 4x256 x 2 segments) is HBM-bound in XLA:
every (B*S, 256) layer activation round-trips to HBM in forward AND backward
(~1.6 GB/step; measured 8.2 ms => 131k rays/s). This kernel keeps the whole
chain's activations in VMEM from forward THROUGH backward — no HBM spills,
no recompute — so total MXU work is the true 3x-forward roofline.

Design notes (Mosaic rules from round 1 + this kernel's VMEM lessons):

  * Split matmuls instead of concats: segment-2's [z . pos_enc] input and the
    color head's [hidden . dir_enc] input are evaluated as TWO aligned GEMMs
    summed (z@W5a + p@W5b), eliminating the unaligned 319/283-wide
    activations that forced per-tile relayouts in round 1. The 257-wide
    segment output is split into a 256-wide hidden GEMM and a 128-padded
    density GEMM. Every GEMM is 128-lane friendly.
  * VMEM padding: any (B, k<128) array occupies full (B, 128) lanes, so
    per-SAMPLE scalars (density, blocking, transmittance, weights) live in
    (T, S) planes (one 4 kB tile each), reached via the SUPPORTED
    (B, 1) -> (T, S) reshape. The reverse reshape does not exist in Mosaic;
    the two places a (T, S) value must return to row space (compositing
    weight w and d_density) use rowsum((E @ X_ts) * F) where E (B, T)
    broadcasts per-ray rows and F (B, S) one-hot selects each row's own
    sample column — two tiny MXU matmuls.
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

MEASURED STATUS (v5e, 1024x128 bf16, round 2): kernel-only 7.7 ms ~= the
XLA fwd+bwd it replaces; full fused step 8.3 ms vs XLA step 8.5 ms. The
kernel's win today is NOT latency but capability: it sidesteps the libtpu
regalloc RET_CHECK that hard-crashes the XLA path at batch >= 8192 —
batch 8192/16384 run at ~143k rays/s (vs 131k round-1 best). Bisect
(scripts/bisect_kernel.py): fwd-only 3.7 ms, fwd-minus-compositing
3.35 ms vs XLA fwd 2.45 ms — the per-tile overhead lives in the
MLP+encodings body (concat relayouts, f32<->bf16 cast passes, small-GEMM
serialization), not in compositing. Wider tiles don't help: tile=8 needs
>16M scoped VMEM (spills; 10.4 ms), tile=16 32.9M (9.0 ms). Mosaic facts
re-verified this round: bf16 comparisons unsupported; bf16-accumulate
dots rejected ("matmul acc must be 32-bit"). Next attack in NEXT.md #1.
"""
from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_experiments_tpu.ops.render import DENSITY_SCALE


def _mask_freq(levels, scale, alpha):
    """(1, L) int iota -> (freq, mask) fp32 rows (Mosaic: int-only iota)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (1, levels), 1).astype(jnp.float32)
    freq = scale * (2.0 ** k)
    ramp = jnp.clip(alpha - k, 0.0, 1.0)
    mask = (1.0 - jnp.cos(ramp * jnp.pi)) / 2.0
    return freq, mask


def _encode(x, levels, scale, alpha):
    """Barf encoding with identity, channel-major: [x, m*cos, m*sin].

    Returns (enc_f32, cos_args, sin_args, maskf) — the trig components and
    mask*freq rows are reused by the in-kernel backward.
    """
    freq, mask = _mask_freq(levels, scale, alpha)
    args = jnp.concatenate([x[:, k : k + 1] * freq for k in range(3)], axis=-1)
    m3 = jnp.tile(mask, (1, 3))
    cos_a, sin_a = jnp.cos(args), jnp.sin(args)
    enc = jnp.concatenate([x, m3 * cos_a, m3 * sin_a], axis=-1)
    maskf = jnp.tile(mask * freq, (1, 3))
    return enc, cos_a, sin_a, maskf


def _encode_bwd(g_enc, cos_a, sin_a, maskf, levels):
    """d(enc)/d(x): identity part + masked trig chain. g_enc (B, 3+6L) f32."""
    lp3 = 3 * levels
    g_id = g_enc[:, :3]
    g_cos = g_enc[:, 3 : 3 + lp3]
    g_sin = g_enc[:, 3 + lp3 : 3 + 2 * lp3]
    # d(m*cos(a))/dx = -m*sin(a)*f, d(m*sin(a))/dx = m*cos(a)*f; maskf = m*f
    t = (g_sin * cos_a.astype(jnp.float32)
         - g_cos * sin_a.astype(jnp.float32)) * maskf
    parts = [
        jnp.sum(t[:, k * levels : (k + 1) * levels], axis=-1, keepdims=True)
        for k in range(3)
    ]
    return g_id + jnp.concatenate(parts, axis=-1)


def _kernel(static, rays_ref, apos_ref, adir_ref, *refs):
    (S, LP, LD, enc_scale, dscale, inv_n3, cd, n_hidden, fwd_only) = static
    f32 = jnp.float32
    n_seg_layers = n_hidden + 1
    # weight order: seg1 [(w,b)]*L, seg2 [w5a, w5b, b5, (w,b)*(L-2), wh, wd,
    # bh, bd], color [wc0a, wc0b, bc0, wc1, bc1]
    n_w = 4 * n_seg_layers + 8
    W = refs[:n_w]
    out_rows_ref = refs[n_w]
    d_refs = refs[n_w + 1:]  # same order as W

    first = pl.program_id(0) == 0

    def cde(x):
        return x.astype(cd) if cd is not None else x

    def _dot(a, b, dims):
        if cd is None:
            return jax.lax.dot_general(
                a, b, (dims, ((), ())),
                preferred_element_type=f32, precision=jax.lax.Precision.HIGHEST)
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

    def accum(ref, val):
        @pl.when(first)
        def _():
            ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            ref[:] = ref[:] + val

    rays = rays_ref[:]             # (B, 16) f32 packed rows
    pos = rays[:, 0:3]
    dirs = rays[:, 3:6]
    B = pos.shape[0]
    T = B // S
    a_pos = apos_ref[0, 0]
    a_dir = adir_ref[0, 0]

    # ---- encodings (forward) ----
    p_enc_f, cosP, sinP, maskfP = _encode(pos, LP, enc_scale, a_pos)
    d_enc_f, cosD, sinD, maskfD = _encode(dirs, LD, enc_scale, a_dir)
    p_enc = cde(p_enc_f)
    d_enc = cde(d_enc_f)
    # trig components are only re-read by the encoding backward — store at
    # compute width (VMEM budget; exact in fp32 mode)
    cosP, sinP = cde(cosP), cde(sinP)
    cosD, sinD = cde(cosD), cde(sinD)

    # ---- MLP forward, activations kept in VMEM (cd width) ----
    iw = 0

    def take():
        nonlocal iw
        r = W[iw]
        iw += 1
        return r

    seg1_w = [(take(), take()) for _ in range(n_seg_layers)]
    w5a, w5b, b5 = take(), take(), take()
    seg2_mid = [(take(), take()) for _ in range(n_seg_layers - 2)]
    wh, wd, bh, bd = take(), take(), take(), take()
    wc0a, wc0b, bc0 = take(), take(), take()
    wc1, bc1 = take(), take()

    acts1 = []  # activations of segment 1 (cd; last entry pre-relu)
    h = p_enc
    for li, (w, b) in enumerate(seg1_w):
        z = mm(h, w) + b[:]
        if li < n_seg_layers - 1:
            z = jnp.maximum(z, 0.0)
        h = cde(z)
        acts1.append(h)
    z1 = acts1[-1]  # segment-1 output, pre-inter-segment-relu (cd)
    zrel = cde(jnp.maximum(z1.astype(f32), 0.0))

    acts2 = []
    s = cde(jnp.maximum(mm(zrel, w5a) + mm(p_enc, w5b) + b5[:], 0.0))
    acts2.append(s)
    for w, b in seg2_mid:
        s = cde(jnp.maximum(mm(s, w) + b[:], 0.0))
        acts2.append(s)
    hid = cde(mm(s, wh) + bh[:])    # (B, D) raw (no relu — segment output)
    dens128 = mm(s, wd) + bd[:]     # (B, 128) f32, col 0 = density_raw

    c0 = cde(jnp.maximum(mm(hid, wc0a) + mm(d_enc, wc0b) + bc0[:], 0.0))
    logits = mm(c0, wc1) + bc1[:]   # (B, 128) f32, cols 0:3 = rgb logits
    rgb128 = jax.nn.sigmoid(logits)

    if fwd_only == 2:  # bisect probe: MLP+encodings only, no compositing
        out_rows_ref[:] = jnp.concatenate(
            [rgb128[:, :3], dens128[:, :3], jnp.zeros((B, 10), f32)], axis=-1)
        for r in d_refs:
            accum(r, jnp.zeros(r.shape, f32))
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
    i_s = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    j_s = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    lower_strict = (i_s < j_s).astype(f32)
    excl = jax.lax.dot_general(
        blocking, lower_strict, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)               # exclusive in-ray prefix
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
    upper_strict = (i_s > j_s).astype(f32)
    suffix = jax.lax.dot_general(
        q, upper_strict, (((1,), (0,)), ((), ())),
        preferred_element_type=f32)               # sum_{s>i} g_w_s * w_s
    d_blocking = -g_w * trans * (1.0 - alpha_c) + suffix
    d_density = d_blocking * (-dists * dscale)
    sp_grad = jnp.where(
        density_raw > 8.0, jnp.ones_like(density_raw),
        jax.nn.sigmoid(jnp.minimum(density_raw, 8.0)))
    d_density_raw = d_density * sp_grad           # (T, S)

    # ---- the two (T,S) -> row conversions: rowsum((E @ X) * F) ----
    i_e = jax.lax.broadcasted_iota(jnp.int32, (B, T), 0)
    r_e = jax.lax.broadcasted_iota(jnp.int32, (B, T), 1)
    e_mat = ((i_e // S) == r_e).astype(f32)       # (B, T)
    i_f = jax.lax.broadcasted_iota(jnp.int32, (B, S), 0)
    s_f = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)
    f_mat = ((i_f % S) == s_f).astype(f32)        # (B, S)

    def mv(m, v):
        return jax.lax.dot_general(
            m, v, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    def ts_to_rows(x_ts):
        return jnp.sum(mv(e_mat, x_ts) * f_mat, axis=-1, keepdims=True)

    if fwd_only:  # perf-bisect mode (NETPU_TRAIN_FWD_ONLY): skip backward
        out_rows_ref[:] = jnp.concatenate(
            [mv(e_mat, jnp.concatenate(rgb_fine, axis=-1)),
             ts_to_rows(g_w), jnp.zeros((B, 12), f32)], axis=-1)
        for r in d_refs:
            accum(r, jnp.zeros(r.shape, f32))
        return

    w_row = ts_to_rows(w_ts)                      # (B, 1)
    d_dens_row = ts_to_rows(d_density_raw)        # (B, 1)
    g_rows = mv(e_mat, jnp.concatenate(g_fine, axis=-1))  # (B, 3)
    d_rgb3 = g_rows * w_row                       # (B, 3)

    # ---- head backward ----
    zero125 = jnp.zeros((B, 125), f32)
    d_logits = jnp.concatenate([d_rgb3, zero125], axis=-1) * rgb128 * (1.0 - rgb128)
    accum(d_refs[n_w - 2], outer(c0, d_logits))   # dWc1
    accum(d_refs[n_w - 1], jnp.sum(d_logits, axis=0, keepdims=True))  # dbc1
    g_c0 = mm_t(d_logits, wc1) * (c0.astype(f32) > 0.0).astype(f32)
    accum(d_refs[n_w - 5], outer(hid, g_c0))      # dWc0a
    accum(d_refs[n_w - 4], outer(d_enc, g_c0))    # dWc0b
    accum(d_refs[n_w - 3], jnp.sum(g_c0, axis=0, keepdims=True))  # dbc0
    g_hid = mm_t(g_c0, wc0a)                      # (B, D) f32 (hid has no relu)
    g_denc = mm_t(g_c0, wc0b)                     # (B, Ddir) f32

    d_dens128 = jnp.concatenate(
        [d_dens_row, jnp.zeros((B, 127), f32)], axis=-1)

    # ---- segment 2 backward ----
    base = 2 * n_seg_layers  # index of w5a in the flat list
    ih = base + 3 + 2 * (n_seg_layers - 2)  # index of wh
    accum(d_refs[ih], outer(s, g_hid))            # dWh
    accum(d_refs[ih + 1], outer(s, d_dens128))    # dWd
    accum(d_refs[ih + 2], jnp.sum(g_hid, axis=0, keepdims=True))     # dbh
    accum(d_refs[ih + 3], jnp.sum(d_dens128, axis=0, keepdims=True))  # dbd
    g = mm_t(g_hid, wh) + mm_t(d_dens128, wd)     # grad into s (post-relu)
    for li in range(n_seg_layers - 3, -1, -1):
        g = g * (acts2[li + 1].astype(f32) > 0.0).astype(f32)
        w, _b = seg2_mid[li]
        idx = base + 3 + 2 * li
        accum(d_refs[idx], outer(acts2[li], g))
        accum(d_refs[idx + 1], jnp.sum(g, axis=0, keepdims=True))
        g = mm_t(g, w)
    g = g * (acts2[0].astype(f32) > 0.0).astype(f32)
    # recompute zrel from z1 (frees the forward buffer across the bwd chain)
    zrel_b = cde(jnp.maximum(z1.astype(f32), 0.0))
    accum(d_refs[base], outer(zrel_b, g))         # dW5a
    accum(d_refs[base + 1], outer(p_enc, g))      # dW5b
    accum(d_refs[base + 2], jnp.sum(g, axis=0, keepdims=True))  # db5
    g_penc = mm_t(g, w5b)                         # pos_enc grad (from seg2)
    g_z = mm_t(g, w5a) * (z1.astype(f32) > 0.0).astype(f32)  # inter-seg relu

    # ---- segment 1 backward ----
    g = g_z
    for li in range(n_seg_layers - 1, -1, -1):
        if li < n_seg_layers - 1:
            g = g * (acts1[li].astype(f32) > 0.0).astype(f32)
        a_in = acts1[li - 1] if li > 0 else p_enc
        w, _b = seg1_w[li]
        accum(d_refs[2 * li], outer(a_in, g))
        accum(d_refs[2 * li + 1], jnp.sum(g, axis=0, keepdims=True))
        g = mm_t(g, w)
    g_penc = g_penc + g                           # (B, P) f32

    # ---- encoding backward -> per-row geometry grads ----
    d_pos = _encode_bwd(g_penc, cosP, sinP, maskfP, LP)       # (B, 3)
    d_dirs_rep = _encode_bwd(g_denc, cosD, sinD, maskfD, LD)  # (B, 3)
    wrgb = jnp.concatenate(
        [mv(e_mat, jnp.concatenate(rgb_fine, axis=-1)),       # per-ray rgb
         d_pos, d_dirs_rep, jnp.zeros((B, 7), f32)], axis=-1)
    out_rows_ref[:] = wrgb


def _flatten_weights(params: Dict, n_hidden: int, cd) -> list:
    """Standard NerfMLP pytree -> the kernel's split/padded flat weight list.

    Weights are cast to the compute dtype (bf16 halves their VMEM footprint);
    biases stay fp32 (added to fp32 accumulators). The density and final
    color columns are zero-padded to 128 lanes.
    """
    L = n_hidden + 1
    s1 = params["segments"][0]["layers"]
    s2 = params["segments"][1]["layers"]
    col = params["color"]
    D = s1[0]["w"].shape[1]

    wcast = (lambda w: w.astype(cd)) if cd is not None else (lambda w: w)
    b2d = lambda b: b.astype(jnp.float32).reshape(1, -1)

    flat = []
    for l in s1:
        flat += [wcast(l["w"]), b2d(l["b"])]
    w5 = s2[0]["w"]  # (D + P, D): rows 0:D = z-part, D:D+P = pos_enc part
    flat += [wcast(w5[:D]), wcast(w5[D:]), b2d(s2[0]["b"])]
    for l in s2[1:L - 1]:
        flat += [wcast(l["w"]), b2d(l["b"])]
    w9 = s2[L - 1]["w"]  # (D, D + 1): cols 0:D hidden, D density
    wd = jnp.pad(w9[:, D:], ((0, 0), (0, 127)))
    bd = jnp.pad(s2[L - 1]["b"][D:].reshape(1, 1), ((0, 0), (0, 127)))
    flat += [wcast(w9[:, :D]), wcast(wd),
             b2d(s2[L - 1]["b"][:D]), bd.astype(jnp.float32)]
    wc0 = col[0]["w"]  # (D + Ddir, C)
    flat += [wcast(wc0[:D]), wcast(wc0[D:]), b2d(col[0]["b"])]
    wc1 = jnp.pad(col[1]["w"], ((0, 0), (0, 125)))  # (C, 3) -> (C, 128)
    bc1 = jnp.pad(col[1]["b"].reshape(1, 3), ((0, 0), (0, 125)))
    flat += [wcast(wc1), bc1.astype(jnp.float32)]
    return flat


def _unflatten_grads(outs, params: Dict, n_hidden: int) -> Dict:
    """Kernel dW/db list (same order/shapes as the flat weights, fp32) back
    into the standard radiance pytree."""
    L = n_hidden + 1

    i = 0

    def take():
        nonlocal i
        r = outs[i]
        i += 1
        return r

    seg1 = []
    for _ in range(L):
        w = take()
        b = take()[0]
        seg1.append({"w": w, "b": b})
    dw5a, dw5b, db5 = take(), take(), take()[0]
    seg2 = [{"w": jnp.concatenate([dw5a, dw5b], axis=0), "b": db5}]
    for _ in range(L - 2):
        w = take()
        b = take()[0]
        seg2.append({"w": w, "b": b})
    dwh, dwd, dbh, dbd = take(), take(), take()[0], take()[0]
    seg2.append({
        "w": jnp.concatenate([dwh, dwd[:, :1]], axis=1),
        "b": jnp.concatenate([dbh, dbd[:1]]),
    })
    dwc0a, dwc0b, dbc0 = take(), take(), take()[0]
    dwc1, dbc1 = take(), take()[0]
    color = [
        {"w": jnp.concatenate([dwc0a, dwc0b], axis=0), "b": dbc0},
        {"w": dwc1[:, :3], "b": dbc1[:3]},
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
) -> Tuple[jnp.ndarray, Dict, jnp.ndarray, jnp.ndarray]:
    """One fused launch: returns (rgb_fine (N,3), grads_radiance pytree,
    d_origs (N,3), d_dirs (N,3)) for loss = mean((rgb - target)^2) over
    (N, 3). Middle-point integration (`integration_strategy="middle"`)."""
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
    tile = tile_rays or max(1, 512 // S)
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

    flat_w = _flatten_weights(params, cfg.n_hidden, cd)
    static = (
        S, pe.levels, de.levels, float(pe.scale), float(density_scale),
        1.0 / (n * 3.0), cd, cfg.n_hidden,
        int(os.environ.get("NETPU_TRAIN_FWD_ONLY", 0)),
    )

    rows16 = pl.BlockSpec((B, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [rows16, smem, smem]
    in_specs += [full(x.shape) for x in flat_w]

    out_specs = [rows16]
    out_shapes = [jax.ShapeDtypeStruct((n_pad * S, 16), f32)]
    for x in flat_w:
        out_specs.append(full(x.shape))
        out_shapes.append(jax.ShapeDtypeStruct(x.shape, f32))

    # raise the Mosaic scoped-VMEM limit for wide tiles (tile=8 measures
    # ~16.3M live; the physical budget is larger — the 16M default is the
    # compiler's conservative cap)
    vmem_mb = int(os.environ.get("NETPU_TRAIN_VMEM_MB", 0))
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
        *flat_w,
    )
    # rows: [rgb_fine(replicated per ray), d_pos, d_dirs_rep, pad]
    rows = outs[0].reshape(n_pad, S, 16)[:n]
    rgb_fine = rows[:, 0, 0:3]
    d_pos = rows[:, :, 3:6]
    d_dirs_rep = rows[:, :, 6:9]
    d_origs = jnp.sum(d_pos, axis=1)
    d_dirs = jnp.sum(t_q[:n, :, None] * d_pos + d_dirs_rep, axis=1)

    grads = _unflatten_grads(outs[1:], params, cfg.n_hidden)
    # match the pytree's leaf dtypes (optax requires grads dtype == param dtype)
    grads = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), grads, params)
    return rgb_fine, grads, d_origs, d_dirs
