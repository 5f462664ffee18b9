"""GARF radiance training mega-kernel: forward + compositing + photometric
loss-grad + backward of the Gaussian-activation radiance network in ONE
Pallas launch per ray tile.

Why: the GARF step (`barf/model_garf.py:206-295` workload — 64-sample
proposal + 192-sample radiance, RadianceNetwork 3->1024->256->128->128 /
->512->256->128->129 / color 131->256->3) is backward-bound in XLA: the
(B*S, 1024) Gaussian pre-activations and activations round-trip to HBM in
forward AND backward (measured 18.8 ms/step = 3.8 fwd + 15.0 bwd+opt at
1024x192). This kernel keeps the radiance chain's activations in VMEM
through the backward pass.

The split is exact, not approximate, because of how GARF's loss factors
(`systems/garf_system.py:loss_fn`):
  * the radiance net's gradient comes ONLY from the photometric MSE — the
    interlevel proposal loss stop-grads the radiance transmittance
    (`ops/proposal.py:159`), and resampled t-bins are stop-gradded
    (`ops/proposal.py:116-117`);
  * the proposal net's gradient comes ONLY from the interlevel loss;
  * the camera gradient is the SUM of the photometric path through radiance
    sample positions (this kernel's d_origs/d_dirs) and the interlevel path
    through proposal sample positions (left to XLA autodiff — the proposal
    net is ~3% of the radiance FLOPs).

Mosaic design rules shared with `ops/train_megakernel.py` (v2): no
unaligned concats (the 131-wide [z1 . pos] and [z1+z2c . dir] inputs are
split GEMMs summed in fp32; the 129-wide density head is a 128+128 merged
GEMM sliced at the aligned boundary); Gaussian activations + pre-activations
stored at compute width in forward so backward is a multiply chain (Mosaic
cannot compare/transcend in bf16 — all activation math runs f32 on VPU);
static E/F/triangular masks are kernel inputs. Because S=192 is not
lane-aligned, the (B, 1) <-> (T, S) conversions avoid Mosaic reshapes
entirely: rows->plane is the contraction E^T @ (col * F), plane->rows is
rowsum((E @ X) * F) — four tiny MXU ops.

Gaussian activation (`barf/gaussian.py:8-31,57-63`): a = exp(-x^2 v),
v = isd^2 + 1e-6; da/dx = -2 x v a, da/d(isd) = -x^2 a * 2 isd. The
reference hand-writes this backward in a th.autograd.Function to save
memory; here the same recompute-free exact gradient runs inside the kernel.
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

# flat weight/bias/activation-param order shared by flatten / kernel /
# unflatten. d1 has 4 activation layers; d2 has 3 + merged raw head;
# color has 1 + padded rgb head. The gabor family carries a SECOND
# per-layer activation param (spread), named s<key>.
ACT_KEYS_D1 = ["1_0", "1_1", "1_2", "1_3"]
ACT_KEYS_D2 = ["2_0", "2_1", "2_2"]
ACT_KEY_C = "c0"


def _act_names(key: str, activation: str):
    return [f"i{key}", f"s{key}"] if activation == "gabor" else [f"i{key}"]


def _names(activation: str):
    names = []
    for i, k in enumerate(ACT_KEYS_D1):
        names += [f"wd1_{i}", f"bd1_{i}"] + _act_names(k, activation)
    names += ["wd2_0a", "wd2_0x", "bd2_0"] + _act_names("2_0", activation)
    for i in (1, 2):
        names += [f"wd2_{i}", f"bd2_{i}"] + _act_names(f"2_{i}", activation)
    names += ["wd2_3m", "bd2_3"]
    names += ["wc0a", "wc0x", "bc0"] + _act_names(ACT_KEY_C, activation)
    names += ["wc1", "bc1"]
    return names


def _kernel(static, rays_ref, an_ref, lt_ref, ut_ref, e_ref, f_ref, *refs):
    (S, dscale, inv_n3, cd, fwd_only, activation) = static
    f32 = jnp.float32
    names = _names(activation)
    n_w = len(names)
    W = {nm: refs[i] for i, nm in enumerate(names)}
    out_rows_ref = refs[n_w]
    Dref = {nm: refs[n_w + 1 + i] for i, nm in enumerate(names)}

    first = pl.program_id(0) == 0
    gamma = an_ref[0, 0]  # activation-anneal scalar (gabor/sarf only)

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
        return _dot(a, w_ref[:], ((1,), (1,)))

    def outer(a, g):
        return _dot(a, g, ((0,), (0,)))

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
    e_mat = e_ref[:]               # (B, T)
    f_mat = f_ref[:]               # (B, S)

    # ---- learnable-bandwidth activation family (static dispatch) ----
    # gauss: a = exp(-x^2 v), v = isd^2 + 1e-6           (barf/gaussian.py)
    # gabor: a = exp(-v x^2) cos(s x)                     (gaborf/gabor.py)
    # sarf:  a = cos(f/(xs^2 + f^-2)) exp(-xs^2),
    #        xs = -sign(x)(|x|+1e-4), dxs/dx = -1         (sarf/activation.py:62-65)
    def act(x_f32, key):
        """(post-act cd, stored tuple) — stored feeds the backward chain.

        gauss stores only the pre-activation (its backward is a multiply
        chain off the stored post-act — zero transcendentals). gabor/sarf
        additionally store their two forward transcendental factors at
        compute width so the backward recomputes ONE transcendental (a sin)
        instead of three (exp + cos + sin) — they are VPU-transcendental-
        bound (measured: gabor 49.3 ms vs gauss 11.8 ms at 1024x192, and
        step time tracks the per-element transcendental count)."""
        if activation == "gauss":
            v = W[f"i{key}"][:] ** 2 + 1e-6
            a = jnp.exp(-(x_f32 * x_f32) * v)
            return cde(a), (cde(x_f32),)
        if activation == "gabor":
            v = W[f"i{key}"][:] ** 2 + 1e-6
            sp = W[f"s{key}"][:] * gamma
            e = jnp.exp(-v * x_f32 * x_f32)
            csx = jnp.cos(sp * x_f32)
            return cde(e * csx), (cde(x_f32), cde(e), cde(csx))
        if activation == "sarf":
            f = W[f"i{key}"][:]
            sgn = jnp.where(x_f32 < 0.0, 1.0, -1.0)
            xs = sgn * (jnp.abs(x_f32) + 1e-4)
            u = xs * xs
            denom = u + 1.0 / (f * f)
            eu = jnp.exp(-u)
            cth = jnp.cos(gamma * f / denom)
            return cde(cth * eu), (cde(x_f32), cde(eu), cde(cth))
        raise ValueError(activation)

    def act_stored(x_cd, key):
        """Recompute act()'s stored tuple from a pre-activation — used by
        the 1024-wide layer 1_0, which recomputes instead of storing (its
        stored factors would cost 2 extra (B, 1024) VMEM buffers)."""
        if activation == "gauss":
            return (x_cd,)
        xf = x_cd.astype(f32)
        if activation == "gabor":
            v = W[f"i{key}"][:] ** 2 + 1e-6
            sp = W[f"s{key}"][:] * gamma
            return (x_cd, cde(jnp.exp(-v * xf * xf)),
                    cde(jnp.cos(sp * xf)))
        sgn = jnp.where(xf < 0.0, 1.0, -1.0)
        xs = sgn * (jnp.abs(xf) + 1e-4)
        u = xs * xs
        denom = u + 1.0 / (W[f"i{key}"][:] * W[f"i{key}"][:])
        return (x_cd, cde(jnp.exp(-u)),
                cde(jnp.cos(gamma * W[f"i{key}"][:] / denom)))

    def act_bwd(g, a_cd, stored, key):
        """g wrt act output -> g wrt pre-act; accumulates d(act params)."""
        xf = stored[0].astype(f32)
        if activation == "gauss":
            v = W[f"i{key}"][:] ** 2 + 1e-6
            ga = g * a_cd.astype(f32)
            accum(f"i{key}", bsum(-ga * xf * xf) * (2.0 * W[f"i{key}"][:]))
            return ga * (-2.0 * v) * xf
        if activation == "gabor":
            isd = W[f"i{key}"][:]
            v = isd**2 + 1e-6
            sp = W[f"s{key}"][:] * gamma
            e = stored[1].astype(f32)
            csx = stored[2].astype(f32)
            ssx = jnp.sin(sp * xf)  # the one recomputed transcendental
            gme = -g * e
            accum(f"i{key}", bsum(gme * xf * xf * csx) * (2.0 * isd))
            accum(f"s{key}", bsum(gme * xf * ssx) * gamma)
            return gme * (2.0 * csx * v * xf + sp * ssx)
        if activation == "sarf":
            f = W[f"i{key}"][:]
            sgn = jnp.where(xf < 0.0, 1.0, -1.0)
            xs = sgn * (jnp.abs(xf) + 1e-4)
            u = xs * xs
            f2i = 1.0 / (f * f)
            denom = u + f2i
            theta = gamma * f / denom
            eu = stored[1].astype(f32)
            cth = stored[2].astype(f32)
            sth = jnp.sin(theta)  # the one recomputed transcendental
            # da/du = eu (gamma sin(th) f / denom^2 - cos(th)); du/dx = -2 xs
            da_du = eu * (gamma * sth * f / (denom * denom) - cth)
            accum(f"i{key}", bsum(-g * gamma * sth * (u + 3.0 * f2i)
                                  / (denom * denom) * eu))
            return g * da_du * (-2.0 * xs)
        raise ValueError(activation)

    # ---- density1: 3 -> 1024 -> 256 -> 128 -> 128, gauss after each ----
    x10 = mm(pos, W["wd1_0"]) + W["bd1_0"][:]
    a10, _ = act(x10, "1_0")    # stored tuple recomputed in bwd (VMEM: 1024-wide)
    x11 = mm(a10, W["wd1_1"]) + W["bd1_1"][:]
    a11, x11c = act(x11, "1_1")
    x12 = mm(a11, W["wd1_2"]) + W["bd1_2"][:]
    a12, x12c = act(x12, "1_2")
    x13 = mm(a12, W["wd1_3"]) + W["bd1_3"][:]
    z1, x13c = act(x13, "1_3")  # (B, 128)

    # ---- density2: [z1 . pos] -> 512 -> 256 -> 128 -> (128 | density) ----
    x20 = mm(z1, W["wd2_0a"]) + mm(pos, W["wd2_0x"]) + W["bd2_0"][:]
    a20, x20c = act(x20, "2_0")
    x21 = mm(a20, W["wd2_1"]) + W["bd2_1"][:]
    a21, x21c = act(x21, "2_1")
    x22 = mm(a21, W["wd2_2"]) + W["bd2_2"][:]
    a22, x22c = act(x22, "2_2")
    z2m = mm(a22, W["wd2_3m"]) + W["bd2_3"][:]  # (B, 256) f32, col 128 = dens
    z2c = z2m[:, :128]
    dens_row = z2m[:, 128:129]                  # (B, 1) f32 raw

    # ---- color: [z1 + z2c . dir] -> 256 -> 3 (sigmoid) ----
    ci = cde(z1.astype(f32) + z2c)
    x30 = mm(ci, W["wc0a"]) + mm(dirs, W["wc0x"]) + W["bc0"][:]
    a30, x30c = act(x30, "c0")
    logits = mm(a30, W["wc1"]) + W["bc1"][:]    # (B, 128), cols 0:3 = rgb
    rgb128 = jax.nn.sigmoid(logits)

    if fwd_only == 2:  # bisect probe: nets only
        out_rows_ref[:] = jnp.concatenate(
            [rgb128[:, :3], dens_row, jnp.zeros((B, 12), f32)], axis=-1)
        for nm in names:
            accum(nm, jnp.zeros(Dref[nm].shape, f32))
        return

    # ---- rows -> (T, S) planes without reshape: E^T @ (col * F) ----
    def ts(col):
        return jax.lax.dot_general(
            e_mat, col * f_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def mv(m_, v):
        return jax.lax.dot_general(
            m_, v, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    def ts_to_rows(x_ts):
        return jnp.sum(mv(e_mat, x_ts) * f_mat, axis=-1, keepdims=True)

    density_sh = ts(dens_row) - 1.0  # softplus8(z - 1), model_garf_radiance
    density = jnp.where(
        density_sh > 8.0, density_sh,
        jax.nn.softplus(jnp.minimum(density_sh, 8.0)))

    dists = ts(rays[:, 7:8])
    blocking = -density * dists * dscale          # (T, S) f32 (<= 0)
    excl = mv(blocking, lt_ref[:])
    trans = jnp.exp(excl)
    alpha_c = 1.0 - jnp.exp(blocking)
    w_ts = trans * alpha_c                        # (T, S)

    cr = ts(rgb128[:, 0:1])
    cg = ts(rgb128[:, 1:2])
    cb = ts(rgb128[:, 2:3])
    rgb_fine = [jnp.sum(w_ts * c, axis=-1, keepdims=True) for c in (cr, cg, cb)]

    tgt = [ts(rays[:, 10 + c : 11 + c])[:, :1] for c in range(3)]
    valid = ts(rays[:, 13:14])[:, :1]             # (T, 1)
    g_fine = [2.0 * (rgb_fine[c] - tgt[c]) * inv_n3 * valid for c in range(3)]

    w_row = ts_to_rows(w_ts)                      # (B, 1) — interlevel input

    if fwd_only:
        out_rows_ref[:] = jnp.concatenate(
            [mv(e_mat, jnp.concatenate(rgb_fine, axis=-1)),
             jnp.zeros((B, 6), f32), w_row, jnp.zeros((B, 6), f32)], axis=-1)
        for nm in names:
            accum(nm, jnp.zeros(Dref[nm].shape, f32))
        return

    # ---- compositing backward ----
    g_w = g_fine[0] * cr + g_fine[1] * cg + g_fine[2] * cb   # (T, S)
    q = g_w * w_ts
    suffix = mv(q, ut_ref[:])
    d_blocking = -g_w * trans * (1.0 - alpha_c) + suffix
    d_density = d_blocking * (-dists * dscale)
    sp_grad = jnp.where(
        density_sh > 8.0, jnp.ones_like(density_sh),
        jax.nn.sigmoid(jnp.minimum(density_sh, 8.0)))
    d_dens_row = ts_to_rows(d_density * sp_grad)  # (B, 1)
    g_rows = mv(e_mat, jnp.concatenate(g_fine, axis=-1))  # (B, 3)
    d_rgb3 = g_rows * w_row

    # ---- color backward ----
    zero125 = jnp.zeros((B, 125), f32)
    d_logits = (jnp.concatenate([d_rgb3, zero125], axis=-1)
                * rgb128 * (1.0 - rgb128))
    accum("wc1", outer(a30, d_logits))
    accum("bc1", bsum(d_logits))
    g_x30 = act_bwd(mm_t(d_logits, W["wc1"]), a30, x30c, "c0")
    accum("wc0a", outer(ci, g_x30))
    accum("wc0x", outer(dirs, g_x30))
    accum("bc0", bsum(g_x30))
    g_ci = mm_t(g_x30, W["wc0a"])                 # grad into z1 AND z2c
    d_dirs_rep = mm_t(g_x30, W["wc0x"])           # (B, 3)

    # ---- density2 backward ----
    d_dens128 = jnp.concatenate(
        [d_dens_row, jnp.zeros((B, 127), f32)], axis=-1)
    g_z2m = jnp.concatenate([g_ci, d_dens128], axis=-1)   # (B, 256) aligned
    accum("wd2_3m", outer(a22, g_z2m))
    accum("bd2_3", bsum(g_z2m))
    g_x22 = act_bwd(mm_t(g_z2m, W["wd2_3m"]), a22, x22c, "2_2")
    accum("wd2_2", outer(a21, g_x22))
    accum("bd2_2", bsum(g_x22))
    g_x21 = act_bwd(mm_t(g_x22, W["wd2_2"]), a21, x21c, "2_1")
    accum("wd2_1", outer(a20, g_x21))
    accum("bd2_1", bsum(g_x21))
    g_x20 = act_bwd(mm_t(g_x21, W["wd2_1"]), a20, x20c, "2_0")
    accum("wd2_0a", outer(z1, g_x20))
    accum("wd2_0x", outer(pos, g_x20))
    accum("bd2_0", bsum(g_x20))
    g_z1 = mm_t(g_x20, W["wd2_0a"]) + g_ci        # skip + color_in share z1
    d_pos = mm_t(g_x20, W["wd2_0x"])              # (B, 3) accumulates below

    # ---- density1 backward ----
    g_x13 = act_bwd(g_z1, z1, x13c, "1_3")
    accum("wd1_3", outer(a12, g_x13))
    accum("bd1_3", bsum(g_x13))
    g_x12 = act_bwd(mm_t(g_x13, W["wd1_3"]), a12, x12c, "1_2")
    accum("wd1_2", outer(a11, g_x12))
    accum("bd1_2", bsum(g_x12))
    g_x11 = act_bwd(mm_t(g_x12, W["wd1_2"]), a11, x11c, "1_1")
    accum("wd1_1", outer(a10, g_x11))
    accum("bd1_1", bsum(g_x11))
    # recompute the (B, 1024) pre-activation instead of storing it (VMEM)
    x10r = cde(mm(pos, W["wd1_0"]) + W["bd1_0"][:])
    g_x10 = act_bwd(mm_t(g_x11, W["wd1_1"]), a10, act_stored(x10r, "1_0"),
                    "1_0")
    accum("wd1_0", outer(pos, g_x10))
    accum("bd1_0", bsum(g_x10))
    d_pos = d_pos + mm_t(g_x10, W["wd1_0"])

    out_rows_ref[:] = jnp.concatenate(
        [mv(e_mat, jnp.concatenate(rgb_fine, axis=-1)),   # per-ray rgb
         d_pos, d_dirs_rep, w_row, jnp.zeros((B, 6), f32)], axis=-1)


def _render_kernel(static, rays_ref, an_ref, lt_ref, e_ref, f_ref, *refs):
    """Forward-only sibling of `_kernel` for the GARF/GaborF/SARF serving
    path (image logger, render_views, bench): rays -> pixels in one launch,
    no gradient outputs and no stored activation tuples — each layer's
    activation is consumed by the next GEMM, so the ray tile can be ~2x the
    training kernel's at the same VMEM cap.

    Output block: (T, 128) per tile — cols 0:3 rgb, 3 opacity, 4 depth
    (nerfacc `rendering` conventions, `ops/render.py:render_full`)."""
    (S, dscale, cd, activation) = static
    f32 = jnp.float32
    names = _names(activation)
    W = {nm: refs[i] for i, nm in enumerate(names)}
    out_ref = refs[len(names)]
    gamma = an_ref[0, 0]

    def cde(x):
        return x.astype(cd) if cd is not None else x

    def mm(a, w_ref):
        if cd is None:
            return jax.lax.dot_general(
                a, w_ref[:], ((((1,), (0,))), ((), ())),
                preferred_element_type=f32, precision=HIGHEST)
        return jax.lax.dot_general(
            a.astype(cd), w_ref[:].astype(cd), ((((1,), (0,))), ((), ())),
            preferred_element_type=f32)

    rays = rays_ref[:]             # (B, 8) f32: [pos, dirs, tq, dists]
    pos = rays[:, 0:3]
    dirs = rays[:, 3:6]
    e_mat = e_ref[:]               # (B, T)
    f_mat = f_ref[:]               # (B, S)

    def act(x_f32, key):
        """Forward-only activation family (see `_kernel.act` for formulas)."""
        if activation == "gauss":
            v = W[f"i{key}"][:] ** 2 + 1e-6
            return cde(jnp.exp(-(x_f32 * x_f32) * v))
        if activation == "gabor":
            v = W[f"i{key}"][:] ** 2 + 1e-6
            sp = W[f"s{key}"][:] * gamma
            return cde(jnp.exp(-v * x_f32 * x_f32) * jnp.cos(sp * x_f32))
        if activation == "sarf":
            f = W[f"i{key}"][:]
            xs = jnp.abs(x_f32) + 1e-4  # sign cancels in xs^2
            u = xs * xs
            return cde(jnp.cos(gamma * f / (u + 1.0 / (f * f)))
                       * jnp.exp(-u))
        raise ValueError(activation)

    # ---- forward chain (no stored activations) ----
    a10 = act(mm(pos, W["wd1_0"]) + W["bd1_0"][:], "1_0")
    a11 = act(mm(a10, W["wd1_1"]) + W["bd1_1"][:], "1_1")
    a12 = act(mm(a11, W["wd1_2"]) + W["bd1_2"][:], "1_2")
    z1 = act(mm(a12, W["wd1_3"]) + W["bd1_3"][:], "1_3")
    a20 = act(mm(z1, W["wd2_0a"]) + mm(pos, W["wd2_0x"]) + W["bd2_0"][:],
              "2_0")
    a21 = act(mm(a20, W["wd2_1"]) + W["bd2_1"][:], "2_1")
    a22 = act(mm(a21, W["wd2_2"]) + W["bd2_2"][:], "2_2")
    z2m = mm(a22, W["wd2_3m"]) + W["bd2_3"][:]
    ci = cde(z1.astype(f32) + z2m[:, :128])
    a30 = act(mm(ci, W["wc0a"]) + mm(dirs, W["wc0x"]) + W["bc0"][:], "c0")
    rgb128 = jax.nn.sigmoid(mm(a30, W["wc1"]) + W["bc1"][:])

    # ---- compositing in (T, S) planes (reshape-free, see module doc) ----
    def ts(col):
        return jax.lax.dot_general(
            e_mat, col * f_mat, (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def mv(m_, v):
        return jax.lax.dot_general(
            m_, v, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    density_sh = ts(z2m[:, 128:129]) - 1.0  # softplus8(z - 1)
    density = jnp.where(
        density_sh > 8.0, density_sh,
        jax.nn.softplus(jnp.minimum(density_sh, 8.0)))
    dists = ts(rays[:, 7:8])
    t_q = ts(rays[:, 6:7])
    blocking = -density * dists * dscale
    trans = jnp.exp(mv(blocking, lt_ref[:]))
    w_ts = trans * (1.0 - jnp.exp(blocking))  # (T, S)

    rgb3 = jnp.concatenate(
        [jnp.sum(w_ts * ts(rgb128[:, c:c + 1]), axis=-1, keepdims=True)
         for c in range(3)], axis=-1)
    opacity = jnp.sum(w_ts, axis=-1, keepdims=True)
    depth = jnp.sum(w_ts * t_q, axis=-1, keepdims=True)
    T = w_ts.shape[0]
    out_ref[:] = jnp.concatenate(
        [rgb3, opacity, depth, jnp.zeros((T, 123), f32)], axis=-1)


def garf_radiance_render(
    params: Dict,             # radiance pytree
    cfg,                      # GarfConfig (for compute_dtype / activation)
    origs: jnp.ndarray,       # (N, 3)
    dirs: jnp.ndarray,        # (N, 3)
    t_start: jnp.ndarray,     # (N, S)
    t_end: jnp.ndarray,       # (N, S)
    act_anneal=1.0,
    density_scale: float = DENSITY_SCALE,
    tile_rays: int = 0,
    interpret: bool = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Forward-only mega-kernel render of the GARF radiance network on
    given t bins: (rgb (N,3), opacity (N,1), depth (N,1)) with middle-point
    integration — the serving-path equivalent of `GarfModel.forward`
    (`model_garf.py:206-249`) minus the proposal stage (whose t bins the
    caller provides). No VJP: eval contexts only."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except RuntimeError:
            interpret = True

    import os as _os

    n, S = t_start.shape
    cd = cfg.compute_dtype
    family = getattr(cfg, "activation", "gauss")
    default_rows = int(_os.environ.get("NETPU_GARF_RENDER_TILE_ROWS", 1536))
    tile = tile_rays or max(1, default_rows // S)
    # Mosaic requires the (tile, 128) output block's sublane dim % 8 == 0;
    # gabor/sarf keep ~1.6x more live transcendental temporaries per layer
    # than gauss (exp AND cos factors: 38.75M scoped VMEM at 8-ray tiles vs
    # gauss under 24M), so they get a raised cap below instead of a smaller
    # tile (4-ray tiles are not lowerable).
    if not interpret:
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
        jnp.broadcast_to(dirs[:, None, :],
                         (n_pad, S, 3)).reshape(-1, 3).astype(f32),
        t_q.reshape(-1, 1).astype(f32),
        dists.reshape(-1, 1).astype(f32),
    ], axis=-1)  # (B_total, 8): [pos, dirs, tq, dists]

    activation = getattr(cfg, "activation", "gauss")
    flat_w = _flatten_weights(params, cd, activation)
    static = (S, float(density_scale), cd, activation)

    i_s, j_s = np.indices((S, S))
    lt = jnp.asarray((i_s < j_s).astype(np.float32))
    i_b = np.arange(B)
    e_mat = jnp.asarray((i_b[:, None] // S == np.arange(tile)[None, :])
                        .astype(np.float32))
    f_mat = jnp.asarray((i_b[:, None] % S == np.arange(S)[None, :])
                        .astype(np.float32))
    consts = [lt, e_mat, f_mat]

    rows8 = pl.BlockSpec((B, 8), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [rows8, smem]
    in_specs += [full(x.shape) for x in consts]
    in_specs += [full(x.shape) for x in flat_w]

    vmem_mb = int(_os.environ.get("NETPU_GARF_RENDER_VMEM_MB", 0))
    if not vmem_mb and B > 768:
        # 40M validated on v5e for gabor/sarf at 8-ray tiles (measured: both
        # compile and run; gauss stays at the 24M validated cap)
        vmem_mb = 24 if family == "gauss" else 40
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
        jnp.asarray(act_anneal, jnp.float32).reshape(1, 1),
        *consts,
        *flat_w,
    )[:n]
    return out[:, 0:3], out[:, 3:4], out[:, 4:5]


def _flatten_weights(params: Dict, cd, activation: str) -> list:
    """Radiance pytree (`models/garf.py:radiance_init`) -> the kernel's
    split/merged/padded flat list (order = _names(activation))."""
    d1 = params["density1"]
    d2 = params["density2"]
    col = params["color"]
    wcast = (lambda w: w.astype(cd)) if cd is not None else (lambda w: w)
    b2d = lambda b: b.astype(jnp.float32).reshape(1, -1)

    def acts(a):
        if activation == "gauss":
            return [b2d(a["isd"])]
        if activation == "gabor":
            return [b2d(a["isd"]), b2d(a["spread"])]
        return [b2d(a["freq"])]  # sarf

    flat = []
    for li in range(4):
        flat += [wcast(d1["linear"][li]["w"]), b2d(d1["linear"][li]["b"])]
        flat += acts(d1["act"][li])
    w20 = d2["linear"][0]["w"]  # (128 + 3, 512): rows 0:128 z1, 128:131 pos
    flat += [wcast(w20[:128]), wcast(w20[128:]), b2d(d2["linear"][0]["b"])]
    flat += acts(d2["act"][0])
    for li in (1, 2):
        flat += [wcast(d2["linear"][li]["w"]), b2d(d2["linear"][li]["b"])]
        flat += acts(d2["act"][li])
    w23 = d2["linear"][3]["w"]  # (128, 129): cols 0:128 z2c, 128 density
    w23m = jnp.concatenate(
        [w23[:, :128], jnp.pad(w23[:, 128:], ((0, 0), (0, 127)))], axis=1)
    b23 = jnp.concatenate(
        [d2["linear"][3]["b"][:128],
         jnp.pad(d2["linear"][3]["b"][128:], (0, 127))])
    flat += [wcast(w23m), b2d(b23)]
    wc0 = col["linear"][0]["w"]  # (128 + 3, 256): rows 0:128 ci, 128:131 dir
    flat += [wcast(wc0[:128]), wcast(wc0[128:]), b2d(col["linear"][0]["b"])]
    flat += acts(col["act"][0])
    wc1 = jnp.pad(col["linear"][1]["w"], ((0, 0), (0, 125)))  # (256, 3)->128
    bc1 = jnp.pad(col["linear"][1]["b"].reshape(1, 3), ((0, 0), (0, 125)))
    flat += [wcast(wc1), bc1.astype(jnp.float32)]
    return flat


def _unflatten_grads(outs, params: Dict, activation: str) -> Dict:
    """Kernel dW/db/d(act-param) list back into the radiance pytree."""
    G = dict(zip(_names(activation), outs))

    def lin(w, b):
        return {"w": w, "b": b[0]}

    def act_g(key):
        if activation == "gauss":
            return {"isd": G[f"i{key}"][0]}
        if activation == "gabor":
            return {"isd": G[f"i{key}"][0], "spread": G[f"s{key}"][0]}
        return {"freq": G[f"i{key}"][0]}  # sarf

    d1 = {"linear": [lin(G[f"wd1_{i}"], G[f"bd1_{i}"]) for i in range(4)],
          "act": [act_g(k) for k in ACT_KEYS_D1]}
    w23m, b23 = G["wd2_3m"], G["bd2_3"][0]
    d2 = {"linear": [
              lin(jnp.concatenate([G["wd2_0a"], G["wd2_0x"]], axis=0),
                  G["bd2_0"]),
              lin(G["wd2_1"], G["bd2_1"]),
              lin(G["wd2_2"], G["bd2_2"]),
              {"w": jnp.concatenate([w23m[:, :128], w23m[:, 128:129]], axis=1),
               "b": jnp.concatenate([b23[:128], b23[128:129]])}],
          "act": [act_g(k) for k in ACT_KEYS_D2]}
    color = {"linear": [
                 lin(jnp.concatenate([G["wc0a"], G["wc0x"]], axis=0),
                     G["bc0"]),
                 {"w": G["wc1"][:, :3], "b": G["bc1"][0][:3]}],
             "act": [act_g(ACT_KEY_C)]}
    return {"density1": d1, "density2": d2, "color": color}


def garf_radiance_train_grads(
    params: Dict,             # radiance pytree
    cfg,                      # GarfConfig (for compute_dtype)
    origs: jnp.ndarray,       # (N, 3)
    dirs: jnp.ndarray,        # (N, 3)
    t_start: jnp.ndarray,     # (N, S)
    t_end: jnp.ndarray,       # (N, S)
    targets: jnp.ndarray,     # (N, 3)
    density_scale: float = DENSITY_SCALE,
    tile_rays: int = 0,
    interpret: bool = None,
    act_anneal=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict, jnp.ndarray, jnp.ndarray]:
    """One fused launch for the radiance half of the GARF step. Returns
    (rgb (N,3), weights (N,S), grads_radiance pytree, d_origs (N,3),
    d_dirs (N,3)) for loss = mean((rgb - target)^2); weights are the
    stop-gradded compositing weights for the interlevel loss."""
    if interpret is None:
        try:
            interpret = jax.devices()[0].platform != "tpu"
        except RuntimeError:
            interpret = True

    import os as _os

    n, S = t_start.shape
    cd = cfg.compute_dtype
    default_rows = int(_os.environ.get("NETPU_GARF_TILE_ROWS", 768))
    tile = tile_rays or max(1, default_rows // S)
    pad = (-n) % tile
    valid = jnp.ones((n, 1), jnp.float32)
    if pad:
        zp = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        origs, dirs = zp(origs), zp(dirs)
        t_start, t_end, targets, valid = (
            zp(t_start), zp(t_end), zp(targets), zp(valid))
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
    ], axis=-1)

    import os

    activation = getattr(cfg, "activation", "gauss")
    flat_w = _flatten_weights(params, cd, activation)
    static = (
        S, float(density_scale), 1.0 / (n * 3.0), cd,
        int(os.environ.get("NETPU_TRAIN_FWD_ONLY", 0)),
        activation,
    )

    i_s, j_s = np.indices((S, S))
    lt = jnp.asarray((i_s < j_s).astype(np.float32))
    ut = jnp.asarray((i_s > j_s).astype(np.float32))
    i_b = np.arange(B)
    e_mat = jnp.asarray((i_b[:, None] // S == np.arange(tile)[None, :])
                        .astype(np.float32))
    f_mat = jnp.asarray((i_b[:, None] % S == np.arange(S)[None, :])
                        .astype(np.float32))
    consts = [lt, ut, e_mat, f_mat]

    rows16 = pl.BlockSpec((B, 16), lambda i: (i, 0), memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)

    in_specs = [rows16, smem]
    in_specs += [full(x.shape) for x in consts]
    in_specs += [full(x.shape) for x in flat_w]

    out_specs = [rows16]
    out_shapes = [jax.ShapeDtypeStruct((n_pad * S, 16), f32)]
    for x in flat_w:
        out_specs.append(full(x.shape))
        out_shapes.append(jax.ShapeDtypeStruct(x.shape, f32))

    # 768-row tiles (default) need ~17.4M scoped VMEM (gauss; gabor's
    # spread params + backward temporaries push to ~21.3M) — 24M validated
    # on v5e (kernel 11.3 -> 9.8 ms at 1024x192)
    vmem_mb = int(os.environ.get("NETPU_TRAIN_VMEM_MB", 0))
    if not vmem_mb and B > 384:
        vmem_mb = 26  # sarf's backward temporaries peak at ~24.3M
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
    )(rays_rows, jnp.asarray(act_anneal, jnp.float32).reshape(1, 1),
      *consts, *flat_w)

    rows = outs[0].reshape(n_pad, S, 16)
    rgb_fine = rows[:n, 0, 0:3]
    d_pos = rows[:n, :, 3:6]
    d_dirs_rep = rows[:n, :, 6:9]
    weights = rows[:n, :, 9]
    d_origs = jnp.sum(d_pos, axis=1)
    d_dirs = jnp.sum(t_q[:n, :, None] * d_pos + d_dirs_rep, axis=1)

    grads = _unflatten_grads(outs[1:], params, activation)
    grads = jax.tree_util.tree_map(
        lambda g, p: g.astype(p.dtype), grads, params)
    return rgb_fine, weights, grads, d_origs, d_dirs
