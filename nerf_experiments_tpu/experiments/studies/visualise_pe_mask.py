"""Visualize IPE x BARF-mask encoding weights vs distance t.

Parity with `barf/visualise_mip_barf_pe_mask.py:1-80`: computes the
per-frequency attenuation of the IntegratedBarf encoding along a ray (the
product of the IPE Gaussian weight and the BARF cosine mask) for a sweep of
t values and alphas, and writes the matrix as .npz (+ matplotlib PNG when
available). Useful for choosing alpha/sigma schedules.
"""
from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.encodings.fourier import Integrated, _barf_mask


def pe_mask_weights(
    levels: int = 10,
    alphas=(0.0, 2.5, 5.0, 10.0),
    t_range=(2.0, 8.0),
    n_t: int = 64,
    pixel_width: float = 1.0 / 555.0,
    bin_width: float = 0.05,
):
    """Returns dict alpha -> (n_t, levels) combined weights for a canonical
    axis-aligned ray."""
    ts = np.linspace(*t_range, n_t)
    enc = Integrated(levels=levels, scale=1.0, include_identity=False,
                     distribute_variance=False)
    dirs = jnp.array([[0.0, 0.0, -1.0]])
    out = {}
    for alpha in alphas:
        mask = np.asarray(_barf_mask(levels, 1, jnp.asarray(float(alpha)), jnp.float32))
        rows = []
        for t in ts:
            pos = jnp.array([[0.0, 0.0, -t]])
            t0 = jnp.array([[t - bin_width / 2]])
            t1 = jnp.array([[t + bin_width / 2]])
            pw = jnp.array([[pixel_width]])
            feats = np.asarray(enc(pos, dirs, pw, t0, t1))
            # cos block, z-channel weights = |feature| since pos_mu z ~ -t
            cos_z = np.abs(feats[0, 2 * levels : 3 * levels])
            # normalize out the cos() value to isolate the attenuation weight
            arg = -t * (2.0 ** np.arange(levels))
            denom = np.maximum(np.abs(np.cos(arg)), 1e-3)
            rows.append(np.clip(cos_z / denom, 0, 1) * mask[:levels])
        out[alpha] = np.stack(rows)
    return ts, out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out_dir", default="runs/pe_mask")
    p.add_argument("--levels", type=int, default=10)
    args = p.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    ts, weights = pe_mask_weights(levels=args.levels)
    np.savez(os.path.join(args.out_dir, "pe_mask_weights.npz"), t=ts,
             **{f"alpha_{a}": w for a, w in weights.items()})
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(weights), figsize=(4 * len(weights), 3))
        for ax, (a, w) in zip(np.atleast_1d(axes), weights.items()):
            ax.imshow(w.T, aspect="auto", origin="lower",
                      extent=[ts[0], ts[-1], 0, args.levels])
            ax.set_title(f"alpha={a}")
            ax.set_xlabel("t")
            ax.set_ylabel("frequency level")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "pe_mask.png"))
    except ImportError:
        pass
    print(os.path.join(args.out_dir, "pe_mask_weights.npz"))


if __name__ == "__main__":
    main()
