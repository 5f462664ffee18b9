"""Rotation-convention sanity check (lie-algebra-check analogue).

The reference ships a WebGL teapot page (`lie-algebra-check/`) to visually
verify rotation-matrix handedness/conventions. Here the same conventions are
checked numerically and (optionally) rendered as a matplotlib animation of a
rotating wireframe: right-handed axes, positive angle = counter-clockwise
about the axis (looking down it), exp(hat(z*theta)) rotates x toward y.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.ops.lie import so3_exp


def convention_checks() -> Dict[str, bool]:
    checks = {}
    # rotate x-axis by +90 deg about z -> y-axis (right-handed, CCW)
    R = np.asarray(so3_exp(jnp.array([0.0, 0.0, np.pi / 2])))
    checks["z_rotation_x_to_y"] = bool(np.allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-5))
    # rotate y-axis by +90 deg about x -> z-axis
    R = np.asarray(so3_exp(jnp.array([np.pi / 2, 0.0, 0.0])))
    checks["x_rotation_y_to_z"] = bool(np.allclose(R @ [0, 1, 0], [0, 0, 1], atol=1e-5))
    # composition: exp(a) exp(b) != exp(a+b) for non-commuting rotations
    a, b = jnp.array([0.7, 0.0, 0.0]), jnp.array([0.0, 0.7, 0.0])
    lhs = np.asarray(so3_exp(a)) @ np.asarray(so3_exp(b))
    rhs = np.asarray(so3_exp(a + b))
    checks["non_commutative"] = bool(np.abs(lhs - rhs).max() > 1e-3)
    # camera convention: c2w rotation maps camera -z to the viewing direction
    from nerf_experiments_tpu.data.synthetic import look_at_c2w

    c2w = look_at_c2w(np.array([4.0, 0.0, 0.0]), np.zeros(3), np.array([0.0, 0.0, 1.0]))
    view = c2w[:3, :3] @ np.array([0.0, 0.0, -1.0])
    checks["camera_looks_at_target"] = bool(np.allclose(view, [-1, 0, 0], atol=1e-6))
    checks["c2w_orthogonal"] = bool(
        np.allclose(c2w[:3, :3] @ c2w[:3, :3].T, np.eye(3), atol=1e-6)
    )
    return checks


def render_teapot_frames(n_frames: int = 8, out_dir: str = None):
    """Optional visual check: rotating unit-cube wireframe PNGs."""
    import os

    corners = np.array(
        [[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], dtype=float
    )
    frames = []
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        R = np.asarray(so3_exp(jnp.array([0.0, 0.0, theta])))
        frames.append(corners @ R.T)
    if out_dir is not None:
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            os.makedirs(out_dir, exist_ok=True)
            for i, pts in enumerate(frames):
                fig = plt.figure()
                ax = fig.add_subplot(projection="3d")
                ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2])
                fig.savefig(os.path.join(out_dir, f"frame_{i}.png"))
                plt.close(fig)
        except ImportError:
            pass
    return frames


if __name__ == "__main__":
    import json

    print(json.dumps(convention_checks(), indent=2))
