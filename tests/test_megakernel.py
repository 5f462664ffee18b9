"""Render mega-kernel vs the XLA reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.encodings.fourier import Barf
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.ops.render_megakernel import flagship_render
from nerf_experiments_tpu.systems import barf as barf_sys

pytestmark = pytest.mark.slow


def _cfg(levels_pos=6, levels_dir=3, hidden=32, n_hidden=1):
    return nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=levels_pos, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=levels_dir, scale=1.0, include_identity=True),
        n_hidden=n_hidden, hidden_dim=hidden,
        delayed_direction=True, delayed_density=False, n_segments=2,
    )


def _rays(key, n):
    k1, k2 = jax.random.split(key)
    dirs = jax.random.normal(k1, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origs = jax.random.normal(k2, (n, 3)) * 0.3
    return origs, dirs


class TestMegaKernel:
    def _reference(self, params, cfg, origs, dirs, offsets, a_pos, a_dir, S, near, far):
        import os

        os.environ["NETPU_NO_PALLAS"] = "1"
        try:
            sys_cfg = barf_sys.BarfConfig(
                radiance=cfg, n_training_images=1, near=near, far=far,
                samples_per_ray_radiance=S,
                uniform_sampling_strategy="equidistant",
                uniform_sampling_offset_size=0.0,
            )
            # emulate the same per-ray offsets by shifting... offsets are 0 here
            rgb, _ = barf_sys.forward(
                {"radiance": params, "camera": None}, sys_cfg, None, origs, dirs,
                jnp.full((origs.shape[0], 1), 0.01), a_pos, a_dir, stratified=False,
            )
            return rgb
        finally:
            del os.environ["NETPU_NO_PALLAS"]

    def test_matches_xla_path(self):
        cfg = _cfg()
        params = nerf_mlp.init(jax.random.PRNGKey(0), cfg)
        origs, dirs = _rays(jax.random.PRNGKey(1), 40)
        offsets = jnp.zeros((40, 1))
        a_pos, a_dir = jnp.asarray(6.0), jnp.asarray(3.0)
        S, near, far = 16, 2.0, 6.5

        rgb_mega = flagship_render(params, cfg, origs, dirs, offsets,
                                   a_pos, a_dir, S, near, far, interpret=True)
        rgb_ref = self._reference(params, cfg, origs, dirs, offsets,
                                  a_pos, a_dir, S, near, far)
        np.testing.assert_allclose(np.asarray(rgb_mega), np.asarray(rgb_ref),
                                   atol=2e-4, rtol=1e-4)

    def test_partial_alpha_mask(self):
        cfg = _cfg()
        params = nerf_mlp.init(jax.random.PRNGKey(2), cfg)
        origs, dirs = _rays(jax.random.PRNGKey(3), 32)
        offsets = jnp.zeros((32, 1))
        a_pos, a_dir = jnp.asarray(2.5), jnp.asarray(1.5)  # ramp mid-level
        rgb_mega = flagship_render(params, cfg, origs, dirs, offsets,
                                   a_pos, a_dir, 16, 2.0, 6.5, interpret=True)
        rgb_ref = self._reference(params, cfg, origs, dirs, offsets,
                                  a_pos, a_dir, 16, 2.0, 6.5)
        np.testing.assert_allclose(np.asarray(rgb_mega), np.asarray(rgb_ref),
                                   atol=2e-4, rtol=1e-4)

    def test_rejects_unsupported_config(self):
        cfg = _cfg()
        import dataclasses

        bad = dataclasses.replace(cfg, n_segments=3)
        params = nerf_mlp.init(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError):
            flagship_render(params, bad, jnp.zeros((8, 3)), jnp.ones((8, 3)),
                            jnp.zeros((8, 1)), 6.0, 3.0, 8, 2.0, 6.5, interpret=True)

    def test_ragged_ray_count(self):
        cfg = _cfg()
        params = nerf_mlp.init(jax.random.PRNGKey(4), cfg)
        origs, dirs = _rays(jax.random.PRNGKey(5), 37)  # not a TILE_R multiple
        rgb = flagship_render(params, cfg, origs, dirs, jnp.zeros((37, 1)),
                              6.0, 3.0, 16, 2.0, 6.5, interpret=True)
        assert rgb.shape == (37, 3)
        assert np.isfinite(np.asarray(rgb)).all()
