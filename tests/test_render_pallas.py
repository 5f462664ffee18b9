"""Pallas fused volume-render kernel vs the pure-JAX reference (interpret
mode on CPU; the same kernel compiles on TPU — exercised by bench/e2e)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.ops import render, render_pallas

pytestmark = pytest.mark.slow


def _random_inputs(key, n=64, s=32):
    ks = jax.random.split(key, 4)
    dens = jax.random.uniform(ks[0], (n, s)) * 8.0
    colors = jax.random.uniform(ks[1], (n, s, 3))
    t = jnp.sort(jax.random.uniform(ks[2], (n, s + 1)) * 6.0 + 2.0, axis=-1)
    return dens, colors, t[:, :-1], t[:, 1:]


class TestForwardParity:
    def test_matches_reference(self):
        dens, colors, ts, te = _random_inputs(jax.random.PRNGKey(0))
        ref = render.render_full(dens, colors, ts, te)
        out = render_pallas.render_full_pallas(dens, colors, ts, te, interpret=True)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[2]), np.asarray(ref[2]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[3]["trans"]),
                                   np.asarray(ref[3]["trans"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[3]["weights"]),
                                   np.asarray(ref[3]["weights"]), atol=1e-5)

    def test_render_rays_parity(self):
        dens, colors, ts, te = _random_inputs(jax.random.PRNGKey(1))
        rgb_ref, w_ref = render.render_rays(dens, colors, te - ts)
        rgb, w = render_pallas.render_rays_pallas(dens, colors, te - ts, interpret=True)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)

    def test_ragged_tile_edge(self):
        # N not a multiple of TILE_N: edge block must not corrupt outputs
        dens, colors, ts, te = _random_inputs(jax.random.PRNGKey(2), n=300, s=16)
        ref = render.render_full(dens, colors, ts, te)
        out = render_pallas.render_full_pallas(dens, colors, ts, te, interpret=True)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)


class TestBackwardParity:
    @pytest.mark.parametrize("wrt", [0, 1, 3])  # densities, dists-as-t, colors
    def test_grads_match_reference(self, wrt):
        dens, colors, ts, te = _random_inputs(jax.random.PRNGKey(3), n=32, s=16)

        def loss_ref(dens, ts, te, colors):
            rgb, opacity, depth, extras = render.render_full(dens, colors, ts, te)
            return (jnp.sum(rgb**2) + jnp.sum(opacity) + 0.5 * jnp.sum(depth)
                    + jnp.sum(extras["weights"] * 0.1) + jnp.sum(extras["trans"] * 0.01))

        def loss_pal(dens, ts, te, colors):
            rgb, opacity, depth, extras = render_pallas.render_full_pallas(
                dens, colors, ts, te, interpret=True)
            return (jnp.sum(rgb**2) + jnp.sum(opacity) + 0.5 * jnp.sum(depth)
                    + jnp.sum(extras["weights"] * 0.1) + jnp.sum(extras["trans"] * 0.01))

        args = (dens, ts, te, colors)
        g_ref = jax.grad(loss_ref, argnums=wrt)(*args)
        g_pal = jax.grad(loss_pal, argnums=wrt)(*args)
        if wrt in (1, 2):
            # t gradients: pallas path omits the depth-tmid term by design
            # (nerfacc parity); compare only the dists-mediated part by using
            # a loss without depth
            def loss_ref2(dens, ts, te, colors):
                rgb, opacity, _, extras = render.render_full(dens, colors, ts, te)
                return jnp.sum(rgb**2) + jnp.sum(opacity)

            def loss_pal2(dens, ts, te, colors):
                rgb, opacity, _, extras = render_pallas.render_full_pallas(
                    dens, colors, ts, te, interpret=True)
                return jnp.sum(rgb**2) + jnp.sum(opacity)

            g_ref = jax.grad(loss_ref2, argnums=wrt)(*args)
            g_pal = jax.grad(loss_pal2, argnums=wrt)(*args)
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   atol=2e-4, rtol=1e-3)
