"""Fused Pallas MLP chain vs plain-JAX reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.models.common import linear_init
from nerf_experiments_tpu.ops.fused_mlp import fused_chain

pytestmark = pytest.mark.slow


def _ref_chain(x, layers):
    h = x
    for i, l in enumerate(layers):
        h = h @ l["w"] + l["b"]
        if i < len(layers) - 1:
            h = jax.nn.relu(h)
    return h


def _make(key, dims):
    ks = jax.random.split(key, len(dims))
    return [linear_init(ks[i], dims[i], dims[i + 1]) for i in range(len(dims) - 1)]


class TestFusedChain:
    def test_forward_parity(self):
        layers = _make(jax.random.PRNGKey(0), [63, 128, 128, 64])
        x = jax.random.normal(jax.random.PRNGKey(1), (200, 63))
        out = fused_chain(x, layers, interpret=True)
        ref = _ref_chain(x, layers)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_forward_parity_tile_multiple(self):
        layers = _make(jax.random.PRNGKey(2), [32, 64, 32])
        x = jax.random.normal(jax.random.PRNGKey(3), (1024, 32))
        out = fused_chain(x, layers, interpret=True)
        ref = _ref_chain(x, layers)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_gradients_parity(self):
        layers = _make(jax.random.PRNGKey(4), [16, 32, 32, 8])
        x = jax.random.normal(jax.random.PRNGKey(5), (600, 16))
        target = jax.random.normal(jax.random.PRNGKey(6), (600, 8))

        def loss_fused(x, layers):
            return jnp.mean((fused_chain(x, layers, interpret=True) - target) ** 2)

        def loss_ref(x, layers):
            return jnp.mean((_ref_chain(x, layers) - target) ** 2)

        gx_f, gl_f = jax.grad(loss_fused, argnums=(0, 1))(x, layers)
        gx_r, gl_r = jax.grad(loss_ref, argnums=(0, 1))(x, layers)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(gl_f), jax.tree_util.tree_leaves(gl_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)

    def test_gradients_accumulate_across_tiles(self):
        # > 1 tile: dW must sum over tiles (revisited-block accumulation)
        layers = _make(jax.random.PRNGKey(7), [8, 16, 4])
        x = jax.random.normal(jax.random.PRNGKey(8), (1200, 8))

        def loss_fused(layers):
            return jnp.sum(fused_chain(x, layers, interpret=True) ** 2)

        def loss_ref(layers):
            return jnp.sum(_ref_chain(x, layers) ** 2)

        g_f = jax.grad(loss_fused)(layers)
        g_r = jax.grad(loss_ref)(layers)
        for a, b in zip(jax.tree_util.tree_leaves(g_f), jax.tree_util.tree_leaves(g_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3)

    def test_single_layer(self):
        layers = _make(jax.random.PRNGKey(9), [8, 4])
        x = jax.random.normal(jax.random.PRNGKey(10), (64, 8))
        out = fused_chain(x, layers, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_chain(x, layers)),
                                   atol=1e-5)


class TestFusedNerfMLPDef:
    def test_matches_nerf_mlp_def(self):
        from nerf_experiments_tpu.encodings.fourier import Barf
        from nerf_experiments_tpu.models import nerf_mlp
        from nerf_experiments_tpu.systems.barf import FusedNerfMLPDef, NerfMLPDef

        cfg = nerf_mlp.NerfMLPConfig(
            position_encoder=Barf(levels=4, scale=1.0, include_identity=True),
            direction_encoder=Barf(levels=2, scale=1.0, include_identity=True),
            n_hidden=2, hidden_dim=32, n_segments=2,
        )
        ref_def = NerfMLPDef(cfg)
        fused_def = FusedNerfMLPDef(cfg, interpret=True)
        params = ref_def.init(jax.random.PRNGKey(0))
        B = 96
        pos = jax.random.normal(jax.random.PRNGKey(1), (B, 3)) * 0.3
        dirs = jax.random.normal(jax.random.PRNGKey(2), (B, 3))
        args = (pos, dirs, jnp.full((B, 1), 0.01), jnp.full((B, 1), 3.0),
                jnp.full((B, 1), 3.1), jnp.asarray(4.0), jnp.asarray(2.0))
        d_ref, rgb_ref = ref_def.apply(params, *args)
        d_fused, rgb_fused = fused_def.apply(params, *args)
        np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_ref), atol=1e-4)
        np.testing.assert_allclose(np.asarray(rgb_fused), np.asarray(rgb_ref), atol=1e-4)

    def test_gradients_match(self):
        from nerf_experiments_tpu.encodings.fourier import Barf
        from nerf_experiments_tpu.models import nerf_mlp
        from nerf_experiments_tpu.systems.barf import FusedNerfMLPDef, NerfMLPDef

        cfg = nerf_mlp.NerfMLPConfig(
            position_encoder=Barf(levels=2, scale=1.0, include_identity=True),
            direction_encoder=Barf(levels=2, scale=1.0, include_identity=True),
            n_hidden=1, hidden_dim=16, n_segments=2,
        )
        ref_def = NerfMLPDef(cfg)
        fused_def = FusedNerfMLPDef(cfg, interpret=True)
        params = ref_def.init(jax.random.PRNGKey(0))
        B = 64
        pos = jax.random.normal(jax.random.PRNGKey(1), (B, 3)) * 0.3
        dirs = jax.random.normal(jax.random.PRNGKey(2), (B, 3))
        args = (dirs, jnp.full((B, 1), 0.01), jnp.full((B, 1), 3.0),
                jnp.full((B, 1), 3.1), jnp.asarray(2.0), jnp.asarray(2.0))

        def loss(model_def, params, pos):
            d, rgb = model_def.apply(params, pos, *args)
            return jnp.sum(rgb) + jnp.sum(d)

        gp_r, gx_r = jax.grad(lambda p, x: loss(ref_def, p, x), argnums=(0, 1))(params, pos)
        gp_f, gx_f = jax.grad(lambda p, x: loss(fused_def, p, x), argnums=(0, 1))(params, pos)
        np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(gp_f), jax.tree_util.tree_leaves(gp_r)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
