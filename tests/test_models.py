import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.encodings.fourier import Barf, Fourier, Identity
from nerf_experiments_tpu.models import common, garf, ingp, nerf2d, nerf_mlp, siren
from nerf_experiments_tpu.ops import hashgrid


def _mlp_cfg(**kw):
    defaults = dict(
        position_encoder=Barf(levels=4, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=2, scale=1.0, include_identity=True),
        n_hidden=2,
        hidden_dim=64,
        delayed_direction=True,
        delayed_density=False,
        n_segments=2,
    )
    defaults.update(kw)
    return nerf_mlp.NerfMLPConfig(**defaults)


class TestNerfMLP:
    def test_shapes_and_ranges(self):
        cfg = _mlp_cfg()
        params = nerf_mlp.init(jax.random.PRNGKey(0), cfg)
        B = 32
        pos = jax.random.normal(jax.random.PRNGKey(1), (B, 3))
        dir = jax.random.normal(jax.random.PRNGKey(2), (B, 3))
        density, rgb = nerf_mlp.apply(
            params, cfg, pos, dir,
            pixel_width=jnp.full((B, 1), 0.01),
            t_start=jnp.full((B, 1), 3.0), t_end=jnp.full((B, 1), 3.1),
            alpha_pos=jnp.asarray(4.0), alpha_dir=jnp.asarray(2.0),
        )
        assert density.shape == (B,) and rgb.shape == (B, 3)
        assert (np.asarray(density) >= 0).all()
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()

    @pytest.mark.parametrize("delayed_direction,delayed_density,n_segments",
                             [(True, False, 1), (False, False, 2),
                              (True, True, 2), (False, True, 3)])
    def test_all_variants(self, delayed_direction, delayed_density, n_segments):
        cfg = _mlp_cfg(delayed_direction=delayed_direction,
                       delayed_density=delayed_density, n_segments=n_segments)
        params = nerf_mlp.init(jax.random.PRNGKey(0), cfg)
        density, rgb = nerf_mlp.apply(
            params, cfg, jnp.ones((8, 3)), jnp.ones((8, 3)),
            alpha_pos=jnp.asarray(4.0), alpha_dir=jnp.asarray(2.0),
        )
        assert density.shape == (8,) and rgb.shape == (8, 3)
        assert np.isfinite(np.asarray(density)).all()

    @pytest.mark.slow
    def test_differentiable(self):
        cfg = _mlp_cfg()
        params = nerf_mlp.init(jax.random.PRNGKey(0), cfg)

        def loss(p):
            d, rgb = nerf_mlp.apply(p, cfg, jnp.ones((8, 3)) * 0.2, jnp.ones((8, 3)),
                                    alpha_pos=jnp.asarray(4.0), alpha_dir=jnp.asarray(2.0))
            return jnp.sum(rgb) + jnp.sum(d)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
        assert np.isfinite(total) and total > 0


class TestGarf:
    @pytest.mark.slow
    @pytest.mark.parametrize("activation", ["gauss", "gabor", "sarf"])
    def test_radiance_and_proposal(self, activation):
        cfg = garf.GarfConfig(activation=activation, init_min=0.5, init_max=2.0)
        rp = garf.radiance_init(jax.random.PRNGKey(0), cfg)
        pp = garf.proposal_init(jax.random.PRNGKey(1), cfg)
        pos = jax.random.normal(jax.random.PRNGKey(2), (16, 3)) * 0.3
        dir = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
        rgb, density = garf.radiance_apply(rp, cfg, pos, dir)
        sigma = garf.proposal_apply(pp, cfg, pos)
        assert rgb.shape == (16, 3) and density.shape == (16,) and sigma.shape == (16,)
        assert (np.asarray(density) >= 0).all() and (np.asarray(sigma) >= 0).all()

    def test_param_labels_cover_tree(self):
        cfg = garf.GarfConfig()
        rp = garf.radiance_init(jax.random.PRNGKey(0), cfg)
        labels = garf.param_labels(rp, "lin", "act")
        flat_p = jax.tree_util.tree_leaves(rp)
        flat_l = jax.tree_util.tree_leaves(labels)
        assert len(flat_p) == len(flat_l)
        assert set(flat_l) == {"lin", "act"}

    @pytest.mark.slow
    def test_gradients_flow_to_activation_params(self):
        cfg = garf.GarfConfig(init_min=0.5, init_max=2.0)
        rp = garf.radiance_init(jax.random.PRNGKey(0), cfg)

        def loss(p):
            rgb, d = garf.radiance_apply(p, cfg, jnp.ones((4, 3)) * 0.1, jnp.ones((4, 3)))
            return jnp.sum(rgb)

        g = jax.grad(loss)(rp)
        act_grad = float(jnp.abs(g["density1"]["act"][0]["isd"]).sum())
        assert act_grad > 0


class TestSiren:
    def test_forward(self):
        cfg = siren.SirenConfig(input_scale=30.0)
        params = siren.init(jax.random.PRNGKey(0), cfg)
        d, rgb = siren.apply(params, cfg, jnp.ones((8, 3)) * 0.1, jnp.ones((8, 3)))
        assert d.shape == (8,) and rgb.shape == (8, 3)
        assert np.isfinite(np.asarray(rgb)).all()


class TestNerf2d:
    def test_forward(self):
        cfg = nerf2d.Nerf2dConfig(fourier_levels=6, hidden_dim=64)
        params = nerf2d.init(jax.random.PRNGKey(0), cfg)
        rgb = nerf2d.apply(params, cfg, jax.random.uniform(jax.random.PRNGKey(1), (32, 2)))
        assert rgb.shape == (32, 3)
        assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()


class TestHashGrid:
    def test_bijective_matches_hashed_at_low_res(self):
        # `2d-ingp/model.py:22-31`: with a huge table, hashing is injective
        # enough that hashed == bijective indexing result for interpolation.
        x = jax.random.uniform(jax.random.PRNGKey(0), (64, 2)) * 0.95
        cfg_b = hashgrid.HashGridConfig(dim=2, resolution_min=8, resolution_max=8,
                                        table_size=128, n_features=2, n_levels=1)
        assert cfg_b.bijective(8)
        params = hashgrid.init(jax.random.PRNGKey(1), cfg_b)
        out_b = hashgrid.encode(params, cfg_b, x)
        assert out_b.shape == (64, 2)
        assert np.isfinite(np.asarray(out_b)).all()

    def test_interpolation_exact_at_corners(self):
        # At exact grid corners only one corner weight is 1: output = that row.
        cfg = hashgrid.HashGridConfig(dim=2, resolution_min=4, resolution_max=4,
                                      table_size=64, n_features=2, n_levels=1)
        params = hashgrid.init(jax.random.PRNGKey(0), cfg)
        x = jnp.array([[0.25, 0.5]])  # corner (1, 2) at res 4
        out = hashgrid.encode(params, cfg, x)
        idx = 1 * 1 + 2 * 5  # bijective stride (res+1)
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(params["table"][0, idx]), atol=1e-6)

    @pytest.mark.slow
    def test_encode_fused_matches_encode(self):
        # encode_fused (one global gather + sorted segment-sum VJP) must be
        # bit-identical to the per-level reference path, fwd and bwd.
        for dim in (2, 3):
            cfg = hashgrid.HashGridConfig(
                dim=dim, resolution_min=4, resolution_max=64,
                table_size=2**12, n_features=2, n_levels=6)
            params = hashgrid.init(jax.random.PRNGKey(0), cfg)
            x = jax.random.uniform(jax.random.PRNGKey(1), (257, dim))
            a = hashgrid.encode(params, cfg, x)
            b = hashgrid.encode_fused(params, cfg, x)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

            def loss(enc, p, xx):
                return (enc(p, cfg, xx) ** 2).sum()

            ga, gxa = jax.grad(loss, argnums=(1, 2))(hashgrid.encode, params, x)
            gb, gxb = jax.grad(loss, argnums=(1, 2))(hashgrid.encode_fused, params, x)
            np.testing.assert_allclose(np.asarray(ga["table"]),
                                       np.asarray(gb["table"]), atol=1e-6)
            np.testing.assert_allclose(np.asarray(gxa), np.asarray(gxb),
                                       atol=1e-5)

    def test_interpolation_is_multilinear(self):
        # Numpy cross-check of the corner-weight formula
        # (`2d-ingp/test_interpolation.py` parity).
        cfg = hashgrid.HashGridConfig(dim=2, resolution_min=4, resolution_max=4,
                                      table_size=64, n_features=1, n_levels=1)
        params = hashgrid.init(jax.random.PRNGKey(3), cfg)
        table = np.asarray(params["table"][0])
        x = np.array([[0.3, 0.6]])
        xs = x * 4
        f = np.floor(xs).astype(int)
        out_expected = 0.0
        for di in (0, 1):
            for dj in (0, 1):
                cx, cy = f[0, 0] + di, f[0, 1] + dj
                w = (1 - abs(xs[0, 0] - cx)) * (1 - abs(xs[0, 1] - cy))
                out_expected += table[cx * 1 + cy * 5, 0] * w
        out = float(hashgrid.encode(params, cfg, jnp.asarray(x))[0, 0])
        np.testing.assert_allclose(out, out_expected, atol=1e-6)

    def test_3d_grid_and_gradients(self):
        cfg = hashgrid.HashGridConfig(dim=3, resolution_min=4, resolution_max=16,
                                      table_size=512, n_features=2, n_levels=4)
        params = hashgrid.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3)) * 0.9

        def loss(p):
            return jnp.sum(hashgrid.encode(p, cfg, x) ** 2)

        g = jax.grad(loss)(params)
        assert float(jnp.abs(g["table"]).sum()) > 0

    def test_level_resolutions_geometric(self):
        cfg = hashgrid.HashGridConfig(dim=2, resolution_min=16, resolution_max=256,
                                      table_size=2**14, n_features=2, n_levels=5)
        res = cfg.level_resolutions
        assert res[0] == 16 and res[-1] == 256
        assert all(res[i] < res[i + 1] for i in range(4))


class TestIngpModels:
    def test_gigapixel(self):
        grid = hashgrid.HashGridConfig(dim=2, resolution_min=4, resolution_max=32,
                                       table_size=256, n_features=2, n_levels=4)
        cfg = ingp.GigapixelConfig(grid=grid, n_hidden=1, hidden_dim=32)
        params = ingp.gigapixel_init(jax.random.PRNGKey(0), cfg)
        rgb = ingp.gigapixel_apply(params, cfg, jax.random.uniform(jax.random.PRNGKey(1), (16, 2)))
        assert rgb.shape == (16, 3)

    def test_nerf_ingp(self):
        grid = hashgrid.HashGridConfig(dim=3, resolution_min=4, resolution_max=32,
                                       table_size=512, n_features=2, n_levels=4)
        cfg = ingp.NerfINGPConfig(grid=grid, n_hidden=1, hidden_dim=32)
        params = ingp.nerf_ingp_init(jax.random.PRNGKey(0), cfg)
        pos = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        dir = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
        density, rgb = ingp.nerf_ingp_apply(params, cfg, pos, dir)
        assert density.shape == (16,) and rgb.shape == (16, 3)

    @pytest.mark.slow
    def test_encoder_knob_matmul_matches_fused(self):
        # the encoder="matmul" config switch must be numerically equivalent
        # to the gather path at the model level (fp32, fwd + table grads)
        grid = hashgrid.HashGridConfig(dim=3, resolution_min=4, resolution_max=32,
                                       table_size=512, n_features=2, n_levels=4)
        pos = jax.random.normal(jax.random.PRNGKey(1), (33, 3))
        dir = jax.random.normal(jax.random.PRNGKey(2), (33, 3))
        cfgs = [ingp.NerfINGPConfig(grid=grid, n_hidden=1, hidden_dim=32,
                                    encoder=e) for e in ("fused", "matmul")]
        params = ingp.nerf_ingp_init(jax.random.PRNGKey(0), cfgs[0])

        outs, grads = [], []
        for cfg in cfgs:
            def loss(p, cfg=cfg):
                d, rgb = ingp.nerf_ingp_apply(p, cfg, pos, dir)
                return jnp.sum(d) + jnp.sum(rgb ** 2)
            outs.append(ingp.nerf_ingp_apply(params, cfg, pos, dir))
            grads.append(jax.grad(loss)(params)["grid"]["table"])
        np.testing.assert_allclose(np.asarray(outs[1][1]), np.asarray(outs[0][1]),
                                   atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(grads[1]), np.asarray(grads[0]),
                                   atol=1e-4, rtol=1e-4)


class TestHashGridNumpyParity:
    def test_hashed_mode_matches_numpy_reference(self):
        """SURVEY §4 invariant (g): the hashed-mode gather+interp agrees with
        a direct numpy implementation of xor-hash + multilinear weights."""
        cfg = hashgrid.HashGridConfig(dim=2, resolution_min=16, resolution_max=16,
                                      table_size=64,  # forces hashing (< 17^2)
                                      n_features=2, n_levels=1)
        assert not cfg.bijective(16)
        params = hashgrid.init(jax.random.PRNGKey(0), cfg)
        table = np.asarray(params["table"][0])
        x = np.asarray(jax.random.uniform(jax.random.PRNGKey(1), (32, 2)) * 0.95)

        out = np.asarray(hashgrid.encode(params, cfg, jnp.asarray(x)))

        xs = x * 16
        f = np.floor(xs).astype(np.int64)
        expected = np.zeros((32, 2))
        pi1, pi2 = cfg.primes[0], cfg.primes[1]
        for di in (0, 1):
            for dj in (0, 1):
                cx, cy = f[:, 0] + di, f[:, 1] + dj
                idx = (np.uint32(pi1) * cx.astype(np.uint32)) ^ (
                    np.uint32(pi2) * cy.astype(np.uint32)
                )
                idx = (idx % np.uint32(64)).astype(np.int64)
                w = (1 - np.abs(xs[:, 0] - cx)) * (1 - np.abs(xs[:, 1] - cy))
                expected += table[idx] * w[:, None]
        np.testing.assert_allclose(out, expected, atol=1e-6)


class TestEncodeRolled:
    """encode_rolled: additive-hash, one wide-row gather per point per level
    (hashgrid.py design note). Bijective levels must be BIT-identical to
    `encode` (additive strided indexing == the reference bijective formula,
    `2d-ingp/model.py:22-31`); hashed levels are pinned against a naive
    per-corner additive-hash implementation, fwd + grads."""

    def _naive_additive(self, params, cfg, x):
        """Per-corner additive-hash encode (plain indexing, autodiffable) —
        the semantics oracle for encode_rolled."""
        outs = []
        for l, res in enumerate(cfg.level_resolutions):
            xs = x * res
            xf = jnp.floor(xs)
            base, deltas = hashgrid._rolled_level_base_and_deltas(
                cfg, res, xf.astype(jnp.int32))
            t_eff = hashgrid._effective_rows(cfg, res)
            offsets = hashgrid._corner_offsets(cfg.dim)
            corners = xf[:, None, :] + offsets[None, :, :].astype(x.dtype)
            w = jnp.prod(1.0 - jnp.abs(xs[:, None, :] - corners), axis=-1)
            feats = []
            for c, d in enumerate(deltas):
                idx = (base + d) % t_eff
                feats.append(params["table"][l][idx] * w[:, c, None])
            outs.append(sum(feats))
        return jnp.concatenate(outs, axis=-1)

    def test_bijective_levels_bit_identical_to_encode(self):
        for dim in (2, 3):
            cfg = hashgrid.HashGridConfig(
                dim=dim, resolution_min=2, resolution_max=6,
                table_size=512, n_features=2, n_levels=3)
            assert all(cfg.bijective(r) for r in cfg.level_resolutions)
            params = hashgrid.init(jax.random.PRNGKey(0), cfg)
            x = jax.random.uniform(jax.random.PRNGKey(1), (129, dim)) * 0.999
            a = hashgrid.encode(params, cfg, x)
            b = hashgrid.encode_rolled(params, cfg, x, compute_dtype=None)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)

    def test_hashed_levels_match_naive_additive_fwd_and_grad(self):
        for dim in (2, 3):
            cfg = hashgrid.HashGridConfig(
                dim=dim, resolution_min=8, resolution_max=64,
                table_size=2**7, n_features=2, n_levels=4)
            assert not all(cfg.bijective(r) for r in cfg.level_resolutions)
            params = hashgrid.init(jax.random.PRNGKey(2), cfg)
            x = jax.random.uniform(jax.random.PRNGKey(3), (257, dim)) * 0.999
            a = self._naive_additive(params, cfg, x)
            b = hashgrid.encode_rolled(params, cfg, x, compute_dtype=None)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

            ga = jax.grad(lambda p: jnp.sum(
                self._naive_additive(p, cfg, x) ** 2))(params)
            gb = jax.grad(lambda p: jnp.sum(
                hashgrid.encode_rolled(p, cfg, x, compute_dtype=None) ** 2)
            )(params)
            np.testing.assert_allclose(np.asarray(ga["table"]),
                                       np.asarray(gb["table"]), atol=1e-5)

    def test_position_gradients_flow(self):
        cfg = hashgrid.HashGridConfig(dim=3, resolution_min=4,
                                      resolution_max=16, table_size=2**6,
                                      n_features=2, n_levels=2)
        params = hashgrid.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3)) * 0.9
        gx = jax.grad(lambda xx: jnp.sum(
            hashgrid.encode_rolled(params, cfg, xx, compute_dtype=None) ** 2)
        )(x)
        gx_ref = jax.grad(lambda xx: jnp.sum(
            self._naive_additive(params, cfg, xx) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                                   atol=1e-5)

    def test_rejects_non_power_of_two_table(self):
        cfg = hashgrid.HashGridConfig(dim=2, resolution_min=16,
                                      resolution_max=16, table_size=100,
                                      n_features=2, n_levels=1)
        params = hashgrid.init(jax.random.PRNGKey(0), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(1), (8, 2))
        with pytest.raises(ValueError, match="power-of-two"):
            hashgrid.encode_rolled(params, cfg, x)

    def test_model_level_encoder_knob(self):
        grid = hashgrid.HashGridConfig(dim=3, resolution_min=4,
                                       resolution_max=32, table_size=512,
                                       n_features=2, n_levels=4)
        cfg = ingp.NerfINGPConfig(grid=grid, n_hidden=1, hidden_dim=32,
                                  encoder="rolled")
        params = ingp.nerf_ingp_init(jax.random.PRNGKey(0), cfg)
        pos = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
        dir = jax.random.normal(jax.random.PRNGKey(2), (16, 3))
        density, rgb = ingp.nerf_ingp_apply(params, cfg, pos, dir)
        assert density.shape == (16,) and rgb.shape == (16, 3)
        assert np.isfinite(np.asarray(density)).all()
