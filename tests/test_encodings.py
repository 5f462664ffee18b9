import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.encodings import fourier as F
from nerf_experiments_tpu.encodings import activations as A


class TestFourier:
    def test_identity(self):
        enc = F.Identity(space_dimensions=3)
        x = jnp.ones((4, 3))
        assert enc.output_dim == 3
        np.testing.assert_allclose(np.asarray(enc(x)), np.asarray(x))

    def test_fourier_ordering_and_values(self):
        # channel-major ordering: [cos(x·s·1), cos(x·s·2), cos(y·s·1), ...]
        enc = F.Fourier(levels=2, scale=1.0, space_dimensions=2)
        x = jnp.array([[0.3, 0.7]])
        out = np.asarray(enc(x))
        expected = np.array(
            [
                np.cos(0.3), np.cos(0.6), np.cos(0.7), np.cos(1.4),
                np.sin(0.3), np.sin(0.6), np.sin(0.7), np.sin(1.4),
            ]
        )
        np.testing.assert_allclose(out[0], expected, atol=1e-6)
        assert enc.output_dim == 8

    def test_barf_mask_values(self):
        # alpha = 1.5: level 0 on, level 1 at (1-cos(0.5π))/2 = 0.5, rest off
        mask = np.asarray(F._barf_mask(4, 1, jnp.asarray(1.5), jnp.float32))
        np.testing.assert_allclose(mask, [1.0, 0.5, 0.0, 0.0], atol=1e-6)

    def test_barf_alpha_zero_only_identity(self):
        enc = F.Barf(levels=4, scale=1.0, include_identity=True, space_dimensions=3)
        x = jnp.ones((2, 3)) * 0.4
        out = np.asarray(enc(x, alpha=jnp.asarray(0.0)))
        np.testing.assert_allclose(out[:, :3], 0.4, atol=1e-6)
        np.testing.assert_allclose(out[:, 3:], 0.0, atol=1e-6)

    def test_barf_alpha_full_matches_fourier(self):
        enc_b = F.Barf(levels=4, scale=1.0, include_identity=False, space_dimensions=3)
        enc_f = F.Fourier(levels=4, scale=1.0, space_dimensions=3)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 3))
        np.testing.assert_allclose(
            np.asarray(enc_b(x, alpha=jnp.asarray(4.0))), np.asarray(enc_f(x)), atol=1e-6
        )

    def test_alpha_schedule(self):
        enc = F.Barf(levels=10, alpha_start=0.0, alpha_increase_start_epoch=2.0,
                     alpha_increase_end_epoch=12.0)
        assert float(enc.alpha_at(0.0)) == 0.0
        assert abs(float(enc.alpha_at(7.0)) - 5.0) < 1e-5
        assert float(enc.alpha_at(20.0)) == 10.0

    def test_ipe_limit_matches_barf_pe(self):
        # The reference's own self-test (`positional_encodings.py:286-309`):
        # as t_end - t_start -> 0 and pixel_width -> 0, IntegratedBarf ≈ Barf.
        key = jax.random.PRNGKey(1)
        pos = jax.random.normal(key, (500, 3)) * 3
        dir = jax.random.normal(jax.random.PRNGKey(2), (500, 3))
        dir = dir / jnp.linalg.norm(dir, axis=1, keepdims=True)
        t_start = jax.random.uniform(jax.random.PRNGKey(3), (500, 1)) * 4
        t_end = t_start + 1e-5
        pw = jnp.full((500, 1), 1e-5)
        alpha = jnp.asarray(0.1)

        pe = F.Barf(levels=10, scale=1.0, include_identity=True)
        ipe = F.IntegratedBarf(levels=10, scale=1.0, include_identity=True,
                               distribute_variance=False)
        out_pe = pe(pos, dir, pw, t_start, t_end, alpha=alpha)
        # Barf ignores t; evaluate at the IPE's shifted mean position for parity
        out_ipe = ipe(pos, dir, pw, t_start, t_end, alpha=alpha)
        diff = float(jnp.max(jnp.abs(out_pe - out_ipe)))
        assert diff < 1e-3

    def test_ipe_attenuates_high_frequencies(self):
        ipe = F.Integrated(levels=8, scale=1.0, include_identity=False)
        pos = jnp.array([[0.1, 0.2, 0.3]])
        dir = jnp.array([[0.0, 0.0, -1.0]])
        t_start = jnp.array([[3.0]])
        t_end = jnp.array([[4.0]])  # wide frustum -> strong attenuation
        pw = jnp.array([[0.01]])
        out = np.asarray(ipe(pos, dir, pw, t_start, t_end))
        cos_part = out[0, : 8 * 3].reshape(3, 8)
        # magnitude at the highest level must be much smaller than the lowest
        assert np.abs(cos_part[2, -1]) < np.abs(cos_part[2, 0]) * 0.5

    def test_distribute_variance_mode(self):
        ipe = F.Integrated(levels=4, scale=1.0, include_identity=True, distribute_variance=True)
        pos = jax.random.normal(jax.random.PRNGKey(4), (16, 3))
        dir = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
        out = ipe(pos, dir, jnp.full((16, 1), 0.01), jnp.full((16, 1), 3.0), jnp.full((16, 1), 3.5))
        assert out.shape == (16, ipe.output_dim)
        assert np.isfinite(np.asarray(out)).all()


class TestActivations:
    def test_gauss_forward(self):
        x = jnp.linspace(-2, 2, 5).reshape(1, 5)
        v = jnp.ones(5) * 2.0
        out = np.asarray(A.gauss_act(x, v))
        np.testing.assert_allclose(out, np.exp(-np.asarray(x) ** 2 * 2.0), atol=1e-6)

    def test_gauss_custom_vjp_matches_autodiff(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 16))
        v = jax.random.uniform(jax.random.PRNGKey(1), (16,)) + 0.1

        def f_custom(x, v):
            return jnp.sum(jnp.sin(A.gauss_act(x, v)))

        def f_plain(x, v):
            return jnp.sum(jnp.sin(jnp.exp(-(x**2) * v)))

        gx_c, gv_c = jax.grad(f_custom, argnums=(0, 1))(x, v)
        gx_p, gv_p = jax.grad(f_plain, argnums=(0, 1))(x, v)
        np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_p), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gv_c), np.asarray(gv_p), atol=1e-5)

    def test_gabor_custom_vjp_matches_autodiff(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (8, 16))
        v = jax.random.uniform(jax.random.PRNGKey(3), (16,)) + 0.1
        s = jax.random.uniform(jax.random.PRNGKey(4), (16,)) * 3

        def f_custom(x, v, s):
            return jnp.sum(A.gabor_act(x, v, s) ** 2)

        def f_plain(x, v, s):
            return jnp.sum((jnp.exp(-v * x**2) * jnp.cos(s * x)) ** 2)

        gs_c = jax.grad(f_custom, argnums=(0, 1, 2))(x, v, s)
        gs_p = jax.grad(f_plain, argnums=(0, 1, 2))(x, v, s)
        for c, p in zip(gs_c, gs_p):
            np.testing.assert_allclose(np.asarray(c), np.asarray(p), atol=1e-5)

    def test_sarf_finite_at_zero(self):
        f = jnp.ones(4) * 2.0
        out = A.sarf_act(jnp.zeros((1, 4)), f)
        assert np.isfinite(np.asarray(out)).all()
        out2 = A.sarf_sinc_act(jnp.zeros((1, 4)), f)
        assert np.isfinite(np.asarray(out2)).all()

    def test_siren_init_and_apply(self):
        params = A.siren_init(jax.random.PRNGKey(0), 3, 64, omega=30.0, first_layer=True)
        assert params["w"].shape == (3, 64)
        w = np.asarray(params["w"])
        assert np.abs(w).max() <= 1.0 / 3 + 1e-6
        out = A.siren_apply(params, jnp.ones((5, 3)), omega=30.0)
        assert out.shape == (5, 64)
        assert (np.abs(np.asarray(out)) <= 1.0).all()


@pytest.mark.slow
def test_hashgrid_encode_matmul_parity():
    """encode_matmul (gather-free factorized one-hot MXU path) == encode,
    forward + table grads + coordinate grads, bijective AND hashed levels."""
    import numpy as np
    from nerf_experiments_tpu.ops import hashgrid

    cfg = hashgrid.HashGridConfig(dim=3, n_levels=6, table_size=2048,
                                  n_features=2, resolution_min=4,
                                  resolution_max=64)
    params = hashgrid.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (257, 3),
                           minval=0.0, maxval=0.999)
    ref = hashgrid.encode(params, cfg, x)
    out = hashgrid.encode_matmul(params, cfg, x, compute_dtype=jnp.float32,
                                 chunk=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)

    def loss(fn):
        return lambda p: jnp.sum(jnp.sin(3 * fn(p, cfg, x)))

    g_ref = jax.grad(loss(hashgrid.encode))(params)["table"]
    g_mm = jax.grad(loss(lambda p, c, xx: hashgrid.encode_matmul(
        p, c, xx, jnp.float32, 128)))(params)["table"]
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_ref),
                               atol=2e-5, rtol=1e-4)
    gx_ref = jax.grad(lambda xx: jnp.sum(
        jnp.cos(hashgrid.encode(params, cfg, xx))))(x)
    gx_mm = jax.grad(lambda xx: jnp.sum(jnp.cos(
        hashgrid.encode_matmul(params, cfg, xx, jnp.float32, 128))))(x)
    np.testing.assert_allclose(np.asarray(gx_mm), np.asarray(gx_ref),
                               atol=2e-4, rtol=1e-3)
