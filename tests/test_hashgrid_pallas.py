"""Pallas lowering of the hash-grid matmul table access (NETPU_PALLAS_HASH)
must be numerically identical to the XLA matmul path and to the plain
gather `encode` — forward, table grads, and coordinate grads, across
bijective AND hashed levels. Runs in interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.ops import hashgrid

pytestmark = pytest.mark.slow


@pytest.fixture()
def pallas_hash_env(monkeypatch):
    monkeypatch.setenv("NETPU_PALLAS_HASH", "1")


def _cfg():
    return hashgrid.HashGridConfig(dim=3, n_levels=6, table_size=2048,
                                   n_features=2, resolution_min=4,
                                   resolution_max=64)


def test_pallas_hash_matches_encode(pallas_hash_env):
    cfg = _cfg()
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
    g_pl = jax.grad(loss(lambda p, c, xx: hashgrid.encode_matmul(
        p, c, xx, jnp.float32, 128)))(params)["table"]
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               atol=2e-5, rtol=1e-4)
    gx_ref = jax.grad(lambda xx: jnp.sum(
        jnp.cos(hashgrid.encode(params, cfg, xx))))(x)
    gx_pl = jax.grad(lambda xx: jnp.sum(jnp.cos(
        hashgrid.encode_matmul(params, cfg, xx, jnp.float32, 128))))(x)
    np.testing.assert_allclose(np.asarray(gx_pl), np.asarray(gx_ref),
                               atol=2e-4, rtol=1e-3)


def test_pallas_level_fns_match_xla_level_fns(pallas_hash_env):
    """Direct parity of the level primitives vs the XLA lax.scan versions,
    including row padding (R not a multiple of the tile)."""
    from nerf_experiments_tpu.ops import hashgrid_pallas

    t_eff, n_hi, n_lo, F = 600, 8, 128, 2
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    table_l = jax.random.normal(k1, (1024, F))
    idx = jax.random.randint(k2, (1000,), 0, t_eff)
    feats_pl = hashgrid_pallas.level_matmul_fwd_pallas(
        table_l, idx, t_eff, n_hi, n_lo, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(feats_pl),
                               np.asarray(table_l[idx]),
                               atol=1e-6, rtol=1e-6)

    contrib = jax.random.normal(k3, (1000, F))
    dt_pl = hashgrid_pallas.level_matmul_dtable_pallas(
        idx, contrib, t_eff, 1024, n_hi, n_lo, compute_dtype=jnp.float32)
    dt_ref = jnp.zeros((1024, F)).at[idx].add(contrib)
    np.testing.assert_allclose(np.asarray(dt_pl), np.asarray(dt_ref),
                               atol=1e-5, rtol=1e-5)


def test_pallas_level_fns_f8(pallas_hash_env):
    """F=8 exercises the wide n_lo*F=1024 single-matmul shape with the
    VMEM-budgeted (256-row) tile — the config where row tiles shrink to
    fit the fp32 M1 intermediate (width-tiling was measured a dead end
    on this Mosaic version; see ops/hashgrid_pallas._fwd_kernel)."""
    from nerf_experiments_tpu.ops import hashgrid_pallas

    t_eff, n_hi, n_lo, F = 8192, 64, 128, 8
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    table_l = jax.random.normal(k1, (t_eff, F))
    idx = jax.random.randint(k2, (3000,), 0, t_eff)
    feats = hashgrid_pallas.level_matmul_fwd_pallas(
        table_l, idx, t_eff, n_hi, n_lo, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(table_l[idx]),
                               atol=1e-6, rtol=1e-6)
