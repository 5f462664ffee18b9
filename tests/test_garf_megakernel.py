"""Parity: the GARF radiance mega-kernel vs jax.grad through the XLA path
(fp32, interpret mode), and the fused train step vs the autodiff train step."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.models import garf
from nerf_experiments_tpu.ops import render, sampling
from nerf_experiments_tpu.ops.garf_megakernel import garf_radiance_train_grads
from nerf_experiments_tpu.systems import garf_system


def _setup(n_rays=5, S=8, seed=0, activation="gauss"):
    cfg = garf.GarfConfig(init_min=0.5, init_max=2.0, activation=activation)
    params = garf.radiance_init(jax.random.PRNGKey(seed), cfg)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    dirs = jax.random.normal(ks[0], (n_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origs = jax.random.normal(ks[1], (n_rays, 3)) * 0.3
    targets = jax.random.uniform(ks[2], (n_rays, 3))
    t_start, t_end = sampling.sample_stratified(
        None, n_rays, S, 2.0, 6.0, "equidistant", 0.0)
    return cfg, params, origs, dirs, targets, t_start, t_end


def _ref_loss(params, cfg, origs, dirs, t_start, t_end, targets, anneal=1.0):
    t_q = (t_start + t_end)[..., None] / 2.0
    pos = (origs[:, None] + dirs[:, None] * t_q).reshape(-1, 3)
    S = t_start.shape[1]
    dirs_rep = jnp.broadcast_to(
        dirs[:, None, :], (dirs.shape[0], S, 3)).reshape(-1, 3)
    rgb_s, dens_s = garf.radiance_apply(params, cfg, pos, dirs_rep, anneal)
    rgb, op, depth, extras = render.render_full(
        dens_s.reshape(t_start.shape), rgb_s.reshape(t_start.shape + (3,)),
        t_start, t_end)
    return jnp.mean((rgb - targets) ** 2), (rgb, extras["weights"])


import pytest

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("activation,anneal", [
    ("gauss", 1.0), ("gabor", 1.0), ("sarf", 1.0),
    ("gabor", 0.37), ("sarf", 0.37),  # activation coarse-to-fine annealing
])
def test_garf_kernel_grads_match_xla(activation, anneal):
    cfg, params, origs, dirs, targets, t_start, t_end = _setup(
        activation=activation)

    (loss_ref, (rgb_ref, w_ref)), grads_ref = jax.value_and_grad(
        lambda p, o, d: _ref_loss(p, cfg, o, d, t_start, t_end, targets,
                                  anneal),
        argnums=(0, 1, 2), has_aux=True,
    )(params, origs, dirs)
    gp_ref, go_ref, gd_ref = grads_ref

    rgb, weights, grads, d_origs, d_dirs = garf_radiance_train_grads(
        params, cfg, origs, dirs, t_start, t_end, targets,
        tile_rays=4, interpret=True, act_anneal=anneal)

    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(weights, w_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d_origs, go_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(d_dirs, gd_ref, rtol=1e-4, atol=1e-6)
    flat_k = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_r = dict(jax.tree_util.tree_flatten_with_path(gp_ref)[0])
    assert len(flat_k) == len(flat_r)
    for path, leaf in flat_k:
        np.testing.assert_allclose(
            leaf, flat_r[path], rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_act_anneal_zero_reduces_to_gauss():
    """gamma=0: gabor == gauss with the same isd (cos(0)=1), and sarf's
    oscillation flattens to the pure exp(-x'^2) bump."""
    from nerf_experiments_tpu.encodings.activations import (
        gabor_from_isd, gauss_from_isd, sarf_act)

    x = jnp.linspace(-3.0, 3.0, 64).reshape(8, 8)
    isd = jnp.linspace(0.3, 2.0, 8)
    spread = jnp.linspace(0.5, 6.0, 8)
    np.testing.assert_allclose(
        gabor_from_isd(x, isd, spread, anneal=0.0),
        gauss_from_isd(x, isd), rtol=1e-6)
    freq = jnp.linspace(0.5, 3.0, 8)
    xs = jnp.abs(x) + 1e-4
    np.testing.assert_allclose(
        sarf_act(x, freq, anneal=0.0), jnp.exp(-(xs ** 2)), rtol=1e-6)


def test_act_anneal_schedule():
    cfg = garf_system.GarfSystemConfig(
        act_anneal_start_step=100, act_anneal_end_step=300)
    assert float(cfg.act_anneal_at(0)) == 0.0
    assert float(cfg.act_anneal_at(200)) == pytest.approx(0.5)
    assert float(cfg.act_anneal_at(1000)) == 1.0
    off = garf_system.GarfSystemConfig()
    assert float(off.act_anneal_at(0)) == 1.0


def test_garf_kernel_padding_rays_do_not_contaminate():
    cfg, params, origs, dirs, targets, t_start, t_end = _setup(n_rays=5)
    _, _, g5, _, _ = garf_radiance_train_grads(
        params, cfg, origs, dirs, t_start, t_end, targets,
        tile_rays=2, interpret=True)  # pad 5 -> 6
    _, _, g5b, _, _ = garf_radiance_train_grads(
        params, cfg, origs, dirs, t_start, t_end, targets,
        tile_rays=5, interpret=True)  # no padding
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g5)[0],
        jax.tree_util.tree_flatten_with_path(g5b)[0],
    ):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7,
                                   err_msg=jax.tree_util.keystr(p))


def test_fused_step_matches_autodiff_step():
    """Full step parity: train_step_fused (kernel) vs train_step (autodiff),
    same batch/key — updated params and metrics must match."""
    n_rays, n_imgs = 6, 3
    sys_cfg = garf_system.GarfSystemConfig(
        n_train_images=n_imgs, near=2.0, far=6.0,
        proposal_samples_per_ray=4, radiance_samples_per_ray=8,
        net=garf.GarfConfig(init_min=0.5, init_max=2.0),
    )
    state = garf_system.init(jax.random.PRNGKey(0), sys_cfg)
    tx = garf_system.make_optimizer(sys_cfg, state.params)

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    dirs = jax.random.normal(ks[0], (n_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origs = jax.random.normal(ks[1], (n_rays, 3)) * 0.2
    batch = {
        "img_idx": jax.random.randint(ks[2], (n_rays,), 0, n_imgs),
        "origs_noisy": origs,
        "dirs_noisy": dirs,
        "colors": jax.random.uniform(ks[3], (n_rays, 1, 3)),
    }
    key = jax.random.PRNGKey(3)

    s_ref, m_ref = garf_system.train_step(state, sys_cfg, tx, batch, key)
    s_fus, m_fus = garf_system.train_step_fused(state, sys_cfg, tx, batch, key)

    for k in ("loss", "radiance_loss", "proposal_loss", "psnr"):
        np.testing.assert_allclose(
            m_fus[k], m_ref[k], rtol=1e-5, atol=1e-7, err_msg=k)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_fus.params)[0],
        jax.tree_util.tree_flatten_with_path(s_ref.params)[0],
    ):
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=1e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(p)}")


@pytest.mark.parametrize("activation,anneal", [
    ("gauss", 1.0), ("gabor", 0.37), ("sarf", 0.37),
])
def test_render_kernel_matches_xla_forward(activation, anneal):
    """garf_radiance_render (forward-only mega-kernel) vs the XLA eval path
    on identical t bins: rgb / opacity / depth parity."""
    from nerf_experiments_tpu.ops.garf_megakernel import garf_radiance_render

    cfg, params, origs, dirs, _, t_start, t_end = _setup(
        activation=activation)
    t_q = (t_start + t_end)[..., None] / 2.0
    pos = (origs[:, None] + dirs[:, None] * t_q).reshape(-1, 3)
    S = t_start.shape[1]
    dirs_rep = jnp.broadcast_to(
        dirs[:, None, :], (dirs.shape[0], S, 3)).reshape(-1, 3)
    rgb_s, dens_s = garf.radiance_apply(params, cfg, pos, dirs_rep, anneal)
    rgb_ref, op_ref, depth_ref, _ = render.render_full(
        dens_s.reshape(t_start.shape), rgb_s.reshape(t_start.shape + (3,)),
        t_start, t_end)

    rgb, op, depth = garf_radiance_render(
        params, cfg, origs, dirs, t_start, t_end, act_anneal=anneal,
        tile_rays=2, interpret=True)
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(op, op_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(depth, depth_ref, rtol=1e-5, atol=1e-6)


def test_render_kernel_ray_padding():
    """n_rays not divisible by the tile: padded rays must not leak."""
    from nerf_experiments_tpu.ops.garf_megakernel import garf_radiance_render

    cfg, params, origs, dirs, _, t_start, t_end = _setup(n_rays=5)
    rgb_pad, _, _ = garf_radiance_render(
        params, cfg, origs, dirs, t_start, t_end, tile_rays=2,
        interpret=True)
    rgb_one, _, _ = garf_radiance_render(
        params, cfg, origs, dirs, t_start, t_end, tile_rays=5,
        interpret=True)
    assert rgb_pad.shape == (5, 3)
    np.testing.assert_allclose(rgb_pad, rgb_one, rtol=1e-5, atol=1e-6)


def test_system_forward_fused_dispatch_matches():
    """garf_system.forward(fused=True) == forward(fused=False) on the
    deterministic eval path (same proposal bins, no key)."""
    cfg = garf_system.GarfSystemConfig(
        n_train_images=4, near=2.0, far=6.0,
        proposal_samples_per_ray=8, radiance_samples_per_ray=8,
    )
    state = garf_system.init(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    n = 5
    dirs = jax.random.normal(ks[0], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origs = jax.random.normal(ks[1], (n, 3)) * 0.3

    rgb_ref, op_ref, depth_ref, _ = garf_system.forward(
        state.params, cfg, None, origs, dirs, stratified=False)
    rgb, op, depth, extras = garf_system.forward(
        state.params, cfg, None, origs, dirs, stratified=False, fused=True)
    assert "proposal_aux" in extras
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(op, op_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(depth, depth_ref, rtol=1e-5, atol=1e-6)


def test_garf_coarse_block_duplicate_rays_match_rep_step():
    """GarfSystemConfig.train_coarse_block: a blocked step on a batch of
    duplicate-ray blocks must EXACTLY match the unblocked step on just the
    representative rays — same estimator key/jitter (n_rep rays either way),
    radiance/camera grads mean-normalize identically over duplicates, and
    the block-mean interlevel weights reduce to the rep weights."""
    import dataclasses

    n_rep, blk, n_imgs = 4, 4, 3
    cfg1 = garf_system.GarfSystemConfig(
        n_train_images=n_imgs, near=2.0, far=6.0,
        proposal_samples_per_ray=4, radiance_samples_per_ray=8,
        net=garf.GarfConfig(init_min=0.5, init_max=2.0),
    )
    cfgB = dataclasses.replace(cfg1, train_coarse_block=blk)
    state = garf_system.init(jax.random.PRNGKey(0), cfg1)
    tx = garf_system.make_optimizer(cfg1, state.params)

    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    dirs = jax.random.normal(ks[0], (n_rep, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origs = jax.random.normal(ks[1], (n_rep, 3)) * 0.2
    rep_batch = {
        "img_idx": jax.random.randint(ks[2], (n_rep,), 0, n_imgs),
        "origs_noisy": origs,
        "dirs_noisy": dirs,
        "colors": jax.random.uniform(ks[3], (n_rep, 1, 3)),
    }
    dup_batch = {k: jnp.repeat(v, blk, axis=0) for k, v in rep_batch.items()}
    key = jax.random.PRNGKey(3)

    s_rep, m_rep = garf_system.train_step_fused(state, cfg1, tx, rep_batch, key)
    s_blk, m_blk = garf_system.train_step_fused(state, cfgB, tx, dup_batch, key)

    for k in ("loss", "radiance_loss", "proposal_loss"):
        np.testing.assert_allclose(
            m_blk[k], m_rep[k], rtol=1e-5, atol=1e-7, err_msg=k)
    for (p, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(s_blk.params)[0],
        jax.tree_util.tree_flatten_with_path(s_rep.params)[0],
    ):
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=1e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(p)}")
