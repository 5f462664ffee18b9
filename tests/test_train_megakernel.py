"""Parity: the fused training mega-kernel's gradients vs jax.grad through the
XLA path, on identical t bins / targets (fp32, interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.encodings.fourier import Barf
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.ops import render, sampling
from nerf_experiments_tpu.ops.train_megakernel import flagship_train_grads
from nerf_experiments_tpu.systems.barf import NerfMLPDef, _eval_model

pytestmark = pytest.mark.slow


def _cfg(n_hidden=2, hidden_dim=32, lv_pos=4, lv_dir=2):
    return nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=lv_pos, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=lv_dir, scale=1.0, include_identity=True),
        n_hidden=n_hidden, hidden_dim=hidden_dim,
        delayed_direction=True, delayed_density=False, n_segments=2,
    )


def _setup(cfg, n_rays=8, S=8, seed=0):
    params = nerf_mlp.init(jax.random.PRNGKey(seed), cfg)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 4)
    dirs = jax.random.normal(ks[0], (n_rays, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origs = jax.random.normal(ks[1], (n_rays, 3)) * 0.3
    targets = jax.random.uniform(ks[2], (n_rays, 3))
    t_start, t_end = sampling.sample_stratified(
        None, n_rays, S, 2.0, 6.0, "equidistant", 0.0)
    return params, origs, dirs, targets, t_start, t_end


def _ref_loss(params, cfg, origs, dirs, t_start, t_end, targets,
              alpha_pos, alpha_dir):
    pw = jnp.full((origs.shape[0], 1), 1e-3)
    dens, rgb_s = _eval_model(
        NerfMLPDef(cfg), params, origs, dirs, t_start, t_end, pw,
        alpha_pos, alpha_dir, "middle")
    rgb, _ = render.render_rays(dens, rgb_s, t_end - t_start)
    return jnp.mean((rgb - targets) ** 2), rgb


@pytest.mark.parametrize("n_hidden,alpha", [(2, 2.5), (4, 4.0), (1, 1.0)])
def test_grads_match_xla(n_hidden, alpha):
    cfg = _cfg(n_hidden=n_hidden)
    params, origs, dirs, targets, t_start, t_end = _setup(cfg)
    a_pos, a_dir = jnp.asarray(alpha), jnp.asarray(alpha / 2.0)

    (loss_ref, rgb_ref), grads_ref = jax.value_and_grad(
        lambda p, o, d: _ref_loss(p, cfg, o, d, t_start, t_end, targets,
                                  a_pos, a_dir),
        argnums=(0, 1, 2), has_aux=True,
    )(params, origs, dirs)
    gp_ref, go_ref, gd_ref = grads_ref

    rgb, grads, d_origs, d_dirs = flagship_train_grads(
        params, cfg, origs, dirs, t_start, t_end, targets,
        a_pos, a_dir, tile_rays=4, interpret=True)

    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(d_origs, go_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(d_dirs, gd_ref, rtol=1e-4, atol=1e-6)
    flat_k, _ = jax.tree_util.tree_flatten_with_path(grads)
    flat_r = dict(jax.tree_util.tree_flatten_with_path(gp_ref)[0])
    assert len(flat_k) == len(flat_r)
    for path, leaf in flat_k:
        ref_leaf = flat_r[path]
        np.testing.assert_allclose(
            leaf, ref_leaf, rtol=2e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_padding_rays_do_not_contaminate():
    """n not divisible by the tile: padded rays must contribute zero grads."""
    cfg = _cfg()
    params, origs, dirs, targets, t_start, t_end = _setup(cfg, n_rays=7)
    a_pos, a_dir = jnp.asarray(2.0), jnp.asarray(1.0)

    (_, _), grads_ref = jax.value_and_grad(
        lambda p: _ref_loss(p, cfg, origs, dirs, t_start, t_end, targets,
                            a_pos, a_dir),
        has_aux=True)(params)

    rgb, grads, _, _ = flagship_train_grads(
        params, cfg, origs, dirs, t_start, t_end, targets,
        a_pos, a_dir, tile_rays=4, interpret=True)
    assert rgb.shape == (7, 3)
    for k_leaf, r_leaf in zip(jax.tree_util.tree_leaves(grads),
                              jax.tree_util.tree_leaves(grads_ref)):
        np.testing.assert_allclose(k_leaf, r_leaf, rtol=2e-4, atol=1e-6)


def test_fused_train_step_matches_standard():
    """Full-step parity: train_step_fused == train_step (same batch/key),
    params and metrics, through camera transform + optimizer."""
    from nerf_experiments_tpu.systems import barf as barf_sys

    cfg_mlp = _cfg(n_hidden=2, hidden_dim=32)
    cfg = barf_sys.BarfConfig(
        radiance=cfg_mlp, n_training_images=4, near=2.0, far=6.0,
        samples_per_ray_radiance=8,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=0.0,
    )
    assert barf_sys.can_fuse_train_step(cfg)
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)

    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    n = 16
    dirs = jax.random.normal(ks[0], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    batch = {
        "origs_raw": jax.random.normal(ks[1], (n, 3)) * 0.3,
        "origs_noisy": jax.random.normal(ks[1], (n, 3)) * 0.3,
        "dirs_raw": dirs,
        "dirs_noisy": dirs,
        "colors": jax.random.uniform(ks[2], (n, 2, 3)),
        "img_idx": jax.random.randint(ks[3], (n,), 0, 4),
        "pixel_width": jnp.full((n, 1), 1e-3),
    }
    a_pos, a_dir, sigma = jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(0.0)

    s_ref, m_ref = barf_sys.train_step(
        state, cfg, tx, batch, ks[4], a_pos, a_dir, sigma)
    s_fused, m_fused = barf_sys.train_step_fused(
        state, cfg, tx, batch, ks[4], a_pos, a_dir, sigma)

    np.testing.assert_allclose(float(m_fused["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for k_leaf, r_leaf in zip(jax.tree_util.tree_leaves(s_fused.params),
                              jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(k_leaf, r_leaf, rtol=1e-4, atol=1e-6)


def test_rejects_non_flagship_config():
    cfg = nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=4, scale=1.0, include_identity=False),
        direction_encoder=Barf(levels=2, scale=1.0, include_identity=True),
        n_hidden=2, hidden_dim=32,
        delayed_direction=True, delayed_density=False, n_segments=2,
    )
    params, origs, dirs, targets, t_start, t_end = _setup(_cfg())
    with pytest.raises(ValueError):
        flagship_train_grads(params, cfg, origs, dirs, t_start, t_end,
                             targets, 1.0, 1.0, interpret=True)


def test_render_kernel_matches_xla_forward():
    """flagship_render (forward-only mega-kernel) vs the XLA eval path on
    identical t bins: rgb / opacity / depth parity (render_full conventions)."""
    from nerf_experiments_tpu.ops.train_megakernel import flagship_render

    cfg = _cfg(n_hidden=2)
    params, origs, dirs, _, t_start, t_end = _setup(cfg, n_rays=8, S=8)
    a_pos, a_dir = jnp.asarray(2.5), jnp.asarray(1.25)
    pw = jnp.full((origs.shape[0], 1), 1e-3)

    dens, rgb_s = _eval_model(
        NerfMLPDef(cfg), params, origs, dirs, t_start, t_end, pw,
        a_pos, a_dir, "middle")
    rgb_ref, opac_ref, depth_ref, _ = render.render_full(
        dens, rgb_s, t_start, t_end)

    rgb, opac, depth = flagship_render(
        params, cfg, origs, dirs, t_start, t_end, a_pos, a_dir,
        tile_rays=4, interpret=True)
    np.testing.assert_allclose(rgb, rgb_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(opac, opac_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(depth, depth_ref, rtol=1e-5, atol=1e-6)


def test_render_kernel_ray_padding():
    """n_rays not divisible by the tile: padded rays must not leak."""
    from nerf_experiments_tpu.ops.train_megakernel import flagship_render

    cfg = _cfg()
    params, origs, dirs, _, t_start, t_end = _setup(cfg, n_rays=7, S=8)
    a = jnp.asarray(2.0)
    rgb_pad, _, _ = flagship_render(
        params, cfg, origs, dirs, t_start, t_end, a, a,
        tile_rays=4, interpret=True)
    rgb_one, _, _ = flagship_render(
        params, cfg, origs, dirs, t_start, t_end, a, a,
        tile_rays=1, interpret=True)
    assert rgb_pad.shape == (7, 3)
    np.testing.assert_allclose(rgb_pad, rgb_one, rtol=1e-5, atol=1e-6)


def test_forward_fused_dispatch_matches():
    """systems.barf.forward(fused=True) == forward(fused=False) on the
    deterministic eval path (equidistant sampling, no key)."""
    from nerf_experiments_tpu.systems import barf as barf_sys

    mlp = _cfg(n_hidden=2)
    cfg = barf_sys.BarfConfig(
        radiance=mlp, n_training_images=4, near=2.0, far=6.0,
        samples_per_ray_radiance=8,
    )
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    n = 6
    dirs = jax.random.normal(ks[0], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origs = jax.random.normal(ks[1], (n, 3)) * 0.3
    pw = jnp.full((n, 1), 1e-3)
    a_pos, a_dir = jnp.asarray(3.0), jnp.asarray(1.5)

    rgb_ref, _ = barf_sys.forward(
        state.params, cfg, None, origs, dirs, pw, a_pos, a_dir,
        stratified=False)
    rgb_fused, coarse = barf_sys.forward(
        state.params, cfg, None, origs, dirs, pw, a_pos, a_dir,
        stratified=False, fused=True)
    assert coarse is None
    np.testing.assert_allclose(rgb_fused, rgb_ref, rtol=1e-5, atol=1e-6)


def _batch(n, n_imgs=4, seed=1):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    dirs = jax.random.normal(ks[0], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return {
        "origs_raw": jax.random.normal(ks[1], (n, 3)) * 0.3,
        "origs_noisy": jax.random.normal(ks[1], (n, 3)) * 0.3,
        "dirs_raw": dirs,
        "dirs_noisy": dirs,
        "colors": jax.random.uniform(ks[2], (n, 2, 3)),
        "img_idx": jax.random.randint(ks[3], (n,), 0, n_imgs),
        "pixel_width": jnp.full((n, 1), 1e-3),
    }, ks[4]


@pytest.mark.parametrize("shared", [False, True])
def test_fused_train_step_matches_standard_proposal(shared):
    """Hierarchical-config parity: the fused step (XLA coarse stage + fine
    radiance through the kernel) == train_step, for both a separate proposal
    net and the MipNeRF shared-net arrangement."""
    from nerf_experiments_tpu.systems import barf as barf_sys

    cfg = barf_sys.BarfConfig(
        radiance=_cfg(n_hidden=2, hidden_dim=32),
        proposal=None if shared else _cfg(n_hidden=1, hidden_dim=16),
        share_proposal_net=shared,
        n_training_images=4, near=2.0, far=6.0,
        samples_per_ray_radiance=8,
        samples_per_ray_proposal=4,
        coarse_loss_weight=0.1 if shared else 1.0,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=0.0,
    )
    assert barf_sys.can_fuse_train_step(cfg)
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)
    batch, key = _batch(16)
    a_pos, a_dir, sigma = jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(0.0)

    s_ref, m_ref = barf_sys.train_step(
        state, cfg, tx, batch, key, a_pos, a_dir, sigma)
    s_fused, m_fused = barf_sys.train_step_fused(
        state, cfg, tx, batch, key, a_pos, a_dir, sigma)

    np.testing.assert_allclose(float(m_fused["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m_fused["loss_coarse"]),
                               float(m_ref["loss_coarse"]), rtol=1e-5)
    for k_leaf, r_leaf in zip(jax.tree_util.tree_leaves(s_fused.params),
                              jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(k_leaf, r_leaf, rtol=1e-4, atol=1e-6)


def test_forward_fused_dispatch_matches_proposal():
    """systems.barf.forward(fused=True) == forward(fused=False) on the
    deterministic hierarchical eval path."""
    from nerf_experiments_tpu.systems import barf as barf_sys

    cfg = barf_sys.BarfConfig(
        radiance=_cfg(n_hidden=2, hidden_dim=32),
        proposal=_cfg(n_hidden=1, hidden_dim=16),
        n_training_images=4, near=2.0, far=6.0,
        samples_per_ray_radiance=8,
        samples_per_ray_proposal=4,
    )
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    n = 6
    dirs = jax.random.normal(ks[0], (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origs = jax.random.normal(ks[1], (n, 3)) * 0.3
    pw = jnp.full((n, 1), 1e-3)
    a_pos, a_dir = jnp.asarray(3.0), jnp.asarray(1.5)

    rgb_ref, coarse_ref = barf_sys.forward(
        state.params, cfg, None, origs, dirs, pw, a_pos, a_dir,
        stratified=False)
    rgb_fused, coarse_fused = barf_sys.forward(
        state.params, cfg, None, origs, dirs, pw, a_pos, a_dir,
        stratified=False, fused=True)
    np.testing.assert_allclose(coarse_fused, coarse_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rgb_fused, rgb_ref, rtol=1e-5, atol=1e-6)


def test_train_kernel_weights_match_render_weights():
    """return_weights: the kernel's per-sample compositing weights (output
    col 9) == render_weights on the XLA path — the contract the fused
    hierarchical COARSE stage relies on for PDF resampling."""
    cfg = _cfg()
    params, origs, dirs, targets, t_start, t_end = _setup(cfg)
    a_pos, a_dir = jnp.asarray(2.0), jnp.asarray(1.0)

    *_, w = flagship_train_grads(
        params, cfg, origs, dirs, t_start, t_end, targets, a_pos, a_dir,
        tile_rays=4, interpret=True, loss_scale=0.1, return_weights=True)

    pw = jnp.full((origs.shape[0], 1), 1e-3)
    dens, _ = _eval_model(
        NerfMLPDef(cfg), params, origs, dirs, t_start, t_end, pw,
        a_pos, a_dir, "middle")
    w_ref, _, _ = render.render_weights(dens, t_end - t_start)
    np.testing.assert_allclose(w, w_ref, rtol=1e-5, atol=1e-6)


def test_train_kernel_loss_scale_scales_grads():
    """loss_scale multiplies every gradient output linearly (the in-kernel
    MSE grad carries coarse_loss_weight for fused coarse stages)."""
    cfg = _cfg()
    params, origs, dirs, targets, t_start, t_end = _setup(cfg)
    a = jnp.asarray(2.0)
    _, g1, go1, gd1 = flagship_train_grads(
        params, cfg, origs, dirs, t_start, t_end, targets, a, a,
        tile_rays=4, interpret=True)
    _, g2, go2, gd2 = flagship_train_grads(
        params, cfg, origs, dirs, t_start, t_end, targets, a, a,
        tile_rays=4, interpret=True, loss_scale=0.25)
    np.testing.assert_allclose(go2, 0.25 * go1, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(gd2, 0.25 * gd1, rtol=1e-5, atol=1e-7)
    for l1, l2 in zip(jax.tree_util.tree_leaves(g1),
                      jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(l2, 0.25 * l1, rtol=1e-5, atol=1e-7)


def test_render_kernel_weights_output():
    """flagship_render(return_weights=True): cols 5:5+S carry the
    compositing weights (hierarchical serving resampler input)."""
    from nerf_experiments_tpu.ops.train_megakernel import flagship_render

    cfg = _cfg(n_hidden=2)
    params, origs, dirs, _, t_start, t_end = _setup(cfg, n_rays=8, S=8)
    a_pos, a_dir = jnp.asarray(2.5), jnp.asarray(1.25)
    pw = jnp.full((origs.shape[0], 1), 1e-3)

    rgb, opac, depth, w = flagship_render(
        params, cfg, origs, dirs, t_start, t_end, a_pos, a_dir,
        tile_rays=4, interpret=True, return_weights=True)
    rgb0, opac0, depth0 = flagship_render(
        params, cfg, origs, dirs, t_start, t_end, a_pos, a_dir,
        tile_rays=4, interpret=True)

    dens, _ = _eval_model(
        NerfMLPDef(cfg), params, origs, dirs, t_start, t_end, pw,
        a_pos, a_dir, "middle")
    w_ref, _, _ = render.render_weights(dens, t_end - t_start)
    np.testing.assert_allclose(w, w_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rgb, rgb0, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(opac, opac0, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(depth, depth0, rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("shared", [False, True])
def test_fused_coarse_stage_matches_xla_coarse(monkeypatch, shared):
    """The fused step with the opt-in KERNEL coarse stage (NETPU_FUSED_COARSE)
    == the fused step with the default XLA coarse stage — bit-comparable
    params after one update at test tolerances. Covers both the dedicated
    proposal net and the MipNeRF shared-net arrangement."""
    from nerf_experiments_tpu.systems import barf as barf_sys

    cfg = barf_sys.BarfConfig(
        radiance=_cfg(n_hidden=2, hidden_dim=32),
        proposal=None if shared else _cfg(n_hidden=1, hidden_dim=16),
        share_proposal_net=shared,
        n_training_images=4, near=2.0, far=6.0,
        samples_per_ray_radiance=8,
        samples_per_ray_proposal=4,
        coarse_loss_weight=0.3,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=0.0,
    )
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    tx = barf_sys.make_optimizer(cfg, state.params)
    batch, key = _batch(16)
    a_pos, a_dir, sigma = jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(0.0)

    monkeypatch.setenv("NETPU_FUSED_COARSE", "1")
    assert barf_sys._fusable_coarse_cfg(cfg) is not None
    s_kern, m_kern = barf_sys.train_step_fused(
        state, cfg, tx, batch, key, a_pos, a_dir, sigma)

    # hierarchical serving with the kernel coarse stage == XLA eval path
    rgb_ref, coarse_ref = barf_sys.forward(
        state.params, cfg, None, batch["origs_raw"], batch["dirs_raw"],
        batch["pixel_width"], a_pos, a_dir, stratified=False)
    rgb_k, coarse_k = barf_sys.forward(
        state.params, cfg, None, batch["origs_raw"], batch["dirs_raw"],
        batch["pixel_width"], a_pos, a_dir, stratified=False, fused=True)
    np.testing.assert_allclose(rgb_k, rgb_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(coarse_k, coarse_ref, rtol=1e-5, atol=1e-6)

    monkeypatch.delenv("NETPU_FUSED_COARSE")
    assert barf_sys._fusable_coarse_cfg(cfg) is None
    s_xla, m_xla = barf_sys.train_step_fused(
        state, cfg, tx, batch, key, a_pos, a_dir, sigma)

    np.testing.assert_allclose(float(m_kern["loss"]), float(m_xla["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_kern["loss_coarse"]),
                               float(m_xla["loss_coarse"]), rtol=1e-6)
    for k_leaf, r_leaf in zip(jax.tree_util.tree_leaves(s_kern.params),
                              jax.tree_util.tree_leaves(s_xla.params)):
        np.testing.assert_allclose(k_leaf, r_leaf, rtol=1e-5, atol=1e-7)


def test_train_coarse_block_identical_rays_exact_parity():
    """Block-coarse training (BarfConfig.train_coarse_block): when every ray
    inside an aligned block IS its representative (repeated rays), sharing
    the coarse stage per block changes nothing — same coarse bins, same
    coarse loss (mean over reps == mean over duplicates), and the camera
    chain accumulates block-many 1/B contributions == one 1/n_rep
    contribution. So the blocked step must match block=1 EXACTLY (up to fp
    association) on such a batch; this pins the rep-slice/vjp-scatter and
    bin-broadcast wiring."""
    import dataclasses

    from nerf_experiments_tpu.systems import barf as barf_sys

    cfg1 = barf_sys.BarfConfig(
        radiance=_cfg(n_hidden=2, hidden_dim=32),
        proposal=_cfg(n_hidden=1, hidden_dim=16),
        n_training_images=4, near=2.0, far=6.0,
        samples_per_ray_radiance=8,
        samples_per_ray_proposal=4,
        uniform_sampling_strategy="equidistant",
        uniform_sampling_offset_size=0.0,
    )
    cfg4 = dataclasses.replace(cfg1, train_coarse_block=4)
    state = barf_sys.init(jax.random.PRNGKey(0), cfg1)
    tx = barf_sys.make_optimizer(cfg1, state.params)

    batch, key = _batch(4)
    # repeat each ray 4x -> 16 rays in 4 aligned blocks of identical rays
    batch = {k: jnp.repeat(v, 4, axis=0) for k, v in batch.items()}
    a_pos, a_dir, sigma = jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(0.0)

    s1, m1 = barf_sys.train_step_fused(
        state, cfg1, tx, batch, key, a_pos, a_dir, sigma)
    s4, m4 = barf_sys.train_step_fused(
        state, cfg4, tx, batch, key, a_pos, a_dir, sigma)

    np.testing.assert_allclose(float(m4["loss"]), float(m1["loss"]), rtol=1e-6)
    np.testing.assert_allclose(float(m4["loss_coarse"]),
                               float(m1["loss_coarse"]), rtol=1e-6)
    for l4, l1 in zip(jax.tree_util.tree_leaves(s4.params),
                      jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_allclose(l4, l1, rtol=1e-5, atol=1e-7)
