"""Occupancy-grid estimator (ops/occgrid.py) — the nerfacc OccGridEstimator
analog (grid-guided sampling; the reference's dependency ships it alongside
the PropNetEstimator that `barf/model_garf.py:222` uses)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.encodings.fourier import Barf
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.ops import occgrid
from nerf_experiments_tpu.systems import barf as barf_sys

pytestmark = pytest.mark.slow


def _cfg(**kw):
    d = dict(resolution=16, aabb_half=2.0, n_coarse=16, update_every=4)
    d.update(kw)
    return occgrid.OccGridConfig(**d)


def test_cell_index_corners_and_clipping():
    cfg = _cfg()
    r = cfg.resolution
    eps = 1e-4
    pos = jnp.array([
        [-2.0 + eps, -2.0 + eps, -2.0 + eps],   # first cell
        [2.0 - eps, 2.0 - eps, 2.0 - eps],       # last cell
        [0.0, 0.0, 0.0],                          # center
        [5.0, -5.0, 0.0],                         # out of aabb -> clipped
    ])
    idx = np.asarray(occgrid.cell_index(cfg, pos))
    assert idx[0] == 0
    assert idx[1] == r**3 - 1
    mid = r // 2
    assert idx[2] == (mid * r + mid) * r + mid
    assert idx[3] == ((r - 1) * r + 0) * r + mid
    assert idx.dtype == np.int32


def test_update_grid_captures_box_density():
    """A synthetic box density lands in exactly the box's cells (max rule),
    and decays elsewhere."""
    cfg = _cfg(decay=0.5, init_sigma=1.0)

    def box_density(pos):  # dense inside the unit box, empty outside
        inside = jnp.all(jnp.abs(pos) < 0.5, axis=-1)
        return jnp.where(inside, 50.0, 0.0)

    grid = occgrid.init_grid(cfg)
    grid = occgrid.update_grid(grid, cfg, box_density, jax.random.PRNGKey(0))
    grid3 = np.asarray(grid).reshape(cfg.resolution, cfg.resolution, cfg.resolution)
    # cells centered inside the box (|center| < 0.5 - half_cell margin)
    ax = (np.arange(cfg.resolution) + 0.5) * (2 * cfg.aabb_half / cfg.resolution) - cfg.aabb_half
    inside = np.abs(ax) < 0.3  # safely interior even with jitter
    assert np.all(grid3[np.ix_(inside, inside, inside)] == 50.0)
    # far-away cells only decayed: 0.5 * init
    assert grid3[0, 0, 0] == pytest.approx(0.5)


def test_sample_intervals_concentrates_in_occupied_region():
    cfg = _cfg(resolution=32, n_coarse=32, pdf_floor=0.01)

    def slab_density(pos):  # occupied slab at z in [0, 1]
        inside = jnp.logical_and(pos[..., 2] > 0.0, pos[..., 2] < 1.0)
        return jnp.where(inside, 100.0, 0.0)

    grid = occgrid.init_grid(cfg)
    grid = jnp.zeros_like(grid)  # start empty, then imprint the slab
    grid = occgrid.update_grid(grid, cfg, slab_density, jax.random.PRNGKey(0))

    # rays along +z from z=-2: the slab spans t in [2, 3] of [0.5, 3.5]
    n = 64
    origs = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (n, 1))
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    t_start, t_end = occgrid.sample_intervals(
        grid, cfg, origs, dirs, near=0.5, far=3.5, n_samples=32,
        key=jax.random.PRNGKey(1))
    t_mid = np.asarray(0.5 * (t_start + t_end))
    frac_in_slab = np.mean((t_mid > 2.0) & (t_mid < 3.0))
    # uniform sampling would put 1/3 of samples in [2, 3]
    assert frac_in_slab > 0.85
    # intervals stay sorted and static-shaped
    assert t_mid.shape == (n, 32)
    assert np.all(np.diff(np.asarray(t_start), axis=1) >= 0)


def test_sample_intervals_uniform_grid_covers_range_deterministic():
    cfg = _cfg()
    grid = occgrid.init_grid(cfg)
    origs = jnp.zeros((4, 3))
    dirs = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (4, 1))
    t_start, t_end = occgrid.sample_intervals(
        grid, cfg, origs, dirs, near=1.0, far=2.0, n_samples=8, key=None)
    t = np.asarray(t_start)
    # uniform constant grid => near-uniform quantiles over [near, far]
    assert t[0, 0] < 1.15 and t[0, -1] > 1.8
    np.testing.assert_allclose(t[0], t[1])  # deterministic, ray-independent


def _tiny_barf_cfg():
    mlp = nerf_mlp.NerfMLPConfig(
        position_encoder=Barf(levels=3, scale=1.0, include_identity=True),
        direction_encoder=Barf(levels=2, scale=1.0, include_identity=True),
        n_hidden=1, hidden_dim=32, delayed_direction=True,
        delayed_density=False, n_segments=2,
        learning_rate_start=5e-3, learning_rate_stop=1e-4,
        learning_rate_decay_end=1000)
    return barf_sys.BarfConfig(
        radiance=mlp, n_training_images=4, near=2.0, far=6.0,
        samples_per_ray_radiance=16,
        occ=occgrid.OccGridConfig(resolution=8, n_coarse=16, update_every=4),
    )


def _batch(key, n):
    from __graft_entry__ import _example_batch

    return _example_batch(key, n)


def test_train_step_with_occ_grid_refreshes_and_learns():
    cfg = _tiny_barf_cfg()
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    assert state.params["occ"].shape == (8**3,)
    grid0 = np.asarray(state.params["occ"])
    tx = barf_sys.make_optimizer(cfg, state.params)
    step = barf_sys.make_train_step(cfg, tx, donate=False)
    batch = _batch(jax.random.PRNGKey(1), 64)
    scalars = (jnp.asarray(2.0), jnp.asarray(1.0), jnp.asarray(0.0))
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(i), *scalars)
        losses.append(float(m["loss"]))
        assert bool(m["grads_finite"])
    # grid refreshed (step 0 and 4 hit the update_every=4 cadence)
    assert not np.allclose(np.asarray(state.params["occ"]), grid0)
    assert losses[-1] < losses[0]


def test_occ_and_proposal_are_mutually_exclusive():
    cfg = _tiny_barf_cfg()
    cfg = barf_sys.dataclasses.replace(cfg, samples_per_ray_proposal=8)
    with pytest.raises(ValueError, match="mutually exclusive"):
        barf_sys.init(jax.random.PRNGKey(0), cfg)


def test_forward_eval_deterministic_with_occ():
    cfg = _tiny_barf_cfg()
    state = barf_sys.init(jax.random.PRNGKey(0), cfg)
    batch = _batch(jax.random.PRNGKey(1), 32)
    a = (jnp.asarray(2.0), jnp.asarray(1.0))
    rgb1, c1 = barf_sys.forward(
        state.params, cfg, None, batch["origs_raw"], batch["dirs_raw"],
        batch["pixel_width"], *a, stratified=False)
    rgb2, _ = barf_sys.forward(
        state.params, cfg, None, batch["origs_raw"], batch["dirs_raw"],
        batch["pixel_width"], *a, stratified=False)
    assert c1 is None
    np.testing.assert_array_equal(np.asarray(rgb1), np.asarray(rgb2))
