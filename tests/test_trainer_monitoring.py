"""Trainer monitoring: per-step LR rows (LearningRateMonitor parity,
`barf/run_barf.py:139-141`) and the non-finite post-mortem dump (the
reference's dump-offending-tensors-on-failure idea,
`barf/model_interpolation.py:233-276`)."""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.data.sampler import RayStore
from nerf_experiments_tpu.models.common import ParamGroup
from nerf_experiments_tpu.training import optim
from nerf_experiments_tpu.training.loggers import MetricLogger
from nerf_experiments_tpu.training.trainer import Trainer, TrainerConfig

import flax.struct


@flax.struct.dataclass
class TinyState:
    params: dict
    step: jnp.ndarray


def _store(n_rays=64, n_images=2):
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 6)
    return RayStore(
        origins_raw=jax.random.normal(ks[0], (n_rays, 3)),
        origins_noisy=jax.random.normal(ks[1], (n_rays, 3)),
        dirs_raw=jax.random.normal(ks[2], (n_rays, 3)),
        dirs_noisy=jax.random.normal(ks[3], (n_rays, 3)),
        colors=jax.random.uniform(ks[4], (n_rays, 2, 3)),
        img_idx=jnp.zeros((n_rays,), jnp.int32),
        pixel_width=0.01,
        gaussian_blur_sigmas=(0.0, 0.0),
        camera_origins_raw=jnp.zeros((n_images, 3)),
        camera_origins_noisy=jnp.zeros((n_images, 3)),
    )


def _make_trainer(tmp_path, step_fn, max_steps=10, lr_fn=None, batch_size=8):
    cfg = TrainerConfig(
        max_steps=max_steps, batch_size=batch_size, log_every_n_steps=5,
        val_every_n_epochs=1e9,
    )
    return Trainer(
        cfg=cfg,
        train_store=_store(),
        step_fn=step_fn,
        scalar_fn=lambda step, ef: (),
        metric_logger=MetricLogger(str(tmp_path)),
        lr_fn=lr_fn,
    )


def _rows(tmp_path):
    return [json.loads(l) for l in open(os.path.join(str(tmp_path), "metrics.jsonl"))]


def test_lr_rows_logged(tmp_path):
    groups = {
        "radiance": ParamGroup(5e-4, 1e-5, 100),
        "camera": ParamGroup(1e-3, 1e-5, 100),
    }
    lr_fn = optim.lr_row_fn(groups)

    def step_fn(state, batch, key):
        loss = jnp.mean(batch["colors"])
        return TinyState(params=state.params, step=state.step + 1), {"loss": loss}

    tr = _make_trainer(tmp_path, step_fn, lr_fn=lr_fn)
    tr.fit(TinyState(params={"w": jnp.zeros(3)}, step=jnp.asarray(0)))
    rows = _rows(tmp_path)
    lr_rows = [r for r in rows if "lr_radiance" in r]
    assert lr_rows, "no lr_ rows logged"
    assert all("lr_camera" in r for r in lr_rows)
    # decaying, and matching the closed-form schedule at the logged step
    for r in lr_rows:
        s = r["step"] - 1
        expected = 5e-4 * np.exp((np.log(1e-5) - np.log(5e-4)) / 100 * min(s, 100))
        assert r["lr_radiance"] == pytest.approx(expected, rel=1e-5)
    assert lr_rows[-1]["lr_radiance"] < lr_rows[0]["lr_radiance"]
    # wall_s: monotone wall-clock since fit() start on every train row
    # (time-to-quality studies integrate over it — study_time_to_30db.py)
    walls = [r["wall_s"] for r in rows if "train_rays_per_sec" in r]
    assert walls and all(b >= a for a, b in zip(walls, walls[1:]))


def test_postmortem_dump_on_first_nonfinite(tmp_path):
    bad_step = 7  # not a log step — the buffered scan must still catch it

    def step_fn(state, batch, key):
        # inject a NaN gradient signal at exactly one step
        is_bad = state.step == bad_step
        loss = jnp.where(is_bad, jnp.nan, jnp.mean(batch["colors"]))
        return (
            TinyState(params=state.params, step=state.step + 1),
            {"loss": loss, "grads_finite": jnp.logical_not(is_bad)},
        )

    tr = _make_trainer(tmp_path, step_fn, max_steps=20)
    tr.fit(TinyState(params={"w": jnp.zeros(3)}, step=jnp.asarray(0)))

    dumps = glob.glob(os.path.join(str(tmp_path), "postmortem_*.npz"))
    assert len(dumps) == 1, f"expected exactly one dump, got {dumps}"
    assert dumps[0].endswith(f"postmortem_{bad_step}.npz")
    z = np.load(dumps[0])
    assert int(z["step"]) == bad_step
    # the dumped batch is the exact batch of the offending step: regenerate
    # from the same fold_in key and compare
    key = jax.random.fold_in(
        jax.random.split(jax.random.PRNGKey(tr.cfg.seed))[0], bad_step
    )
    expected = tr._regen_batch(tr.train_store.arrays(), key)
    np.testing.assert_allclose(z["batch_colors"], np.asarray(expected["colors"]))
    rows = _rows(tmp_path)
    assert any(r.get("postmortem_step") == float(bad_step) for r in rows)


def test_no_postmortem_when_finite(tmp_path):
    def step_fn(state, batch, key):
        return (
            TinyState(params=state.params, step=state.step + 1),
            {"loss": jnp.mean(batch["colors"]), "grads_finite": jnp.asarray(True)},
        )

    tr = _make_trainer(tmp_path, step_fn, max_steps=10)
    tr.fit(TinyState(params={"w": jnp.zeros(3)}, step=jnp.asarray(0)))
    assert not glob.glob(os.path.join(str(tmp_path), "postmortem_*.npz"))


def _rollback_cfg(**kw):
    base = dict(
        max_steps=60, batch_size=8, log_every_n_steps=5,
        val_every_n_epochs=1e9, rollback_enabled=True,
        rollback_spike_factor=20.0, rollback_patience=3,
        rollback_snapshot_every_n_steps=10, rollback_max=2,
        rollback_warmup_steps=5,
    )
    base.update(kw)
    return TrainerConfig(**base)


def _cliff_step_fn(state, batch, key):
    # deterministic loss cliff: the scalar param counts steps; past 30 the
    # loss jumps 1e-3 -> 1.0 (1000x the pre-spike EMA)
    p = state.params["w"] + 1.0
    loss = jnp.where(p > 30.0, 1.0, 1e-3)
    return TinyState(params={"w": p}, step=state.step + 1), {"loss": loss}


def test_rollback_on_sustained_spike(tmp_path):
    tr = Trainer(
        cfg=_rollback_cfg(),
        train_store=_store(),
        step_fn=_cliff_step_fn,
        scalar_fn=lambda step, ef: (),
        metric_logger=MetricLogger(str(tmp_path)),
    )
    base0 = jax.random.split(jax.random.PRNGKey(tr.cfg.seed))[0]
    final = tr.fit(TinyState(params={"w": jnp.asarray(0.0)}, step=jnp.asarray(0)))
    rows = _rows(tmp_path)
    rb = [r for r in rows if "rollback" in r]
    # the cliff is deterministic in the step index, so every replay re-dives:
    # exactly rollback_max rollbacks, then training runs through to the end
    assert [r["rollback"] for r in rb] == [1.0, 2.0]
    # the snapshot had moved forward to the last healthy log step (30),
    # not stayed at 0
    assert all(r["rollback_to_step"] == 30.0 for r in rb)
    assert all(r["rollback_from_step"] >= 33.0 for r in rb)
    # each rollback perturbs the batch key stream
    assert not np.array_equal(np.asarray(tr._base_key), np.asarray(base0))
    # training completed despite the rollbacks (step counts the replays from
    # the restored snapshot state)
    assert int(final.step) == 60


def test_no_rollback_on_healthy_run(tmp_path):
    def step_fn(state, batch, key):
        # loss drifts smoothly downward with mild noise
        loss = 1e-2 / (1.0 + 0.1 * state.params["w"]) + 1e-4 * jnp.mean(batch["colors"])
        return (
            TinyState(params={"w": state.params["w"] + 1.0}, step=state.step + 1),
            {"loss": loss},
        )

    tr = Trainer(
        cfg=_rollback_cfg(),
        train_store=_store(),
        step_fn=step_fn,
        scalar_fn=lambda step, ef: (),
        metric_logger=MetricLogger(str(tmp_path)),
    )
    final = tr.fit(TinyState(params={"w": jnp.asarray(0.0)}, step=jnp.asarray(0)))
    assert not [r for r in _rows(tmp_path) if "rollback" in r]
    assert int(final.step) == 60
    assert tr._rollbacks == 0


def test_rollback_disabled(tmp_path):
    tr = Trainer(
        cfg=_rollback_cfg(rollback_enabled=False),
        train_store=_store(),
        step_fn=_cliff_step_fn,
        scalar_fn=lambda step, ef: (),
        metric_logger=MetricLogger(str(tmp_path)),
    )
    final = tr.fit(TinyState(params={"w": jnp.asarray(0.0)}, step=jnp.asarray(0)))
    assert not [r for r in _rows(tmp_path) if "rollback" in r]
    # without the guard the run marches straight through the cliff
    assert int(final.step) == 60 and float(final.params["w"]) == 60.0


def test_freeze_window_zeroes_lr_and_holds_params():
    """ParamGroup freeze window: LR = 0 inside [start, end), schedule
    resumes after, and the optimizer moves the frozen group's params only
    outside the window (the hold-cameras-through-the-gamma-ramp knob)."""
    groups = {
        "net": ParamGroup(1e-2, 1e-3, 100),
        "camera": ParamGroup(1e-2, 1e-3, 100, freeze_start_step=5,
                             freeze_end_step=10),
    }
    scheds = optim.group_lr_schedules(groups, "garf_exponential")
    assert float(scheds["camera"](4)) > 0
    assert float(scheds["camera"](5)) == 0.0
    assert float(scheds["camera"](9)) == 0.0
    assert float(scheds["camera"](10)) > 0
    # frozen window does not alter the base schedule outside it
    assert float(scheds["camera"](12)) == pytest.approx(
        float(scheds["net"](12)), rel=1e-6)

    params = {"net": jnp.ones(3), "camera": jnp.ones(3)}
    labels = {"net": "net", "camera": "camera"}
    tx = optim.multi_group_adam(groups, labels,
                                schedule_kind="garf_exponential")
    opt_state = tx.init(params)
    grads = {"net": jnp.full(3, 0.5), "camera": jnp.full(3, 0.5)}

    def step(params, opt_state):
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        return optax.apply_updates(params, updates), opt_state

    history = []
    for _ in range(12):
        params, opt_state = step(params, opt_state)
        history.append(np.asarray(params["camera"][0]))
    # steps 0-4 move, 5-9 hold bitwise, 10+ move again
    assert history[4] != history[3]
    for s in range(5, 10):
        assert history[s] == history[4], f"camera moved during freeze at {s}"
    assert history[10] != history[9]


def test_freeze_window_gates_adam_moments():
    """Grads inside the freeze window must not reach Adam's mu/nu: the first
    post-unfreeze update is otherwise driven by an EMA of exactly the ramp
    noise the freeze exists to exclude (ADVICE r2). With gating, moments decay
    toward zero through the window instead of accumulating."""
    import optax

    groups = {
        "camera": ParamGroup(1e-2, 1e-3, 100, freeze_start_step=0,
                             freeze_end_step=10),
    }
    params = {"camera": jnp.ones(3)}
    labels = {"camera": "camera"}
    tx = optim.multi_group_adam(groups, labels,
                                schedule_kind="garf_exponential")
    opt_state = tx.init(params)
    grads = {"camera": jnp.full(3, 0.5)}
    for _ in range(10):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
    # after 10 in-window steps of constant grads, the camera Adam first moment
    # must still be ~0 (ungated it would be ~0.5*(1-0.9^10) ≈ 0.33)
    mus = [np.abs(np.asarray(leaf)).max()
           for st in jax.tree_util.tree_leaves(
               opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState))
           if isinstance(st, optax.ScaleByAdamState)
           for leaf in jax.tree_util.tree_leaves(st.mu)]
    assert mus and max(mus) == 0.0
    # first post-window step applies a clean update from the fresh gradient
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    assert float(new_params["camera"][0]) != float(params["camera"][0])


def test_garf_config_freeze_plumbs_to_camera_group():
    from nerf_experiments_tpu.systems import garf_system

    cfg = garf_system.GarfSystemConfig(
        camera_freeze_start_step=7, camera_freeze_end_step=11)
    g = cfg.camera_group
    assert g.freeze_start_step == 7 and g.freeze_end_step == 11


def test_val_fn_receives_live_schedule_scalars(tmp_path):
    """A val_fn declared as (params, batch, *scalars) gets the SAME schedule
    scalars as the train step at that step — required for eval paths that
    must match training-time state (garf activation anneal: a gamma=1 eval
    of gamma=0-trained weights reads ~6 dB flat regardless of fit)."""
    def step_fn(state, batch, key, anneal):
        return (TinyState(params=state.params, step=state.step + 1),
                {"loss": jnp.mean(batch["colors"]) * anneal})

    def val_fn(params, batch, anneal):
        return {"psnr": jnp.asarray(anneal) * 2.0}

    cfg = TrainerConfig(max_steps=16, batch_size=8, log_every_n_steps=5,
                        val_every_n_epochs=1.0, val_batches=1)
    store = _store()
    tr = Trainer(
        cfg=cfg, train_store=store, step_fn=step_fn,
        scalar_fn=lambda step, ef: (jnp.asarray(0.25 * step),),
        metric_logger=MetricLogger(str(tmp_path)),
        val_store=store, val_fn=val_fn,
    )
    tr.fit(TinyState(params={"w": jnp.zeros(3)}, step=jnp.asarray(0)))
    rows = [r for r in _rows(tmp_path) if "val_psnr" in r]
    assert rows, "validation never ran"
    # val reuses the scalars of the train step it follows (computed at
    # step-1, the pre-increment index): val_psnr = 2 * 0.25 * (step - 1)
    for r in rows:
        assert abs(r["val_psnr"] - 2 * 0.25 * (r["step"] - 1)) < 1e-6, r


def test_val_fn_without_scalars_still_works(tmp_path):
    def step_fn(state, batch, key):
        return (TinyState(params=state.params, step=state.step + 1),
                {"loss": jnp.mean(batch["colors"])})

    def val_fn(params, batch):
        return {"psnr": jnp.asarray(1.0)}

    cfg = TrainerConfig(max_steps=16, batch_size=8, log_every_n_steps=5,
                        val_every_n_epochs=1.0, val_batches=1)
    store = _store()
    tr = Trainer(
        cfg=cfg, train_store=store, step_fn=step_fn,
        scalar_fn=lambda step, ef: (),
        metric_logger=MetricLogger(str(tmp_path)),
        val_store=store, val_fn=val_fn,
    )
    tr.fit(TinyState(params={"w": jnp.zeros(3)}, step=jnp.asarray(0)))
    assert any("val_psnr" in r for r in _rows(tmp_path))
