"""Training harness: the Lightning-loop replacement.

Drives jitted train steps over device-resident ray stores with explicit
hooks for everything the reference's callbacks did (epoch-fraction logging,
tapered image/point logging, LR monitoring via the closed-form schedules,
periodic validation with Kabsch gauge, checkpoints every N epochs,
rate-limited pose error — `barf/model_garf.py:347-349` logs it every 100
train batches).

Epoch semantics match the reference: one "epoch" = one pass worth of rays
(n_images * H * W / batch_size steps), but batches are sampled i.i.d. from
the full ray set rather than a shuffled partition — same distribution, no
host-side shuffle, zero input pipeline stalls.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_experiments_tpu.data import sampler as sampler_lib
from nerf_experiments_tpu.training.loggers import MetricLogger


@dataclasses.dataclass
class TrainerConfig:
    max_epochs: int = 100
    batch_size: int = 1024
    log_every_n_steps: int = 50
    val_every_n_epochs: float = 1.0
    val_batches: int = 8
    pose_error_every_n_steps: int = 100
    checkpoint_every_n_epochs: Optional[float] = None
    seed: int = 0
    max_steps: Optional[int] = None  # overrides epochs when set
    # Divergence rollback (self-healing, SURVEY §5.3): NeRF training can
    # fall off a finite loss cliff into a gradient-dead basin (density
    # blow-up -> transmittance underflow -> grads ~1e-11 while Adam
    # momentum coasts; no NaN, so guard_nonfinite never trips — observed
    # at 256²/batch-8192, RESULTS.md "collapse"). The guard keeps an
    # in-memory snapshot and, when the loss stays above
    # rollback_spike_factor × its pre-spike EMA for rollback_patience
    # consecutive steps, restores the snapshot and perturbs the batch key
    # stream so the replay takes a different trajectory. This generalizes
    # the reference's self-repairing PDF sampler
    # (`barf/model_interpolation.py:233-276`) to the training level.
    rollback_enabled: bool = True
    rollback_spike_factor: float = 20.0
    rollback_patience: int = 10
    rollback_snapshot_every_n_steps: int = 1000
    rollback_max: int = 8
    rollback_warmup_steps: int = 500  # no trigger before the EMA settles
    # Block-coarse TRAINING batches: sample aligned runs of `batch_block`
    # raster-consecutive rays instead of independent rays, so the system's
    # train step can share its coarse stage across each block (the training
    # analog of systems.barf.render_block_coarse). 1 = independent rays.
    batch_block: int = 1


class Trainer:
    """Generic loop: the system supplies jitted step/val/pose functions."""

    def __init__(
        self,
        cfg: TrainerConfig,
        train_store: sampler_lib.RayStore,
        step_fn: Callable,  # (state, batch, key, *scalars) -> (state, metrics)
        scalar_fn: Callable,  # (step, epoch_frac) -> tuple of scalar args
        metric_logger: MetricLogger,
        val_store: Optional[sampler_lib.RayStore] = None,
        val_fn: Optional[Callable] = None,  # (params, batch, *scalars) -> metrics
        pose_error_fn: Optional[Callable] = None,  # (params) -> scalar
        checkpoint_manager=None,
        callbacks: Optional[List[Callable]] = None,  # f(trainer, state, step, epoch_frac)
        lr_fn: Optional[Callable] = None,  # (step) -> {"lr_<group>": float}
    ):
        self.cfg = cfg
        self.train_store = train_store
        self.val_store = val_store
        self.step_fn = step_fn
        self.scalar_fn = scalar_fn
        self.val_fn = val_fn
        self.pose_error_fn = pose_error_fn
        self.metric_logger = metric_logger
        self.checkpoint_manager = checkpoint_manager
        self.callbacks = callbacks or []
        self.lr_fn = lr_fn
        # non-finite post-mortem (the reference dumps offending tensors on
        # sampler failure, `barf/model_interpolation.py:233-276`): on the
        # FIRST step whose gradients were non-finite, the exact batch is
        # regenerated from its fold_in key and dumped with the schedule
        # scalars for offline analysis.
        self._postmortem_done = False
        self._pending_finite: List = []  # (step, key, scalars, grads_finite)
        # divergence rollback state (see TrainerConfig): losses are buffered
        # as DEVICE scalars and fetched once per log interval — a per-step
        # float() would add a host sync per step
        self._pending_losses: List = []
        self._ref_loss: Optional[float] = None  # EMA of non-spiking losses
        self._spike_run = 0  # consecutive spiking steps at the buffer tail
        self._rollbacks = 0
        self._snapshot = None  # (step, state copy)
        import jax.numpy as _jnp

        self._copy_state = jax.jit(
            lambda s: jax.tree_util.tree_map(_jnp.copy, s))
        self._last_pose_step = -(10 ** 12)  # first log step always records
        self.steps_per_epoch = max(1, train_store.n_rays // cfg.batch_size)

        # ONE fused device program per step: index sampling + batch gather +
        # the system's train step, jitted together (each eager op would cost
        # a device-tunnel roundtrip, and eager gathers have been observed to
        # hit TPU backend errors under this tunnel)
        n_rays = train_store.n_rays
        pixel_width = train_store.pixel_width
        batch_size = cfg.batch_size
        block = max(1, cfg.batch_block)
        if block > 1:
            assert batch_size % block == 0, (batch_size, block)
            assert n_rays % block == 0, (n_rays, block)
            # aligned blocks must never cross an image boundary: each image
            # is a contiguous hw-run in the flat store, so hw % block == 0
            # guarantees every block's rays come from one camera (otherwise
            # rays would silently share another camera's coarse PDF bins)
            hw = getattr(train_store, "hw", 0)
            assert hw == 0 or hw % block == 0, (
                f"batch_block={block} requires rays-per-image (hw={hw}) "
                f"divisible by the block so blocks stay within one image")

        def sample_idx(k_batch):
            if block == 1:
                return jax.random.randint(k_batch, (batch_size,), 0, n_rays)
            # aligned block starts: each block is `block` raster-consecutive
            # pixels, never crossing an image boundary (n_rays % block == 0
            # and every image is a contiguous hw-run with hw % block == 0)
            start = block * jax.random.randint(
                k_batch, (batch_size // block,), 0, n_rays // block)
            return (start[:, None]
                    + jnp.arange(block, dtype=start.dtype)).reshape(-1)

        def fused(state, arrays, base_key, step_idx, *scalars):
            # fold_in INSIDE the jit: an eager per-step fold_in would cost a
            # device-tunnel roundtrip every step
            key = jax.random.fold_in(base_key, step_idx)
            k_batch, k_step = jax.random.split(key)
            batch = sampler_lib.gather_batch_arrays(
                arrays, pixel_width, sample_idx(k_batch))
            return self.step_fn(state, batch, k_step, *scalars)

        self._fused_step = jax.jit(fused, donate_argnums=(0,))

        # schedule scalars are tiny pure functions of the step; computing
        # them with eager jnp ops on the accelerator costs ~10 tunnel
        # roundtrips per step (measured ~2x step-time overhead on small
        # steps). Run them on the host CPU backend instead.
        try:
            self._scalar_device = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            self._scalar_device = None

        def regen_batch(arrays, key):
            k_batch, _ = jax.random.split(key)
            return sampler_lib.gather_batch_arrays(
                arrays, pixel_width, sample_idx(k_batch))

        self._regen_batch = jax.jit(regen_batch)

    def epoch_fraction(self, step: int) -> float:
        return step / self.steps_per_epoch

    def _host_scalars(self, step: int, epoch_frac: float):
        """Evaluate scalar_fn on the host CPU backend and hand the jitted
        step plain numpy scalars (no accelerator roundtrips, no retraces)."""
        if self._scalar_device is None:
            return self.scalar_fn(step, epoch_frac)
        with jax.default_device(self._scalar_device):
            scalars = self.scalar_fn(step, epoch_frac)
        return tuple(np.asarray(s) for s in scalars)

    def fit(self, state) -> Any:
        cfg = self.cfg
        # per-step keys are fold_in(base, step) — a pure function of the step
        # index, so a save/restore at any step reproduces the uninterrupted
        # trajectory bit-for-bit (sequential key splitting would desync).
        # Validation gets its own base stream (fold_in requires non-negative
        # ints — folding -step overflows uint32).
        base_key, val_base_key = jax.random.split(jax.random.PRNGKey(cfg.seed))
        self._base_key = base_key
        self._base_key0 = base_key
        if cfg.rollback_enabled and self._snapshot is None:
            self._snapshot = (int(state.step), self._copy_state(state))
        total_steps = (
            cfg.max_steps
            if cfg.max_steps is not None
            else cfg.max_epochs * self.steps_per_epoch
        )
        next_val = cfg.val_every_n_epochs
        next_ckpt = cfg.checkpoint_every_n_epochs or float("inf")
        t_start = time.perf_counter()
        rays_done = 0

        # held on self so callbacks (e.g. the conv-blur sigma decay,
        # ops/image_blur.py) can swap arrays between steps (or pre-fit)
        # without retraces
        if not hasattr(self, "_train_arrays"):
            self._train_arrays = self.train_store.arrays()
        step = int(state.step)
        while step < total_steps:
            train_arrays = self._train_arrays
            epoch_frac = self.epoch_fraction(step)
            scalars = self._host_scalars(step, epoch_frac)
            state, metrics = self._fused_step(
                state, train_arrays, base_key, step, *scalars)
            step += 1
            rays_done += cfg.batch_size
            if not self._postmortem_done and "grads_finite" in metrics:
                self._pending_finite.append(
                    (step - 1, scalars, metrics["grads_finite"])
                )
            if cfg.rollback_enabled and "loss" in metrics:
                self._pending_losses.append(metrics["loss"])

            if step % cfg.log_every_n_steps == 0 or step == total_steps:
                row = {k: v for k, v in metrics.items()}
                row["epoch_fraction"] = epoch_frac
                # forcing float() here is also the device sync point
                row = {k: float(np.asarray(v)) for k, v in row.items()}
                if self.lr_fn is not None:
                    row.update(self.lr_fn(step - 1))
                self._check_postmortem(train_arrays)
                dt = time.perf_counter() - t_start
                row["train_rays_per_sec"] = rays_done / max(dt, 1e-9)
                # wall seconds since fit() start (includes the first-step
                # compile); lets studies report time-to-quality (the
                # BASELINE.md north star names time-to-30dB explicitly)
                row["wall_s"] = round(dt, 3)
                # rate-limited pose error: at most once per
                # pose_error_every_n_steps, evaluated on log steps
                # (`barf/model_garf.py:347-349` logs every 100 train batches)
                if self.pose_error_fn is not None and (
                    step - self._last_pose_step >= cfg.pose_error_every_n_steps
                    or step == total_steps
                ):
                    self._last_pose_step = step
                    row["pose_error"] = float(np.asarray(self.pose_error_fn(state.params)))
                self.metric_logger.log(row, step)
                if cfg.rollback_enabled:
                    state, step = self._rollback_check(state, step)
                    base_key = self._base_key

            for cb in self.callbacks:
                cb(self, state, step, epoch_frac)

            if self.val_fn is not None and self.val_store is not None and epoch_frac >= next_val:
                next_val += cfg.val_every_n_epochs
                self._run_validation(
                    state, step, jax.random.fold_in(val_base_key, step),
                    scalars)

            if epoch_frac >= next_ckpt and self.checkpoint_manager is not None:
                next_ckpt += cfg.checkpoint_every_n_epochs
                self.checkpoint_manager.save(step, state)

        if self.checkpoint_manager is not None:
            self.checkpoint_manager.save(step, state)
        return state

    def swap_train_colors(self, colors) -> None:
        """Replace the training target colors in place (same shape/dtype —
        the jitted step does not retrace). Used by the conv-blur-with-decay
        dataset variant (`gaborf/dataset.py:383-390` parity)."""
        old = self._train_arrays["colors"]
        assert colors.shape == old.shape and colors.dtype == old.dtype, (
            f"swap_train_colors shape/dtype mismatch: {colors.shape} vs {old.shape}"
        )
        self._train_arrays = dict(self._train_arrays, colors=colors)

    def _rollback_check(self, state, step: int):
        """Divergence rollback (TrainerConfig.rollback_*): fetch the buffered
        per-step losses in ONE transfer, run the spike detector, and on a
        sustained divergence restore the snapshot and perturb the batch key
        stream (fold_in(base0, n_rollbacks)) so the replay takes a different
        trajectory through the cliff region. Returns (state, step), possibly
        rewound."""
        cfg = self.cfg
        if not self._pending_losses:
            return state, step
        import jax.numpy as jnp

        losses = np.asarray(jnp.stack(self._pending_losses), np.float64)
        self._pending_losses.clear()
        triggered = False
        for v in losses:
            spiking = (not np.isfinite(v)) or (
                self._ref_loss is not None
                and v > cfg.rollback_spike_factor * self._ref_loss
            )
            if spiking:
                self._spike_run += 1
            else:
                self._spike_run = 0
                self._ref_loss = (
                    float(v) if self._ref_loss is None
                    else 0.99 * self._ref_loss + 0.01 * float(v))
            if (self._spike_run >= cfg.rollback_patience
                    and step > cfg.rollback_warmup_steps
                    and self._snapshot is not None
                    and self._rollbacks < cfg.rollback_max):
                triggered = True
        if triggered:
            self._rollbacks += 1
            snap_step, snap_state = self._snapshot
            self._base_key = jax.random.fold_in(
                self._base_key0, self._rollbacks)
            self.metric_logger.log({
                "rollback": float(self._rollbacks),
                "rollback_from_step": float(step),
                "rollback_to_step": float(snap_step),
                "rollback_ref_loss": float(self._ref_loss or -1.0),
            }, step)
            self._spike_run = 0
            self._pending_finite.clear()
            # hand back a COPY: the snapshot itself must survive the fused
            # step's buffer donation on the next iteration
            return self._copy_state(snap_state), snap_step
        if (self._spike_run == 0 and self._snapshot is not None
                and step - self._snapshot[0]
                >= cfg.rollback_snapshot_every_n_steps):
            # healthy interval: move the snapshot forward so a later
            # rollback replays as little as possible
            self._snapshot = (step, self._copy_state(state))
        return state, step

    def _check_postmortem(self, train_arrays) -> None:
        """Scan the buffered grads_finite flags (one stacked transfer per log
        interval, not one per step); dump the first offending batch."""
        if self._postmortem_done or not self._pending_finite:
            self._pending_finite.clear()
            return
        import jax.numpy as jnp

        flags = np.asarray(jnp.stack([p[2] for p in self._pending_finite]))
        for (bad_step, scalars, _), ok in zip(self._pending_finite, flags):
            if not ok:
                key = jax.random.fold_in(self._base_key, bad_step)
                self._dump_postmortem(train_arrays, bad_step, key, scalars)
                self._postmortem_done = True
                break
        self._pending_finite.clear()

    def _dump_postmortem(self, train_arrays, bad_step: int, key, scalars) -> None:
        import os

        out_dir = os.path.dirname(self.metric_logger.path)
        path = os.path.join(out_dir, f"postmortem_{bad_step}.npz")
        batch = self._regen_batch(train_arrays, key)
        payload = {f"batch_{k}": np.asarray(v) for k, v in batch.items()}
        payload["scalars"] = np.asarray([float(np.asarray(s)) for s in scalars])
        payload["step"] = np.asarray(bad_step)
        payload["key"] = np.asarray(key)
        np.savez(path, **payload)
        self.metric_logger.log({"postmortem_step": float(bad_step)}, bad_step)

    def _run_validation(self, state, step: int, key, scalars=()) -> None:
        if not hasattr(self, "_fused_val"):
            n_rays = self.val_store.n_rays
            pixel_width = self.val_store.pixel_width
            # validation runs the XLA forward (+ Kabsch gauge SVD in the
            # same program): cap the chunk at the known-good 1024 so the
            # program stays clear of the libtpu regalloc RET_CHECK even
            # when the train batch is mega-kernel-sized (verify SKILL.md —
            # 4096 with the in-program SVD still crashed)
            batch_size = min(self.cfg.batch_size, 1024)
            # A val_fn may declare (params, batch, *scalars) to receive the
            # LIVE schedule scalars — required when the eval must match the
            # training-time activation/encoding state (e.g. the garf-family
            # activation anneal: evaluating gamma=1 on gamma=0-trained
            # weights reads ~6 dB regardless of the fit).
            import inspect

            sig = inspect.signature(self.val_fn)
            self._val_takes_scalars = (
                len(sig.parameters) > 2
                or any(p.kind == inspect.Parameter.VAR_POSITIONAL
                       for p in sig.parameters.values()))

            def fused_val(params, arrays, k, *sc):
                idx = jax.random.randint(k, (batch_size,), 0, n_rays)
                batch = sampler_lib.gather_batch_arrays(arrays, pixel_width, idx)
                if self._val_takes_scalars:
                    return self.val_fn(params, batch, *sc)
                return self.val_fn(params, batch)

            self._fused_val = jax.jit(fused_val)
            self._val_arrays = self.val_store.arrays()

        sc = tuple(scalars) if self._val_takes_scalars else ()
        vals: Dict[str, list] = {}
        for i in range(self.cfg.val_batches):
            key, k = jax.random.split(key)
            metrics = self._fused_val(state.params, self._val_arrays, k, *sc)
            for name, v in metrics.items():
                vals.setdefault(f"val_{name}", []).append(float(np.asarray(v)))
        self.metric_logger.log({k: float(np.mean(v)) for k, v in vals.items()}, step)
