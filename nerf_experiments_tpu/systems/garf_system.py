"""GARF / GaborF / SARF training system (proposal-estimator renderer).

Pure-function re-design of:
  * `barf/model_garf.py:20-402` GarfModel — nerfacc PropNetEstimator sampling
    (lindisp, stratified while training) + nerfacc.rendering with rgb/sigma
    closures, interlevel proposal loss on detached transmittance;
  * `garf/model_camera_calibration.py:384-479` — manual optimization with a
    separate Adam+ExponentialLR per sub-network (proposal / radiance /
    camera). Adam state is per-leaf, so this is expressed as ONE
    multi_transform optimizer with per-label garf_exponential schedules —
    mathematically identical updates, one fused XLA step.

The nerfacc CUDA kernels are replaced by the fixed-shape JAX transmittance
estimator in `ops/proposal.py` and the fused compositing in `ops/render.py`
(Pallas kernel variant in `ops/render_pallas.py`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from nerf_experiments_tpu.cameras import calibration, extrinsics
from nerf_experiments_tpu.models import garf
from nerf_experiments_tpu.models.common import ParamGroup
from nerf_experiments_tpu.ops import proposal, render
from nerf_experiments_tpu.ops.metrics import psnr
from nerf_experiments_tpu.training import optim


@dataclasses.dataclass(frozen=True)
class GarfSystemConfig:
    n_train_images: int = 100
    near: float = 2.0
    far: float = 7.0
    proposal_samples_per_ray: int = 64
    radiance_samples_per_ray: int = 192

    net: garf.GarfConfig = garf.GarfConfig()
    proposal_net: Optional[garf.GarfConfig] = None  # defaults to `net`

    camera_learning_rate_start: float = 1e-4
    camera_learning_rate_stop: float = 1e-5
    camera_learning_rate_decay_end: int = 10_000
    optimize_camera: bool = True
    # Adam eps for the camera group only. The reference default (1e-8,
    # sign-normalized updates) random-walks the extrinsics while camera
    # gradients are still noise-level (measured: cameras drift AWAY from a
    # perfect init at zero pose noise). A large eps makes small-gradient
    # updates gradient-proportional; None keeps the optimizer default.
    camera_adam_eps: float = None
    # Hold the cameras still (camera-group LR = 0) for steps in
    # [camera_freeze_start_step, camera_freeze_end_step). The SARF 100k run
    # showed the activation-anneal gamma ramp pushing converged cameras
    # back out (pose -88.7% at ramp start -> -80.9% at cutoff, RESULTS.md);
    # freezing the extrinsics across the ramp lets the scene net absorb the
    # new frequencies without undoing the calibration. (0, 0) disables.
    camera_freeze_start_step: int = 0
    camera_freeze_end_step: int = 0

    # gaborf steps its schedulers only at epoch-fraction milestones
    # (`gaborf/model_gaborf.py:284-303`); 1 = per-step (garf/sarf)
    scheduler_steps_per_period: int = 1

    # Activation coarse-to-fine annealing for the gabor/sarf families: the
    # oscillation term (gabor spread / sarf cosine phase) is scaled by
    # gamma(step), ramping 0 -> 1 linearly between the two steps below. At
    # gamma=0 both activations reduce to a Gaussian bump — the GARF family
    # member that DOES calibrate cameras (RESULTS.md camera-eps recipe) —
    # so the high-frequency capacity that lets gabor/sarf absorb pose noise
    # is unlocked only as the cameras settle. (0, 0) disables (gamma = 1
    # always; reference semantics — the reference never calibrates these
    # families, e.g. `sarf/main.py` camera LR 4e-9). Gauss ignores gamma.
    act_anneal_start_step: int = 0
    act_anneal_end_step: int = 0

    def act_anneal_at(self, step) -> jnp.ndarray:
        """gamma(step): linear 0 -> 1 over [start, end); 1.0 when disabled."""
        if self.act_anneal_end_step <= self.act_anneal_start_step:
            return jnp.asarray(1.0)
        span = self.act_anneal_end_step - self.act_anneal_start_step
        return jnp.clip(
            (jnp.asarray(step, jnp.float32) - self.act_anneal_start_step)
            / span, 0.0, 1.0)

    # Let the interlevel (proposal) loss backpropagate into the camera
    # extrinsics. True = reference semantics (`barf/model_garf.py:124-156`
    # closures do not detach rays, so nerfacc's prop loss reaches the
    # cameras). False detaches the rays in the interlevel branch only —
    # the proposal-histogram-matching gradient carries no pose-alignment
    # information and was measured to destabilize joint calibration.
    interlevel_camera_grads: bool = True

    # Block-coarse training (the r4 barf finding applied to the GARF family,
    # VERDICT r4 weak #6): run the 64-bin proposal/estimator stage on every
    # blk-th ray and broadcast its t bins across blk raster-consecutive rays
    # — the trace attributed the same coarse/gather overhead here as on the
    # barf path. Requires batches arriving as aligned blocks
    # (TrainerConfig.batch_block). 1 = off (reference semantics).
    train_coarse_block: int = 1

    @property
    def prop_cfg(self) -> garf.GarfConfig:
        return self.proposal_net if self.proposal_net is not None else self.net

    @property
    def camera_group(self) -> ParamGroup:
        return ParamGroup(
            self.camera_learning_rate_start,
            self.camera_learning_rate_stop,
            self.camera_learning_rate_decay_end,
            adam_eps=self.camera_adam_eps,
            freeze_start_step=self.camera_freeze_start_step,
            freeze_end_step=self.camera_freeze_end_step,
        )


@flax.struct.dataclass
class TrainState:
    params: Dict
    opt_state: Any
    step: jnp.ndarray


def init(key: jax.Array, cfg: GarfSystemConfig) -> TrainState:
    kp, kr = jax.random.split(key)
    params = {
        "proposal": garf.proposal_init(kp, cfg.prop_cfg),
        "radiance": garf.radiance_init(kr, cfg.net),
        "camera": extrinsics.init(cfg.n_train_images),
    }
    tx = make_optimizer(cfg, params)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.asarray(0))


def make_groups(cfg: GarfSystemConfig, params: Dict):
    """(groups, labels, schedule_kind) shared by optimizer and LR rows."""
    groups = {
        "proposal_lin": cfg.prop_cfg.linear_group,
        "proposal_act": cfg.prop_cfg.activation_group,
        "radiance_lin": cfg.net.linear_group,
        "radiance_act": cfg.net.activation_group,
        "camera": cfg.camera_group if cfg.optimize_camera else ParamGroup(0.0, 0.0, 0),
    }
    labels = {
        "proposal": garf.param_labels(params["proposal"], "proposal_lin", "proposal_act"),
        "radiance": garf.param_labels(params["radiance"], "radiance_lin", "radiance_act"),
        "camera": optim.constant_labels(params["camera"], "camera"),
    }
    kind = (
        "quantized_exponential" if cfg.scheduler_steps_per_period > 1
        else "garf_exponential"
    )
    return groups, labels, kind


def make_optimizer(cfg: GarfSystemConfig, params: Dict) -> optax.GradientTransformation:
    """Per-subnet Adams with linear/activation LR split (garf's 5 groups)."""
    groups, labels, kind = make_groups(cfg, params)
    return optim.multi_group_adam(
        groups, labels, schedule_kind=kind,
        scheduler_steps_per_period=cfg.scheduler_steps_per_period,
    )


def lr_fn(cfg: GarfSystemConfig, params: Dict):
    """(step) -> {"lr_<group>": float} rows (per-subnet ExponentialLR
    monitor parity, `garf/model_garf.py:365-428`)."""
    groups, _, kind = make_groups(cfg, params)
    return optim.lr_row_fn(groups, kind, cfg.scheduler_steps_per_period)


def forward(
    params: Dict,
    cfg: GarfSystemConfig,
    key: Optional[jax.Array],
    ray_origs: jnp.ndarray,
    ray_dirs: jnp.ndarray,
    stratified: bool,
    act_anneal=1.0,
    fused: bool = False,
):
    """GarfModel.forward parity (`model_garf.py:206-249`):
    returns (rgb, opacity, depth, extras) with extras carrying the proposal
    histograms + final weights for the interlevel loss.

    fused=True (eval contexts ONLY — no VJP, extras lacks the interlevel
    weights) runs the radiance eval + compositing through the forward-only
    render mega-kernel (`ops/garf_megakernel.py:garf_radiance_render`);
    the proposal stage (~3% of the FLOPs) stays in XLA."""

    def positions(ts, te):
        tm = (ts + te)[..., None] / 2.0
        return ray_origs[:, None] + ray_dirs[:, None] * tm

    # the sampled t edges are stop-gradded inside proposal.sampling, so the
    # only camera-gradient path out of the estimator is the aux histograms;
    # detach the rays in the proposal closure when configured off
    o_il = (ray_origs if cfg.interlevel_camera_grads
            else jax.lax.stop_gradient(ray_origs))
    d_il = (ray_dirs if cfg.interlevel_camera_grads
            else jax.lax.stop_gradient(ray_dirs))

    def prop_sigma_fn(ts, te):
        tm = (ts + te)[..., None] / 2.0
        pos = (o_il[:, None] + d_il[:, None] * tm).reshape(-1, 3)
        return garf.proposal_apply(
            params["proposal"], cfg.prop_cfg, pos, act_anneal
        ).reshape(ts.shape)

    t_starts, t_ends, aux = proposal.sampling(
        prop_sigma_fns=[prop_sigma_fn],
        prop_samples=[cfg.proposal_samples_per_ray],
        num_samples=cfg.radiance_samples_per_ray,
        n_rays=ray_origs.shape[0],
        near_plane=cfg.near,
        far_plane=cfg.far,
        sampling_type="lindisp",
        stratified=stratified,
        key=key,
    )

    if fused:
        from nerf_experiments_tpu.ops.garf_megakernel import (
            garf_radiance_render)

        rgb, opacity, depth = garf_radiance_render(
            params["radiance"], cfg.net, ray_origs, ray_dirs,
            t_starts, t_ends, act_anneal=act_anneal)
        return rgb, opacity, depth, {"proposal_aux": aux}

    pos = positions(t_starts, t_ends).reshape(-1, 3)
    dirs_rep = jnp.broadcast_to(
        ray_dirs[:, None, :], (ray_dirs.shape[0], cfg.radiance_samples_per_ray, 3)
    ).reshape(-1, 3)
    rgb_s, density_s = garf.radiance_apply(
        params["radiance"], cfg.net, pos, dirs_rep, act_anneal)
    rgb_s = rgb_s.reshape(t_starts.shape + (3,))
    density_s = density_s.reshape(t_starts.shape)

    rgb, opacity, depth, extras = render.render_full_auto(density_s, rgb_s, t_starts, t_ends)
    extras["proposal_aux"] = aux
    return rgb, opacity, depth, extras


def use_fused_render(cfg: GarfSystemConfig) -> bool:
    """True when eval rendering should route through the forward-only GARF
    render mega-kernel: on TPU, Pallas not disabled (the kernel supports all
    three activation families and the fixed GARF architecture)."""
    import os

    return (
        not os.environ.get("NETPU_NO_FUSED_RENDER")
        and render.use_pallas_renderer()
    )


def loss_fn(
    params: Dict,
    cfg: GarfSystemConfig,
    batch: Dict,
    key: Optional[jax.Array],
    train: bool = True,
    val_gauge=None,
    act_anneal=1.0,
):
    """`_forward_loss` (`model_garf.py:254-295`): interlevel proposal loss on
    detached weights + MSE radiance loss on the SHARP target (garf does not
    use blurred colors: `model_garf.py:280-281`)."""
    if train:
        origs, dirs = calibration.training_transform_rays(
            params["camera"], batch["img_idx"], batch["origs_noisy"], batch["dirs_noisy"]
        )
    else:
        origs, dirs = calibration.validation_transform_rays(
            batch["origs_raw"], batch["dirs_raw"], val_gauge
        )

    rgb, opacity, depth, extras = forward(
        params, cfg, key, origs, dirs, stratified=train, act_anneal=act_anneal)
    proposal_loss = proposal.compute_loss(extras["proposal_aux"], extras["weights"])
    radiance_loss = jnp.mean((rgb - batch["colors"][:, -1]) ** 2)

    loss = radiance_loss + proposal_loss
    metrics = {
        "proposal_loss": proposal_loss,
        "radiance_loss": radiance_loss,
        "psnr": psnr(radiance_loss),
    }
    return loss, metrics


def train_step(
    state: TrainState,
    cfg: GarfSystemConfig,
    tx: optax.GradientTransformation,
    batch: Dict,
    key: jax.Array,
    act_anneal=1.0,
) -> Tuple[TrainState, Dict]:
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, key, True, None, act_anneal
    )
    grads, ok = optim.guard_nonfinite(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics, loss=loss, grads_finite=ok)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1), metrics


def make_train_step(cfg: GarfSystemConfig, tx, donate: bool = True):
    fn = lambda state, batch, key, act_anneal=1.0: train_step(
        state, cfg, tx, batch, key, act_anneal)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def train_step_fused(
    state: TrainState,
    cfg: GarfSystemConfig,
    tx: optax.GradientTransformation,
    batch: Dict,
    key: jax.Array,
    act_anneal=1.0,
) -> Tuple[TrainState, Dict]:
    """One optimization step with the radiance half running through the GARF
    mega-kernel (`ops/garf_megakernel.py`): forward + compositing + MSE grad
    + backward in one Pallas launch, activations resident in VMEM.

    Gradient-exact vs `train_step` because GARF's loss factors cleanly
    (see the kernel docstring): radiance <- photometric only (kernel),
    proposal <- interlevel only (XLA autodiff over a recompute of the cheap
    proposal branch with the same PRNG key), camera <- sum of both paths."""
    from nerf_experiments_tpu.ops.garf_megakernel import (
        garf_radiance_train_grads,
    )

    def transform(cam):
        return calibration.training_transform_rays(
            cam, batch["img_idx"], batch["origs_noisy"], batch["dirs_noisy"])

    (origs, dirs), tvjp = jax.vjp(transform, state.params["camera"])

    # block-coarse: estimator on every blk-th ray, bins broadcast across the
    # block (see GarfSystemConfig.train_coarse_block); rep-slicing happens
    # INSIDE the vjp'd function so its VJP scatters rep grads back into
    # full-size d_origs/d_dirs and the camera chain needs no special casing
    blk = max(1, cfg.train_coarse_block)
    n_rays = origs.shape[0]
    n_rep = n_rays // blk
    if blk > 1:
        assert n_rays % blk == 0, (n_rays, blk)

    def _rep(x):
        return x[::blk] if blk > 1 else x

    def _bcast_bins(t):
        if blk == 1:
            return t
        s = t.shape[1]
        return jnp.broadcast_to(t[:, None, :], (n_rep, blk, s)).reshape(
            n_rays, s)

    def sample_bins(prop_params, origs_, dirs_):
        o_r, d_r = _rep(origs_), _rep(dirs_)

        def positions(ts, te):
            tm = (ts + te)[..., None] / 2.0
            return o_r[:, None] + d_r[:, None] * tm

        def prop_sigma_fn(ts, te):
            pos = positions(ts, te).reshape(-1, 3)
            return garf.proposal_apply(
                prop_params, cfg.prop_cfg, pos, act_anneal).reshape(ts.shape)

        return proposal.sampling(
            prop_sigma_fns=[prop_sigma_fn],
            prop_samples=[cfg.proposal_samples_per_ray],
            num_samples=cfg.radiance_samples_per_ray,
            n_rays=n_rep,
            near_plane=cfg.near,
            far_plane=cfg.far,
            sampling_type="lindisp",
            stratified=True,
            key=key,
        )

    # ONE proposal/estimator forward, with its linearization captured: the
    # t edges feed the radiance kernel (zero cotangent = the stop-grad the
    # two-pass version applied), and the aux histograms carry the
    # interlevel-loss gradient back through the same vjp — no recompute.
    (t_starts, t_ends, aux), sample_vjp = jax.vjp(
        sample_bins, state.params["proposal"], origs, dirs)

    targets = batch["colors"][:, -1]
    rgb, weights, grads_rad, d_origs, d_dirs = garf_radiance_train_grads(
        state.params["radiance"], cfg.net, origs, dirs,
        jax.lax.stop_gradient(_bcast_bins(t_starts)),
        jax.lax.stop_gradient(_bcast_bins(t_ends)),
        targets, act_anneal=act_anneal)

    # interlevel loss matches the proposal histogram to the block's MEAN
    # fine-weight distribution (all rays in a block share the bin edges;
    # with duplicate rays this reduces to the unblocked loss exactly)
    weights_rep = (weights if blk == 1
                   else weights.reshape(n_rep, blk, -1).mean(axis=1))
    ploss, d_aux = jax.value_and_grad(
        lambda a: proposal.compute_loss(a, weights_rep))(aux)
    g_prop, g_origs_il, g_dirs_il = sample_vjp(
        (jnp.zeros_like(t_starts), jnp.zeros_like(t_ends), d_aux))
    if not cfg.interlevel_camera_grads:
        g_origs_il = jnp.zeros_like(g_origs_il)
        g_dirs_il = jnp.zeros_like(g_dirs_il)
    (g_cam,) = tvjp((d_origs + g_origs_il, d_dirs + g_dirs_il))

    grads = {"proposal": g_prop, "radiance": grads_rad, "camera": g_cam}
    radiance_loss = jnp.mean((rgb - targets) ** 2)

    grads, ok = optim.guard_nonfinite(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    metrics = {
        "proposal_loss": ploss,
        "radiance_loss": radiance_loss,
        "psnr": psnr(radiance_loss),
        "loss": radiance_loss + ploss,
        "grads_finite": ok,
    }
    return (TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1), metrics)


def make_train_step_fused(cfg: GarfSystemConfig, tx, donate: bool = True):
    fn = lambda state, batch, key, act_anneal=1.0: train_step_fused(
        state, cfg, tx, batch, key, act_anneal)
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def pose_error_metric(params, camera_origins_raw, camera_origins_noisy):
    return calibration.compute_pose_error(
        params["camera"], camera_origins_raw, camera_origins_noisy
    )
