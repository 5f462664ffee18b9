"""BARF / vanilla-NeRF / Mip-NeRF training system (the flagship).

Pure-function re-design of the reference's Lightning stack:
  * `barf/model_interpolation.py:71-597` NerfInterpolation — hierarchical
    stratified + PDF-weighted sampling, alpha compositing, MSE + PSNR;
  * `barf/model_camera_calibration.py:19-346` CameraCalibrationModel —
    extrinsics transform for train rays, Kabsch gauge for val rays;
  * `barf/model_barf.py:12-92` BarfModel — per-step alpha annealing of the
    encoders + alpha-coupled target blur;
  * `barf/model_mip.py:18-304` MipNeRF/MipBarf — shared proposal==radiance
    net with 0.1-weighted coarse loss, and the Mip sigma schedule driving
    image blur + IPE pixel_width_sigma.

One config covers all four reference entry points (run_barf / run_bip_barf /
run_vanilla_as_barf / run_naive_as_barf); see `experiments/`.

TPU notes: the whole train step (ray transform → sampling → MLP → composite
→ loss → grads → optax update) is ONE jitted function with donated state;
scalars (alpha, sigma, step) are traced inputs so schedules never retrace.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from nerf_experiments_tpu.cameras import calibration, extrinsics
from nerf_experiments_tpu.data.sampler import blurred_pixel_colors
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.models.common import ParamGroup
from nerf_experiments_tpu.ops import occgrid, render, sampling
from nerf_experiments_tpu.ops.metrics import psnr
from nerf_experiments_tpu.training import optim


@dataclasses.dataclass(frozen=True)
class NerfMLPDef:
    """Default model plug: the segmented NerfModel MLP."""

    cfg: nerf_mlp.NerfMLPConfig

    def init(self, key):
        return nerf_mlp.init(key, self.cfg)

    def apply(self, params, pos, dir, pixel_width, t_start, t_end,
              alpha_pos, alpha_dir, pixel_width_sigma=0.0):
        return nerf_mlp.apply(
            params, self.cfg, pos, dir, pixel_width=pixel_width,
            t_start=t_start, t_end=t_end, alpha_pos=alpha_pos,
            alpha_dir=alpha_dir, pixel_width_sigma=pixel_width_sigma,
        )

    @property
    def param_group(self) -> ParamGroup:
        return self.cfg.param_group


@dataclasses.dataclass(frozen=True)
class FusedNerfMLPDef:
    """Segmented NerfModel evaluated with the fused Pallas MLP-chain kernel.

    Same parameters/init/optimizer group as NerfMLPDef — only the execution
    strategy differs: each segment and the color head run as one VMEM-
    resident GEMM chain (`ops/fused_mlp.py`), so layer activations never
    touch HBM. Encodings, concats, and heads stay in XLA (they fuse fine).
    Numerically equivalent to NerfMLPDef up to matmul-order rounding.
    """

    cfg: nerf_mlp.NerfMLPConfig
    interpret: bool = False

    def init(self, key):
        return nerf_mlp.init(key, self.cfg)

    @property
    def param_group(self) -> ParamGroup:
        return self.cfg.param_group

    def apply(self, params, pos, dir, pixel_width, t_start, t_end,
              alpha_pos, alpha_dir, pixel_width_sigma=0.0):
        from nerf_experiments_tpu.ops.fused_mlp import fused_chain

        cfg = self.cfg
        try:
            pos_enc = cfg.position_encoder(
                pos, dir, pixel_width, t_start, t_end, alpha=alpha_pos,
                pixel_width_sigma=pixel_width_sigma,
            )
        except TypeError:
            pos_enc = cfg.position_encoder(pos, dir, pixel_width, t_start, t_end,
                                           alpha=alpha_pos)
        dir_enc = cfg.direction_encoder(dir, alpha=alpha_dir)

        z = jnp.zeros((pos_enc.shape[0], 0), dtype=pos_enc.dtype)
        for i, segment in enumerate(params["segments"]):
            if not cfg.delayed_direction:
                z = jnp.concatenate([z, dir_enc], axis=-1)
            z = fused_chain(
                jnp.concatenate([z, pos_enc], axis=-1), segment["layers"],
                compute_dtype=cfg.compute_dtype, interpret=self.interpret,
            )
            if i < cfg.n_segments - 1:
                z = jax.nn.relu(z)

        length = z.shape[-1] - (0 if cfg.delayed_density else 1)
        if cfg.delayed_direction:
            final_input = jnp.concatenate([z[:, :length], dir_enc], axis=-1)
        else:
            final_input = z[:, :length]
        final_output = fused_chain(
            final_input, params["color"],
            compute_dtype=cfg.compute_dtype, interpret=self.interpret,
        )
        from nerf_experiments_tpu.models.common import softplus8

        density_raw = final_output[:, -1] if cfg.delayed_density else z[:, -1]
        density = softplus8(density_raw.astype(jnp.float32))
        rgb = jax.nn.sigmoid(final_output[:, :3].astype(jnp.float32))
        return density, rgb


def _model_def(model):
    """Accept either a NerfMLPConfig (wrapped) or any ModelDef-like object
    exposing init/apply/param_group — this is how SIREN / hash-grid / fused-
    Pallas radiance fields plug into the same renderer + calibration stack."""
    if isinstance(model, nerf_mlp.NerfMLPConfig):
        return NerfMLPDef(model)
    return model


@dataclasses.dataclass(frozen=True)
class BarfConfig:
    radiance: Any  # NerfMLPConfig or ModelDef (see _model_def)
    n_training_images: int
    near: float = 2.0
    far: float = 8.0
    samples_per_ray_radiance: int = 128
    samples_per_ray_proposal: int = 0  # 0 => no hierarchical sampling
    proposal: Optional[Any] = None  # None => same architecture as radiance
    share_proposal_net: bool = False  # MipNeRF style (model_mip.py:36)
    # occupancy-grid guided sampling (ops/occgrid.py — the nerfacc
    # OccGridEstimator analog): an ALTERNATIVE to the proposal net, mutually
    # exclusive with samples_per_ray_proposal > 0
    occ: Optional[occgrid.OccGridConfig] = None
    uniform_sampling_strategy: str = "stratified_uniform"
    uniform_sampling_offset_size: float = 0.0
    integration_strategy: str = "middle"
    coarse_loss_weight: float = 1.0  # MipNeRF uses 0.1 (model_mip.py:73)
    # Renderer density scale = 3 * MAGIC_NUMBER. The barf family uses
    # MAGIC_NUMBER=1/3 (net 1.0, `barf/magic.py`), but mip_NeRF uses
    # MAGIC_NUMBER=7 (net 21, `mip_NeRF/model_interpolation.py:8,216`) —
    # REQUIRED at its near/far 1/10–1/3: dt is ~40x smaller than at 2–8,
    # and without the boost the density gradients cannot lift the field
    # out of the empty basin (measured: the 4x256 net stays at ~10 dB
    # indefinitely with scale 1, trains normally with 21).
    density_scale: float = render.DENSITY_SCALE
    # Block-coarse TRAINING (train_step_fused only): with batches sampled as
    # aligned runs of N raster-consecutive rays (TrainerConfig.batch_block),
    # the coarse stage (proposal fwd+VJP or occ gather + PDF resample) runs
    # on ONE representative ray per block and its fine t-bins are shared by
    # the block — the training analog of render_block_coarse. The coarse
    # photometric loss is taken over representatives. 1 = off.
    train_coarse_block: int = 1

    optimize_camera: bool = True
    camera_learning_rate_start: float = 1e-3
    camera_learning_rate_stop: float = 1e-5
    camera_learning_rate_decay_end: int = 200_000
    # None -> reference Adam eps for the camera too. A large value (e.g.
    # 1e-2) makes small camera updates gradient-proportional, suppressing
    # the Adam random walk measured in the GARF study (RESULTS.md); BARF's
    # annealed encodings give strong early camera gradients so the
    # reference default already converges, but the knob is shared.
    camera_adam_eps: Optional[float] = None

    max_gaussian_sigma: float = 0.0
    gaussian_blur_sigmas: Tuple[float, ...] = (0.0, 0.0)

    # Adam knobs: reference default eps=1e-5 (`model_interpolation.py:556`);
    # the INGP variants use betas (0.9, 0.99), eps 1e-15 (`3d-ingp/model.py:503-510`)
    adam_eps: float = 1e-5
    adam_b2: float = 0.999

    @property
    def use_proposal(self) -> bool:
        return self.samples_per_ray_proposal > 0

    @property
    def use_occ(self) -> bool:
        return self.occ is not None

    @property
    def camera_group(self) -> ParamGroup:
        return ParamGroup(
            self.camera_learning_rate_start,
            self.camera_learning_rate_stop,
            self.camera_learning_rate_decay_end,
            adam_eps=self.camera_adam_eps,
        )


@flax.struct.dataclass
class TrainState:
    params: Dict
    opt_state: Any
    step: jnp.ndarray


def init(key: jax.Array, cfg: BarfConfig) -> TrainState:
    if cfg.use_occ and cfg.use_proposal:
        raise ValueError("occ grid and proposal net are mutually exclusive")
    k_rad, k_prop = jax.random.split(key)
    params: Dict = {"radiance": _model_def(cfg.radiance).init(k_rad)}
    if cfg.use_proposal and not cfg.share_proposal_net:
        prop = cfg.proposal if cfg.proposal is not None else cfg.radiance
        params["proposal"] = _model_def(prop).init(k_prop)
    if cfg.use_occ:
        params["occ"] = occgrid.init_grid(cfg.occ)
    params["camera"] = extrinsics.init(cfg.n_training_images)
    tx = make_optimizer(cfg, params)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.asarray(0))


def make_groups(cfg: BarfConfig, params: Dict):
    """(groups, labels) shared by the optimizer and the LR monitor rows."""
    groups = {
        "radiance": _model_def(cfg.radiance).param_group,
        "camera": cfg.camera_group,
    }
    labels = {
        "radiance": optim.constant_labels(params["radiance"], "radiance"),
        "camera": optim.constant_labels(params["camera"], "camera"),
    }
    if "proposal" in params:
        prop = cfg.proposal if cfg.proposal is not None else cfg.radiance
        groups["proposal"] = _model_def(prop).param_group
        labels["proposal"] = optim.constant_labels(params["proposal"], "proposal")
    if "occ" in params:
        # the occupancy grid is state, not a learned parameter: frozen
        # group (lr 0); it is refreshed by `occgrid.maybe_update` inside
        # the train step and checkpointed with the params for free
        groups["occ"] = ParamGroup(0.0, 0.0, 0)
        labels["occ"] = optim.constant_labels(params["occ"], "occ")
    if not cfg.optimize_camera:
        groups["camera"] = ParamGroup(0.0, 0.0, 0)
    return groups, labels


def make_optimizer(cfg: BarfConfig, params: Dict) -> optax.GradientTransformation:
    groups, labels = make_groups(cfg, params)
    return optim.multi_group_adam(groups, labels, eps=cfg.adam_eps, adam_b2=cfg.adam_b2)


def lr_fn(cfg: BarfConfig, params: Dict):
    """(step) -> {"lr_radiance": ..., "lr_camera": ...} rows
    (LearningRateMonitor parity, `barf/run_barf.py:139-141`)."""
    groups, _ = make_groups(cfg, params)
    return optim.lr_row_fn(groups)


def _eval_model(model_def, params, origs, dirs, t_start, t_end, pixel_width,
                alpha_pos, alpha_dir, integration_strategy, pixel_width_sigma=0.0):
    """Positions from t bins -> flattened MLP eval -> (density, rgb) grouped.

    Mirrors `_compute_positions:288-312` + `_compute_color:356-414`.

    (Measured: jax.checkpoint/remat on the MLP eval is a 20% REGRESSION here
    — with bf16 activation storage the bwd reads are cheaper than the fwd
    recompute — so no remat. Revisit only if activations outgrow HBM.)
    """
    n_rays, n_samples = t_start.shape
    t_q = sampling.t_query(t_start, t_end, integration_strategy)
    pos = origs[:, None, :] + t_q[..., None] * dirs[:, None, :]
    dirs_rep = jnp.broadcast_to(dirs[:, None, :], pos.shape)

    flat = lambda x, d: x.reshape(n_rays * n_samples, d)
    density, rgb = model_def.apply(
        params,
        flat(pos, 3), flat(dirs_rep, 3),
        jnp.broadcast_to(pixel_width, (n_rays, n_samples)).reshape(-1, 1),
        flat(t_start[..., None], 1), flat(t_end[..., None], 1),
        alpha_pos, alpha_dir, pixel_width_sigma,
    )
    return density.reshape(n_rays, n_samples), rgb.reshape(n_rays, n_samples, 3)


def forward(
    params: Dict,
    cfg: BarfConfig,
    key: Optional[jax.Array],
    ray_origs: jnp.ndarray,
    ray_dirs: jnp.ndarray,
    pixel_width: jnp.ndarray,
    alpha_pos: Optional[jnp.ndarray] = None,
    alpha_dir: Optional[jnp.ndarray] = None,
    pixel_width_sigma: float = 0.0,
    stratified: bool = True,
    fused: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(rgb_fine, rgb_coarse|None) — `NerfInterpolation.forward:417-486`.

    fused=True (eval contexts ONLY — no VJP) runs the dense radiance eval
    through the forward-only render mega-kernel
    (`ops/train_megakernel.py:flagship_render`); requires
    `can_fuse_train_step(cfg)`."""
    n_rays = ray_origs.shape[0]
    strategy = cfg.uniform_sampling_strategy if stratified else "equidistant"
    offset = cfg.uniform_sampling_offset_size if stratified else 0.0
    needs_key = (strategy == "stratified_uniform" or offset != 0.0
                 or (cfg.use_occ and stratified))
    k1 = key if needs_key else None

    def _radiance_intervals():
        """Fine t bins: occ-grid guided when configured, uniform otherwise."""
        if cfg.use_occ:
            return occgrid.sample_intervals(
                params["occ"], cfg.occ, ray_origs, ray_dirs, cfg.near,
                cfg.far, cfg.samples_per_ray_radiance,
                key=k1 if stratified else None, strategy=strategy,
            )
        return sampling.sample_stratified(
            k1, n_rays, cfg.samples_per_ray_radiance, cfg.near, cfg.far,
            strategy, offset,
        )

    if fused and not cfg.use_proposal:
        from nerf_experiments_tpu.ops.train_megakernel import flagship_render

        t_start, t_end = _radiance_intervals()
        rgb_fine, _, _ = flagship_render(
            params["radiance"], _model_def(cfg.radiance).cfg,
            ray_origs, ray_dirs, t_start, t_end, alpha_pos, alpha_dir,
        )
        return rgb_fine, None

    if fused and cfg.use_proposal:
        # hierarchical eval: coarse stage in XLA by default (measured faster
        # for small proposal nets — see _fusable_coarse_cfg), through the
        # forward render kernel under NETPU_FUSED_COARSE (weights come back
        # in the output block); fine radiance eval + compositing through
        # the render mega-kernel either way
        from nerf_experiments_tpu.ops.train_megakernel import flagship_render

        tc_start, tc_end = sampling.sample_stratified(
            k1, n_rays, cfg.samples_per_ray_proposal, cfg.near, cfg.far,
            strategy, offset,
        )
        prop_params = params.get("proposal", params["radiance"])
        prop_model = _model_def(
            cfg.proposal if cfg.proposal is not None else cfg.radiance)
        if cfg.share_proposal_net:
            prop_params, prop_model = params["radiance"], _model_def(cfg.radiance)
        coarse_cfg = _fusable_coarse_cfg(cfg)
        if coarse_cfg is not None and cfg.samples_per_ray_proposal <= 123:
            rgb_coarse, _, _, weights = flagship_render(
                prop_params, coarse_cfg, ray_origs, ray_dirs,
                tc_start, tc_end, alpha_pos, alpha_dir, return_weights=True,
            )
        else:
            dens_c, rgb_c_samples = _eval_model(
                prop_model, prop_params, ray_origs, ray_dirs, tc_start,
                tc_end, pixel_width, alpha_pos, alpha_dir,
                cfg.integration_strategy, pixel_width_sigma,
            )
            rgb_coarse, weights = render.render_rays_auto(
                dens_c, rgb_c_samples, tc_end - tc_start,
                density_scale=cfg.density_scale)
        tf_start, tf_end = sampling.sample_pdf_weighted_intervals(
            tc_start, tc_end, jax.lax.stop_gradient(weights),
            cfg.samples_per_ray_radiance, cfg.far,
        )
        rgb_fine, _, _ = flagship_render(
            params["radiance"], _model_def(cfg.radiance).cfg,
            ray_origs, ray_dirs, tf_start, tf_end, alpha_pos, alpha_dir,
        )
        return rgb_fine, rgb_coarse

    if cfg.use_proposal:
        tc_start, tc_end = sampling.sample_stratified(
            k1, n_rays, cfg.samples_per_ray_proposal, cfg.near, cfg.far, strategy, offset
        )
        prop_params = params.get("proposal", params["radiance"])
        prop_model = _model_def(cfg.proposal if cfg.proposal is not None else cfg.radiance)
        if cfg.share_proposal_net:
            prop_params, prop_model = params["radiance"], _model_def(cfg.radiance)
        dens_c, rgb_c_samples = _eval_model(
            prop_model, prop_params, ray_origs, ray_dirs, tc_start, tc_end,
            pixel_width, alpha_pos, alpha_dir, cfg.integration_strategy, pixel_width_sigma,
        )
        rgb_coarse, weights = render.render_rays_auto(
            dens_c, rgb_c_samples, tc_end - tc_start,
            density_scale=cfg.density_scale)
        tf_start, tf_end = sampling.sample_pdf_weighted_intervals(
            tc_start, tc_end, jax.lax.stop_gradient(weights),
            cfg.samples_per_ray_radiance, cfg.far,
        )
        tf_start = jax.lax.stop_gradient(tf_start)
        tf_end = jax.lax.stop_gradient(tf_end)
    else:
        tf_start, tf_end = _radiance_intervals()
        rgb_coarse = None

    dens_f, rgb_f_samples = _eval_model(
        _model_def(cfg.radiance), params["radiance"], ray_origs, ray_dirs,
        tf_start, tf_end,
        pixel_width, alpha_pos, alpha_dir, cfg.integration_strategy, pixel_width_sigma,
    )
    rgb_fine, _ = render.render_rays_auto(dens_f, rgb_f_samples,
                                          tf_end - tf_start,
                                          density_scale=cfg.density_scale)
    return rgb_fine, rgb_coarse


def loss_fn(
    params: Dict,
    cfg: BarfConfig,
    batch: Dict,
    key: jax.Array,
    alpha_pos: jnp.ndarray,
    alpha_dir: jnp.ndarray,
    blur_sigma: jnp.ndarray,
    pixel_width_sigma: float = 0.0,
    train: bool = True,
    val_gauge=None,
):
    """Full training/val objective (`BarfModel._step_helper:29-92`)."""
    if train:
        origs, dirs = calibration.training_transform_rays(
            params["camera"], batch["img_idx"], batch["origs_noisy"], batch["dirs_noisy"]
        )
    else:
        origs, dirs = calibration.validation_transform_rays(
            batch["origs_raw"], batch["dirs_raw"], val_gauge
        )

    colors = blurred_pixel_colors(batch["colors"], cfg.gaussian_blur_sigmas, blur_sigma)
    target = colors[:, 0]

    rgb_fine, rgb_coarse = forward(
        params, cfg, key, origs, dirs, batch["pixel_width"],
        alpha_pos, alpha_dir, pixel_width_sigma, stratified=train,
    )
    loss_fine = jnp.mean((rgb_fine - target) ** 2)
    loss = loss_fine
    metrics = {"loss_fine": loss_fine, "psnr": psnr(loss_fine)}
    if rgb_coarse is not None:
        loss_coarse = jnp.mean((rgb_coarse - target) ** 2)
        loss = loss + cfg.coarse_loss_weight * loss_coarse
        metrics["loss_coarse"] = loss_coarse
    return loss, metrics


def _occ_density_fn(cfg: BarfConfig, params_rad, alpha_pos, alpha_dir):
    """Positions (M, 3) -> densities (M,) through the radiance net's density
    head at the current annealing state (for `occgrid.update_grid`).

    Direction is zeroed (the density head is direction-free in every
    supported architecture — `delayed_direction`); IPE-style encoders get a
    cell-sized dummy frustum.
    """
    model_def = _model_def(cfg.radiance)
    cell = 2.0 * cfg.occ.aabb_half / cfg.occ.resolution

    def fn(pos):
        zeros = jnp.zeros((pos.shape[0], 1), pos.dtype)
        density, _ = model_def.apply(
            params_rad, pos, jnp.zeros_like(pos), zeros,
            zeros, zeros + cell, alpha_pos, alpha_dir,
        )
        return density

    return fn


def _maybe_refresh_occ(cfg: BarfConfig, params: Dict, step, key,
                       alpha_pos, alpha_dir) -> Dict:
    """Post-update occ-grid refresh (every cfg.occ.update_every steps)."""
    if not cfg.use_occ:
        return params
    grid = occgrid.maybe_update(
        params["occ"], cfg.occ, step,
        _occ_density_fn(cfg, params["radiance"], alpha_pos, alpha_dir),
        jax.random.fold_in(key, 0x0CC),
    )
    return dict(params, occ=grid)


def train_step(
    state: TrainState,
    cfg: BarfConfig,
    tx: optax.GradientTransformation,
    batch: Dict,
    key: jax.Array,
    alpha_pos: jnp.ndarray,
    alpha_dir: jnp.ndarray,
    blur_sigma: jnp.ndarray,
    pixel_width_sigma: float = 0.0,
) -> Tuple[TrainState, Dict]:
    """One optimization step: grads + NaN guard + multi-group Adam update."""
    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, key, alpha_pos, alpha_dir, blur_sigma, pixel_width_sigma
    )
    grads, ok = optim.guard_nonfinite(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = _maybe_refresh_occ(cfg, params, state.step, key, alpha_pos, alpha_dir)
    metrics = dict(metrics, loss=loss, grads_finite=ok)
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1), metrics


def train_step_fused(
    state: TrainState,
    cfg: BarfConfig,
    tx: optax.GradientTransformation,
    batch: Dict,
    key: jax.Array,
    alpha_pos: jnp.ndarray,
    alpha_dir: jnp.ndarray,
    blur_sigma: jnp.ndarray,
    axis_name: str = None,
) -> Tuple[TrainState, Dict]:
    """One optimization step through the fused training mega-kernel
    (`ops/train_megakernel.py`): forward + compositing + loss grad + backward
    run in ONE Pallas launch with VMEM-resident activations, bypassing
    jax.value_and_grad for the radiance net. Camera gradients chain through
    jax.vjp of the ray transform using the kernel's d_origs/d_dirs.

    Numerically equivalent to train_step for the flagship radiance
    architecture, dense or hierarchical (verified in
    tests/test_train_megakernel.py).

    With `axis_name` (inside shard_map): the batch is the LOCAL ray shard;
    grads/loss are pmean'd over the data axis before the (replicated)
    optimizer update, and the sampling key is decorrelated per shard.

    Hierarchical configs (`cfg.use_proposal`) run the coarse stage in XLA
    under jax.vjp by default — measured FASTER than a second kernel launch
    for the small proposal net (see `_fusable_coarse_cfg`); NETPU_FUSED_COARSE
    routes it through the kernel instead (loss grad scaled by
    coarse_loss_weight in-kernel, compositing weights returned for the fine
    resampler). Gradient-exact vs `train_step` either way because the fine t
    bins are stop-gradded in both paths: radiance <- fine MSE only,
    proposal <- coarse MSE only, camera <- sum of both photometric paths.
    """
    from nerf_experiments_tpu.ops.train_megakernel import flagship_train_grads

    params = state.params
    # pre-decorrelation key: the occ-grid refresh must use the SAME key on
    # every shard (replicated grid = replicated params invariant)
    occ_key = key
    if axis_name is not None:
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))

    (origs, dirs), vjp_cam = jax.vjp(
        lambda cam: calibration.training_transform_rays(
            cam, batch["img_idx"], batch["origs_noisy"], batch["dirs_noisy"]),
        params["camera"],
    )
    colors = blurred_pixel_colors(batch["colors"], cfg.gaussian_blur_sigmas, blur_sigma)
    target = colors[:, 0]

    n_rays = origs.shape[0]
    strategy = cfg.uniform_sampling_strategy
    offset = cfg.uniform_sampling_offset_size
    needs_key = (strategy == "stratified_uniform" or offset != 0.0
                 or cfg.use_occ)
    k1 = key if needs_key else None

    import os

    loss_coarse = None
    g_prop = g_origs_c = g_dirs_c = None
    shared_prop = cfg.use_proposal and "proposal" not in params
    # block-coarse training (see BarfConfig.train_coarse_block): the coarse
    # stage runs on every blk-th ray; batches must arrive as aligned
    # raster-consecutive blocks (TrainerConfig.batch_block)
    blk = max(1, cfg.train_coarse_block)
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

    if cfg.use_proposal:
        prop_model = _model_def(
            cfg.radiance if shared_prop or cfg.proposal is None
            else cfg.proposal)
        prop_params = params["radiance"] if shared_prop else params["proposal"]
        tc_start, tc_end = sampling.sample_stratified(
            k1, n_rep, cfg.samples_per_ray_proposal, cfg.near, cfg.far,
            strategy, offset,
        )

        # the kernel coarse stage has no rep-slicing path — XLA coarse only
        coarse_cfg = _fusable_coarse_cfg(cfg) if blk == 1 else None
        if coarse_cfg is not None:
            # coarse stage through the mega-kernel too: one small launch
            # returns rgb_coarse, proposal grads (in-kernel MSE grad scaled
            # by coarse_loss_weight), geometry grads for the camera chain,
            # AND the compositing weights for the fine resampler — the
            # whole XLA coarse fwd+vjp disappears.
            (rgb_coarse, g_prop, g_origs_c, g_dirs_c,
             weights) = flagship_train_grads(
                prop_params, coarse_cfg, origs, dirs, tc_start, tc_end,
                target, alpha_pos, alpha_dir,
                loss_scale=cfg.coarse_loss_weight,
                tile_rays=int(os.environ.get("NETPU_COARSE_TILE", 0)),
                return_weights=True,
            )
        else:
            target_c = _rep(target)

            def coarse_stage(prop_p, origs_, dirs_):
                # rep-slicing INSIDE the vjp'd function: its VJP scatters
                # the rep grads back into full-size zero-padded d_origs/
                # d_dirs, so the camera chain needs no special casing
                dens_c, rgb_c_samples = _eval_model(
                    prop_model, prop_p, _rep(origs_), _rep(dirs_), tc_start,
                    tc_end, _rep(batch["pixel_width"]), alpha_pos, alpha_dir,
                    cfg.integration_strategy,
                )
                rgb_c, weights = render.render_rays_auto(
                    dens_c, rgb_c_samples, tc_end - tc_start)
                return rgb_c, weights

            (rgb_coarse, weights), coarse_vjp = jax.vjp(
                coarse_stage, prop_params, origs, dirs)
            d_rgb_c = (cfg.coarse_loss_weight * 2.0 / rgb_coarse.size
                       ) * (rgb_coarse - target_c)
            g_prop, g_origs_c, g_dirs_c = coarse_vjp(
                (d_rgb_c, jnp.zeros_like(weights)))
        loss_coarse = jnp.mean((rgb_coarse - _rep(target)) ** 2)
        t_start, t_end = sampling.sample_pdf_weighted_intervals(
            tc_start, tc_end, jax.lax.stop_gradient(weights),
            cfg.samples_per_ray_radiance, cfg.far,
        )
        t_start = _bcast_bins(jax.lax.stop_gradient(t_start))
        t_end = _bcast_bins(jax.lax.stop_gradient(t_end))
    elif cfg.use_occ:
        t_start, t_end = occgrid.sample_intervals(
            params["occ"], cfg.occ, _rep(origs), _rep(dirs), cfg.near,
            cfg.far, cfg.samples_per_ray_radiance, key=k1, strategy=strategy,
        )
        t_start = _bcast_bins(t_start)
        t_end = _bcast_bins(t_end)
    else:
        t_start, t_end = sampling.sample_stratified(
            k1, n_rays, cfg.samples_per_ray_radiance,
            cfg.near, cfg.far, strategy, offset,
        )

    mlp_cfg = _model_def(cfg.radiance).cfg
    rgb_fine, grads_rad, d_origs, d_dirs = flagship_train_grads(
        params["radiance"], mlp_cfg, origs, dirs, t_start, t_end, target,
        alpha_pos, alpha_dir,
        tile_rays=int(os.environ.get("NETPU_TRAIN_TILE", 0)),
    )
    if cfg.use_proposal:
        d_origs = d_origs + g_origs_c
        d_dirs = d_dirs + g_dirs_c
        if shared_prop:
            grads_rad = jax.tree_util.tree_map(
                lambda a, b: a + b.astype(a.dtype), grads_rad, g_prop)
    (d_camera,) = vjp_cam((d_origs, d_dirs))
    grads = {"radiance": grads_rad, "camera": d_camera}
    if cfg.use_proposal and not shared_prop:
        grads["proposal"] = g_prop
    if cfg.use_occ:
        # frozen group; zero leaf keeps the optimizer tree aligned
        grads["occ"] = jnp.zeros_like(params["occ"])

    loss_fine = jnp.mean((rgb_fine - target) ** 2)
    loss = loss_fine
    if loss_coarse is not None:
        loss = loss + cfg.coarse_loss_weight * loss_coarse
    if axis_name is not None:
        grads = jax.lax.pmean(grads, axis_name)
        loss_fine = jax.lax.pmean(loss_fine, axis_name)
        loss = jax.lax.pmean(loss, axis_name)
        if loss_coarse is not None:
            loss_coarse = jax.lax.pmean(loss_coarse, axis_name)
    metrics = {"loss_fine": loss_fine, "psnr": psnr(loss_fine), "loss": loss}
    if loss_coarse is not None:
        metrics["loss_coarse"] = loss_coarse

    grads, ok = optim.guard_nonfinite(grads)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    params = _maybe_refresh_occ(cfg, params, state.step, occ_key,
                                alpha_pos, alpha_dir)
    metrics["grads_finite"] = ok
    return TrainState(params=params, opt_state=opt_state, step=state.step + 1), metrics


def _flagship_mlp(model) -> Optional[nerf_mlp.NerfMLPConfig]:
    """The NerfMLPConfig when `model` matches the mega-kernel's supported
    architecture (Barf encoders w/ identity, 2 segments, delayed direction,
    immediate density), else None."""
    from nerf_experiments_tpu.encodings.fourier import Barf

    m = model if isinstance(model, nerf_mlp.NerfMLPConfig) else None
    if m is None:
        return None
    pe, de = m.position_encoder, m.direction_encoder
    ok = (
        isinstance(pe, Barf) and isinstance(de, Barf)
        and pe.include_identity and de.include_identity
        and m.n_segments == 2 and m.delayed_direction
        and not m.delayed_density and pe.scale == de.scale
        and m.n_hidden >= 1
    )
    return m if ok else None


def _fusable_coarse_cfg(cfg: BarfConfig) -> Optional[nerf_mlp.NerfMLPConfig]:
    """NerfMLPConfig of the proposal/coarse net when that stage should ALSO
    run through the mega-kernel (with loss_scale=coarse_loss_weight and the
    weights output feeding the fine resampler), else None.

    MEASURED (v5e, 8192 rays x (64 coarse + 32 fine), 64-wide proposal net,
    bf16): the kernel coarse stage is SLOWER than the XLA coarse stage —
    23.7-24.3 ms/step vs 19.3 (train), 0.94M vs 1.30M rays/s (serving),
    flat across coarse tiles 16-32 rays. The small net wastes MXU lanes
    (64 < the 128-lane tile) and the kernel's fixed per-tile machinery
    ((T,S) selector matmuls, dW block RMW across hundreds of grid steps)
    dominates its tiny GEMMs, while XLA batches the whole 512k-row stage
    into a few large fused GEMMs. So the kernel coarse stage is OPT-IN
    (NETPU_FUSED_COARSE=1 — useful if a config's XLA coarse stage hits the
    libtpu regalloc crash); the XLA coarse stage is the default."""
    import os

    if not cfg.use_proposal or not os.environ.get("NETPU_FUSED_COARSE"):
        return None
    prop = (cfg.radiance if cfg.share_proposal_net or cfg.proposal is None
            else cfg.proposal)
    return _flagship_mlp(prop)


def can_fuse_train_step(cfg: BarfConfig) -> bool:
    """True when the fused mega-kernel covers this config exactly.

    The kernel evaluates the RADIANCE pass (the dominant cost); hierarchical
    configs are supported too — their coarse/proposal stage runs through a
    second (small) kernel launch when its architecture qualifies
    (`_fusable_coarse_cfg`), else in XLA."""
    return (_flagship_mlp(cfg.radiance) is not None
            and cfg.integration_strategy == "middle"
            # the mega-kernels bake the default density scale; non-default
            # scales (mip_NeRF's 21) take the XLA path
            and cfg.density_scale == render.DENSITY_SCALE)


def render_block_coarse(
    params: Dict,
    cfg: BarfConfig,
    ray_origs: jnp.ndarray,
    ray_dirs: jnp.ndarray,
    alpha_pos: Optional[jnp.ndarray] = None,
    alpha_dir: Optional[jnp.ndarray] = None,
    block: int = 4,
    pixel_width: float = 1e-3,
) -> jnp.ndarray:
    """Serving-only hierarchical render with a SUBSAMPLED coarse stage.

    Rays must arrive in raster (image) order: each group of ``block``
    consecutive rays shares the fine t-bins resampled from its FIRST ray's
    coarse PDF. Neighboring pixels traverse nearly the same frustum, and
    the bins only need to cover the surface — the fine net still evaluates
    every ray exactly — so the coarse stage (proposal-net forward or
    occ-grid gather + PDF resample, the 1.94 ms gap between the 1.81M
    rays/s fine kernel and the 1.27M full hierarchical render) shrinks by
    ``block``x. block=1 is bitwise the standard deterministic serving path.

    TPU-first reading of nerfacc's serving estimator (the CUDA original
    amortizes per-ray marching with early termination; static-shape
    subsampling is the analog that keeps the MXU kernel dense).
    """
    n_rays = ray_origs.shape[0]
    assert n_rays % block == 0, (n_rays, block)
    rep_origs = ray_origs[::block]
    rep_dirs = ray_dirs[::block]

    if cfg.use_occ:
        t_start_r, t_end_r = occgrid.sample_intervals(
            params["occ"], cfg.occ, rep_origs, rep_dirs, cfg.near, cfg.far,
            cfg.samples_per_ray_radiance, key=None, strategy="equidistant",
        )
    else:
        assert cfg.use_proposal
        tc_start, tc_end = sampling.sample_stratified(
            None, rep_origs.shape[0], cfg.samples_per_ray_proposal,
            cfg.near, cfg.far, "equidistant", 0.0,
        )
        prop_params = params.get("proposal", params["radiance"])
        prop_model = _model_def(
            cfg.proposal if cfg.proposal is not None else cfg.radiance)
        if cfg.share_proposal_net:
            prop_params, prop_model = params["radiance"], _model_def(cfg.radiance)
        dens_c, rgb_c = _eval_model(
            prop_model, prop_params, rep_origs, rep_dirs, tc_start, tc_end,
            jnp.full((rep_origs.shape[0], 1), pixel_width), alpha_pos,
            alpha_dir, cfg.integration_strategy,
        )
        _, weights = render.render_rays_auto(dens_c, rgb_c, tc_end - tc_start,
                                             density_scale=cfg.density_scale)
        t_start_r, t_end_r = sampling.sample_pdf_weighted_intervals(
            tc_start, tc_end, weights, cfg.samples_per_ray_radiance, cfg.far,
        )

    # broadcast the representative's bins to its block members
    S = t_start_r.shape[1]
    t_start = jnp.broadcast_to(t_start_r[:, None, :],
                               (t_start_r.shape[0], block, S)).reshape(n_rays, S)
    t_end = jnp.broadcast_to(t_end_r[:, None, :],
                             (t_end_r.shape[0], block, S)).reshape(n_rays, S)

    if use_fused_render(cfg):
        from nerf_experiments_tpu.ops.train_megakernel import flagship_render

        rgb, _, _ = flagship_render(
            params["radiance"], _model_def(cfg.radiance).cfg,
            ray_origs, ray_dirs, t_start, t_end, alpha_pos, alpha_dir,
        )
        return rgb
    dens_f, rgb_f = _eval_model(
        _model_def(cfg.radiance), params["radiance"], ray_origs, ray_dirs,
        t_start, t_end, jnp.full((n_rays, 1), pixel_width), alpha_pos,
        alpha_dir, cfg.integration_strategy,
    )
    rgb, _ = render.render_rays_auto(dens_f, rgb_f, t_end - t_start,
                                     density_scale=cfg.density_scale)
    return rgb


def use_fused_render(cfg: BarfConfig) -> bool:
    """True when eval rendering should route through the forward-only render
    mega-kernel: flagship dense config, on TPU, Pallas not disabled."""
    import os

    return (
        not os.environ.get("NETPU_NO_FUSED_RENDER")
        and can_fuse_train_step(cfg)
        and render.use_pallas_renderer()
    )


def make_train_step(cfg: BarfConfig, tx: optax.GradientTransformation,
                    donate: bool = True, fused: bool = False):
    """jit-compiled train step closure over static config.

    Accepts 3 or 4 trailing scalars: (alpha_pos, alpha_dir, blur_sigma
    [, pixel_width_sigma]) — the 4th drives the Mip-BARF IPE extra-blur
    schedule (`barf/model_mip.py:252`). With fused=True (flagship dense
    configs on TPU) the step runs through the training mega-kernel."""
    if fused:
        assert can_fuse_train_step(cfg), "config not supported by fused step"
        fn = lambda state, batch, key, a_pos, a_dir, sigma: train_step_fused(
            state, cfg, tx, batch, key, a_pos, a_dir, sigma
        )
    else:
        fn = lambda state, batch, key, a_pos, a_dir, sigma, pw_sigma=0.0: train_step(
            state, cfg, tx, batch, key, a_pos, a_dir, sigma, pw_sigma
        )
    return jax.jit(fn, donate_argnums=(0,) if donate else ())


def pose_error_metric(params: Dict, camera_origins_raw, camera_origins_noisy):
    return calibration.compute_pose_error(
        params["camera"], camera_origins_raw, camera_origins_noisy
    )


def val_gauge(params: Dict, camera_origins_raw, camera_origins_noisy):
    """Kabsch raw->pred similarity used by validation_transform."""
    return calibration.post_transform_params(
        params["camera"], camera_origins_raw, camera_origins_noisy, from_raw_to_pred=True
    )
