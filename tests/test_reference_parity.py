"""Differential parity suite: this framework vs the REFERENCE'S OWN torch code.

Every test here runs the reference implementation (imported read-only from
/root/reference via tests/reference_oracle.py) and the JAX implementation on
SHARED random inputs and asserts numeric agreement. This converts the
framework's correctness story from "self-consistent" to "matches the
reference" without needing the Blender lego data.

Module families covered (all fp32, tolerances <= 1e-5 on O(1) values):
  1. Positional encodings — Fourier / BARF mask + alpha schedule / IPE
     (both variance modes, pixel_width_sigma) / Integrated-BARF
     (`barf/positional_encodings.py:28-282`)
  2. Activations fwd+grad — Gauss (`barf/gaussian.py:8-31`), Gabor
     (`gaborf/gabor.py:8-29`), SARF both formulas (`sarf/activation.py:8-65`)
  3. Lie maps — so3/SO3/se3 exp+log (`barf/Lie_barf.py:3-82`) and the main
     path's matrix_exp (`barf/model_camera_extrinsics.py:22-43`)
  4. Camera extrinsics forward (`barf/model_camera_extrinsics.py:61-85`)
  5. Kabsch — full scale+outlier algorithm
     (`barf/model_camera_calibration.py:69-156`) and the standalone
     `test-camera-similarity/optimize.py:100-126` solvers
  6. Volume renderer — `NerfInterpolation._render_rays`
     (`barf/model_interpolation.py:316-353`) called unbound
  7. Segmented NeRF MLP — weights copied torch->JAX, outputs compared
     (`barf/model_interpolation_architecture.py:33-168`)
  8. Hash-grid encoding — tables copied, bijective + hashed levels
     (`2d-ingp/model.py:13-115`)
  9. Schedules — SchedulerLeNice closed form
     (`barf/model_interpolation.py:30-67`), BARF sigma(alpha)
     (`barf/model_barf.py:14-23`), Mip-BARF sigma schedule
     (`barf/model_mip.py:170-252`)
"""
from __future__ import annotations

import types

import numpy as np
import pytest
import torch as th
import jax
import jax.numpy as jnp

from tests import reference_oracle as ro

from nerf_experiments_tpu.cameras import extrinsics
from nerf_experiments_tpu.encodings import activations, fourier
from nerf_experiments_tpu.models import nerf_mlp
from nerf_experiments_tpu.ops import hashgrid, kabsch, lie, render
from nerf_experiments_tpu.training import schedules

pytestmark = pytest.mark.slow

RNG = np.random.default_rng(20260819)


def _t(x):
    return th.from_numpy(np.asarray(x, np.float32))


def _j(x):
    return jnp.asarray(x, jnp.float32)


def _max_diff(a_torch, b_jax):
    return float(np.abs(a_torch.detach().numpy() - np.asarray(b_jax)).max())


# ======================================================== 1. encodings
class TestEncodingParity:
    def test_fourier(self):
        pe = ro.load_barf("positional_encodings")
        x = RNG.uniform(-0.5, 0.5, (64, 3))
        ref = pe.FourierFeatures(levels=6, scale=2 * np.pi, space_dimensions=3)
        mine = fourier.Fourier(space_dimensions=3, levels=6, scale=2 * np.pi)
        assert _max_diff(ref(_t(x)), mine(_j(x))) < 1e-5

    @pytest.mark.parametrize("alpha", [0.0, 0.4, 2.0, 3.7, 6.0])
    def test_barf_mask_and_forward(self, alpha):
        pe = ro.load_barf("positional_encodings")
        x = RNG.uniform(-0.5, 0.5, (32, 3))
        ref = pe.BarfPositionalEncoding(
            levels=6, alpha_start=0.0, alpha_increase_start_epoch=1.0,
            alpha_increase_end_epoch=2.0, include_identity=True,
            scale=2 * np.pi, space_dimensions=3)
        ref.alpha = th.tensor(float(alpha))
        mine = fourier.Barf(space_dimensions=3, levels=6, scale=2 * np.pi,
                            include_identity=True)
        assert _max_diff(ref.compute_mask(ref.alpha),
                         fourier._barf_mask(6, 3, _j(alpha), jnp.float32)) < 1e-6
        assert _max_diff(ref(_t(x)), mine(_j(x), alpha=_j(alpha))) < 1e-5

    @pytest.mark.parametrize("epoch", [0.0, 0.5, 1.0, 1.25, 1.9, 2.0, 7.0])
    def test_barf_alpha_schedule(self, epoch):
        pe = ro.load_barf("positional_encodings")
        ref = pe.BarfPositionalEncoding(
            levels=8, alpha_start=1.5, alpha_increase_start_epoch=1.0,
            alpha_increase_end_epoch=2.0)
        ref.update_alpha(epoch)
        mine = fourier.barf_alpha_schedule(
            jnp.float32(epoch), 8, 1.5, 1.0, 2.0)
        assert abs(float(ref.alpha) - float(mine)) < 1e-5

    @pytest.mark.parametrize("distribute_variance", [False, True])
    @pytest.mark.parametrize("pixel_width_sigma", [0.0, 0.5])
    def test_integrated(self, distribute_variance, pixel_width_sigma):
        pe = ro.load_barf("positional_encodings")
        n = 64
        pos = RNG.normal(0, 1, (n, 3))
        dirs = RNG.normal(0, 1, (n, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        t_start = RNG.uniform(0.5, 3.0, (n, 1))
        t_end = t_start + RNG.uniform(0.01, 0.3, (n, 1))
        pw = 1.0 / 400.0

        ref = pe.IntegratedFourierFeatures(
            levels=5, scale=2 * np.pi, include_identity=True,
            distribute_variance=distribute_variance)
        ref.pixel_width_sigma = pixel_width_sigma
        out_ref = ref(_t(pos), _t(dirs), th.tensor(pw), _t(t_start), _t(t_end))

        mine = fourier.Integrated(
            space_dimensions=3, levels=5, scale=2 * np.pi,
            include_identity=True, distribute_variance=distribute_variance)
        out_mine = mine(_j(pos), _j(dirs), _j(pw), _j(t_start), _j(t_end),
                        pixel_width_sigma=pixel_width_sigma)
        assert _max_diff(out_ref, out_mine) < 1e-5

    @pytest.mark.parametrize("alpha", [0.7, 2.5, 5.0])
    def test_integrated_barf(self, alpha):
        pe = ro.load_barf("positional_encodings")
        n = 48
        pos = RNG.normal(0, 1, (n, 3))
        dirs = RNG.normal(0, 1, (n, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        t_start = RNG.uniform(0.5, 3.0, (n, 1))
        t_end = t_start + RNG.uniform(0.01, 0.3, (n, 1))
        pw = 1.0 / 256.0

        ref = pe.IntegratedBarfFourierFeatures(
            levels=5, alpha_start=0.0, alpha_increase_start_epoch=0.0,
            alpha_increase_end_epoch=1.0, include_identity=True,
            scale=2 * np.pi, distribute_variance=True)
        ref.alpha = th.tensor(float(alpha))
        # the reference reads this attr inside IntegratedFourierFeatures.forward
        # but IntegratedBarf never initializes it; the Mip-BARF trainer sets it
        # (`barf/model_mip.py:252`)
        ref.pixel_width_sigma = 0.0
        out_ref = ref(_t(pos), _t(dirs), th.tensor(pw), _t(t_start), _t(t_end))

        mine = fourier.IntegratedBarf(
            space_dimensions=3, levels=5, scale=2 * np.pi,
            include_identity=True, distribute_variance=True)
        out_mine = mine(_j(pos), _j(dirs), _j(pw), _j(t_start), _j(t_end),
                        alpha=_j(alpha), pixel_width_sigma=0.0)
        assert _max_diff(out_ref, out_mine) < 1e-5


# ======================================================== 2. activations
def _torch_grads(fn, inputs, cotangent):
    ins = [th.from_numpy(np.asarray(v, np.float32)).requires_grad_(True)
           for v in inputs]
    out = fn(*ins)
    out.backward(gradient=th.from_numpy(np.asarray(cotangent, np.float32)))
    return out, [i.grad.numpy() for i in ins]


def _jax_grads(fn, inputs, cotangent):
    ins = [jnp.asarray(v, jnp.float32) for v in inputs]
    out, vjp = jax.vjp(fn, *ins)
    grads = vjp(jnp.asarray(cotangent, jnp.float32))
    return out, [np.asarray(g) for g in grads]


class TestActivationParity:
    def test_gauss_forward_and_grads(self):
        g = ro.load_file("barf/gaussian.py", "ref_gaussian")
        x = RNG.normal(0, 1.5, (32, 8))
        v = RNG.uniform(0.1, 2.0, (8,))
        ct = RNG.normal(0, 1, (32, 8))
        out_r, (dx_r, dv_r) = _torch_grads(g.GaussActivation.apply, (x, v), ct)
        out_j, (dx_j, dv_j) = _jax_grads(activations.gauss_act, (x, v), ct)
        assert _max_diff(out_r, out_j) < 1e-6
        assert np.abs(dx_r - dx_j).max() < 1e-5
        assert np.abs(dv_r - dv_j).max() < 1e-5

    def test_gauss_module_parameterization(self):
        """GaussAct.forward applies v = isd^2 + 1e-6 (`barf/gaussian.py:57-63`)."""
        g = ro.load_file("barf/gaussian.py", "ref_gaussian")
        mod = g.GaussAct(8, 0.0, 1.0)
        isd = RNG.uniform(-1.0, 1.0, (8,))
        with th.no_grad():
            mod.inv_standard_deviation.copy_(_t(isd))
        x = RNG.normal(0, 1.5, (32, 8))
        assert _max_diff(mod(_t(x)),
                         activations.gauss_from_isd(_j(x), _j(isd))) < 1e-6

    def test_gabor_forward_and_grads(self):
        gb = ro.load_file("gaborf/gabor.py", "ref_gabor")
        x = RNG.normal(0, 1.5, (32, 8))
        v = RNG.uniform(0.1, 2.0, (8,))
        s = RNG.uniform(0.0, 2 * np.pi, (8,))
        ct = RNG.normal(0, 1, (32, 8))
        out_r, (dx_r, dv_r, ds_r) = _torch_grads(
            gb.GaborActivation.apply, (x, v, s), ct)
        out_j, (dx_j, dv_j, ds_j) = _jax_grads(activations.gabor_act, (x, v, s), ct)
        assert _max_diff(out_r, out_j) < 1e-6
        assert np.abs(dx_r - dx_j).max() < 1e-5
        assert np.abs(dv_r - dv_j).max() < 1e-5
        assert np.abs(ds_r - ds_j).max() < 1e-5

    def test_sarf_live_forward_and_grads(self):
        """The LIVE SarfAct forward is the damped cosine at
        `sarf/activation.py:62-65` (the sinc autograd.Function is dead code)."""
        sa = ro.load_file("sarf/activation.py", "ref_sarf")
        mod = sa.SarfAct(8, 0.5, 4.0)
        f = RNG.uniform(0.5, 4.0, (8,))
        with th.no_grad():
            mod.frequency.copy_(_t(f))
        x = RNG.normal(0, 1.5, (32, 8))
        ct = RNG.normal(0, 1, (32, 8))

        xt = _t(x).requires_grad_(True)
        out_r = mod(xt)
        out_r.backward(gradient=_t(ct))
        out_j, (dx_j, df_j) = _jax_grads(
            lambda xx, ff: activations.sarf_act(xx, ff), (x, f), ct)
        assert _max_diff(out_r, out_j) < 1e-6
        assert np.abs(xt.grad.numpy() - dx_j).max() < 1e-4
        assert np.abs(mod.frequency.grad.numpy() - df_j).max() < 1e-4

    def test_sarf_sinc_forward_and_grads(self):
        sa = ro.load_file("sarf/activation.py", "ref_sarf")
        x = RNG.normal(0, 1.5, (32, 8))
        f = RNG.uniform(0.5, 4.0, (8,))
        ct = RNG.normal(0, 1, (32, 8))
        out_r, (dx_r, df_r) = _torch_grads(sa.SarfActivation.apply, (x, f), ct)
        out_j, (dx_j, df_j) = _jax_grads(activations.sarf_sinc_act, (x, f), ct)
        assert _max_diff(out_r, out_j) < 1e-5
        # x-grad: the reference's hand-written backward differentiates
        # sin(f x')/x' wrt the SHIFTED x' and omits the chain factor of the
        # zero-avoidance shift x' = (signbit(x)*2-1)(|x|+eps), whose
        # derivative is exactly -1 everywhere — so its x-grads are the
        # NEGATION of the true gradient of the forward it computes. JAX
        # autodiff returns the true gradient; assert the discovered relation.
        assert np.abs(dx_r + dx_j).max() < 1e-4
        assert np.abs(df_r - df_j).max() < 1e-5


# ======================================================== 3. Lie maps
class TestLieParity:
    def setup_method(self):
        self.L = ro.load_barf("Lie_barf").Lie()

    def test_so3_exp(self):
        w = RNG.normal(0, 0.8, (64, 3))
        assert _max_diff(self.L.so3_to_SO3(_t(w)), lie.so3_exp(_j(w))) < 1e-5

    def test_so3_exp_matches_matrix_exp_main_path(self):
        mce = ro.load_barf("model_camera_extrinsics")
        w = RNG.normal(0, 0.5, (32, 3))
        assert _max_diff(mce.CameraExtrinsics.so3_to_SO3(_t(w)),
                         lie.so3_exp(_j(w))) < 1e-5

    def test_so3_log(self):
        w = RNG.normal(0, 0.6, (64, 3))
        R = lie.so3_exp(_j(w))
        ref_w = self.L.SO3_to_so3(_t(np.asarray(R)))
        assert _max_diff(ref_w, lie.so3_log(R)) < 1e-4

    def test_se3_exp(self):
        xi = RNG.normal(0, 0.7, (64, 6))
        ref = self.L.se3_to_SE3(_t(xi))  # (N, 3, 4)
        mine = lie.se3_exp(_j(xi))[:, :3, :]  # drop homogeneous row
        assert _max_diff(ref, mine) < 1e-5

    def test_skew(self):
        w = RNG.normal(0, 1, (16, 3))
        assert _max_diff(self.L.skew_symmetric(_t(w)), lie.hat(_j(w))) < 1e-7


# ======================================================== 4. extrinsics
class TestCameraExtrinsicsParity:
    def test_forward(self):
        mce = ro.load_barf("model_camera_extrinsics")
        n_img, n_rays = 10, 64
        rot = RNG.normal(0, 0.3, (n_img, 3))
        trans = RNG.normal(0, 0.2, (n_img, 3))
        idx = RNG.integers(0, n_img, (n_rays,))
        o = RNG.normal(0, 1, (n_rays, 3))
        d = RNG.normal(0, 1, (n_rays, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)

        ref = mce.CameraExtrinsics(n_img, 1e-3, 1e-5, 100)
        with th.no_grad():
            ref.rotation.copy_(_t(rot))
            ref.translation.copy_(_t(trans))
        o_r, d_r, R_r, t_r = ref(th.from_numpy(idx), _t(o), _t(d))

        params = {"rotation": _j(rot), "translation": _j(trans)}
        o_j, d_j, R_j, t_j = extrinsics.forward(params, jnp.asarray(idx), _j(o), _j(d))
        assert _max_diff(o_r, o_j) < 1e-6
        assert _max_diff(d_r, d_j) < 1e-5
        assert _max_diff(R_r, R_j) < 1e-5
        assert _max_diff(t_r, t_j) < 1e-6


# ======================================================== 5. Kabsch
def _ref_kabsch():
    mcc = ro.load_barf("model_camera_calibration")

    class _Shim:
        kabsch_algorithm = mcc.CameraCalibrationModel.kabsch_algorithm

    return _Shim()


class TestKabschParity:
    def _clouds(self, n=40, noise=0.05, outliers=0):
        P = RNG.normal(0, 1, (n, 3))
        w = RNG.normal(0, 0.5, (3,))
        R = np.asarray(lie.so3_exp(_j(w)))
        c, t = 1.7, np.array([0.4, -1.2, 2.0])
        Q = (P @ R.T) * c + t + RNG.normal(0, noise, (n, 3))
        if outliers:
            Q[:outliers] += RNG.normal(0, 2.0, (outliers, 3))
        return P, Q

    def test_no_outlier_pass(self):
        P, Q = self._clouds()
        R_r, t_r, c_r = _ref_kabsch().kabsch_algorithm(
            _t(P), _t(Q), remove_outliers=False)
        R_j, t_j, c_j = kabsch.kabsch(_j(P), _j(Q), remove_outliers=False)
        assert _max_diff(R_r, R_j) < 1e-5
        assert _max_diff(t_r, t_j) < 1e-5
        assert abs(float(c_r) - float(c_j)) < 1e-5

    def test_outlier_rejection_pass(self):
        """The weighted 0/1-mask re-run must equal the reference's boolean
        row removal exactly."""
        P, Q = self._clouds(n=50, noise=0.02, outliers=5)
        R_r, t_r, c_r = _ref_kabsch().kabsch_algorithm(
            _t(P), _t(Q), remove_outliers=True)
        R_j, t_j, c_j = kabsch.kabsch(_j(P), _j(Q), remove_outliers=True)
        assert _max_diff(R_r, R_j) < 1e-5
        assert _max_diff(t_r, t_j) < 1e-5
        assert abs(float(c_r) - float(c_j)) < 1e-5

    def test_standalone_align_functions(self):
        """`test-camera-similarity/optimize.py:100-126` — a discovered
        reference quirk, asserted exactly:

        `align_rotation` computes R = U @ K @ V.T from U, S, V =
        th.linalg.svd(P^T Q). But torch.linalg.svd returns V^H (unlike the
        deprecated th.svd the formula was written for), so as-written it is
        NOT the minimizer of ||P@R - Q||^2. With the intended convention
        (V_true = Vh^T, R = U @ K @ V_true.T = U @ K @ Vh) it IS the
        minimizer and equals this framework's left-multiply solution
        transposed. The main-path `kabsch_algorithm` (tested above) handles
        the torch.linalg convention correctly and is what we match."""
        opt = ro.load_optimize()
        P, Q = self._clouds(n=30, noise=0.1)
        Pc, Qc = P - P.mean(0), Q - Q.mean(0)
        R_aswritten = opt.align_rotation(_t(Pc), _t(Qc)).numpy()

        H = th.tensor(Pc.T @ Qc, dtype=th.float32)
        U, S, Vh = th.linalg.svd(H)
        d = float(th.linalg.det(Vh @ U.T))
        K = th.eye(3)
        K[-1, -1] = d
        assert np.abs((U @ K @ Vh.T).numpy() - R_aswritten).max() < 1e-5
        R_intended = (U @ K @ Vh).numpy()

        R_mine, _, _ = kabsch.kabsch(_j(P), _j(Q), remove_outliers=False)
        assert np.abs(R_intended - np.asarray(R_mine).T).max() < 1e-5
        # and the intended solution really is the better aligner
        res_mine = np.linalg.norm(Pc @ np.asarray(R_mine).T - Qc)
        res_aswritten = np.linalg.norm(Pc @ R_aswritten - Qc)
        assert res_mine < res_aswritten


# ======================================================== 6. renderer
class TestRendererParity:
    def test_render_rays(self):
        mi = ro.load_barf("model_interpolation")
        n, s = 32, 24
        densities = RNG.uniform(0, 30, (n, s))
        colors = RNG.uniform(0, 1, (n, s, 3))
        dists = RNG.uniform(0.01, 0.2, (n, s))

        shim = types.SimpleNamespace(device=th.device("cpu"))
        rgb_r, w_r = mi.NerfInterpolation._render_rays(
            shim, _t(densities), _t(colors), _t(dists))
        rgb_j, w_j = render.render_rays(_j(densities), _j(colors), _j(dists))
        assert _max_diff(rgb_r, rgb_j) < 1e-5
        assert _max_diff(w_r, w_j) < 1e-5

    def test_density_scale_is_reference_magic(self):
        """`magic.py` MAGIC_NUMBER=1/3 scaled by 3 in `_render_rays:340`."""
        magic = ro.load_barf("magic")
        assert render.DENSITY_SCALE == pytest.approx(3 * magic.MAGIC_NUMBER)


# ======================================================== 7. segmented MLP
class TestNerfModelParity:
    @pytest.mark.parametrize("delayed_direction,delayed_density",
                             [(True, False), (False, True), (True, True)])
    def test_forward(self, delayed_direction, delayed_density):
        pe = ro.load_barf("positional_encodings")
        mia = ro.load_barf("model_interpolation_architecture")
        th.manual_seed(7)
        ref = mia.NerfModel(
            n_hidden=2, hidden_dim=64,
            delayed_direction=delayed_direction,
            delayed_density=delayed_density, n_segments=2,
            position_encoder=pe.FourierFeatures(4, 2 * np.pi, 3),
            direction_encoder=pe.FourierFeatures(3, 2 * np.pi, 3))

        cfg = nerf_mlp.NerfMLPConfig(
            position_encoder=fourier.Fourier(space_dimensions=3, levels=4),
            direction_encoder=fourier.Fourier(space_dimensions=3, levels=3),
            n_hidden=2, hidden_dim=64,
            delayed_direction=delayed_direction,
            delayed_density=delayed_density, n_segments=2)
        params = nerf_mlp.init(jax.random.PRNGKey(0), cfg)

        # copy torch weights into the pytree (nn.Linear stores (out, in))
        def copy_linear(linear):
            return {"w": _j(linear.weight.detach().numpy().T),
                    "b": _j(linear.bias.detach().numpy())}

        for i, seg in enumerate(ref.model_segments):
            linears = [m for m in seg.modules() if isinstance(m, th.nn.Linear)]
            assert len(linears) == len(params["segments"][i]["layers"])
            params["segments"][i]["layers"] = [copy_linear(m) for m in linears]
        color_linears = [m for m in ref.model_color.modules()
                         if isinstance(m, th.nn.Linear)]
        params["color"] = [copy_linear(m) for m in color_linears]

        n = 64
        pos = RNG.uniform(-0.5, 0.5, (n, 3))
        dirs = RNG.normal(0, 1, (n, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        with th.no_grad():
            dens_r, rgb_r = ref(_t(pos), _t(dirs), None, None, None)
        dens_j, rgb_j = nerf_mlp.apply(params, cfg, _j(pos), _j(dirs))
        assert _max_diff(dens_r, dens_j) < 2e-5
        assert _max_diff(rgb_r, rgb_j) < 2e-5


# ======================================================== 8. hash grid
class TestHashGridParity:
    def test_2d_encoding_bijective_and_hashed_levels(self):
        ingp = ro.load_file("2d-ingp/model.py", "ref_ingp2d",
                            {"data_loader": {"SingleImageDataModule": object}})
        # res (4, 8, 16) with table 64: level 0 bijective ((4+1)^2=25 <= 64),
        # levels 1-2 hashed — both index paths exercised. Power-of-two table
        # so int64 (torch) and uint32 (TPU) hash arithmetic agree exactly.
        th.manual_seed(3)
        ref = ingp.INGPEncoding(resolution_max=16, resolution_min=4,
                                table_size=64, n_features=2, n_levels=3)
        cfg = hashgrid.HashGridConfig(
            dim=2, resolution_min=4, resolution_max=16,
            table_size=64, n_features=2, n_levels=3)
        assert cfg.level_resolutions == tuple(
            int(r) for r in ref.resolution)

        params = hashgrid.init(jax.random.PRNGKey(0), cfg)
        table = np.asarray(params["table"]).copy()
        for l, enc in enumerate(ref.encodings):
            rows = enc.table.shape[0]
            table[l, :rows] = enc.table.detach().numpy()
        params = {"table": _j(table)}

        x = RNG.uniform(0.0, 0.99, (128, 2))
        out_ref = th.cat([enc(_t(x)) for enc in ref.encodings], dim=1)
        # reference concatenates per-level blocks in the same level order
        out_mine = hashgrid.encode(params, cfg, _j(x))
        assert _max_diff(out_ref, out_mine) < 1e-6

    def test_hash_function_matches(self):
        ingp = ro.load_file("2d-ingp/model.py", "ref_ingp2d",
                            {"data_loader": {"SingleImageDataModule": object}})
        ref = ingp.INGPTable(resolution=32, table_size=128, n_features=2,
                             pi1=1, pi2=2654435761)
        corners = RNG.integers(0, 33, (64, 4, 2))
        idx_ref = ref.hash(th.from_numpy(corners).to(th.int64)).numpy()
        cfg = hashgrid.HashGridConfig(dim=2, table_size=128)
        idx_mine = np.asarray(hashgrid._level_indices(
            jnp.asarray(corners, jnp.int32), 32, cfg))
        assert (idx_ref == idx_mine).all()


# ======================================================== 9. schedules
class TestScheduleParity:
    def test_le_nice_closed_form(self):
        mi = ro.load_barf("model_interpolation")
        opt = th.optim.Adam([
            {"params": [th.nn.Parameter(th.zeros(1))], "lr": 5e-4},
            {"params": [th.nn.Parameter(th.zeros(1))], "lr": 1e-3},
        ])
        # torch 2.13 dropped LRScheduler's `verbose` kwarg (reference targets
        # torch 2.0); shim it for construction only
        orig_init = th.optim.lr_scheduler.LRScheduler.__init__

        def patched(self, optimizer, last_epoch=-1, verbose=False):
            orig_init(self, optimizer, last_epoch)

        th.optim.lr_scheduler.LRScheduler.__init__ = patched
        try:
            sched = mi.SchedulerLeNice(
                opt, start_LR=[5e-4, 1e-3], stop_LR=[1e-5, 1e-4],
                number_of_steps=[200, 100])
        finally:
            th.optim.lr_scheduler.LRScheduler.__init__ = orig_init

        mine = [schedules.le_nice(5e-4, 1e-5, 200),
                schedules.le_nice(1e-3, 1e-4, 100)]
        for step in [0, 1, 50, 100, 150, 200, 400]:
            sched._step_count = step
            ref_lrs = sched._get_closed_form_lr()
            for g in range(2):
                assert float(mine[g](step)) == pytest.approx(
                    ref_lrs[g], rel=1e-6), (step, g)

    @pytest.mark.parametrize("alpha", [0.0, 1.0, 2.0, 3.0, 6.0])
    def test_barf_sigma_alpha(self, alpha):
        mb = ro.load_barf("model_barf")
        sigma_max = 2.0
        ref = mb.BarfModel.get_sigma_alpha(th.tensor(float(alpha)), sigma_max)
        mine = schedules.barf_sigma_alpha(_j(alpha), sigma_max)
        assert abs(float(ref) - float(mine)) < 1e-6

    @pytest.mark.parametrize("step", [0, 99, 100, 250, 500, 501, 900])
    def test_mip_sigma_schedule(self, step):
        mm = ro.load_barf("model_mip")
        ns = types.SimpleNamespace(
            sigma_decay_start_step=100, sigma_decay_end_step=500,
            start_blur_sigma=2.0, start_pixel_width_sigma=1.0)
        mm.MipBarf.update_sigma_schedule(ns, step)
        mine = schedules.mip_sigma_schedule(step, 100, 500, 2.0, 1.0)
        assert float(ns.sigma_schedule) == pytest.approx(float(mine), abs=1e-6)

        # the derived blur/pixel-width sigmas with the 0.25 floor
        blur_ref = mm.MipBarf.current_blur_sigma.fget(ns)
        pw_ref = mm.MipBarf.current_pixel_width_sigma.fget(ns)
        assert float(blur_ref) == pytest.approx(
            float(schedules.sigma_floor(mine * 2.0)), abs=1e-6)
        assert float(pw_ref) == pytest.approx(
            float(schedules.sigma_floor(mine * 1.0)), abs=1e-6)
