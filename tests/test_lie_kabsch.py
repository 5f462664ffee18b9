import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.ops import lie
from nerf_experiments_tpu.ops.kabsch import kabsch, apply_similarity
from nerf_experiments_tpu.ops.metrics import psnr, pose_error


def _matrix_exp_series(A, terms=30):
    out = np.eye(3)
    term = np.eye(3)
    for i in range(1, terms):
        term = term @ A / i
        out = out + term
    return out


class TestSO3:
    def test_matches_matrix_exponential(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(16, 3)).astype(np.float32)
        R = np.asarray(lie.so3_exp(jnp.asarray(w)))
        for i in range(16):
            expected = _matrix_exp_series(np.asarray(lie.hat(jnp.asarray(w[i]))).astype(np.float64))
            np.testing.assert_allclose(R[i], expected, atol=5e-4)

    def test_orthogonal_det_one(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
        R = lie.so3_exp(w)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(np.asarray(eye), np.eye(3)[None].repeat(32, 0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)

    def test_zero_rotation_and_gradients_at_zero(self):
        R = lie.so3_exp(jnp.zeros((1, 3)))
        np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-7)
        # gradient through the Taylor branch must be finite
        g = jax.grad(lambda w: jnp.sum(lie.so3_exp(w)))(jnp.zeros((1, 3)))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_log_inverts_exp(self):
        w = jax.random.normal(jax.random.PRNGKey(2), (16, 3)) * 0.8
        w_back = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(np.asarray(w_back), np.asarray(w), atol=5e-3)

    def test_reference_fixture(self):
        # `barf/dataset.py:494-498` documents so3_to_SO3([23, 11, 31]) ≈ this matrix
        R = np.asarray(lie.so3_exp(jnp.array([23.0, 11.0, 31.0])))
        expected = np.array(
            [
                [-0.1838, -0.2228, 0.9574],
                [0.7764, -0.6302, 0.0024],
                [0.6028, 0.7438, 0.2888],
            ]
        )
        np.testing.assert_allclose(R, expected, atol=2e-3)

    def test_se3_exp_zero(self):
        T = lie.se3_exp(jnp.zeros(6))
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-7)


class TestKabsch:
    def _random_cloud(self, key, n=40):
        return jax.random.normal(key, (n, 3)) * 2.0

    def test_recovers_known_transform(self):
        # The reference's own test hook semantics (`barf/dataset.py:484-511`)
        key = jax.random.PRNGKey(3)
        pts = self._random_cloud(key)
        R_true = lie.so3_exp(jnp.array([0.3, -1.2, 0.7]))
        t_true = jnp.array([[7.0, 2.0, -11.0]])
        c_true = 3.6
        target = apply_similarity(R_true, t_true, c_true, pts)
        R, t, c = kabsch(pts, target, remove_outliers=False)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-3)
        np.testing.assert_allclose(float(c), c_true, atol=1e-4)

    def test_outlier_rejection(self):
        key = jax.random.PRNGKey(4)
        pts = self._random_cloud(key, n=50)
        R_true = lie.so3_exp(jnp.array([0.1, 0.5, -0.3]))
        t_true = jnp.array([[1.0, -2.0, 0.5]])
        target = apply_similarity(R_true, t_true, 1.7, pts)
        # Corrupt 8% of the targets badly
        target = target.at[:4].add(50.0)
        R, t, c = kabsch(pts, target, remove_outliers=True)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_true), atol=5e-3)
        np.testing.assert_allclose(float(c), 1.7, atol=5e-3)

    def test_jit_compatible(self):
        key = jax.random.PRNGKey(5)
        pts = self._random_cloud(key)
        f = jax.jit(lambda a, b: kabsch(a, b, remove_outliers=True))
        R, t, c = f(pts, pts + 1.0)
        assert np.isfinite(np.asarray(R)).all()
        np.testing.assert_allclose(float(c), 1.0, atol=1e-5)


class TestMetrics:
    def test_psnr(self):
        assert abs(float(psnr(jnp.asarray(0.01))) - 20.0) < 1e-3
        assert np.isnan(float(psnr(jnp.asarray(1e-9))))

    def test_pose_error_invariant_to_gauge(self):
        # pose error must be invariant under rigid+scale transforms of the
        # predicted origins (the commented-out reference test, model_mip.py:306-375)
        key = jax.random.PRNGKey(6)
        raw = jax.random.normal(key, (30, 3))
        pred = raw + jax.random.normal(jax.random.PRNGKey(7), (30, 3)) * 0.05
        e0 = float(pose_error(raw, pred))
        R = lie.so3_exp(jnp.array([1.0, 2.0, 3.0]))
        pred2 = apply_similarity(R, jnp.array([[5.0, -1.0, 2.0]]), 2.3, pred)
        e1 = float(pose_error(raw, pred2))
        assert abs(e0 - e1) < 1e-3
        assert e0 < 0.1


class TestRayConventions:
    """Direct tests of ops/rays.py (conventions from barf/dataset.py)."""

    def test_center_pixel_looks_down_minus_z(self):
        from nerf_experiments_tpu.ops import rays as R

        H = W = 11  # odd => exact center pixel
        mesh = np.asarray(R.directions_meshgrid(H, W, focal=20.0))
        center = mesh[(H // 2) * W + W // 2]
        np.testing.assert_allclose(center, [0, 0, -1], atol=1e-6)
        # row-major: pixel (0, 0) is top-left => +y (flipped), -x
        tl = mesh[0]
        assert tl[0] < 0 and tl[1] > 0
        np.testing.assert_allclose(np.linalg.norm(mesh, axis=-1), 1.0, atol=1e-6)

    def test_space_transform_auto_params(self):
        from nerf_experiments_tpu.ops import rays as R

        pos = jnp.array([[0.0, 0, 0], [2.0, 0, 0], [0, 1.0, 0]])
        scale, translate = R.space_transform_params(pos)
        # 3 * max pairwise distance; mean translate
        np.testing.assert_allclose(float(scale), 3 * np.sqrt(5), atol=1e-5)
        np.testing.assert_allclose(np.asarray(translate), pos.mean(axis=0), atol=1e-6)

    def test_transform_c2w_only_translation_column(self):
        from nerf_experiments_tpu.ops import rays as R

        c2w = jnp.eye(4)[None].at[0, :3, 3].set(jnp.array([2.0, 4.0, 6.0]))
        out = R.transform_c2w(c2w, jnp.asarray(2.0), jnp.array([1.0, 1.0, 1.0]))
        np.testing.assert_allclose(np.asarray(out[0, :3, 3]), [0.5, 1.5, 2.5], atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[0, :3, :3]), np.eye(3), atol=1e-7)

    def test_pose_noise_conventions(self):
        # translation only moves origins; rotation only turns directions
        from nerf_experiments_tpu.ops import rays as R

        key = jax.random.PRNGKey(0)
        cam_o = jax.random.normal(key, (4, 3))
        cam_d = jax.random.normal(jax.random.PRNGKey(1), (4, 3))
        ray_o = jnp.repeat(cam_o[:, None], 5, axis=1)
        ray_d = jnp.repeat(cam_d[:, None], 5, axis=1)
        co, cd, ro, rd = R.apply_pose_noise(
            jax.random.PRNGKey(2), cam_o, cam_d, ray_o, ray_d,
            rotation_noise_sigma=0.2, translation_noise_sigma=0.1,
        )
        # origins shifted by a per-camera constant
        shift = np.asarray(ro - ray_o)
        np.testing.assert_allclose(
            shift, np.broadcast_to(shift[:, :1], shift.shape), atol=1e-6
        )
        # directions keep their norms (pure rotation)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(rd), axis=-1),
                                   np.linalg.norm(np.asarray(ray_d), axis=-1), atol=1e-5)
        # camera-level and ray-level noises agree
        np.testing.assert_allclose(np.asarray(co), np.asarray(ro[:, 0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(cd), np.asarray(rd[:, 0]), atol=1e-6)
