"""Native C++ data kernels vs the numpy reference implementations."""
import numpy as np
import pytest

from nerf_experiments_tpu.data import native

pytestmark = [pytest.mark.slow, pytest.mark.skipif(not native.available(), reason="no C++ toolchain")]


class TestComputeRays:
    def test_matches_numpy_loader(self):
        import jax.numpy as jnp

        from nerf_experiments_tpu.ops import rays as rays_ops

        rng = np.random.default_rng(0)
        # random orthonormal c2w matrices
        from nerf_experiments_tpu.ops.lie import so3_exp

        n, h, w, focal = 3, 16, 20, 25.0
        R = np.asarray(so3_exp(jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)))
        c2w = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
        c2w[:, :3, :3] = R
        c2w[:, :3, 3] = rng.normal(size=(n, 3)).astype(np.float32)

        origs_c, dirs_c = native.compute_rays(c2w, h, w, focal)

        mesh = np.asarray(rays_ops.directions_meshgrid(h, w, focal))
        origs_ref, dirs_ref = rays_ops.rays_from_c2w(jnp.asarray(mesh), jnp.asarray(c2w))
        np.testing.assert_allclose(origs_c, np.asarray(origs_ref), atol=1e-6)
        np.testing.assert_allclose(dirs_c, np.asarray(dirs_ref), atol=1e-5)


class TestBlurPyramid:
    def test_identity_below_min_sigma(self):
        img = np.random.default_rng(1).random((1, 8, 9, 3)).astype(np.float32)
        out = native.blur_pyramid(img, [0.0])
        np.testing.assert_allclose(out[:, :, :, 0, :], img, atol=1e-7)

    def test_blur_vs_scipy_style_reference(self):
        rng = np.random.default_rng(2)
        img = rng.random((1, 24, 24, 3)).astype(np.float32)
        sigma = 2.0
        out = native.blur_pyramid(img, [sigma])[0, :, :, 0, :]

        # numpy separable reference with clamp-to-edge
        radius = int(np.ceil(3 * sigma))
        k = np.exp(-np.arange(-radius, radius + 1) ** 2 / (2 * sigma**2))
        k /= k.sum()
        padded = np.pad(img[0], ((radius, radius), (radius, radius), (0, 0)), mode="edge")
        tmp = np.zeros_like(padded)
        for i in range(2 * radius + 1):
            tmp[:, radius:-radius or None] += (
                k[i] * padded[:, i : i + img.shape[2]]
            )
        ref = np.zeros_like(img[0])
        for i in range(2 * radius + 1):
            ref += k[i] * tmp[i : i + img.shape[1], radius:-radius or None]
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_blur_preserves_mean_roughly(self):
        img = np.random.default_rng(3).random((2, 32, 32, 3)).astype(np.float32)
        out = native.blur_pyramid(img, [4.0, 1.0, 0.0])
        assert out.shape == (2, 32, 32, 3, 3)
        np.testing.assert_allclose(out.mean(), img.mean(), atol=0.01)
        # stronger blur -> lower variance
        assert out[..., 0, :].var() < out[..., 2, :].var()


class TestPoseNoise:
    def test_matches_numpy(self):
        import jax.numpy as jnp

        from nerf_experiments_tpu.ops.lie import so3_exp

        rng = np.random.default_rng(4)
        n, hw = 3, 50
        origs = rng.normal(size=(n, hw, 3)).astype(np.float32)
        dirs = rng.normal(size=(n, hw, 3)).astype(np.float32)
        rot = np.asarray(so3_exp(jnp.asarray(rng.normal(size=(n, 3)) * 0.2, jnp.float32)))
        trans = rng.normal(size=(n, 3)).astype(np.float32)

        oo, od = native.apply_pose_noise(origs, dirs, rot, trans)
        np.testing.assert_allclose(oo, origs + trans[:, None], atol=1e-6)
        ref_d = np.einsum("nij,npj->npi", rot, dirs)
        np.testing.assert_allclose(od, ref_d, atol=1e-5)
