"""Conv-blur-with-decay dataset variant (PARITY 1b): the on-device separable
blur must match direct 2-D convolution with reflect padding — the reference's
at-fetch-time per-pixel blur (`gaborf/dataset.py:324-440`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_experiments_tpu.ops.image_blur import (
    ConvBlurTargets,
    gaussian_kernel,
    separable_gaussian_blur,
)


def _reference_kernel(kernel_size, relative_sigma, max_side):
    """Literal `_get_gaussian_blur_kernel:324-340` in numpy."""
    if relative_sigma <= np.finfo(float).eps:
        k = np.zeros(kernel_size)
        k[kernel_size // 2] = 1
        return k
    x = np.linspace(-kernel_size / 2, kernel_size / 2, kernel_size)
    k = np.exp(-(x ** 2) / (2 * (relative_sigma * max_side) ** 2))
    return k / k.sum()


def _direct_blur(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Brute-force 2-D separable convolution with reflect padding."""
    k = len(kernel)
    half = k // 2
    padded = np.pad(img, ((half, half), (half, half), (0, 0)), mode="reflect")
    h, w, _ = img.shape
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            acc = np.zeros(3)
            for j in range(k):
                row = np.zeros(3)
                for i in range(k):
                    row += kernel[i] * padded[y + j, x + i]
                acc += kernel[j] * row
            out[y, x] = acc
    return out


def test_kernel_matches_reference_formula():
    for sigma in (0.0, 0.01, 0.05):
        ours = np.asarray(gaussian_kernel(21, jnp.asarray(sigma), 32))
        ref = _reference_kernel(21, sigma, 32)
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-7)


def test_blur_matches_direct_convolution_interior_sigma():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    sigma, ksize, max_side = 0.08, 9, 16
    kernel = _reference_kernel(ksize, sigma, max_side)
    ref = _direct_blur(img, kernel)
    ours = np.asarray(separable_gaussian_blur(
        jnp.asarray(img)[None], gaussian_kernel(ksize, jnp.asarray(sigma), max_side)
    ))[0]
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_dirac_sigma_is_identity():
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(2, 12, 12, 3)).astype(np.float32)
    out = separable_gaussian_blur(
        jnp.asarray(img), gaussian_kernel(9, jnp.asarray(0.0), 12))
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)


def test_sigma_decays_and_targets_update():
    rng = np.random.default_rng(2)
    images = rng.uniform(size=(2, 8, 8, 3)).astype(np.float32)
    cb = ConvBlurTargets(images, kernel_size=5, relative_sigma_start=0.2,
                         relative_sigma_decay=0.5, epoch_fraction_period=0.1)

    swaps = []

    class FakeTrainer:
        def swap_train_colors(self, colors):
            swaps.append(np.asarray(colors))

    tr = FakeTrainer()
    cb(tr, None, 1, 0.05)   # before milestone: no swap
    assert not swaps
    cb(tr, None, 2, 0.11)   # first milestone: decay + swap
    assert len(swaps) == 1 and abs(cb.sigma - 0.1) < 1e-12
    cb(tr, None, 3, 0.35)   # catches up across two missed milestones
    assert len(swaps) == 2 and abs(cb.sigma - 0.025) < 1e-12
    # less blur => closer to the raw images
    raw = images.reshape(-1, 3)
    d1 = np.abs(swaps[0][:, -1] - raw).mean()
    d2 = np.abs(swaps[1][:, -1] - raw).mean()
    assert d2 < d1


@pytest.mark.slow
def test_garf_cli_conv_blur_trains(tmp_path):
    import json
    import os

    from nerf_experiments_tpu.data import synthetic
    from nerf_experiments_tpu.experiments import garf_main

    scene = str(tmp_path / "scene")
    synthetic.generate_dataset(scene, n_train=3, n_val=2, n_test=2,
                               image_size=16, n_samples=24)
    out = str(tmp_path / "run")
    args = garf_main.parse_args([
        "--activation", "gabor",
        "--scene_path", scene, "--image_size", "16",
        "--batch_size", "64", "--max_steps", "30",
        "--proposal_samples_per_ray", "8", "--radiance_samples_per_ray", "16",
        "--conv_blur", "--blur_kernel_size", "9",
        "--blur_relative_sigma_start", "0.1",
        "--blur_relative_sigma_decay", "0.9",
        "--out_dir", out,
    ])
    cfg, state, trainer = garf_main.build(args)
    state = trainer.fit(state)
    assert int(state.step) == 30
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    losses = [r["loss"] for r in rows if "loss" in r]
    assert losses and all(np.isfinite(l) for l in losses)
