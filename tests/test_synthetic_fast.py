"""Device-accelerated scene generator parity vs the numpy oracle.

The fast path (data/synthetic_fast.py) is a JAX port of
synthetic.render_image; validate() is the oracle check the generator runs
before writing any dataset. On CPU fp32 it measures 98.8% of pixels within
1/255 of the fp64 numpy render (hard-edge boundary pixels account for the
rest); any convention bug (transpose, flip, wrong camera axis) drops
agreement below 50%.
"""
import json
import os

import numpy as np

from nerf_experiments_tpu.data import synthetic, synthetic_fast


def test_validate_against_numpy_oracle():
    frac_same, mean_err = synthetic_fast.validate(size=64, n_samples=64)
    assert frac_same >= 0.98
    assert mean_err < 1e-3


def test_generate_dataset_fast_layout(tmp_path):
    out = str(tmp_path / "scene")
    synthetic_fast.generate_dataset(out, n_train=3, n_val=1, n_test=1,
                                    image_size=32, n_samples=32)
    # identical layout to the slow path: per-split transforms + RGBA PNGs
    for split, n in (("train", 3), ("val", 1), ("test", 1)):
        with open(os.path.join(out, f"transforms_{split}.json")) as f:
            t = json.load(f)
        assert len(t["frames"]) == n
        assert abs(t["camera_angle_x"] - synthetic.CAMERA_ANGLE_X) < 1e-9
    # monkeypatch is reverted after generation
    assert synthetic.render_image.__module__ == "nerf_experiments_tpu.data.synthetic"


def test_poses_match_slow_path(tmp_path):
    """Same seed => byte-identical transforms JSON from both paths."""
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    synthetic.generate_dataset(a, n_train=2, n_val=1, n_test=1,
                               image_size=16, n_samples=16)
    synthetic_fast.generate_dataset(b, n_train=2, n_val=1, n_test=1,
                                    image_size=16, n_samples=16)
    for split in ("train", "val", "test"):
        ta = open(os.path.join(a, f"transforms_{split}.json")).read()
        tb = open(os.path.join(b, f"transforms_{split}.json")).read()
        assert ta == tb
        # and the rendered images agree perceptually
    import PIL.Image
    for split in ("train", "val", "test"):
        for name in os.listdir(os.path.join(a, split)):
            ia = np.asarray(PIL.Image.open(os.path.join(a, split, name)),
                            dtype=np.float32) / 255.0
            ib = np.asarray(PIL.Image.open(os.path.join(b, split, name)),
                            dtype=np.float32) / 255.0
            d = np.abs(ia - ib).max(axis=-1)
            assert (d <= 2.0 / 255.0).mean() >= 0.97
