"""Loader validation against a FOREIGN-written Blender scene fixture.

Every scene the repo has ever loaded was written by its own
`data/synthetic.py` generator, so `blender.load` could in principle depend
on private conventions of that writer. This fixture is hand-built to the
conventions of the official Blender-synthetic (nerf_synthetic/lego) format
as used by the reference loader (`/root/reference/barf/dataset.py:264-313`):

- `transforms_<split>.json` with exactly the official keys, in the official
  order: top-level ``camera_angle_x`` + ``frames``; each frame is
  ``{"file_path": "./train/r_3", "rotation": 0.0125, "transform_matrix"}``
  (file_path carries the split-dir prefix and NO extension; ``rotation`` is
  an extra key the loader must ignore — the reference unpacks frames
  positionally at `dataset.py:309-311`, ours by key).
- frames listed in NON-sorted order (real JSONs are ordered r_0, r_1, ...
  r_10 lexicographic-unfriendly; we shuffle outright).
- RGBA PNGs with a transparent background that must composite to WHITE
  (`dataset.py:205-210` alpha_composite semantics).
- c2w matrices in the OpenGL/Blender convention: orthonormal rotation,
  camera looks along its −z axis, scale-1 homogeneous row.
- images at a "native" resolution larger than requested (loader resizes).

If real lego data drops into the image, the only change should be
`--scene_path` — this test is what makes that a zero-code event.
"""
import json
import math
import os

import numpy as np
import pytest

from nerf_experiments_tpu.data import blender

pytestmark = pytest.mark.slow


def _look_at_c2w(pos, up=(0.0, 0.0, 1.0)):
    """Blender-convention c2w: columns [right, up, backward], camera −z is
    the viewing direction (towards the origin here)."""
    pos = np.asarray(pos, np.float64)
    backward = pos / np.linalg.norm(pos)          # camera +z (away from target)
    right = np.cross(np.asarray(up, np.float64), backward)
    right = right / np.linalg.norm(right)
    true_up = np.cross(backward, right)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = backward
    c2w[:3, 3] = pos
    return c2w


@pytest.fixture(scope="module")
def foreign_scene(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("nerf_synthetic_like")
    split_dir = os.path.join(str(root), "train")
    os.makedirs(split_dir)

    rng = np.random.default_rng(7)
    n, native = 5, 64
    frames = []
    c2ws = []
    for i in range(n):
        theta = 2 * math.pi * i / n
        pos = np.array([4.0 * math.cos(theta), 4.0 * math.sin(theta), 2.5])
        c2w = _look_at_c2w(pos)
        c2ws.append(c2w)
        # official layout: split-dir prefix, no extension, extra "rotation"
        frames.append({
            "file_path": f"./train/r_{i}",
            "rotation": 0.012566370614359171,
            "transform_matrix": [list(row) for row in c2w.tolist()],
        })
        # RGBA image: opaque red left half, FULLY TRANSPARENT right half
        img = np.zeros((native, native, 4), np.uint8)
        img[:, : native // 2] = [200, 30, 30, 255]
        Image.fromarray(img, "RGBA").save(os.path.join(split_dir, f"r_{i}.png"))

    order = rng.permutation(n)  # non-sorted frame order, like real JSONs
    payload = {
        "camera_angle_x": 0.6911112070083618,  # the actual lego value
        "frames": [frames[int(j)] for j in order],
    }
    with open(os.path.join(str(root), "transforms_train.json"), "w") as f:
        json.dump(payload, f, indent=4)
    return str(root), np.stack(c2ws)


class TestForeignBlenderScene:
    def test_loads_and_matches_conventions(self, foreign_scene):
        scene, c2ws = foreign_scene
        W = 17  # odd => a pixel sits exactly on the optical axis
        data = blender.load(scene, "train", W, W)

        assert data.n_images == 5
        # focal from camera_angle_x (`dataset.py:303-304` convention)
        focal = W / 2 / math.tan(0.6911112070083618 / 2)
        assert np.isclose(data.focal_length, focal, rtol=1e-6)

        # auto space transform: mean-centered origins, 3x max pairwise scale
        pos = c2ws[:, :3, 3]
        scale = 3.0 * np.linalg.norm(pos[:, None] - pos[None], axis=-1).max()
        expect_origins = (pos - pos.mean(0)) / scale
        np.testing.assert_allclose(data.camera_origins, expect_origins,
                                   atol=1e-6)

        # alpha -> white composite: the transparent half must read pure white
        colors = np.asarray(data.images)
        assert np.allclose(colors[:, :, -1, 0], 1.0, atol=1e-6)
        # opaque half keeps its color
        assert np.allclose(colors[:, :, 0, 0, 0], 200 / 255, atol=0.02)

    def test_center_ray_is_camera_forward(self, foreign_scene):
        scene, c2ws = foreign_scene
        W = 17
        data = blender.load(scene, "train", W, W)
        dirs = np.asarray(data.ray_directions).reshape(5, W, W, 3)
        center = dirs[:, W // 2, W // 2]
        forward = -c2ws[:, :3, 2]  # camera looks along its -z column
        np.testing.assert_allclose(center, forward, atol=1e-6)
        # all rays unit-norm
        assert np.allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)

    def test_shuffled_frames_map_to_right_images(self, foreign_scene):
        scene, c2ws = foreign_scene
        data = blender.load(scene, "train", 9, 9)
        # image i (sorted stem r_i) must carry frame i's camera regardless of
        # the JSON's frame order
        pos = c2ws[:, :3, 3]
        scale = 3.0 * np.linalg.norm(pos[:, None] - pos[None], axis=-1).max()
        for i in range(5):
            np.testing.assert_allclose(
                data.camera_origins[i], (pos[i] - pos.mean(0)) / scale,
                atol=1e-6)

    def test_non_orthogonal_c2w_rejected(self, foreign_scene, tmp_path):
        scene, _ = foreign_scene
        bad_root = tmp_path / "bad_scene"
        os.makedirs(bad_root / "train")
        with open(os.path.join(scene, "transforms_train.json")) as f:
            payload = json.load(f)
        payload["frames"] = payload["frames"][:1]
        payload["frames"][0]["transform_matrix"][0][0] += 0.05  # break R
        with open(bad_root / "transforms_train.json", "w") as f:
            json.dump(payload, f)
        from PIL import Image

        stem = os.path.basename(payload["frames"][0]["file_path"])
        Image.new("RGBA", (8, 8)).save(bad_root / "train" / f"{stem}.png")
        with pytest.raises(ValueError, match="orthogonal"):
            blender.load(str(bad_root), "train", 8, 8)
