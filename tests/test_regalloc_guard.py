"""The centralized libtpu-regalloc crash guard (utils/regalloc.py): every
entry CLI routes its batch through safe_batch_size, so no default-flag
invocation reaches a known-crashing (path, batch, resolution) combo."""
import warnings

import pytest

from nerf_experiments_tpu.utils import regalloc


def test_dense_path_caps_above_1m_samples():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        b, reason = regalloc.safe_batch_size(
            8192, samples_per_ray=128, fused=False)
    assert b == 4096 and reason is not None
    assert b * 128 < regalloc.MAX_SAMPLES_PER_PROGRAM


def test_dense_path_keeps_safe_batches():
    b, reason = regalloc.safe_batch_size(4096, samples_per_ray=128, fused=False)
    assert b == 4096 and reason is None
    b, reason = regalloc.safe_batch_size(1024, samples_per_ray=256, fused=False)
    assert b == 1024 and reason is None


def test_fused_path_allows_large_batch_at_low_res():
    b, reason = regalloc.safe_batch_size(
        8192, samples_per_ray=128, fused=True, image_size=256, n_images=24)
    assert b == 8192 and reason is None


def test_fused_path_caps_at_high_res():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        b, reason = regalloc.safe_batch_size(
            8192, samples_per_ray=128, fused=True, image_size=400, n_images=24)
    assert b == 4096 and reason is not None


def test_bypass_env(monkeypatch):
    monkeypatch.setenv("NETPU_NO_REGALLOC_GUARD", "1")
    b, reason = regalloc.safe_batch_size(8192, samples_per_ray=128, fused=False)
    assert b == 8192 and reason is None


def test_render_chunk_cap():
    assert regalloc.safe_render_chunk(8192, 128) == 4096
    assert regalloc.safe_render_chunk(4096, 128) == 4096
    assert regalloc.safe_render_chunk(4096, 256) == 2048


@pytest.mark.slow
def test_builder_routes_through_guard(tmp_path, monkeypatch):
    """build_barf_experiment caps an unsafe XLA-dense batch (the end-to-end
    wiring, not just the pure function)."""
    from nerf_experiments_tpu.data import synthetic
    from nerf_experiments_tpu.experiments import run_barf

    scene = tmp_path / "scene"
    synthetic.generate_dataset(str(scene), n_train=3, n_val=1, n_test=1,
                               image_size=16, n_samples=16)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        exp = run_barf.build(run_barf.parse_args([
            "--scene_path", str(scene), "--image_size", "16",
            "--batch_size", "8192", "--max_steps", "1",
            "--samples_per_ray", "128", "--samples_per_ray_proposal", "0",
            "--out_dir", str(tmp_path / "out"),
        ]))
    assert exp.trainer.cfg.batch_size == 4096
