"""bench.py must produce one valid JSON line with every config populated —
a config-construction bug here would otherwise surface only in the driver's
TPU run."""
import json
import os

import pytest

pytestmark = pytest.mark.slow


def test_bench_main_all_configs(capsys, monkeypatch):
    monkeypatch.setenv("BENCH_BATCH", "64")
    monkeypatch.setenv("BENCH_SAMPLES", "8")
    monkeypatch.setenv("BENCH_STEPS", "2")
    monkeypatch.setenv("BENCH_DTYPE", "fp32")
    monkeypatch.setenv("BENCH_INGP_BATCH", "64")

    import bench

    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"bench must print exactly ONE line, got {out}"
    row = json.loads(out[0])
    assert row["metric"] == "nerf_train_rays_per_sec_1chip"
    assert row["value"] > 0 and row["unit"] == "rays/s"
    d = row["detail"]
    for name in ("dense_barf", "fused_step", "proposal_barf", "mip", "garf",
                 "ingp", "ingp_matmul"):
        assert name in d, f"missing config {name}"
        assert "error" not in d[name], f"{name} failed: {d[name]}"
        assert d[name]["rays_per_sec"] > 0
    assert d["render_rays_per_sec"] > 0
    assert d["headline_path"] in (
        "xla_dense", "fused_step", "north_star_S32", "north_star_occ_S32",
        "north_star_S32_blk4", "north_star_occ_S32_blk4")
