"""Test config: force an 8-virtual-device CPU platform so multi-chip sharding
paths are exercised without TPU hardware.

NOTE the environment's 'axon' TPU plugin ignores the JAX_PLATFORMS env var,
so we must use jax.config.update after import. XLA_FLAGS must still be set
before the backend initializes to get 8 virtual CPU devices.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 tests everywhere; TPU bf16 matmul passes are opted into explicitly via
# compute_dtype in the models, never silently.
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: the suite is compile-dominated on this 1-core
# box; repeat runs (the inner-loop/CI case) hit the cache and run ~2x faster.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("NETPU_TEST_CACHE", "/tmp/netpu_jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two lanes: anything not explicitly marked slow is the fast lane, so
    `pytest -m fast` is the <2-min inner-loop/CI command and
    `pytest -m slow` (or plain `pytest`) covers the rest."""
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.fast)
