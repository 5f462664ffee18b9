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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
