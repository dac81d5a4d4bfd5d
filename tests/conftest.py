"""Test configuration: run JAX on 8 virtual CPU devices with float64.

Golden tests compare against the reference implementation (numpy/scipy, f64),
so tests run on CPU with x64 enabled. Multi-chip sharding is exercised on the
virtual 8-device mesh; the real-TPU path is covered by bench.py and the driver.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The env var alone is not honored when the axon TPU plugin is present;
# the config update reliably forces the CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
