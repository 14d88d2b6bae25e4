"""Test environment: force the CPU backend with 8 virtual devices (so
sharding tests run without TPU hardware) and enable float64 (validation
tolerances are fp64-calibrated).

Note: this machine's site hook pins jax_platforms to "axon,cpu" (TPU via
tunnel), so JAX_PLATFORMS alone is not enough — override jax.config before
the backend initialises."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
