"""Test configuration: run JAX on CPU with 8 virtual devices (so
multi-device Parareal sharding is exercised without a TPU pod) and enable
float64 so numerical oracles can be checked at reference precision."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
