"""Test configuration: run JAX on CPU with 8 virtual devices (so
multi-device Parareal sharding is exercised without a TPU pod) and enable
float64 so numerical oracles can be checked at reference precision.

Plugins may import jax before this conftest runs, so environment
variables are too late; the config updates below work as long as no
backend has been initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
