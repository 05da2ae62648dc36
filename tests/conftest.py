"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

Note: this environment's sitecustomize registers a remote 'axon' TPU backend
and pins JAX_PLATFORMS=axon; plain env-var overrides are not enough, so we
also update jax.config after import (which wins over the env pin).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
