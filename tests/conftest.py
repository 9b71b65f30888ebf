"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests validate the multi-chip path without TPU hardware.

Note: this environment pins JAX_PLATFORMS=axon (the TPU tunnel) and the
plugin wins over the env var, so the override must go through jax.config
before any backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
