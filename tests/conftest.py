"""Test configuration: run on a virtual 8-device CPU mesh with fp64.

The session environment pins JAX at a tunneled TPU (JAX_PLATFORMS=axon via
sitecustomize); unit tests must run on local CPU devices, so we override
through jax.config after import (env vars alone are not enough here).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
