"""Test configuration: force an 8-device virtual CPU platform so sharding
tests run without TPU hardware, per the multi-device JAX testing recipe.

Note: this environment registers a TPU PJRT plugin via sitecustomize before
conftest runs and pins ``jax_platforms`` programmatically, so the usual
JAX_PLATFORMS env var is not enough — we must set the XLA flag before the
first jax import *and* override the platform config after import.
"""

import os

# Must be set before jax is imported anywhere.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
