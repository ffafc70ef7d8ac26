"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
initialises, so sharding/mesh tests run without TPU hardware (SURVEY.md
section 4: multi-node testing strategy)."""

import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
