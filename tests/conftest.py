"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md section 4): sharding
logic is validated without TPU hardware, and everything is deterministic.
The env vars must be set before jax is imported anywhere.
"""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (the TPU tunnel),
# which would remote-compile every op; tests must be local + deterministic.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU platform and OVERRIDES
# JAX_PLATFORMS at interpreter start; without this config update, "CPU"
# tests silently run through the TPU tunnel (remote-compiling every op).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: first-compile latency dominates test time.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
