"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding is exercised without TPU hardware.

Note: this environment's 'axon' TPU plugin ignores the JAX_PLATFORMS env
var, so the platform must be forced through jax.config before any backend
initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
