"""Test configuration: run everything on a virtual 8-device CPU mesh so
sharding is exercised without TPU hardware.

Note: this environment's 'axon' TPU plugin ignores the JAX_PLATFORMS env
var, so the platform must be forced through jax.config before any backend
initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA:CPU's in-process collective rendezvous ABORTS the process when a
    # participant is >30 s late (AwaitAndLogIfStuck).  On this 1-core host a
    # concurrent compile can starve a device thread for minutes — raise the
    # terminate deadline so oversubscription shows up as slowness, not a
    # `Fatal Python error: Aborted` flake.
    flags += (
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
        " --xla_cpu_collective_timeout_seconds=1800"
    )
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
