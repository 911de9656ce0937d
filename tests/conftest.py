"""Test config: run everything on a virtual 8-device CPU mesh.

The driver environment boots an `axon` TPU-tunnel backend via sitecustomize and
pins ``jax_platforms="axon,cpu"`` before any user code runs, so plain env vars
cannot force CPU — ``jax.config.update`` after import (but before first backend
use) can. Multi-chip sharding tests use the 8 simulated devices; Pallas kernels
run in interpret mode on CPU.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    return devices[:8]
