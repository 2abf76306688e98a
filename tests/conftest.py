"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the SURVEY §4 plan — multi-device sharding is tested without TPUs via
``xla_force_host_platform_device_count`` (the driver separately dry-runs the
multi-chip path).  The XLA flag must be set before the first backend init;
the platform itself is forced through ``jax.config`` because the environment's
TPU plugin overrides ``JAX_PLATFORMS``.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# REGNET_TEST_TPU=1 runs the suite against the attached accelerator
# instead of the virtual CPU mesh (used for tests/test_pallas_kernels.py).
if os.environ.get("REGNET_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
