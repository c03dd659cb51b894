"""Test config: force an 8-device CPU platform before JAX backends init.

The container's sitecustomize registers the 'axon' TPU plugin and pins
``JAX_PLATFORMS=axon`` at interpreter boot, so plain env vars are not
enough — we override via ``jax.config`` before the first backend lookup.

Mesh/sharding tests exercise the data-parallel path on 8 virtual CPU
devices (SURVEY.md §4); numerics tests are platform-independent.
"""

import os

# AVSEP_TEST_PLATFORM=axon runs the suite against the real chip (used to
# calibrate slow learning tests at hardware speed); default is the
# 8-virtual-device CPU mesh.
_platform = os.environ.get("AVSEP_TEST_PLATFORM", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = _platform
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: torch-parity / CLI / long-compile tests. Fast tier: "
        "pytest -m 'not slow' (<~4 min); full suite ~15 min.")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
