"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The container's sitecustomize force-registers the axon TPU backend and
sets JAX_PLATFORMS=axon before any conftest runs, so an env-var
override alone is not enough — we also flip the jax config after import
(SURVEY.md section 4: multi-device tests via
xla_force_host_platform_device_count). Tests must never touch the real
TPU: the chip serializes clients, so a test run would block benches.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
