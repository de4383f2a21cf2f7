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
# Persistent compilation cache (same mechanism bench.py uses): repeat
# runs — and the recompiles forced by the per-module cache clearing
# below — load compiled binaries instead of re-running XLA. This is
# half of keeping the ONE-SHOT `pytest tests/` run near the sum of its
# per-module times (VERDICT r04 weak 5: a single invocation degraded
# >3x vs three separate processes from per-process accumulation).
_cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache_cpu")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test")


@pytest.fixture(autouse=True, scope="module")
def _free_jit_caches_between_modules():
    """Drop the in-process jit/trace caches after each test module: the
    executables and trace artifacts of ~30 jitted programs per e2e
    module otherwise accumulate across the whole session (the other
    half of VERDICT r04 weak 5 — the one-shot run's slowdown grows with
    modules already executed). Recompiles in later modules hit the
    persistent cache above."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
