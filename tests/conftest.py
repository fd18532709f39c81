"""Test env: force CPU with 8 virtual devices BEFORE jax import.

Mirrors the reference's distributed-test strategy (SURVEY.md §4): multi-device
logic is exercised on a virtual CPU mesh, the JAX analogue of the reference's
RANK/WORLD_SIZE env fakes (`tests/test_pipeline.py:30-44` in the reference).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("CI", os.environ.get("CI", "0"))

import jax

# The axon TPU plugin force-registers itself regardless of JAX_PLATFORMS env;
# the config update below is what actually pins tests to the (8-device
# virtual) CPU backend.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compilation dominates the suite's wall
# time (single-core machine — pytest-xdist measured SLOWER at -n2 from core
# contention + duplicate jax init, see docs/performance.md). Cache hits cut
# repeat full-suite runs massively; first runs pay ~nothing.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("CFLEARN_TEST_JAX_CACHE", "/root/.cache/cflearn_tpu/jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed() -> None:
    np.random.seed(142857)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
