"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` per the project build rules.
Must run before jax initializes its backends, hence the env mutation at
import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon harness pins JAX_PLATFORMS=axon via sitecustomize, overriding the
# env var above — force CPU through the config API, which wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: most of the suite's wall time is jit
# compiles of the same tracker/mapmaker programs across test modules.
# The directory is keyed by a host-CPU fingerprint: /root is a volume
# that can move between machines, and XLA:CPU loading an AOT result
# compiled for another machine's feature set segfaults (observed:
# "+prefer-no-gather is not supported on the host machine ... SIGILL",
# then a hard crash mid-suite).
from mcptam_tpu.hostcache import enable_cpu_cache  # noqa: E402

enable_cpu_cache(jax)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_executables_between_modules():
    """XLA:CPU segfaults inside backend_compile when hundreds of compiled
    executables from earlier test modules are still live in the process
    (observed twice on the full suite, each time at the first big compile
    past ~40 modules; the same compiles pass in a fresh process).
    Dropping the in-memory jit caches between modules keeps the compiler
    healthy; the persistent disk cache makes the re-compiles cheap."""
    yield
    jax.clear_caches()


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
