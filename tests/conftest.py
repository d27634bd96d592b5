"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4.7: multi-chip sharding is validated without a pod by
forcing the host platform and a virtual device count. Must run before jax
is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-appends the TPU platform to jax_platforms, so
# the env var alone is not enough: override via jax.config before backends
# initialize.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    """Fixed-seed RNG ≙ the reference's mt19937_64 rnd(10000)
    (source.cpp:2944 etc.)."""
    return np.random.default_rng(10000)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    The full suite accumulates hundreds of live XLA:CPU executables and
    interpret-mode traces; past ~70 tests the process occasionally
    segfaults inside the heaviest banded interpret tests (reproduced
    twice, different tests, never file-alone — environmental, not a
    specific test). Clearing per module keeps the suite stable and costs
    one recompile set per file.
    """
    yield
    jax.clear_caches()
