"""Test harness configuration.

Tests run on the CPU backend with 8 fake host devices so that the
multi-chip sharding paths (pjit/shard_map over a Mesh) are exercised
without TPU hardware, per SURVEY.md §4 (d).  x64 is enabled: parity
tests against the reference's float64 artifacts need double precision.
"""

import os

# Must be set before the first jax import anywhere in the test session.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache: the Haar/e2e tests recompile dozens of
# per-shape programs; caching them across test sessions cuts minutes.
jax.config.update("jax_compilation_cache_dir", "/tmp/fdrp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_root():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    return REFERENCE


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a shared stream makes one test's draws
    # depend on which tests ran before it (ordering coupling bit us --
    # adding tests shifted test_multistream's planted-face noise).
    return np.random.default_rng(1234)
