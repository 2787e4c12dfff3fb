"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding is validated on a fake CPU mesh
(``xla_force_host_platform_device_count=8``), per SURVEY.md section 4.  This
must run before jax initializes its backends, hence the env mutation at
import time.
"""

import os

# The session environment pins JAX_PLATFORMS to the tunneled TPU backend;
# tests must run hermetically on a virtual 8-device CPU platform, so override
# unconditionally (and again via jax.config, which wins over plugins).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the heavy tests (tiny-model fit/ensemble/eval
# programs) are compile-bound on CPU; repeat suite runs hit the cache.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_cpu_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
