"""Test configuration: force CPU with 8 virtual devices so sharding and
multi-chip code paths are testable without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox's sitecustomize registers the TPU backend at interpreter start
# and pins jax_platforms; override back to CPU before any backend init.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the fast suite is dominated by XLA-CPU
# compiles of the U-Net / sharded-train-step programs (~120 s); caching
# them across runs keeps repeat runs well under the CI budget.
jax.config.update("jax_compilation_cache_dir", "/tmp/deqsci_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
