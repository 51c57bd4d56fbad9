"""Test harness: force an 8-device virtual CPU mesh before jax is imported.

This is the standard "multi-chip without a cluster" substitute (SURVEY.md §4):
all sharding/pjit tests run against 8 virtual CPU devices so the exact same
mesh code compiles on real TPU slices.
"""

import os

# Force CPU even if the session environment pins another platform. NOTE: the
# JAX_PLATFORMS env var alone is NOT sufficient under the axon TPU plugin
# (it still registers the TPU); jax.config.update must be used as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# Numerics-parity tests compare against f64/torch goldens; keep matmuls f32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on the virtual CPU mesh"


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
