"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/halo-exchange paths can
be exercised without TPU hardware (SURVEY.md section 4, item 4).  Must set
env before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize imports jax and registers the TPU backend at
# interpreter startup, so the env var alone is latched too late — override
# through the config API before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
