"""Test configuration: force a virtual 8-device CPU platform so pjit/sharding
tests exercise real collectives without TPU hardware (SURVEY.md §4c)."""

import os
import sys

# jax may already be imported at interpreter startup (axon platform preload),
# so plain env vars are too late; flip the backend through jax.config before
# anything touches it.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
