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

# Persistent compilation cache: the suite is compile-dominated on this
# 1-core host (the two train-step scan tests alone cost ~5 min of CPU XLA
# compiles).  Cold runs populate .jax_cache (gitignored; shared with the
# multichip dryrun); warm reruns replay compiles in seconds.
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.join(_repo, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
