"""Test configuration: force pure-CPU JAX with an 8-device virtual mesh so
sharding paths are exercised without TPU hardware (task spec / SURVEY.md §7
step 8).

Note: the environment's sitecustomize force-registers the axon TPU platform at
interpreter startup (jax_platforms="axon,cpu"), so setting JAX_PLATFORMS in the
env is not enough — we must override jax.config before any backend is used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # opt level 0: the limb-arithmetic graphs take minutes to optimize on CPU
    # and tests only need correctness; TPU benches use the default level.
    os.environ["XLA_FLAGS"] = (
        flags
        + " --xla_force_host_platform_device_count=8"
        + " --xla_backend_optimization_level=0"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are expensive to
# compile on CPU; cache them across test runs.  The directory is keyed on the
# host CPU (see __graft_entry__._host_cache_dir): XLA:CPU AOT entries embed
# ISA features and segfault if loaded on a different machine.
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _host_cache_dir

_cache = _host_cache_dir()
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import random

import numpy as np
import pytest


@pytest.fixture
def rng():
    """Deterministic RNG: the reference uses OsRng with no fixed seeds
    (SURVEY.md §4), so vectors are regenerated from this seeded harness."""
    return random.Random(0xEA6E4)


@pytest.fixture
def nprng():
    return np.random.default_rng(0xEA6E4)
