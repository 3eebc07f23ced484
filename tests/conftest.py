"""Test harness: force CPU with 8 virtual devices (SURVEY.md §4.5).

Must run before jax is imported anywhere — pytest imports conftest first.
The 8-device CPU mesh is the "fake backend" for multi-walker/sharding tests;
the same shard_map code runs unmodified on a real TPU slice.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# hard-set (not setdefault): the container exports JAX_PLATFORMS=axon and
# tests must run on the virtual-device CPU backend regardless.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The axon PJRT plugin force-registers itself ("axon,cpu") and overrides the
# env var, so pin the platform again post-import.  Verified: env-only is NOT
# enough in this container.
jax.config.update("jax_platforms", "cpu")

# Compile-cache policy (utils/cache.py): persistent cache DISABLED on
# cpu — reloading cached 8-virtual-device CPU executables segfaults
# (XLA:CPU AOT round-trip bug, observed round 3 in
# test_cli_walkers_times_spatial: cold compile passes, warm reload
# SIGSEGVs), and cross-host entries are poison outright.  The suite is
# trace-bound, so fresh compiles cost little.
from metadyn_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
