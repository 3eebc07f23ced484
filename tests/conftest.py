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
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
