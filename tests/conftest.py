"""Test harness: force an 8-virtual-device CPU JAX platform.

Multi-chip sharding logic is exercised on a fake device mesh (SURVEY.md §4's
test strategy): `xla_force_host_platform_device_count=8` gives every test
eight CPU "chips" so pjit/shard_map paths compile and run without TPU
hardware. Must run before jax is imported anywhere.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
