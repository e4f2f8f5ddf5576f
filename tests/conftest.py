"""Test harness: force an 8-virtual-device CPU JAX platform.

Multi-chip sharding logic is exercised on a fake device mesh (SURVEY.md §4's
test strategy): `xla_force_host_platform_device_count=8` gives every test
eight CPU "chips" so pjit/shard_map paths compile and run without TPU
hardware.

Note: this machine's sitecustomize registers the remote `axon` TPU backend
and pins JAX_PLATFORMS=axon at interpreter startup, so the env var cannot
be overridden from here — `jax.config.update("jax_platforms", "cpu")`
after import is what actually selects CPU (it must run before any backend
is initialized, hence this conftest does it at collection time).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The rare full-suite SIGABRT (ARCHITECTURE.md "Suite-stability
# campaign") is XLA:CPU's in-process collective rendezvous FATAL-ing
# when the 8 virtual devices' all-gather participants starve on this
# 2-core host (symbolized round 3: AllGatherThunk::Execute →
# InProcessCommunicator::AllGather → AwaitAndLogIfStuck → abort). The
# starvation is transient scheduling, not deadlock — raise the
# terminate timeout so slow rendezvous waits instead of killing the
# interpreter.
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=60"
        # the communicator-level rendezvous (the symbolized abort path)
        # reads its own timeout knob
        " --xla_cpu_collective_timeout_seconds=600"
    )
os.environ.setdefault("JAX_ENABLE_X64", "0")

# One persistent compile cache for the WHOLE suite, shared across test
# files, the two-process workers, and repeated suite runs (the cache dir
# is stable, unlike per-test tmp cache_roots). Repeat runs skip nearly
# all XLA:CPU compiles, which both speeds the suite up and shrinks the
# compile-induced scheduling-starvation windows behind the historical
# full-suite SIGABRT. apply_compile_cache() respects this env override.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "jax_test_compile")
os.makedirs(_CACHE, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _CACHE)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def cpu_devices():
    devices = jax.devices()
    assert devices[0].platform == "cpu"
    return devices
