"""Test configuration.

Device-path tests run on a virtual 8-device CPU mesh so multi-chip sharding
is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benches run on the real chip).
"""

import os

# Detach the axon TPU tunnel entirely (it hangs jax device init when its
# relay is down, and it registers itself even under JAX_PLATFORMS=cpu).
# Set BPTPU_TEST_TPU=1 to run the suite against the tunnel instead.
if not os.environ.get("BPTPU_TEST_TPU"):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
# Host-local persistent XLA cache for tests: /tmp is never copied across
# machines, so CPU AOT entries (keyed without the CPU feature set) cannot
# SIGILL here; repeat suite runs then skip the XLA-CPU compile cost.  The
# repo-local .jax_cache stays TPU-only (see ops/__init__.py).
os.environ.setdefault("BPTPU_COMPILE_CACHE", "/tmp/bptpu_cpu_cache")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import random

import pytest


# Modules in the `-m quick` subset (VERDICT r4 item 9): protocol logic,
# transcripts, codecs, native cross-checks, and small-shape prove/verify --
# everything that runs in a few minutes WITHOUT the XLA-heavy device
# sweeps.  `pytest -m quick` (~3 min warm) is the iteration loop;
# tests/run_suite.py remains the full gate.
_QUICK_MODULES = {
    "test_core", "test_transcript", "test_generators", "test_ipp",
    "test_linear", "test_rangeproof", "test_mpc_wire", "test_fuzz_decode",
    "test_native_curve", "test_sc_vec", "test_zeroize", "test_config",
    "test_batch_prover", "test_readme_example", "test_r1cs",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (item.module.__name__ in _QUICK_MODULES
                and "slow" not in item.keywords):
            item.add_marker(pytest.mark.quick)


def pytest_configure(config):
    # Pin JAX to the CPU backend for tests: the axon TPU tunnel has ~0.5 s
    # per-op eager latency, and tests must not depend on TPU availability.
    # The tunnel plugin registers at interpreter start (sitecustomize) and
    # overrides JAX_PLATFORMS, and its backend init HANGS when the relay is
    # down -- jax.config is the only reliable override, and it must be set
    # before the first backend init.
    try:
        import jax
        if not os.environ.get("BPTPU_TEST_TPU"):
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:
        pass


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release jitted executables after each test module.

    XLA-CPU JIT code pages accumulate mmap regions; a full-suite run crosses
    the kernel's vm.max_map_count (65530 here) around the 100th test and
    dies with a segfault inside compiled code.  Clearing jax's compilation
    caches between modules keeps the map count bounded."""
    yield
    try:
        import gc
        import jax
        jax.clear_caches()
        gc.collect()
    except Exception:
        pass


class SeededRng:
    """Deterministic RNG with the `randbytes` protocol used across the API."""

    def __init__(self, seed: int = 0):
        self._r = random.Random(seed)

    def randbytes(self, n: int) -> bytes:
        return self._r.randbytes(n)


@pytest.fixture
def rng():
    return SeededRng(24)
