"""Test configuration.

Device-path tests run on a virtual 8-device CPU mesh so multi-chip sharding
is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benches run on the real chip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# No persistent XLA cache in tests: CPU AOT entries compiled on a different
# machine (the TPU tunnel host) can be feature-mismatched with this host.
os.environ["BPTPU_COMPILE_CACHE"] = "0"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import random

import pytest


def pytest_configure(config):
    # Pin JAX to the CPU backend for tests: the axon TPU tunnel has ~0.5 s
    # per-op eager latency, and tests must not depend on TPU availability.
    # (JAX_PLATFORMS=cpu is not honored under the axon plugin, so set the
    # default device explicitly.)
    try:
        import jax
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
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
