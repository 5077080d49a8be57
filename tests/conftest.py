"""Test configuration.

Device-path tests run on a virtual 8-device CPU mesh so multi-chip sharding
is exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; benches run on the real chip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import random

import pytest


class SeededRng:
    """Deterministic RNG with the `randbytes` protocol used across the API."""

    def __init__(self, seed: int = 0):
        self._r = random.Random(seed)

    def randbytes(self, n: int) -> bytes:
        return self._r.randbytes(n)


@pytest.fixture
def rng():
    return SeededRng(24)
