"""Framework configuration (the reference's Cargo-feature analog,
SURVEY.md §5 "config/flag system").

Everything is overridable via environment variables (BPTPU_*) or directly
on the `settings` object before first use.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


@dataclass
class Settings:
    # --- limb layout (ops/limbs.py) -- fixed by the overflow analysis; kept
    # here for documentation and asserted at import
    limb_bits: int = 13
    num_limbs: int = 20

    # --- MSM tuning (ops/msm.py)
    msm_window_bits: int = _env_int("BPTPU_MSM_WINDOW", 8)
    msm_max_groups: int = _env_int("BPTPU_MSM_GROUPS", 128)

    # --- sharded MSM (parallel/sharded_msm.py)
    groups_per_device: int = _env_int("BPTPU_GROUPS_PER_DEVICE", 64)

    # --- batch verification
    # bisect threshold when a fused batch check fails and the caller wants
    # the failing indices
    batch_bisect_min: int = _env_int("BPTPU_BATCH_BISECT_MIN", 1)

    # --- feature flags (reference Cargo features)
    # yoloproofs (R1CS) is always available here; this flag exists for
    # API-parity with deployments that want it disabled
    enable_r1cs: bool = os.environ.get("BPTPU_ENABLE_R1CS", "1") != "0"

    # --- compile cache (ops/__init__.py reads the env var directly)
    compile_cache_dir: str = os.environ.get("BPTPU_COMPILE_CACHE", "")


settings = Settings()
