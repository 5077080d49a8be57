"""Device (JAX/XLA/Pallas) kernels: packed-limb field/curve ops and MSM.

Importing this package enables a persistent XLA compilation cache (the
kernel family is static -- field chains, MSM shapes -- so cross-process
cache hits eliminate the 20-40 s first-compile cost of the TPU toolchain).
"""

import os

import jax

from ..config import settings

_EXPLICIT = settings.compile_cache_dir is not None
_CACHE_DIR = settings.compile_cache_dir if _EXPLICIT else os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")

def _cpu_only() -> bool:
    # CPU AOT cache entries are keyed without the host's CPU feature set, so
    # an entry compiled on one x86 host can SIGILL on another.  Only persist
    # the cache when a real accelerator backend is in play.
    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and all(p.strip() in ("cpu", "") for p in plats.split(",")):
        return True
    return "host_platform_device_count" in os.environ.get("XLA_FLAGS", "")


try:
    # the cpu-only guard applies to the DEFAULT repo-local dir (which may
    # travel across machines); an explicit BPTPU_COMPILE_CACHE dir is the
    # caller's statement that it is host-local and safe (tests use /tmp)
    if _CACHE_DIR and _CACHE_DIR != "0" and (_EXPLICIT or not _cpu_only()):
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization only
    pass
