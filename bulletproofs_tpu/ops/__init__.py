"""Device (JAX/XLA/Pallas) kernels: packed-limb field/curve ops and MSM.

Importing this package enables a persistent XLA compilation cache (the
kernel family is static -- field chains, MSM shapes -- so cross-process
cache hits eliminate the 20-40 s first-compile cost of the TPU toolchain).
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "BPTPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))

try:
    if _CACHE_DIR and _CACHE_DIR != "0":
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization only
    pass
