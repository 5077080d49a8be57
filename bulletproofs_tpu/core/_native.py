"""ctypes binding to the native host curve backend (native/ristretto.cpp).

Exposes `LIB` (the loaded shared library with argtypes configured) or None
when the library is unbuilt / disabled.  Set BPTPU_NO_NATIVE=1 to force the
pure-Python paths (tests use this to cross-check the two implementations).

Boundary formats (see native/ristretto.cpp):
  point  = 128 bytes (X, Y, Z, T as 32-byte little-endian field elements)
  scalar = 32 bytes little-endian, reduced mod l
"""

from __future__ import annotations

import ctypes
import os


def _load():
    from ..config import settings
    if settings.no_native:
        return None
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    native_dir = os.path.join(here, "native")
    so = os.path.join(native_dir, "libbptranscript.so")
    if not os.path.exists(so):
        # fresh checkout: build once (quiet); fall back to pure Python on
        # any failure
        import subprocess
        try:
            subprocess.run(["sh", "build.sh"], cwd=native_dir,
                           capture_output=True, timeout=600, check=True)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        sz = ctypes.c_size_t
        lib.rist_msm.argtypes = [sz, ctypes.c_char_p, ctypes.c_char_p,
                                 ctypes.c_char_p]
        lib.rist_msm.restype = None
        lib.rist_msm_ct.argtypes = [sz, ctypes.c_char_p, ctypes.c_char_p,
                                    ctypes.c_char_p]
        lib.rist_msm_ct.restype = None
        lib.rist_bit_commit.argtypes = [sz, ctypes.c_uint64, ctypes.c_char_p,
                                        ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_char_p, ctypes.c_char_p]
        lib.rist_bit_commit.restype = None
        lib.rist_scalar_mul.argtypes = [ctypes.c_char_p] * 3
        lib.rist_scalar_mul.restype = None
        lib.rist_add.argtypes = [ctypes.c_char_p] * 3
        lib.rist_add.restype = None
        lib.rist_sum.argtypes = [sz, ctypes.c_char_p, ctypes.c_char_p]
        lib.rist_sum.restype = None
        lib.rist_fold.argtypes = [sz] + [ctypes.c_char_p] * 4
        lib.rist_fold.restype = None
        lib.rist_compress.argtypes = [ctypes.c_char_p] * 2
        lib.rist_compress.restype = None
        lib.rist_decompress.argtypes = [ctypes.c_char_p] * 2
        lib.rist_decompress.restype = ctypes.c_int
        lib.rist_from_uniform_bytes.argtypes = [ctypes.c_char_p] * 2
        lib.rist_from_uniform_bytes.restype = None
        lib.rist_eq.argtypes = [ctypes.c_char_p] * 2
        lib.rist_eq.restype = ctypes.c_int
        lib.rist_is_identity.argtypes = [ctypes.c_char_p]
        lib.rist_is_identity.restype = ctypes.c_int
        lib.rist_msm_rows.argtypes = [sz, sz, ctypes.c_char_p,
                                      ctypes.c_char_p, ctypes.c_char_p]
        lib.rist_msm_rows.restype = None
        lib.rist_msm_rows_ct.argtypes = [sz, sz, ctypes.c_char_p,
                                         ctypes.c_char_p, ctypes.c_char_p]
        lib.rist_msm_rows_ct.restype = None
        lib.rist_batch_compress.argtypes = [sz, ctypes.c_char_p,
                                            ctypes.c_char_p]
        lib.rist_batch_compress.restype = None
        lib.rist_batch_decompress.argtypes = [sz] + [ctypes.c_char_p] * 3
        lib.rist_batch_decompress.restype = ctypes.c_int
        for name, nargs in (("sc_vec_mul", 3), ("sc_vec_add", 3),
                            ("sc_vec_scale", 3), ("sc_vec_inner", 3),
                            ("sc_powers", 2)):
            fn = getattr(lib, name)
            fn.argtypes = [sz] + [ctypes.c_char_p] * nargs
            fn.restype = None
        lib.sc_vec_batch_invert.argtypes = [sz, ctypes.c_char_p]
        lib.sc_vec_batch_invert.restype = None
        lib.sc_invert1.argtypes = [ctypes.c_char_p] * 2
        lib.sc_invert1.restype = None
        lib.ipp_round_scalars.argtypes = [sz, sz] + [ctypes.c_char_p] * 8
        lib.ipp_round_scalars.restype = None
        lib.ipp_fold.argtypes = [sz, sz] + [ctypes.c_char_p] * 6
        lib.ipp_fold.restype = None
        # R1CS vector stages (large-circuit host path)
        lib.r1cs_lr_polys.argtypes = [sz] + [ctypes.c_char_p] * 17
        lib.r1cs_lr_polys.restype = None
        lib.r1cs_lr_eval.argtypes = [sz, sz] + [ctypes.c_char_p] * 11
        lib.r1cs_lr_eval.restype = None
        lib.r1cs_verify_scalars.argtypes = [sz, sz, sz] + [ctypes.c_char_p] * 14
        lib.r1cs_verify_scalars.restype = None
        lib.sc_vec_axpy.argtypes = [sz] + [ctypes.c_char_p] * 3
        lib.sc_vec_axpy.restype = None
        lib.r1cs_hg_factors.argtypes = [sz, sz] + [ctypes.c_char_p] * 4
        lib.r1cs_hg_factors.restype = None
        try:
            lib.linear_verify_replay_batch_c.argtypes = (
                [ctypes.c_char_p, sz, ctypes.c_char_p, sz]
                + [ctypes.c_char_p] * 5
                + [ctypes.c_uint64, ctypes.c_uint64]
                + [ctypes.c_char_p] * 3)
            lib.linear_verify_replay_batch_c.restype = ctypes.c_int
        except AttributeError:
            pass   # older .so build: the linear fast path auto-disables
        del u8p
        return lib
    except (OSError, AttributeError):
        return None


LIB = _load()
