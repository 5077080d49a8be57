"""Limb packing: Python ints / 32-byte encodings <-> packed-limb tensors.

Layout: GF(2^255-19) elements (and mod-l scalars) are stored as 20 limbs of
13 bits each, little-endian, in int32 lanes -- chosen so that a 20-term
schoolbook product plus reduction folds stays below 2^31 (no 64-bit
arithmetic exists on the TPU VPU; see ops/vec_field.py for the bound
analysis).  Replaces the reference's 64-bit radix-51 / AVX2 representations
(curve25519-dalek backends, SURVEY.md §2b) with a lane-parallel layout.

All packing is vectorized numpy (host) -- it sits on the host->device
boundary and must not become a Python-loop bottleneck at MSM scale.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

NLIMBS = 20
LIMB_BITS = 13
LIMB_MASK = (1 << LIMB_BITS) - 1
_WEIGHTS = (1 << np.arange(LIMB_BITS, dtype=np.int64)).astype(np.int64)


# limb k covers bits [13k, 13k + 13): gather the 3 bytes that span it
# (same static schedule as ops/vec_curve.device_limbs_from_bytes)
_LIMB_BYTE = np.array([(LIMB_BITS * k) // 8 for k in range(NLIMBS)], np.intp)
_LIMB_OFF = np.array([(LIMB_BITS * k) % 8 for k in range(NLIMBS)], np.int32)


def bytes_to_limbs(data: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 little-endian -> (N, 20) int32 limbs (low 255..260 bits)."""
    data = np.ascontiguousarray(data, dtype=np.uint8)
    n = data.shape[0]
    b = np.zeros((n, 34), np.int32)
    b[:, :32] = data
    val = ((b[:, _LIMB_BYTE] | (b[:, _LIMB_BYTE + 1] << 8)
            | (b[:, _LIMB_BYTE + 2] << 16)) >> _LIMB_OFF)
    return val & LIMB_MASK


def ints_to_limbs(values: Sequence[int]) -> np.ndarray:
    """Python ints (< 2^256) -> (N, 20) int32 limbs."""
    buf = b"".join(int(v).to_bytes(32, "little") for v in values)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(len(values), 32)
    return bytes_to_limbs(arr)


def limbs_to_ints(limbs: np.ndarray) -> List[int]:
    """(..., 20) limbs -> Python ints (not reduced mod p)."""
    limbs = np.asarray(limbs, dtype=np.int64).reshape(-1, NLIMBS)
    out = []
    for row in limbs:
        acc = 0
        for k in range(NLIMBS - 1, -1, -1):
            acc = (acc << LIMB_BITS) + int(row[k])
        out.append(acc)
    return out


def limbs_to_bytes(limbs: np.ndarray) -> np.ndarray:
    """(N, 20) canonical limbs (13-bit, value < 2^255) -> (N, 32) uint8."""
    limbs = np.asarray(limbs, dtype=np.int64)
    n = limbs.shape[0]
    bits = ((limbs[:, :, None] >> np.arange(LIMB_BITS)) & 1).astype(np.uint8)
    bits = bits.reshape(n, NLIMBS * LIMB_BITS)[:, :256]
    return np.packbits(bits, axis=1, bitorder="little")


def points_to_limbs(points) -> np.ndarray:
    """Host RistrettoPoints -> (N, 4, 20) int32 (X, Y, Z, T)."""
    coords = []
    for p in points:
        coords.extend((p.X, p.Y, p.Z, p.T))
    return ints_to_limbs(coords).reshape(len(points), 4, NLIMBS)


def scalars_to_limbs(scalars) -> np.ndarray:
    """Host Scalars (or ints) -> (N, 20) int32."""
    return ints_to_limbs([s.v if hasattr(s, "v") else int(s) for s in scalars])
