"""Lane-major batched ristretto255 / edwards25519 point operations.

Points are int32 tensors of shape (..., 4, L, N): extended twisted Edwards
coordinates (X : Y : Z : T) stacked on axis -3, limbs on the sublane axis,
batch on the lane axis (see ops/vec_field.py for the layout rationale).
Formulas are add-2008-hwcd-3 / dbl-2008-hwcd for a = -1, complete and
branch-free, matching the reference backend's semantics
(curve25519-dalek, SURVEY.md §2b); compression follows RFC 9496.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import vec_field as F
from .limbs import NLIMBS, ints_to_limbs, limbs_to_bytes, bytes_to_limbs
from ..core import field as host_field

L = NLIMBS

_CONSTS = {}


def const(name: str) -> np.ndarray:
    """(L, 1) numpy limb column for a named curve constant (numpy, not jnp,
    so a traced constant is never cached across jit scopes)."""
    if name not in _CONSTS:
        vals = {
            "d": host_field.D,
            "d2": host_field.EDWARDS_D2,
            "sqrt_m1": host_field.SQRT_M1,
            "invsqrt_a_minus_d": host_field.INVSQRT_A_MINUS_D,
            "one_minus_d_sq": host_field.ONE_MINUS_D_SQ,
            "d_minus_one_sq": host_field.D_MINUS_ONE_SQ,
            "sqrt_ad_minus_one": host_field.SQRT_AD_MINUS_ONE,
        }
        _CONSTS[name] = F.const(vals[name])
    return _CONSTS[name]


def identity(shape=(), n: int = 1) -> jnp.ndarray:
    """(..., 4, L, n) identity points (0 : 1 : 1 : 0)."""
    pt = np.zeros((4, L, 1), np.int32)
    pt[1, 0, 0] = 1
    pt[2, 0, 0] = 1
    return jnp.broadcast_to(jnp.asarray(pt), tuple(shape) + (4, L, n))


def coords(p):
    return p[..., 0, :, :], p[..., 1, :, :], p[..., 2, :, :], p[..., 3, :, :]


def add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete unified addition (handles P == Q and identities)."""
    X1, Y1, Z1, T1 = coords(p)
    X2, Y2, Z2, T2 = coords(q)
    A = F.mul(F.sub(Y1, X1), F.sub(Y2, X2))
    B = F.mul(F.add(Y1, X1), F.add(Y2, X2))
    C = F.mul(F.mul(T1, jnp.asarray(const("d2"))), T2)
    D = F.mul_small(F.mul(Z1, Z2), 2)
    E = F.sub(B, A)
    Fv = F.sub(D, C)
    G = F.add(D, C)
    H = F.add(B, A)
    return jnp.stack([F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G), F.mul(E, H)],
                     axis=-3)


def double(p: jnp.ndarray) -> jnp.ndarray:
    """dbl-2008-hwcd (a = -1): 4M + 4S."""
    X1, Y1, Z1, _ = coords(p)
    A = F.square(X1)
    B = F.square(Y1)
    C = F.mul_small(F.square(Z1), 2)
    H = F.add(A, B)
    E = F.sub(H, F.square(F.add(X1, Y1)))
    G = F.sub(A, B)
    Fv = F.add(C, G)
    return jnp.stack([F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G), F.mul(E, H)],
                     axis=-3)


def negate(p: jnp.ndarray) -> jnp.ndarray:
    X, Y, Z, T = coords(p)
    return jnp.stack([F.neg(X), Y, Z, F.neg(T)], axis=-3)


def cond_negate(p: jnp.ndarray, flag: jnp.ndarray) -> jnp.ndarray:
    """flag (..., N) -> -p where set."""
    return jnp.where(flag[..., None, None, :], negate(p), p)


def select(flag: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(flag[..., None, None, :], p, q)


def eq(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """(..., N) ristretto equality: X1*Y2 == Y1*X2 or X1*X2 == Y1*Y2."""
    X1, Y1 = p[..., 0, :, :], p[..., 1, :, :]
    X2, Y2 = q[..., 0, :, :], q[..., 1, :, :]
    a = F.eq(F.mul(X1, Y2), F.mul(Y1, X2))
    b = F.eq(F.mul(X1, X2), F.mul(Y1, Y2))
    return a | b


def is_identity(p: jnp.ndarray) -> jnp.ndarray:
    return eq(p, identity(p.shape[:-3], p.shape[-1]))


def compress(p: jnp.ndarray) -> jnp.ndarray:
    """Batched RFC 9496 ENCODE -> (..., L, N) canonical limbs of s."""
    X, Y, Z, T = coords(p)
    u1 = F.mul(F.add(Z, Y), F.sub(Z, Y))
    u2 = F.mul(X, Y)
    one = jnp.broadcast_to(jnp.asarray(F.ONE), u1.shape)
    _, invsqrt = F.sqrt_ratio_m1(one, F.mul(u1, F.square(u2)))
    den1 = F.mul(invsqrt, u1)
    den2 = F.mul(invsqrt, u2)
    z_inv = F.mul(F.mul(den1, den2), T)
    ix0 = F.mul(X, jnp.asarray(const("sqrt_m1")))
    iy0 = F.mul(Y, jnp.asarray(const("sqrt_m1")))
    enchanted = F.mul(den1, jnp.asarray(const("invsqrt_a_minus_d")))
    rotate = F.is_negative(F.mul(T, z_inv)) == 1
    x = F.select(rotate, iy0, X)
    y = F.select(rotate, ix0, Y)
    den_inv = F.select(rotate, enchanted, den2)
    y = F.cond_neg(y, F.is_negative(F.mul(x, z_inv)) == 1)
    s = F.ct_abs(F.mul(den_inv, F.sub(Z, y)))
    return F.canonicalize(s)


def decompress(s: jnp.ndarray):
    """Batched RFC 9496 DECODE from canonical limb encodings (..., L, N).

    Returns (valid (..., N), point (..., 4, L, N)).  Canonical-ness of the
    raw 32-byte input must be pre-checked on host (see decompress_bytes)."""
    ss = F.square(s)
    one = jnp.broadcast_to(jnp.asarray(F.ONE), ss.shape)
    u1 = F.sub(one, ss)
    u2 = F.add(one, ss)
    u2_sqr = F.square(u2)
    v = F.sub(F.neg(F.mul(jnp.asarray(const("d")), F.square(u1))), u2_sqr)
    was_square, invsqrt = F.sqrt_ratio_m1(one, F.mul(v, u2_sqr))
    den_x = F.mul(invsqrt, u2)
    den_y = F.mul(F.mul(invsqrt, den_x), v)
    x = F.ct_abs(F.mul(F.mul_small(s, 2), den_x))
    y = F.mul(u1, den_y)
    t = F.mul(x, y)
    valid = was_square & (F.is_negative(t) == 0) & (~F.eq_zero(y))
    return valid, jnp.stack([x, y, one, t], axis=-3)


def elligator_map(t: jnp.ndarray) -> jnp.ndarray:
    """Batched RFC 9496 MAP (one half of from_uniform_bytes)."""
    one = jnp.broadcast_to(jnp.asarray(F.ONE), t.shape)
    r = F.mul(F.mul(jnp.asarray(const("sqrt_m1")), t), t)
    u = F.mul(F.add(r, one), jnp.asarray(const("one_minus_d_sq")))
    v = F.mul(F.sub(F.neg(one), F.mul(r, jnp.asarray(const("d")))),
              F.add(r, jnp.asarray(const("d"))))
    was_square, s = F.sqrt_ratio_m1(u, v)
    s_prime = F.neg(F.ct_abs(F.mul(s, t)))
    s = F.select(was_square, s, s_prime)
    c = F.select(was_square, F.neg(one), r)
    n = F.sub(F.mul(F.mul(c, F.sub(r, one)),
                    jnp.asarray(const("d_minus_one_sq"))), v)
    w0 = F.mul(F.mul_small(s, 2), v)
    w1 = F.mul(n, jnp.asarray(const("sqrt_ad_minus_one")))
    w2 = F.sub(one, F.square(s))
    w3 = F.add(one, F.square(s))
    return jnp.stack([F.mul(w0, w3), F.mul(w2, w1), F.mul(w1, w3),
                      F.mul(w0, w2)], axis=-3)


# ---- host <-> device conversion helpers (lane-major) -----------------------

_compress_jit = jax.jit(compress)
_decompress_jit = jax.jit(decompress)
_is_identity_jit = jax.jit(is_identity)
_from_uniform_jit = jax.jit(lambda lo, hi: add(elligator_map(lo), elligator_map(hi)))


def points_to_lanes(points) -> np.ndarray:
    """Host RistrettoPoints -> (4, L, N) int32."""
    coords_flat = []
    for p in points:
        coords_flat.extend((p.X, p.Y, p.Z, p.T))
    arr = ints_to_limbs(coords_flat).reshape(len(points), 4, L)
    return np.ascontiguousarray(arr.transpose(1, 2, 0))


def lanes_to_points(arr: np.ndarray):
    """(4, L, N) -> list of host RistrettoPoints."""
    from ..core.ristretto import RistrettoPoint
    from .limbs import limbs_to_ints

    arr = np.asarray(arr)
    n = arr.shape[-1]
    vals = limbs_to_ints(arr.transpose(2, 0, 1).reshape(-1, L))
    return [RistrettoPoint(vals[4 * i] % host_field.P, vals[4 * i + 1] % host_field.P,
                           vals[4 * i + 2] % host_field.P, vals[4 * i + 3] % host_field.P)
            for i in range(n)]


def field_to_lanes(values) -> np.ndarray:
    """Python ints -> (L, N)."""
    return np.ascontiguousarray(ints_to_limbs(values).T)


def _on_tpu() -> bool:
    try:
        dev = jax.config.jax_default_device or jax.devices()[0]
        return dev.platform == "tpu"
    except Exception:
        return False


# static byte/shift schedule: limb k covers bits [13k, 13k + 13)
_LIMB_BYTE = np.array([(13 * k) // 8 for k in range(L)], np.int32)
_LIMB_OFF = np.array([(13 * k) % 8 for k in range(L)], np.int32)


def device_limbs_from_bytes(raw: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 device array -> (L, N) int32 limb columns (on device;
    replaces the host numpy unpackbits path at batch scale)."""
    b = jnp.concatenate(
        [raw, jnp.zeros((raw.shape[0], 2), jnp.uint8)], axis=1).astype(jnp.int32)
    lo = b[:, _LIMB_BYTE]
    mid = b[:, _LIMB_BYTE + 1]
    hi = b[:, _LIMB_BYTE + 2]
    val = (lo | (mid << 8) | (hi << 16)) >> jnp.asarray(_LIMB_OFF)[None, :]
    return (val & ((1 << 13) - 1)).T


def device_canonical_mask(raw: jnp.ndarray) -> jnp.ndarray:
    """(N, 32) uint8 device array -> (N,) bool: canonical field encoding
    (value < p = 2^255 - 19 and even)."""
    b = raw.astype(jnp.int32)
    top_clear = b[:, 31] < 128
    ge_p = ((b[:, 31] == 127) & (b[:, 0] >= 237)
            & jnp.all(b[:, 1:31] == 255, axis=1))
    return top_clear & ~ge_p & ((b[:, 0] & 1) == 0)


# static byte-extraction schedule: byte i covers bits [8i, 8i+8) of the
# 13-bit-limb value (an 8-bit window spans at most 2 limbs)
_B32_LIMB = np.array([(8 * i) // 13 for i in range(32)], np.int32)
_B32_OFF = np.array([(8 * i) % 13 for i in range(32)], np.int32)


@jax.jit
def _limb_bytes_jit(s: jnp.ndarray) -> jnp.ndarray:
    """(L, N) canonical limbs -> (N, 32) uint8, ON DEVICE (fetching bytes
    costs 32 B/point over the tunnel vs 80 B for int32 limbs)."""
    padded = jnp.concatenate([s, jnp.zeros_like(s[:1])], axis=0)
    lo = padded[_B32_LIMB, :]
    hi = padded[_B32_LIMB + 1, :]
    off = jnp.asarray(_B32_OFF)[:, None]
    b = ((lo >> off) | (hi << (13 - off))) & 255
    return b.T.astype(jnp.uint8)


def compress_device(p: jnp.ndarray) -> jnp.ndarray:
    """(4, L, N) -> (N, 32) uint8 DEVICE array (fused Pallas kernel on
    TPU); nothing is fetched, so callers can defer the sync."""
    if _on_tpu() and p.shape[-1] % 256 == 0:
        from . import msm_pallas
        s = msm_pallas.compress_lanes(p)
    else:
        s = _compress_jit(p)
    return _limb_bytes_jit(s)


def compress_to_bytes(p: jnp.ndarray) -> np.ndarray:
    """(4, L, N) -> (N, 32) uint8 on host."""
    return np.asarray(jax.device_get(compress_device(p)))


def canonical_mask(raw: np.ndarray) -> np.ndarray:
    """(N, 32) uint8 -> bool mask: encoding is canonical (< p, even)."""
    raw = np.asarray(raw, np.uint8)
    # canonical iff value < p = 2^255 - 19 and low bit 0.  Compare from the
    # top byte down, vectorized.
    p_bytes = np.frombuffer(host_field.P.to_bytes(32, "little"), np.uint8)
    lt = np.zeros(raw.shape[0], bool)
    gt = np.zeros(raw.shape[0], bool)
    for k in range(31, -1, -1):
        lt = lt | (~gt & (raw[:, k] < p_bytes[k]))
        gt = gt | (~lt & (raw[:, k] > p_bytes[k]))
    return lt & ((raw[:, 0] & 1) == 0)


_prep_decompress_jit = jax.jit(
    lambda raw: (device_limbs_from_bytes(raw), device_canonical_mask(raw)))


def decompress_device(raw_dev: jnp.ndarray):
    """(N, 32) uint8 on device -> (valid (N,) bool device array, points
    (4, L, N)).  Fully asynchronous: nothing is fetched to host, so callers
    can overlap host work with the device decompression."""
    limbs, canonical = _prep_decompress_jit(raw_dev)
    if _on_tpu() and raw_dev.shape[0] % 256 == 0:
        from . import msm_pallas
        valid, pts = msm_pallas.decompress_lanes(limbs)
    else:
        valid, pts = _decompress_jit(limbs)
    return valid & canonical, pts


def decompress_bytes(raw: np.ndarray):
    """(N, 32) uint8 -> (valid (N,) host bool array, points (4, L, N));
    includes the canonical-ness checks (on device)."""
    raw = np.ascontiguousarray(np.asarray(raw, np.uint8))
    valid, pts = decompress_device(jnp.asarray(raw))
    return np.asarray(jax.device_get(valid)), pts


def from_uniform_bytes(raw: np.ndarray) -> jnp.ndarray:
    """(N, 64) uint8 -> (4, L, N) points: MAP(lo) + MAP(hi)."""
    raw = np.asarray(raw, np.uint8)
    lo = bytes_to_limbs(np.ascontiguousarray(raw[:, :32]))
    hi = bytes_to_limbs(np.ascontiguousarray(raw[:, 32:]))
    lo[:, L - 1] &= 0xFF
    hi[:, L - 1] &= 0xFF
    return _from_uniform_jit(jnp.asarray(np.ascontiguousarray(lo.T)),
                             jnp.asarray(np.ascontiguousarray(hi.T)))
