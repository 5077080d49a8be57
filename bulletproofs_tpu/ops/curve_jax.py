"""Batched ristretto255 / edwards25519 point operations on limb tensors.

TPU-native replacement for curve25519-dalek's point layer (SURVEY.md §2b):
points are (..., 4, 20) int32 tensors of extended twisted Edwards
coordinates (X : Y : Z : T); every operation is complete (works for
identity and doubling inputs), branch-free, and batched -- the reference's
`subtle`-based constant-time selection becomes `jnp.where` by construction.

Formulas: add-2008-hwcd-3 / dbl-2008-hwcd for a = -1 (same as the
reference's backend); compress/decompress per RFC 9496 ENCODE/DECODE,
batched, with the whole sqrt_ratio exponentiation shared across the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import field_jax as F
from .limbs import NLIMBS, ints_to_limbs, limbs_to_bytes, bytes_to_limbs
from ..core import field as host_field

_D2 = None
_CONSTS = {}


def _const(name: str) -> np.ndarray:
    # Cache as numpy (NOT jnp): a jnp constant materialized inside a traced
    # scope would cache a tracer and leak it across jit boundaries.
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
        _CONSTS[name] = ints_to_limbs([vals[name]])[0]
    return _CONSTS[name]


def identity(shape=()) -> jnp.ndarray:
    """(..., 4, 20) identity points (0 : 1 : 1 : 0)."""
    pt = np.zeros((4, NLIMBS), np.int32)
    pt[1, 0] = 1
    pt[2, 0] = 1
    return jnp.broadcast_to(jnp.asarray(pt), tuple(shape) + (4, NLIMBS))


def add(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Complete unified addition (handles P == Q and identities)."""
    X1, Y1, Z1, T1 = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    X2, Y2, Z2, T2 = q[..., 0, :], q[..., 1, :], q[..., 2, :], q[..., 3, :]
    A = F.mul(F.sub(Y1, X1), F.sub(Y2, X2))
    B = F.mul(F.add(Y1, X1), F.add(Y2, X2))
    C = F.mul(F.mul(T1, _const("d2")), T2)
    D = F.mul_small(F.mul(Z1, Z2), 2)
    E = F.sub(B, A)
    Fv = F.sub(D, C)
    G = F.add(D, C)
    H = F.add(B, A)
    return jnp.stack([F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G), F.mul(E, H)],
                     axis=-2)


def double(p: jnp.ndarray) -> jnp.ndarray:
    """dbl-2008-hwcd (a = -1): 4M + 4S."""
    X1, Y1, Z1 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    A = F.square(X1)
    B = F.square(Y1)
    C = F.mul_small(F.square(Z1), 2)
    H = F.add(A, B)
    E = F.sub(H, F.square(F.add(X1, Y1)))
    G = F.sub(A, B)
    Fv = F.add(C, G)
    return jnp.stack([F.mul(E, Fv), F.mul(G, H), F.mul(Fv, G), F.mul(E, H)],
                     axis=-2)


def negate(p: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([F.neg(p[..., 0, :]), p[..., 1, :], p[..., 2, :],
                      F.neg(p[..., 3, :])], axis=-2)


def cond_negate(p: jnp.ndarray, flag: jnp.ndarray) -> jnp.ndarray:
    """flag (...,) boolean -> -p where set (branch-free)."""
    return jnp.where(flag[..., None, None], negate(p), p)


def select(flag: jnp.ndarray, p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(flag[..., None, None], p, q)


def eq(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Ristretto equality: X1*Y2 == Y1*X2 or X1*X2 == Y1*Y2."""
    X1, Y1 = p[..., 0, :], p[..., 1, :]
    X2, Y2 = q[..., 0, :], q[..., 1, :]
    a = F.eq(F.mul(X1, Y2), F.mul(Y1, X2))
    b = F.eq(F.mul(X1, X2), F.mul(Y1, Y2))
    return a | b


def is_identity(p: jnp.ndarray) -> jnp.ndarray:
    return eq(p, identity(p.shape[:-2]))


def compress(p: jnp.ndarray) -> jnp.ndarray:
    """Batched RFC 9496 ENCODE -> (..., 20) canonical limbs of s."""
    X, Y, Z, T = p[..., 0, :], p[..., 1, :], p[..., 2, :], p[..., 3, :]
    u1 = F.mul(F.add(Z, Y), F.sub(Z, Y))
    u2 = F.mul(X, Y)
    _, invsqrt = F.sqrt_ratio_m1(jnp.broadcast_to(jnp.asarray(F.ONE), u1.shape),
                                 F.mul(u1, F.square(u2)))
    den1 = F.mul(invsqrt, u1)
    den2 = F.mul(invsqrt, u2)
    z_inv = F.mul(F.mul(den1, den2), T)
    ix0 = F.mul(X, _const("sqrt_m1"))
    iy0 = F.mul(Y, _const("sqrt_m1"))
    enchanted = F.mul(den1, _const("invsqrt_a_minus_d"))
    rotate = F.is_negative(F.mul(T, z_inv)) == 1
    x = F.select(rotate, iy0, X)
    y = F.select(rotate, ix0, Y)
    den_inv = F.select(rotate, enchanted, den2)
    y = F.cond_neg(y, F.is_negative(F.mul(x, z_inv)) == 1)
    s = F.ct_abs(F.mul(den_inv, F.sub(Z, y)))
    return F.canonicalize(s)


# Jitted entry points for host-facing helpers: eager per-op dispatch through
# the TPU tunnel costs ~10ms-0.5s per primitive, so anything called from
# host code must go through jit.
_compress_jit = jax.jit(lambda p: compress(p))
_decompress_jit = jax.jit(lambda s: decompress(s))
_from_uniform_jit = jax.jit(lambda lo, hi: add(elligator_map(lo), elligator_map(hi)))
_is_identity_jit = jax.jit(lambda p: is_identity(p))


def compress_to_bytes(p: jnp.ndarray) -> np.ndarray:
    """(N, 4, 20) -> (N, 32) uint8 on host."""
    s = np.asarray(jax.device_get(_compress_jit(p)))
    return limbs_to_bytes(s.reshape(-1, NLIMBS))


def decompress(s: jnp.ndarray):
    """Batched RFC 9496 DECODE from canonical limb encodings.

    Returns (valid, point).  Canonical-ness of the 32-byte input (value < p,
    non-negative) must be pre-checked on host from the raw bytes
    (`decompress_bytes` does both).
    """
    ss = F.square(s)
    u1 = F.sub(jnp.broadcast_to(jnp.asarray(F.ONE), ss.shape), ss)
    u2 = F.add(jnp.broadcast_to(jnp.asarray(F.ONE), ss.shape), ss)
    u2_sqr = F.square(u2)
    v = F.sub(F.neg(F.mul(_const("d"), F.square(u1))), u2_sqr)
    was_square, invsqrt = F.sqrt_ratio_m1(
        jnp.broadcast_to(jnp.asarray(F.ONE), ss.shape), F.mul(v, u2_sqr))
    den_x = F.mul(invsqrt, u2)
    den_y = F.mul(F.mul(invsqrt, den_x), v)
    x = F.ct_abs(F.mul(F.mul_small(s, 2), den_x))
    y = F.mul(u1, den_y)
    t = F.mul(x, y)
    valid = was_square & (F.is_negative(t) == 0) & (~F.eq_zero(y))
    one = jnp.broadcast_to(jnp.asarray(F.ONE), ss.shape)
    return valid, jnp.stack([x, y, one, t], axis=-2)


def decompress_bytes(raw: np.ndarray):
    """(N, 32) uint8 -> (valid (N,), points (N, 4, 20)); includes the host
    canonical-ness checks on the raw encodings."""
    raw = np.asarray(raw, np.uint8)
    vals = [int.from_bytes(raw[i].tobytes(), "little") for i in range(raw.shape[0])]
    canonical = np.array([v < host_field.P and (v & 1) == 0 for v in vals])
    limbs = bytes_to_limbs(raw)
    valid, pts = _decompress_jit(jnp.asarray(limbs))
    return np.asarray(valid) & canonical, pts


def elligator_map(t: jnp.ndarray) -> jnp.ndarray:
    """Batched RFC 9496 MAP (one half of from_uniform_bytes)."""
    one = jnp.broadcast_to(jnp.asarray(F.ONE), t.shape)
    r = F.mul(F.mul(_const("sqrt_m1"), t), t)
    u = F.mul(F.add(r, one), _const("one_minus_d_sq"))
    v = F.mul(F.sub(F.neg(one), F.mul(r, _const("d"))), F.add(r, _const("d")))
    was_square, s = F.sqrt_ratio_m1(u, v)
    s_prime = F.neg(F.ct_abs(F.mul(s, t)))
    s = F.select(was_square, s, s_prime)
    c = F.select(was_square, F.neg(one), r)
    n = F.sub(F.mul(F.mul(c, F.sub(r, one)), _const("d_minus_one_sq")), v)
    w0 = F.mul(F.mul_small(s, 2), v)
    w1 = F.mul(n, _const("sqrt_ad_minus_one"))
    w2 = F.sub(one, F.square(s))
    w3 = F.add(one, F.square(s))
    return jnp.stack([F.mul(w0, w3), F.mul(w2, w1), F.mul(w1, w3),
                      F.mul(w0, w2)], axis=-2)


def from_uniform_bytes(raw: np.ndarray) -> jnp.ndarray:
    """(N, 64) uint8 -> (N, 4, 20) points: MAP(lo) + MAP(hi)."""
    raw = np.asarray(raw, np.uint8)
    lo = bytes_to_limbs(np.ascontiguousarray(raw[:, :32]))
    hi = bytes_to_limbs(np.ascontiguousarray(raw[:, 32:]))
    # mask to 255 bits (limb 19 covers bits 247..259; bit 255 is its bit 8)
    lo[:, NLIMBS - 1] &= 0xFF
    hi[:, NLIMBS - 1] &= 0xFF
    return _from_uniform_jit(jnp.asarray(lo), jnp.asarray(hi))


def scalar_mul_shared(p: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply a batch of points by one shared scalar (double-and-add over
    the public scalar's bits; used for generator setup, not secrets)."""
    acc = identity(p.shape[:-2])
    base = p
    while k:
        if k & 1:
            acc = add(acc, base)
        k >>= 1
        if k:
            base = double(base)
    return acc
