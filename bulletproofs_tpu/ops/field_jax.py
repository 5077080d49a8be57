"""Batched GF(2^255 - 19) arithmetic as packed-limb int32 tensor kernels.

This is the TPU-native replacement for curve25519-dalek's field backend
(the reference's hottest dependency, SURVEY.md §2b): every operation is
elementwise/vectorized over an arbitrary leading batch shape, branch-free,
and jit/vmap/shard_map-compatible.

Representation and bounds
-------------------------
An element is (..., 20) int32: 20 limbs x 13 bits, little-endian, value
v = sum(limb_k * 2^(13k)), redundant mod p (v < 2^260).  The *loose
invariant* maintained between ops is limb <= B_LOOSE (~2^13.2).  Bounds:

* schoolbook product term: 20 * B_LOOSE^2 = 20*9407^2 = 1.77e9 < 2^31-1.
* reduction fold: 2^260 = 2^5 * 2^255 == 608 (mod p), so product limb
  c_{20+k} folds into c_k as 608*(c & 0x1fff) and 608*(c >> 13) into
  c_{k+1}; the folded accumulator stays < 1.9e9 < 2^31.
* three parallel carry rounds restore limb <= 8799; one round after add;
  two after biased subtraction.

No 64-bit arithmetic anywhere: TPU VPU lanes are 32-bit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import NLIMBS, LIMB_BITS, LIMB_MASK, ints_to_limbs
from ..core.field import P

# 2^260 mod p = 2^5 * 19
_TOPFOLD = 608

# Bias for subtraction: limbs (2^14 + r_k) with value == 0 mod p, where
# r = (-sum 2^14*2^(13k)) mod p.  Every bias limb >= 2^14 > B_LOOSE.
def _make_bias() -> np.ndarray:
    v = sum(1 << (14 + LIMB_BITS * k) for k in range(NLIMBS))
    r = (-v) % P
    r_limbs = ints_to_limbs([r])[0]
    return (r_limbs + (1 << 14)).astype(np.int32)


_BIAS = _make_bias()

ZERO = np.zeros(NLIMBS, np.int32)
ONE = np.array([1] + [0] * (NLIMBS - 1), np.int32)


def carry_round(c: jnp.ndarray) -> jnp.ndarray:
    """One parallel carry-save round; top carry (weight 2^260) folds into
    limb 0 with factor 608.  Requires nonnegative limbs."""
    carry = c >> LIMB_BITS
    lo = c & LIMB_MASK
    incoming = jnp.concatenate(
        [_TOPFOLD * carry[..., NLIMBS - 1:], carry[..., : NLIMBS - 1]], axis=-1)
    return lo + incoming


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return carry_round(a + b)


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    c = a + jnp.asarray(_BIAS) - b
    return carry_round(carry_round(c))


def neg(a: jnp.ndarray) -> jnp.ndarray:
    c = jnp.asarray(_BIAS) - a
    return carry_round(carry_round(c))


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook 20x20 product + fold + 3 carry rounds."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    c = jnp.zeros(shape + (2 * NLIMBS - 1,), jnp.int32)
    for i in range(NLIMBS):
        c = c.at[..., i: i + NLIMBS].add(a[..., i: i + 1] * b)
    return _reduce_wide(c)


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def _reduce_wide(c: jnp.ndarray) -> jnp.ndarray:
    """Fold limbs 20..38 (weights 2^260..) into 0..19, then carry."""
    lo = c[..., :NLIMBS]
    hi = c[..., NLIMBS:]
    hi_lo = hi & LIMB_MASK
    hi_hi = hi >> LIMB_BITS
    lo = lo.at[..., : NLIMBS - 1].add(_TOPFOLD * hi_lo)
    lo = lo.at[..., 1:NLIMBS].add(_TOPFOLD * hi_hi)
    lo = carry_round(lo)
    lo = carry_round(lo)
    return carry_round(lo)


def mul_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """Multiply by a small constant (k * B_LOOSE < 2^31 required)."""
    assert k * 9407 < 2 ** 31
    return carry_round(carry_round(carry_round(a * k)))


def pow2k(a: jnp.ndarray, k: int) -> jnp.ndarray:
    """a^(2^k) via k squarings (lax loop keeps the traced graph small)."""
    return jax.lax.fori_loop(0, k, lambda _, x: square(x), a)


def _pow_p58(a: jnp.ndarray) -> jnp.ndarray:
    """a^((p-5)/8) -- the exponent 2^252 - 3, via the standard curve25519
    addition chain (11 multiplies + 254 squarings, all batched)."""
    t0 = square(a)                     # 2
    t1 = square(square(t0))            # 8
    t2 = mul(a, t1)                    # 9
    t3 = mul(t0, t2)                   # 11
    t4 = square(t3)                    # 22
    t5 = mul(t2, t4)                   # 2^5 - 1
    t6 = mul(pow2k(t5, 5), t5)         # 2^10 - 1
    t7 = mul(pow2k(t6, 10), t6)        # 2^20 - 1
    t8 = mul(pow2k(t7, 20), t7)        # 2^40 - 1
    t9 = mul(pow2k(t8, 10), t6)        # 2^50 - 1
    t10 = mul(pow2k(t9, 50), t9)       # 2^100 - 1
    t11 = mul(pow2k(t10, 100), t10)    # 2^200 - 1
    t12 = mul(pow2k(t11, 50), t9)      # 2^250 - 1
    return mul(square(square(t12)), a)  # 2^252 - 3


def invert(a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2) = a^(2^255 - 21): chain shared with _pow_p58."""
    t0 = square(a)                     # 2
    t1 = square(square(t0))            # 8
    t2 = mul(a, t1)                    # 9
    t3 = mul(t0, t2)                   # 11
    t4 = square(t3)                    # 22
    t5 = mul(t2, t4)                   # 2^5 - 1
    t6 = mul(pow2k(t5, 5), t5)         # 2^10 - 1
    t7 = mul(pow2k(t6, 10), t6)        # 2^20 - 1
    t8 = mul(pow2k(t7, 20), t7)        # 2^40 - 1
    t9 = mul(pow2k(t8, 10), t6)        # 2^50 - 1
    t10 = mul(pow2k(t9, 50), t9)       # 2^100 - 1
    t11 = mul(pow2k(t10, 100), t10)    # 2^200 - 1
    t12 = mul(pow2k(t11, 50), t9)      # 2^250 - 1
    return mul(pow2k(t12, 5), t3)      # 2^255 - 21


_SQRT_M1 = None
def _sqrt_m1() -> np.ndarray:
    # numpy, not jnp: see curve_jax._const for the tracer-leak rationale
    global _SQRT_M1
    if _SQRT_M1 is None:
        from ..core.field import SQRT_M1
        _SQRT_M1 = ints_to_limbs([SQRT_M1])[0]
    return _SQRT_M1


def canonicalize(c: jnp.ndarray) -> jnp.ndarray:
    """Reduce to the canonical representative: limbs 13-bit, value < p."""
    # fold bits >= 255 (limb 19 bits 8..12) as *19 into limb 0, twice
    for _ in range(2):
        t = c[..., NLIMBS - 1] >> 8
        c = c.at[..., NLIMBS - 1].set(c[..., NLIMBS - 1] & 0xFF)
        c = c.at[..., 0].add(19 * t)
        # strict sequential carry (no top wrap: value now < 2^255 + eps)
        for k in range(NLIMBS - 1):
            carry = c[..., k] >> LIMB_BITS
            c = c.at[..., k].set(c[..., k] & LIMB_MASK)
            c = c.at[..., k + 1].add(carry)
    # now v < 2^255 + small; subtract p once if v >= p
    p_limbs = jnp.asarray(ints_to_limbs([P])[0])
    d = c - p_limbs
    # borrow-propagate d
    borrow = jnp.zeros(c.shape[:-1], jnp.int32)
    outs = []
    for k in range(NLIMBS):
        t = d[..., k] - borrow
        borrow = (t < 0).astype(jnp.int32)
        outs.append(t + (borrow << LIMB_BITS))
    d = jnp.stack(outs, axis=-1)
    ge_p = borrow == 0
    return jnp.where(ge_p[..., None], d, c)


def is_negative(c: jnp.ndarray) -> jnp.ndarray:
    """Low bit of the canonical encoding (RFC 9496 IS_NEGATIVE)."""
    return (canonicalize(c)[..., 0] & 1).astype(jnp.int32)


def eq_zero(c: jnp.ndarray) -> jnp.ndarray:
    cc = canonicalize(c)
    return jnp.all(cc == 0, axis=-1)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return eq_zero(sub(a, b))


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Branch-free select: cond ? a : b (cond broadcast over limbs)."""
    return jnp.where(cond[..., None], a, b)


def cond_neg(c: jnp.ndarray, flag: jnp.ndarray) -> jnp.ndarray:
    return select(flag, neg(c), c)


def ct_abs(c: jnp.ndarray) -> jnp.ndarray:
    return cond_neg(c, is_negative(c) == 1)


def sqrt_ratio_m1(u: jnp.ndarray, v: jnp.ndarray):
    """(was_square, r): r = sqrt(u/v) or sqrt(i*u/v), non-negative
    (RFC 9496 SQRT_RATIO_M1, fully batched; host oracle in core/field.py)."""
    v3 = mul(square(v), v)
    v7 = mul(square(v3), v)
    r = mul(mul(u, v3), _pow_p58(mul(u, v7)))
    check = mul(v, square(r))

    neg_u = neg(u)
    correct = eq(check, u)
    flipped = eq(check, neg_u)
    flipped_i = eq(check, mul(neg_u, _sqrt_m1()))

    r = select(flipped | flipped_i, mul(r, _sqrt_m1()), r)
    r = ct_abs(r)
    return correct | flipped, r
