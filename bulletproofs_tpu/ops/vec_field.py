"""Lane-major batched GF(2^255 - 19) arithmetic: limbs on sublanes, batch on
lanes.

This is the TPU field core.  A batch of field elements is
an int32 tensor of shape (..., L, N): the limb axis (L = 20 limbs x 13 bits,
little-endian) sits on the TPU *sublane* dimension and the batch axis N on
the *lane* dimension, so a (20, N) element batch occupies ceil(20/8) x
ceil(N/128) native (8, 128) int32 tiles with ~1.2x padding -- versus ~12.8x
for the batch-major (..., 4, 20) layout, where XLA pads 20 limb lanes to 128.
Every op is elementwise over lanes and vectorizes over arbitrary leading
batch dims.

Numeric invariants (cross-checked in tests/test_vec.py):

* value v = sum(limb_k * 2^(13k)), redundant mod p, limbs <= ~2^13.2 between
  ops; 20 * 9407^2 < 2^31 keeps the schoolbook product in int32;
* 2^260 == 608 (mod p) folds product limbs 20..38 back into 0..19;
* subtraction adds a bias (2^14 + r_k per limb, == 0 mod p) to stay
  nonnegative.

Reference parity: this layer replaces curve25519-dalek's FieldElement51 /
AVX2 backends (SURVEY.md §2b); the AVX2 4-way parallelism maps to the lane
axis here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import NLIMBS, LIMB_BITS, LIMB_MASK, ints_to_limbs
from ..core.field import P

L = NLIMBS
_TOPFOLD = 608  # 2^260 mod p = 2^5 * 19


def _make_bias() -> np.ndarray:
    v = sum(1 << (14 + LIMB_BITS * k) for k in range(L))
    r = (-v) % P
    r_limbs = ints_to_limbs([r])[0]
    return (r_limbs + (1 << 14)).astype(np.int32)[:, None]  # (L, 1)


_BIAS = _make_bias()

ZERO = np.zeros((L, 1), np.int32)
ONE = np.zeros((L, 1), np.int32)
ONE[0, 0] = 1


def const(value: int) -> np.ndarray:
    """Python int -> (L, 1) numpy limb column (broadcastable constant)."""
    return ints_to_limbs([value % P])[0].astype(np.int32)[:, None]


def carry_round(c: jnp.ndarray) -> jnp.ndarray:
    """One parallel carry-save round over the limb (sublane) axis."""
    carry = c >> LIMB_BITS
    lo = c & LIMB_MASK
    incoming = jnp.concatenate(
        [_TOPFOLD * carry[..., L - 1:, :], carry[..., : L - 1, :]], axis=-2)
    return lo + incoming


def add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return carry_round(a + b)


def add_lazy(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a + b without a carry round.  Safe only when the caller's bound
    analysis shows the sum's limbs stay < 2^31 through the next reduction."""
    return a + b


def sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    c = a + jnp.asarray(_BIAS) - b
    return carry_round(carry_round(c))


def neg(a: jnp.ndarray) -> jnp.ndarray:
    c = jnp.asarray(_BIAS) - a
    return carry_round(carry_round(c))


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook 20x20 product + top fold + 3 carry rounds."""
    shape = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    n = jnp.broadcast_shapes(a.shape[-1:], b.shape[-1:])
    c = jnp.zeros(shape + (2 * L - 1,) + n, jnp.int32)
    for i in range(L):
        c = c.at[..., i: i + L, :].add(a[..., i: i + 1, :] * b)
    return _reduce_wide(c)


def square(a: jnp.ndarray) -> jnp.ndarray:
    return mul(a, a)


def _reduce_wide(c: jnp.ndarray) -> jnp.ndarray:
    lo = c[..., :L, :]
    hi = c[..., L:, :]
    hi_lo = hi & LIMB_MASK
    hi_hi = hi >> LIMB_BITS
    lo = lo.at[..., : L - 1, :].add(_TOPFOLD * hi_lo)
    lo = lo.at[..., 1:L, :].add(_TOPFOLD * hi_hi)
    return carry_round(carry_round(carry_round(lo)))


def mul_small(a: jnp.ndarray, k: int) -> jnp.ndarray:
    assert k * 9407 < 2 ** 31
    return carry_round(carry_round(carry_round(a * k)))


def pow2k(a: jnp.ndarray, k: int) -> jnp.ndarray:
    return jax.lax.fori_loop(0, k, lambda _, x: square(x), a)


def pow_p58(a: jnp.ndarray) -> jnp.ndarray:
    """a^((p-5)/8) = a^(2^252 - 3) (standard curve25519 chain, batched)."""
    t0 = square(a)
    t1 = square(square(t0))
    t2 = mul(a, t1)
    t3 = mul(t0, t2)
    t4 = square(t3)
    t5 = mul(t2, t4)
    t6 = mul(pow2k(t5, 5), t5)
    t7 = mul(pow2k(t6, 10), t6)
    t8 = mul(pow2k(t7, 20), t7)
    t9 = mul(pow2k(t8, 10), t6)
    t10 = mul(pow2k(t9, 50), t9)
    t11 = mul(pow2k(t10, 100), t10)
    t12 = mul(pow2k(t11, 50), t9)
    return mul(square(square(t12)), a)


def invert(a: jnp.ndarray) -> jnp.ndarray:
    """a^(p-2) = a^(2^255 - 21)."""
    t0 = square(a)
    t1 = square(square(t0))
    t2 = mul(a, t1)
    t3 = mul(t0, t2)
    t4 = square(t3)
    t5 = mul(t2, t4)
    t6 = mul(pow2k(t5, 5), t5)
    t7 = mul(pow2k(t6, 10), t6)
    t8 = mul(pow2k(t7, 20), t7)
    t9 = mul(pow2k(t8, 10), t6)
    t10 = mul(pow2k(t9, 50), t9)
    t11 = mul(pow2k(t10, 100), t10)
    t12 = mul(pow2k(t11, 50), t9)
    return mul(pow2k(t12, 5), t3)


_SQRT_M1 = None


def sqrt_m1() -> np.ndarray:
    global _SQRT_M1
    if _SQRT_M1 is None:
        from ..core.field import SQRT_M1 as v
        _SQRT_M1 = const(v)
    return _SQRT_M1


def canonicalize(c: jnp.ndarray) -> jnp.ndarray:
    """Canonical representative: 13-bit limbs, value < p.  Sequential over
    limbs (2 x 19 carry steps) -- use only at encode/compare boundaries."""
    for _ in range(2):
        t = c[..., L - 1, :] >> 8
        c = c.at[..., L - 1, :].set(c[..., L - 1, :] & 0xFF)
        c = c.at[..., 0, :].add(19 * t)
        for k in range(L - 1):
            carry = c[..., k, :] >> LIMB_BITS
            c = c.at[..., k, :].set(c[..., k, :] & LIMB_MASK)
            c = c.at[..., k + 1, :].add(carry)
    p_limbs = jnp.asarray(ints_to_limbs([P])[0].astype(np.int32)[:, None])
    d = c - p_limbs
    borrow = jnp.zeros(c.shape[:-2] + c.shape[-1:], jnp.int32)
    outs = []
    for k in range(L):
        t = d[..., k, :] - borrow
        borrow = (t < 0).astype(jnp.int32)
        outs.append(t + (borrow << LIMB_BITS))
    d = jnp.stack(outs, axis=-2)
    ge_p = borrow == 0
    return jnp.where(ge_p[..., None, :], d, c)


def is_negative(c: jnp.ndarray) -> jnp.ndarray:
    """(..., N) low bit of the canonical encoding."""
    return (canonicalize(c)[..., 0, :] & 1).astype(jnp.int32)


def eq_zero(c: jnp.ndarray) -> jnp.ndarray:
    cc = canonicalize(c)
    return jnp.all(cc == 0, axis=-2)


def eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return eq_zero(sub(a, b))


def select(cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """cond (..., N) ? a : b, broadcast over the limb axis."""
    return jnp.where(cond[..., None, :], a, b)


def cond_neg(c: jnp.ndarray, flag: jnp.ndarray) -> jnp.ndarray:
    return select(flag, neg(c), c)


def ct_abs(c: jnp.ndarray) -> jnp.ndarray:
    return cond_neg(c, is_negative(c) == 1)


def sqrt_ratio_m1(u: jnp.ndarray, v: jnp.ndarray):
    """(was_square (..., N), r (..., L, N)): RFC 9496 SQRT_RATIO_M1."""
    v3 = mul(square(v), v)
    v7 = mul(square(v3), v)
    r = mul(mul(u, v3), pow_p58(mul(u, v7)))
    check = mul(v, square(r))

    neg_u = neg(u)
    correct = eq(check, u)
    flipped = eq(check, neg_u)
    flipped_i = eq(check, mul(neg_u, jnp.asarray(sqrt_m1())))

    r = select(flipped | flipped_i, mul(r, jnp.asarray(sqrt_m1())), r)
    r = ct_abs(r)
    return correct | flipped, r
