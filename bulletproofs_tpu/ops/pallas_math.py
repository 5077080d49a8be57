"""Shared in-kernel field/curve math for the Pallas TPU kernels.

The same 20 x 13-bit schoolbook arithmetic as ops/vec_field.py, expressed
in the subset of JAX that Mosaic lowers: static slices, concatenates,
elementwise ops, fori_loop.  Everything operates on (..., L, N) int32
values with limbs on the sublane axis; curve points are 4-tuples of
coordinate tensors (X, Y, Z, T) so Mosaic keeps them in registers/VMEM
without stacking.

Kernel-scope constants (subtraction bias, curve constants) arrive as one
(NCONST, L, 1) input tensor; kernels call `bind_consts` at entry.
Bound analysis is inherited from ops/vec_field.py and cross-checked by
tests/test_vec.py + tests/test_pallas.py against the Python-int oracle.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .limbs import NLIMBS, LIMB_BITS, LIMB_MASK
from ..core import field as host_field

L = NLIMBS
MASK = LIMB_MASK
TOP = 608                      # 2^260 mod p = 2^5 * 19

# const slots
BIAS, D2, ONE, D, SQRT_M1, INVSQRT_A_MINUS_D, P_LIMBS = range(7)
NCONST = 7


def _to_limbs(v: int) -> np.ndarray:
    out = np.zeros(L, np.int32)
    for k in range(L):
        out[k] = v & MASK
        v >>= LIMB_BITS
    return out


def make_consts() -> np.ndarray:
    """(NCONST, L, 1) int32 constant block, indexed by the slot enums above."""
    bias_v = sum(1 << (14 + LIMB_BITS * k) for k in range(L))
    rows = [
        _to_limbs((-bias_v) % host_field.P) + (1 << 14),
        _to_limbs(host_field.EDWARDS_D2),
        _to_limbs(1),
        _to_limbs(host_field.D),
        _to_limbs(host_field.SQRT_M1),
        _to_limbs(host_field.INVSQRT_A_MINUS_D),
        _to_limbs(host_field.P),
    ]
    return np.stack(rows).astype(np.int32)[:, :, None]


CONSTS = make_consts()
_C = [None] * NCONST


def bind_consts(consts_ref):
    for i in range(NCONST):
        _C[i] = consts_ref[i]


def const(i):
    return _C[i]


def carry(c):
    cr = c >> LIMB_BITS
    lo = c & MASK
    return lo + jnp.concatenate([TOP * cr[..., L - 1:, :], cr[..., :L - 1, :]],
                                axis=-2)


def fmul(a, b):
    """Schoolbook 20x20 with static slice/concat only (Mosaic-safe)."""
    lead = jnp.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    lanes = jnp.broadcast_shapes(a.shape[-1:], b.shape[-1:])
    # Mosaic cannot broadcast sublanes and lanes in one vector op.  `a` is
    # consumed as (1, N) sublane slices (sublane-only broadcast) and `b`
    # whole (lanes-only broadcast), so a lane-1 `a` (a curve constant) must
    # take the `b` role -- fmul commutes.
    if a.shape[-1] == 1 and b.shape[-1] != 1:
        a, b = b, a
    c = jnp.zeros(lead + (2 * L - 1,) + lanes, jnp.int32)
    for i in range(L):
        seg = c[..., i: i + L, :] + a[..., i: i + 1, :] * b
        parts = ([c[..., :i, :]] if i else []) + [seg]
        if i + L < 2 * L - 1:
            parts.append(c[..., i + L:, :])
        c = jnp.concatenate(parts, axis=-2) if len(parts) > 1 else parts[0]
    lo = c[..., :L, :]
    hi = c[..., L:, :]
    z1 = jnp.zeros_like(hi[..., :1, :])
    lo = lo + TOP * jnp.concatenate([hi & MASK, z1], axis=-2)
    lo = lo + TOP * jnp.concatenate([z1, hi >> LIMB_BITS], axis=-2)
    return carry(carry(carry(lo)))


def fsquare(a):
    return fmul(a, a)


def fadd(a, b):
    return carry(a + b)


def fsub(a, b):
    return carry(carry(a + _C[BIAS] - b))


def fneg(a):
    return carry(carry(_C[BIAS] - a))


def fmul_small(a, k):
    assert k * 9407 < 2 ** 31
    return carry(carry(carry(a * k)))


def fone(shape):
    """Materialized field element 1 of the given (..., L, N) shape (real
    concat ops, not a lazy broadcast -- Mosaic folds lazy broadcasts into
    unsupported two-axis vector.broadcast when later sliced)."""
    z = jnp.zeros(shape[:-2] + (L - 1,) + shape[-1:], jnp.int32)
    o = jnp.ones(shape[:-2] + (1,) + shape[-1:], jnp.int32)
    return jnp.concatenate([o, z], axis=-2)


def fselect(cond, a, b):
    """cond (..., 1, N) or (..., N) broadcastable over limbs."""
    return jnp.where(cond, a, b)


def pow2k(a, k):
    return jax.lax.fori_loop(0, k, lambda _, x: fsquare(x), a)


def pow_p58(a):
    """a^(2^252 - 3), the curve25519 chain (fori_loop squarings)."""
    t0 = fsquare(a)
    t1 = fsquare(fsquare(t0))
    t2 = fmul(a, t1)
    t3 = fmul(t0, t2)
    t4 = fsquare(t3)
    t5 = fmul(t2, t4)
    t6 = fmul(pow2k(t5, 5), t5)
    t7 = fmul(pow2k(t6, 10), t6)
    t8 = fmul(pow2k(t7, 20), t7)
    t9 = fmul(pow2k(t8, 10), t6)
    t10 = fmul(pow2k(t9, 50), t9)
    t11 = fmul(pow2k(t10, 100), t10)
    t12 = fmul(pow2k(t11, 50), t9)
    return fmul(fsquare(fsquare(t12)), a)


def canonicalize(c):
    """Canonical representative (13-bit limbs, value < p); sequential carry
    chain -- cheap in-kernel, use only at compare/encode boundaries."""
    for _ in range(2):
        t = c[..., L - 1:, :] >> 8
        c = jnp.concatenate([c[..., :L - 1, :], c[..., L - 1:, :] & 0xFF],
                            axis=-2)
        c = jnp.concatenate([c[..., :1, :] + 19 * t, c[..., 1:, :]], axis=-2)
        for k in range(L - 1):
            cr = c[..., k: k + 1, :] >> LIMB_BITS
            parts = []
            if k > 0:
                parts.append(c[..., :k, :])
            parts.append(c[..., k: k + 1, :] & MASK)
            parts.append(c[..., k + 1: k + 2, :] + cr)
            if k + 2 < L:
                parts.append(c[..., k + 2:, :])
            c = jnp.concatenate(parts, axis=-2)
    d = c - _C[P_LIMBS]
    borrow = jnp.zeros(d.shape[:-2] + (1,) + d.shape[-1:], jnp.int32)
    outs = []
    for k in range(L):
        t = d[..., k: k + 1, :] - borrow
        borrow = (t < 0).astype(jnp.int32)
        outs.append(t + (borrow << LIMB_BITS))
    d = jnp.concatenate(outs, axis=-2)
    ge_p = borrow == 0
    return jnp.where(ge_p, d, c)


def is_negative(c):
    """(..., 1, N) low bit of the canonical encoding."""
    return canonicalize(c)[..., :1, :] & 1


def eq_zero(c):
    """(..., 1, N) int32 1/0: canonical value == 0."""
    cc = canonicalize(c)
    return jnp.all(cc == 0, axis=-2, keepdims=True).astype(jnp.int32)


def feq(a, b):
    return eq_zero(fsub(a, b))


def cond_neg(c, flag):
    return jnp.where(flag != 0, fneg(c), c)


def ct_abs(c):
    return cond_neg(c, is_negative(c))


def sqrt_ratio_m1(u, v):
    """(was_square (..., 1, N) int32, r (..., L, N)) per RFC 9496."""
    v3 = fmul(fsquare(v), v)
    v7 = fmul(fsquare(v3), v)
    r = fmul(fmul(u, v3), pow_p58(fmul(u, v7)))
    check = fmul(v, fsquare(r))

    neg_u = fneg(u)
    correct = feq(check, u)
    flipped = feq(check, neg_u)
    flipped_i = feq(check, fmul(neg_u, _C[SQRT_M1]))

    r = jnp.where((flipped | flipped_i) != 0, fmul(r, _C[SQRT_M1]), r)
    r = ct_abs(r)
    return correct | flipped, r


# ---- curve ops on coordinate tuples ---------------------------------------

def ed_add(p, q):
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = fmul(fsub(Y1, X1), fsub(Y2, X2))
    B = fmul(fadd(Y1, X1), fadd(Y2, X2))
    C = fmul(fmul(T1, _C[D2]), T2)
    Dv = carry(carry(carry(2 * fmul(Z1, Z2))))
    E = fsub(B, A)
    Fv = fsub(Dv, C)
    G = fadd(Dv, C)
    H = fadd(B, A)
    return (fmul(E, Fv), fmul(G, H), fmul(Fv, G), fmul(E, H))


def ed_double(p):
    X1, Y1, Z1, _ = p
    A = fsquare(X1)
    B = fsquare(Y1)
    C = carry(carry(carry(2 * fsquare(Z1))))
    H = fadd(A, B)
    E = fsub(H, fsquare(fadd(X1, Y1)))
    G = fsub(A, B)
    Fv = fadd(C, G)
    return (fmul(E, Fv), fmul(G, H), fmul(Fv, G), fmul(E, H))


def identity_tuple(shape):
    """4-tuple of (shape[:-2], L, N)-shaped coords for the identity point."""
    zero = jnp.zeros(shape, jnp.int32)
    one = jnp.concatenate([jnp.ones(shape[:-2] + (1,) + shape[-1:], jnp.int32),
                           zero[..., 1:, :]], axis=-2)
    return (zero, one, one, zero)


def is_identity(p):
    """(..., 1, N): ristretto eq against (0:1:1:0) reduces to X==0 or Y==0."""
    return (eq_zero(p[0]) | eq_zero(p[1])).astype(jnp.int32)


def decompress(s):
    """RFC 9496 DECODE on limb columns s (L, N) -> (valid (1, N), point
    tuple).  Canonical-ness of the raw bytes is the caller's job."""
    ss = fsquare(s)
    one = fone(ss.shape)
    u1 = fsub(one, ss)
    u2 = fadd(one, ss)
    u2_sqr = fsquare(u2)
    v = fsub(fneg(fmul(_C[D], fsquare(u1))), u2_sqr)
    was_square, invsqrt = sqrt_ratio_m1(one, fmul(v, u2_sqr))
    den_x = fmul(invsqrt, u2)
    den_y = fmul(fmul(invsqrt, den_x), v)
    x = ct_abs(fmul(fmul_small(s, 2), den_x))
    y = fmul(u1, den_y)
    t = fmul(x, y)
    valid = was_square & (1 - is_negative(t)) & (1 - eq_zero(y))
    return valid, (x, y, one, t)


def compress(p):
    """RFC 9496 ENCODE -> canonical limb columns (L, N)."""
    X, Y, Z, T = p
    u1 = fmul(fadd(Z, Y), fsub(Z, Y))
    u2 = fmul(X, Y)
    one = fone(u1.shape)
    _, invsqrt = sqrt_ratio_m1(one, fmul(u1, fsquare(u2)))
    den1 = fmul(invsqrt, u1)
    den2 = fmul(invsqrt, u2)
    z_inv = fmul(fmul(den1, den2), T)
    ix0 = fmul(X, _C[SQRT_M1])
    iy0 = fmul(Y, _C[SQRT_M1])
    den1_rot = fmul(den1, _C[INVSQRT_A_MINUS_D])
    rotate = is_negative(fmul(T, z_inv))
    x = jnp.where(rotate != 0, iy0, X)
    y = jnp.where(rotate != 0, ix0, Y)
    den_inv = jnp.where(rotate != 0, den1_rot, den2)
    y = cond_neg(y, is_negative(fmul(x, z_inv)))
    s = ct_abs(fmul(den_inv, fsub(Z, y)))
    return canonicalize(s)
