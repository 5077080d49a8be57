"""Device-path kernels (ops/) vs the host scalar core.

Every batched limb kernel is cross-checked against the Python-int oracle in
bulletproofs_tpu.core.  All device calls are jit-wrapped (eager per-op
dispatch is pathologically slow through the TPU tunnel and unrepresentative
of real use).
"""

import random

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bulletproofs_tpu.ops import field_jax as F
from bulletproofs_tpu.ops import curve_jax as C
from bulletproofs_tpu.ops import limbs
from bulletproofs_tpu.core.field import P, is_negative as h_isneg, sqrt_ratio_m1 as h_sqrt
from bulletproofs_tpu.core.ristretto import RISTRETTO_BASEPOINT, RistrettoPoint
from bulletproofs_tpu.core.scalar import Scalar, L

rr = random.Random(0xBEEF)
N = 32

A_INT = [rr.randrange(P) for _ in range(N)]
B_INT = [rr.randrange(P) for _ in range(N)]
A = jnp.asarray(limbs.ints_to_limbs(A_INT))
B = jnp.asarray(limbs.ints_to_limbs(B_INT))


def ints(x):
    return [v % P for v in limbs.limbs_to_ints(np.asarray(x))]


def test_limb_pack_roundtrip():
    vals = [0, 1, P - 1, 2 ** 255 - 1, 12345] + [rr.randrange(2 ** 256) for _ in range(10)]
    got = limbs.limbs_to_ints(limbs.ints_to_limbs(vals))
    assert got == vals
    # bytes roundtrip for canonical values
    can = [v % P for v in vals]
    lb = limbs.ints_to_limbs(can)
    assert limbs.limbs_to_bytes(lb).tobytes() == b"".join(v.to_bytes(32, "little") for v in can)


def test_field_arith_matches_host():
    add = jax.jit(F.add)
    sub = jax.jit(F.sub)
    mul = jax.jit(F.mul)
    assert ints(add(A, B)) == [(x + y) % P for x, y in zip(A_INT, B_INT)]
    assert ints(sub(A, B)) == [(x - y) % P for x, y in zip(A_INT, B_INT)]
    assert ints(mul(A, B)) == [(x * y) % P for x, y in zip(A_INT, B_INT)]
    assert ints(jax.jit(F.neg)(A)) == [(-x) % P for x in A_INT]
    assert ints(jax.jit(lambda x: F.mul_small(x, 121666))(A)) == [x * 121666 % P for x in A_INT]


def test_field_invert_and_chain():
    assert ints(jax.jit(F.invert)(A)) == [pow(x, P - 2, P) for x in A_INT]

    @jax.jit
    def chain(a, b):
        c = a
        for _ in range(20):
            c = F.mul(F.add(c, b), F.sub(a, c))
        return c

    exp = list(A_INT)
    for _ in range(20):
        exp = [((c + y) * (x - c)) % P for c, x, y in zip(exp, A_INT, B_INT)]
    assert ints(chain(A, B)) == exp


def test_is_negative_and_canonicalize():
    got = np.asarray(jax.jit(F.is_negative)(A))
    assert list(got) == [1 if h_isneg(x) else 0 for x in A_INT]
    cc = np.asarray(jax.jit(F.canonicalize)(jax.jit(F.mul)(A, B)))
    assert (cc >= 0).all() and (cc < 8192).all()


def test_sqrt_ratio_matches_host():
    u_int = [rr.randrange(P) for _ in range(N)]
    v_int = [rr.randrange(1, P) for _ in range(N)]
    u = jnp.asarray(limbs.ints_to_limbs(u_int))
    v = jnp.asarray(limbs.ints_to_limbs(v_int))
    ws, r = jax.jit(F.sqrt_ratio_m1)(u, v)
    h = [h_sqrt(a, b) for a, b in zip(u_int, v_int)]
    assert list(np.asarray(ws)) == [x[0] for x in h]
    assert ints(r) == [x[1] for x in h]


# ---------------------------------------------------------------------------
# curve ops
# ---------------------------------------------------------------------------

HP1 = [RISTRETTO_BASEPOINT.scalar_mul(Scalar(rr.randrange(1, L))) for _ in range(N)]
HP2 = [RISTRETTO_BASEPOINT.scalar_mul(Scalar(rr.randrange(1, L))) for _ in range(N)]
P1 = jnp.asarray(limbs.points_to_limbs(HP1))
P2 = jnp.asarray(limbs.points_to_limbs(HP2))

_compress = jax.jit(C.compress)


def compressed(pts):
    s = np.asarray(_compress(pts)).reshape(-1, limbs.NLIMBS)
    return [bytes(r) for r in limbs.limbs_to_bytes(s)]


def test_point_add_double_negate():
    got = compressed(jax.jit(C.add)(P1, P2))
    assert got == [(p + q).compress() for p, q in zip(HP1, HP2)]
    got = compressed(jax.jit(C.double)(P1))
    assert got == [p.double().compress() for p in HP1]
    zero = jax.jit(C.add)(P1, C.negate(P1))
    assert np.asarray(jax.jit(C.is_identity)(zero)).all()
    # unified add doubles correctly (complete formulas)
    got = compressed(jax.jit(C.add)(P1, P1))
    assert got == [p.double().compress() for p in HP1]


def test_point_eq():
    assert np.asarray(jax.jit(C.eq)(P1, P1)).all()
    assert not np.asarray(jax.jit(C.eq)(P1, P2)).any()


def test_decompress_roundtrip_and_rejects():
    raw = np.stack([np.frombuffer(p.compress(), np.uint8) for p in HP1])
    valid, pts = C.decompress_bytes(raw)
    assert valid.all()
    assert np.asarray(jax.jit(C.eq)(pts, P1)).all()

    bad = np.stack([
        np.frombuffer((1).to_bytes(32, "little"), np.uint8),       # negative s
        np.frombuffer((P + 1).to_bytes(32, "little"), np.uint8),   # non-canonical
        np.frombuffer((4).to_bytes(32, "little"), np.uint8),       # not on curve? (may be valid)
    ])
    valid, _ = C.decompress_bytes(bad)
    assert not valid[0] and not valid[1]
    # identity round-trips
    valid, pts = C.decompress_bytes(np.zeros((1, 32), np.uint8))
    assert valid.all()
    assert np.asarray(jax.jit(C.is_identity)(pts)).all()


def test_elligator_matches_host():
    raw64 = np.frombuffer(random.Random(2).randbytes(64 * N), np.uint8).reshape(N, 64)
    got = compressed(C.from_uniform_bytes(raw64))
    exp = [RistrettoPoint.from_uniform_bytes(raw64[i].tobytes()).compress()
           for i in range(N)]
    assert got == exp
