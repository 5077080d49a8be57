"""Host field / scalar / ristretto255 core tests.

Anchored on public ristretto255 constants (RFC 9496 / dalek): the basepoint
encoding and the odd sqrt(ad-1) Elligator constant; everything else is
property-tested.  The golden-proof tests provide transitive bit-exactness
for compress/decompress/Elligator against curve25519-dalek.
"""

import random

import pytest

from bulletproofs_tpu.core import field as F
from bulletproofs_tpu.core.scalar import Scalar, batch_invert, L
from bulletproofs_tpu.core.ristretto import (
    RistrettoPoint, RISTRETTO_BASEPOINT, multiscalar_mul)


BASEPOINT_HEX = "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76"


def test_field_constants():
    assert (F.SQRT_M1 * F.SQRT_M1) % F.P == F.P - 1
    assert F.SQRT_M1 % 2 == 0
    assert (F.SQRT_AD_MINUS_ONE ** 2) % F.P == (-F.D - 1) % F.P
    inv = F.INVSQRT_A_MINUS_D
    assert (inv * inv % F.P) * ((-1 - F.D) % F.P) % F.P == 1


def test_sqrt_ratio_cases():
    # square case
    ws, r = F.sqrt_ratio_m1(4, 1)
    assert ws and (r * r) % F.P == 4
    # u/v square
    ws, r = F.sqrt_ratio_m1(9, 4)
    assert ws and (r * r * 4) % F.P == 9
    # non-square: returns sqrt(i*u/v)
    rr = random.Random(1)
    for _ in range(10):
        u, v = rr.randrange(1, F.P), rr.randrange(1, F.P)
        ws, r = F.sqrt_ratio_m1(u, v)
        lhs = (v * r * r) % F.P
        if ws:
            assert lhs == u % F.P
        else:
            assert lhs == (u * F.SQRT_M1) % F.P or lhs == (F.P - u * F.SQRT_M1 % F.P) % F.P
        assert r % 2 == 0  # non-negative root


def test_scalar_arithmetic():
    a, b = Scalar(12345), Scalar(L - 1)
    assert (a + b).v == (12345 - 1) % L
    assert (a * a.invert()).v == 1
    assert Scalar.from_bytes_mod_order_wide(b"\xff" * 64).v == (2 ** 512 - 1) % L
    assert Scalar.from_canonical_bytes(L.to_bytes(32, "little")) is None
    assert Scalar.from_canonical_bytes((L - 1).to_bytes(32, "little")).v == L - 1


def test_batch_invert():
    rr = random.Random(2)
    xs = [Scalar(rr.randrange(1, L)) for _ in range(17)]
    orig = [x.v for x in xs]
    allinv = batch_invert(xs)
    prod = 1
    for o in orig:
        prod = prod * o % L
    assert allinv.v == pow(prod, L - 2, L)
    for o, inv in zip(orig, xs):
        assert o * inv.v % L == 1


def test_basepoint_encoding():
    assert RISTRETTO_BASEPOINT.compress().hex() == BASEPOINT_HEX


def test_point_roundtrip_and_group_laws():
    rr = random.Random(3)
    B = RISTRETTO_BASEPOINT
    pts = [B.scalar_mul(Scalar(rr.randrange(1, L))) for _ in range(8)]
    for p in pts:
        assert RistrettoPoint.decompress(p.compress()) == p
        assert p + RistrettoPoint.identity() == p
        assert p - p == RistrettoPoint.identity()
        assert p.double() == p + p
    assert (pts[0] + pts[1]) + pts[2] == pts[0] + (pts[1] + pts[2])
    assert pts[0] + pts[1] == pts[1] + pts[0]


def test_decompress_rejects_invalid():
    # non-canonical field element (>= p)
    assert RistrettoPoint.decompress((F.P + 1).to_bytes(32, "little")) is None
    # negative s
    assert RistrettoPoint.decompress((1).to_bytes(32, "little")) is None
    # identity decodes
    assert RistrettoPoint.decompress(bytes(32)).is_identity()


def test_scalar_mul_matches_repeated_add():
    B = RISTRETTO_BASEPOINT
    acc = RistrettoPoint.identity()
    for k in range(8):
        assert B.scalar_mul(Scalar(k)) == acc
        acc = acc + B


def test_elligator_identity_on_zero():
    # MAP(0): s = 0 -> encodes the identity coset member
    p = RistrettoPoint._elligator_map(0)
    # must be a valid group element
    assert RistrettoPoint.decompress(p.compress()) == p


def test_msm_matches_naive():
    rr = random.Random(4)
    B = RISTRETTO_BASEPOINT
    for n in [0, 1, 2, 3, 33, 100]:
        pts = [B.scalar_mul(Scalar(rr.randrange(1, L))) for _ in range(n)]
        ss = [Scalar(rr.randrange(L)) for _ in range(n)]
        naive = RistrettoPoint.identity()
        for s, p in zip(ss, pts):
            naive = naive + p.scalar_mul(s)
        assert multiscalar_mul(ss, pts) == naive
